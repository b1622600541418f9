"""Visualization, FM snap, and legacy sequencer coverage."""

import numpy as np

from libgooey_tpu.engine.legacy_sequencer import LegacySequencer
from libgooey_tpu.instruments.common import fm_snap_block
from libgooey_tpu.visualization import (
    AudioBuffer, SpectrogramAnalyzer, WaveformDisplay,
)

SR = 44100.0


def test_audio_buffer_ring():
    buf = AudioBuffer(8)
    buf.push(1.0)
    buf.push(np.arange(10, dtype=np.float32))
    got = buf.get_samples()
    assert len(got) == 8 and buf.capacity() == 8
    np.testing.assert_array_equal(got, np.arange(2, 10, dtype=np.float32))


def test_spectrogram_peak_bin_and_db():
    sa = SpectrogramAnalyzer(1024, SR, max_history=4)
    f = sa.bin_to_frequency(100)
    t = np.arange(2048) / SR
    sa.analyze(np.sin(2 * np.pi * f * t).astype(np.float32))
    assert len(sa.get_history()) == 1
    spec = sa.get_history()[0]
    assert len(spec) == sa.num_bins() == 512
    assert np.argmax(spec) == 100
    # batched path matches the single path
    frames = np.stack([np.sin(2 * np.pi * f * t[:1024]).astype(np.float32)] * 3)
    sa2 = SpectrogramAnalyzer(1024, SR, max_history=8)
    sa2.analyze_many(frames)
    assert len(sa2.get_history()) == 3
    np.testing.assert_allclose(sa2.get_history()[0], sa2.get_history()[2],
                               rtol=0, atol=1e-5)
    # history bounded
    for _ in range(6):
        sa.analyze(np.sin(2 * np.pi * f * t).astype(np.float32))
    assert len(sa.get_history()) == 4


def test_waveform_display_renders_trace():
    buf = AudioBuffer(4096)
    t = np.arange(4096) / SR
    buf.push(0.8 * np.sin(2 * np.pi * 220.0 * t).astype(np.float32))
    disp = WaveformDisplay(buf, 200, 100, SR)
    assert disp.update() == [] and not disp.should_close()
    img = disp.render()
    assert img.shape == (100, 200, 3)
    trace = (img == np.array(WaveformDisplay.TRACE, np.uint8)).all(-1)
    assert trace.sum() > 200  # the sine covers many rows
    assert trace[:10].sum() == 0 or trace[:2].sum() == 0  # stays within ±0.8


def test_fm_snap_envelope_and_phase_carry():
    # elapsed spanning trigger at sample 0
    n = np.arange(512, dtype=np.float32)
    phase0 = np.float32(0.0)
    phase1, y = fm_snap_block(phase0, n / SR, SR)
    y = np.asarray(y)
    assert abs(y[0]) < 1e-5  # env starts at 0
    dur = int(0.009 * SR)
    assert np.abs(y[:dur]).max() > 0.3  # audible blip
    assert np.all(y[dur + 2:] == 0.0)   # silent after attack+decay
    assert 0.0 <= float(phase1) < 2 * np.pi
    # block splitting is seamless: 2×256 == 1×512
    pa, ya = fm_snap_block(phase0, n[:256] / SR, SR)
    pb, yb = fm_snap_block(pa, n[256:] / SR, SR)
    np.testing.assert_allclose(np.concatenate([ya, yb]), y, rtol=0, atol=2e-5)


def test_legacy_sequencer_8th_grid():
    seq = LegacySequencer(120.0, SR)  # 8th = 0.25 s = 11025 samples
    seq.start()
    fired = []
    for _ in range(4):
        fired += seq.tick_block(11025)
    assert [s for _, s in fired] == [0, 1, 2, 3]
    offs = [o for o, _ in fired]
    assert offs == [0, 0, 0, 0]  # lands exactly on block starts here
    # per-sample shim agrees with block path
    seq2 = LegacySequencer(120.0, SR)
    seq2.start()
    count = sum(seq2.tick() for _ in range(44100))
    assert count == len(fired) == 4
    # stopped sequencer advances time but never fires
    seq2.stop()
    assert seq2.tick_block(44100) == []
