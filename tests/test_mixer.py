"""Loop mixer: channel playback oracles, wrap windows, quantized swaps, clip
grid scheduling, WSOLA behavior, graph routing, stem renders (mirrors
tests/loop_mixer.rs, tests/loop_render_wav.rs, tests/clip_grid.rs,
tests/mixer_graph.rs)."""

import numpy as np

from libgooey_tpu.mixer import chain as chain_mod
from libgooey_tpu.mixer.clip_grid import QUANTIZE_BAR, STATE_LOADED, STATE_PLAYING, STATE_QUEUED
from libgooey_tpu.mixer.graph import MixerGraph, SOURCE_BASS, SOURCE_DRUMKIT
from libgooey_tpu.mixer.loop_channel import PITCH_PRESERVE, PITCH_RESAMPLE
from libgooey_tpu.mixer import mixer as mixer_mod
from libgooey_tpu.mixer.mixer import Mixer
from libgooey_tpu.mixer.stereo_buffer import StereoSampleBuffer

SR = 44100.0
B = 512


def ramp_buffer(period, sr=SR, bpm=None):
    ramp = (np.arange(period) % period).astype(np.float32) / period
    return StereoSampleBuffer.from_channels(ramp, ramp, sr, bpm)


def test_loop_tiles_ramp_exactly():
    """Loop playback tiles the region: out[i] == ramp[i % period]
    (tests/loop_render_wav.rs:78-142)."""
    m = Mixer(SR, block_size=B, buffer_capacity=1 << 14)
    period = 1000
    m.channels[0].set_buffer(ramp_buffer(period))
    m.channels[0].set_playing(True)
    out = np.concatenate([np.asarray(m.render_block())[0] for _ in range(8)])
    want = (np.arange(len(out)) % period).astype(np.float32) / period
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_loop_window_sub_region_and_wrap():
    m = Mixer(SR, block_size=B, buffer_capacity=1 << 14)
    period = 1000
    ch = m.channels[0]
    ch.set_buffer(ramp_buffer(period))
    ch.set_loop_window(0.2, 0.5)  # frames 200..500
    ch.restart()
    ch.set_playing(True)
    out = np.concatenate([np.asarray(m.render_block())[0] for _ in range(4)])
    want = (200 + (np.arange(len(out)) % 300)).astype(np.float32) / period
    np.testing.assert_allclose(out, want, atol=1e-4)

    # wrap-around window: end < start plays [800,1000) ∪ [0,200)
    ch.set_loop_window(0.8, 0.2)
    ch.restart()
    out = np.concatenate([np.asarray(m.render_block())[0] for _ in range(4)])
    virtual = (800 + (np.arange(len(out)) % 400)) % 1000
    np.testing.assert_allclose(out, virtual.astype(np.float32) / period, atol=1e-4)


def test_speed_and_resample_warp():
    m = Mixer(SR, block_size=B, buffer_capacity=1 << 14)
    ch = m.channels[0]
    ch.set_buffer(ramp_buffer(2000, bpm=120.0))
    ch.set_playing(True)
    ch.speed = 2.0
    out = np.asarray(m.render_block())[0]
    np.testing.assert_allclose(out[:500], (np.arange(0, 1000, 2) / 2000.0), atol=1e-4)
    # Resample warp: engine 60 BPM vs source 120 → half-speed reads
    ch.speed = 1.0
    ch.pitch_mode = PITCH_RESAMPLE
    m.set_bpm(60.0)
    ch.restart()
    out = np.asarray(m.render_block())[0]
    np.testing.assert_allclose(out[:100], np.arange(100) * 0.5 / 2000.0, atol=1e-4)


def test_quantized_swap_lands_on_grid():
    m = Mixer(SR, block_size=B, buffer_capacity=1 << 14)
    ch = m.channels[0]
    period = 1024
    ch.set_buffer(ramp_buffer(period))
    ch.set_playing(True)
    new = StereoSampleBuffer.from_channels(
        -np.ones(period, np.float32), -np.ones(period, np.float32), SR
    )
    ch.queue_swap(new, divisions=2)  # land at half-loop boundary (frame 512)
    out = np.concatenate([np.asarray(m.render_block())[0] for _ in range(3)])
    first_neg = int(np.argmax(out < -0.5))
    assert first_neg == 512, first_neg
    assert ch.swaps_completed == 1


def test_mute_fades_and_solo_gates():
    m = Mixer(SR, block_size=B, buffer_capacity=1 << 14)
    dc = StereoSampleBuffer.from_channels(
        np.ones(4096, np.float32), np.ones(4096, np.float32), SR
    )
    for i in (0, 1):
        m.channels[i].set_buffer(dc)
        m.channels[i].set_playing(True)
    m.channels[1].soloed = True
    for _ in range(14):  # 15 ms gate needs ~9 time constants to snap-settle
        out = np.asarray(m.render_block())
    # channel 0 faded out (solo gate), channel 1 stays
    assert abs(out[0, -1] - 1.0) < 0.02
    m.channels[1].soloed = False
    m.channels[0].muted = True
    for _ in range(14):
        out = np.asarray(m.render_block())
    assert abs(out[0, -1] - 1.0) < 0.02


def test_channel_chain_and_stem_preroll_warms_delay():
    m = Mixer(SR, block_size=B, buffer_capacity=1 << 14)
    ch = m.channels[0]
    period = 2048
    ch.set_buffer(ramp_buffer(period))
    ch.chain.add(chain_mod.EFFECT_DELAY)
    ch.chain.set_param(0, 1, 0.8)   # feedback
    ch.chain.set_param(0, 2, 0.5)   # mix
    warm = m.render_channel_to_buffer(0, 4096, preroll_blocks=8)
    cold = None
    ch.chain.reset()
    # cold render: no preroll
    ch.restart()
    ch.set_playing(True)
    cold = np.concatenate(
        [np.asarray(m.render_block()) for _ in range(8)], axis=-1
    )[:, :4096]
    assert np.abs(warm - cold).max() > 1e-3  # preroll audibly warms the tail
    assert np.all(np.isfinite(warm))


def test_clip_grid_launch_and_states():
    m = Mixer(SR, block_size=B, buffer_capacity=1 << 17)
    g = m.clip_grid
    # 1-bar loop at 120 BPM: 2 s = 88200 frames
    loop = ramp_buffer(88200)
    assert g.load(0, 2, loop, source_bpm=120.0)
    assert g.slot_state(0, 2) == STATE_LOADED
    g.transport_start(m.channels)
    assert g.launch_quantized(0, 2, QUANTIZE_BAR)
    assert g.slot_state(0, 2) & STATE_QUEUED
    # first bar boundary is beat 4 → two seconds of blocks
    blocks_to_bar = int(4 / (g.beats_per_sample() * B)) + 1
    for _ in range(blocks_to_bar + 1):
        m.render_block()
    assert g.slot_state(0, 2) & STATE_PLAYING
    assert m.channels[0].playing and m.channels[0].buffer is not None
    assert m.channels[0].pitch_mode == PITCH_PRESERVE
    # stop quantized
    g.stop_quantized(0, QUANTIZE_BAR)
    for _ in range(blocks_to_bar + 1):
        m.render_block()
    assert g.slot_state(0, 2) == STATE_LOADED


def test_wsola_preserves_duration_at_unity_and_stretches():
    """PreservePitch at warp 1 keeps material rate ~1:1; at engine BPM 60 vs
    source 120 the source is consumed at half rate (pitch unchanged)."""
    m = Mixer(SR, block_size=B, buffer_capacity=1 << 16)
    t = np.arange(44100)
    tone = np.sin(2 * np.pi * 440 * t / SR).astype(np.float32)
    ch = m.channels[0]
    ch.set_buffer(StereoSampleBuffer.from_channels(tone, tone, SR, 120.0))
    ch.pitch_mode = PITCH_PRESERVE
    ch.set_playing(True)
    out1 = np.concatenate([np.asarray(m.render_block())[0] for _ in range(20)])
    # unity warp: a pure 440 Hz tone (the first grain starts one hop ahead,
    # so the output is hop-shifted — compare spectrum + envelope, not phase)
    sp = np.abs(np.fft.rfft(out1[2000:2000 + 8192] * np.hanning(8192)))
    f = np.fft.rfftfreq(8192, 1 / SR)
    assert abs(f[np.argmax(sp)] - 440.0) < 10.0
    env = np.sqrt(np.convolve(out1[2000:12000] ** 2, np.ones(441) / 441, "valid"))
    assert env.std() / env.mean() < 0.1  # COLA keeps the envelope flat

    # warp 2x (engine 240 vs source 120): source consumption ~doubles while
    # the 440 Hz pitch is preserved.  The reference allows ±0.25 on the
    # ratio — WSOLA's similarity search trades tempo precision for grain
    # continuity, and a periodic tone is its worst case
    # (tests/loop_mixer.rs:356-397).
    baseline_cursor = m.channels[0].cursor
    m.set_bpm(240.0)
    ch.restart()
    out2 = np.concatenate([np.asarray(m.render_block())[0] for _ in range(20)])
    warped_cursor = m.channels[0].cursor
    sp = np.abs(np.fft.rfft(out2[2000:2000 + 8192] * np.hanning(8192)))
    f = np.fft.rfftfreq(8192, 1 / SR)
    peak = f[np.argmax(sp)]
    assert abs(peak - 440.0) < 10.0, peak
    ratio = warped_cursor / baseline_cursor
    assert abs(ratio - 2.0) < 0.25, ratio


def test_mixer_graph_routing_and_peaks():
    import jax.numpy as jnp

    g = MixerGraph.with_default_layout(SR, 120.0)
    frames = np.zeros((9, 2, B), np.float32)
    frames[SOURCE_DRUMKIT, :, :] = 0.5
    frames[SOURCE_BASS, :, :] = 0.25
    master, peaks = g.render(jnp.asarray(frames), B)
    master = np.asarray(master)
    # default layout sums bit-identically to the flat mix
    np.testing.assert_allclose(master, 0.75, atol=1e-5)
    g.record_peaks(peaks)
    assert abs(g.take_peak(0) - 0.5) < 1e-5
    assert g.take_peak(0) == 0.0  # read-and-reset
    # balance: hard-left on drums silences its right channel
    g.set_track_pan(0, 0.0)
    for _ in range(30):  # let the 10 ms pan smoother settle
        master, _ = g.render(jnp.asarray(frames), B)
    master = np.asarray(master)
    assert abs(master[0, -1] - 0.75) < 1e-2   # left unchanged (min(2(1-p),1)=1)
    assert abs(master[1, -1] - 0.25) < 1e-2   # drums gone from the right


def test_track_mute_solo_scoped():
    import jax.numpy as jnp

    g = MixerGraph.with_default_layout(SR, 120.0)
    frames = np.zeros((9, 2, B), np.float32)
    frames[SOURCE_DRUMKIT] = 0.5
    frames[SOURCE_BASS] = 0.25
    g.set_track_solo(1, True)  # solo bass
    out = None
    for _ in range(30):
        out, _ = g.render(jnp.asarray(frames), B)
    out = np.asarray(out)
    assert abs(out[0, -1] - 0.25) < 1e-2  # only bass remains


def test_clip_launch_lands_sample_exact_mid_block():
    """A launch whose quantize boundary falls mid-block starts at that exact
    sample, not the block edge (clip_grid.rs fires per sample; the channel
    sweep applies actions at exact offsets).  SR=1000 makes beat math exact
    (the reference's tests/clip_grid.rs uses the same trick)."""
    sr, bpm, B = 1000.0, 60.0, 512  # 1 beat = 1000 samples
    m = mixer_mod.Mixer(sr, bpm, B, buffer_capacity=4096)
    ones = np.ones(2000, np.float32)
    buf = StereoSampleBuffer(ones, ones, sr, source_bpm=bpm)
    assert m.clip_grid.load(0, 0, buf, bpm)
    m.clip_grid.transport_running = True
    assert m.clip_grid.launch_at(0, 0, 0.7)  # sample 700: offset 188 in block 1
    out0 = np.asarray(m.render_block())      # beats 0.000-0.512: silent
    assert np.abs(out0).max() == 0.0
    out1 = np.asarray(m.render_block())      # lands at sample 700 = offset 188
    nz = np.nonzero(np.abs(out1[0]) > 1e-7)[0]
    assert len(nz) > 0
    assert 188 <= nz[0] <= 192, nz[0]        # exact sample, not block edge
    assert np.abs(out1[0, :188]).max() == 0.0
    # and the grid's bookkeeping matches
    assert m.clip_grid.active_row[0] == 0
    assert abs(m.clip_grid.launch_beat[0] - 0.7) < 1e-9


def test_wsola_unity_warp_reconstructs_within_cola_bound():
    """PreservePitch at warp 1.0 on a DC ramp: the periodic-Hann OLA with a
    continuity-preserving search must reconstruct the source to within the
    COLA bound after the first hop (wsola.rs:29-81 invariants)."""
    sr, bpm, B = 44100.0, 120.0, 512
    m = mixer_mod.Mixer(sr, bpm, B, buffer_capacity=1 << 16)
    n = 1 << 15
    dc = np.full(n, 0.7, np.float32)  # constant: any alignment reconstructs
    ch = m.channels[0]
    ch.set_buffer(StereoSampleBuffer(dc, dc, sr, source_bpm=bpm))
    ch.pitch_mode = PITCH_PRESERVE
    ch.set_playing(True)
    blocks = [np.asarray(m.render_block())[0] for _ in range(8)]
    out = np.concatenate(blocks)
    settled = out[2048:]  # skip OLA warm-in
    # COLA: the two Hann streams must sum to unity -> output == 0.7
    assert np.abs(settled - 0.7).max() < 1e-3, np.abs(settled - 0.7).max()
