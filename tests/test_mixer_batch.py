"""Batched mixer render (`Mixer.render_blocks`) vs per-block rendering.

`render_blocks` must be semantically identical to K `render_block` calls:
the same host-side f64 sweeps, quantized swaps and gain trajectories run
in the same order, and the device math per block is the same — only the
dispatch granularity changes.  These tests pin that equivalence across
pitch modes (Off / Resample / PreservePitch via the host WSOLA search),
wrap windows, a mid-batch quantized swap, and mute gating.
"""

import numpy as np
import pytest

from libgooey_tpu.mixer.loop_channel import (
    PITCH_OFF,
    PITCH_PRESERVE,
    PITCH_RESAMPLE,
)
from libgooey_tpu.mixer.mixer import Mixer
from libgooey_tpu.mixer.stereo_buffer import StereoSampleBuffer

SR = 44100.0
B = 512


def _tone(n, f, sr=SR, seed=None):
    t = np.arange(n) / sr
    x = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    if seed is not None:
        x = x + np.random.RandomState(seed).randn(n).astype(np.float32) * 0.02
    return x


def _build(configure):
    m = Mixer(SR, block_size=B, buffer_capacity=1 << 15)
    configure(m)
    return m


def _compare(configure, K=10, atol=2e-6):
    seq = _build(configure)
    ref = [np.asarray(seq.render_block()) for _ in range(K)]
    ref = np.concatenate(ref, axis=-1)

    bat = _build(configure)
    got = np.asarray(bat.render_blocks(K))

    np.testing.assert_allclose(got, ref, atol=atol, rtol=0)
    # host control state converged identically (cursor, swaps, smoothing)
    for cs, cb in zip(seq.channels, bat.channels):
        assert cs.swaps_completed == cb.swaps_completed
        np.testing.assert_allclose(cb.cursor, cs.cursor, atol=1e-9)
    return got


def test_batched_matches_sequential_resample_and_off():
    def configure(m):
        m.set_bpm(150.0)  # warp 1.25 for the resample channel
        b0 = StereoSampleBuffer.from_channels(
            _tone(20000, 220.0, seed=0), _tone(20000, 330.0, seed=1), SR, 120.0
        )
        m.channels[0].set_buffer(b0)
        m.channels[0].pitch_mode = PITCH_OFF
        m.channels[0].speed = 1.31
        m.channels[0].set_playing(True)
        b1 = StereoSampleBuffer.from_channels(
            _tone(16384, 110.0, seed=2), _tone(16384, 110.0, seed=3), SR, 120.0
        )
        m.channels[1].set_buffer(b1)
        m.channels[1].pitch_mode = PITCH_RESAMPLE
        m.channels[1].set_playing(True)
        m.channels[1].gain_target = 0.7

    _compare(configure)


def test_batched_matches_sequential_preserve_pitch_host_search():
    def configure(m):
        m.set_bpm(180.0)  # warp 1.5
        mono = _tone(1 << 14, 220.0, seed=4)
        m.channels[0].set_buffer(
            StereoSampleBuffer.from_channels(mono, mono * 0.8, SR, 120.0)
        )
        m.channels[0].pitch_mode = PITCH_PRESERVE
        m.channels[0].set_playing(True)

    _compare(configure, K=8)


def test_batched_wrap_window_and_mute():
    def configure(m):
        mono = _tone(1 << 14, 150.0, seed=5)
        ch = m.channels[2]
        ch.set_buffer(StereoSampleBuffer.from_channels(mono, mono, SR, 120.0))
        ch.set_loop_window(0.75, 0.25)  # wrap-around region
        ch.set_playing(True)
        m.channels[3].muted = True

    _compare(configure)


def test_batched_quantized_swap_lands_mid_batch():
    first = _tone(8192, 220.0, seed=6)
    second = _tone(8192, 440.0, seed=7)

    def configure(m):
        ch = m.channels[0]
        ch.set_buffer(StereoSampleBuffer.from_channels(first, first, SR, 120.0))
        ch.set_playing(True)
        ch.queue_swap(
            StereoSampleBuffer.from_channels(second, second, SR, 120.0),
            divisions=2,
        )

    got = _compare(configure, K=12)
    assert got.shape == (2, 12 * B)


def test_batched_with_effect_chain():
    from libgooey_tpu.mixer.chain import EFFECT_DELAY, EFFECT_LOWPASS_FILTER

    def configure(m):
        mono = _tone(1 << 13, 180.0, seed=8)
        ch = m.channels[1]
        ch.set_buffer(StereoSampleBuffer.from_channels(mono, mono, SR, 120.0))
        ch.set_playing(True)
        ch.chain.add(EFFECT_LOWPASS_FILTER)
        ch.chain.add(EFFECT_DELAY)

    _compare(configure)


@pytest.mark.parametrize("K", [1, 3])
def test_batched_small_counts(K):
    def configure(m):
        mono = _tone(4096, 330.0, seed=9)
        m.channels[0].set_buffer(
            StereoSampleBuffer.from_channels(mono, mono, SR, 120.0)
        )
        m.channels[0].set_playing(True)

    _compare(configure, K=K)
