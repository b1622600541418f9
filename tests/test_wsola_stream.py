"""Device-resident WSOLA streaming vs the per-block host scheduler.

The stream path (`ops/wsola_stream.py` + `mixer/stream.py`) must make the
same hop choices as the host scheduler on material with clear correlation
peaks and produce the same audio to ~1e-3 (in-kernel f32 positions vs the
host's f64 — see the module docstring's deviation list).  A differing hop
choice would shift a whole 2×hop grain and blow far past the tolerance,
so the audio comparison pins the choices too.

Runs at 8 kHz so hops are 160 samples and the interpret-mode kernels stay
fast on CPU.
"""

import numpy as np
import pytest

from libgooey_tpu.mixer import wsola
from libgooey_tpu.mixer.loop_channel import PITCH_PRESERVE
from libgooey_tpu.mixer.mixer import Mixer
from libgooey_tpu.mixer.stereo_buffer import StereoSampleBuffer

SR = 8000.0
B = 256


def _noise_buffer(n=1 << 13, seed=0, bpm=120.0):
    rng = np.random.RandomState(seed)
    left = (rng.randn(n) * 0.3).astype(np.float32)
    right = (rng.randn(n) * 0.3).astype(np.float32)
    return StereoSampleBuffer.from_channels(left, right, SR, bpm)


def _mixer(buffer, *, bpm=180.0, speed=1.0, window=None):
    m = Mixer(SR, block_size=B, buffer_capacity=1 << 14)
    m.set_bpm(bpm)
    ch = m.channels[0]
    ch.set_buffer(buffer)
    ch.pitch_mode = PITCH_PRESERVE
    ch.speed = speed
    if window is not None:
        ch.set_loop_window(*window)
    ch.set_playing(True)
    return m


def _host_reference(buffer, K, **kw):
    m = _mixer(buffer, **kw)
    out = [np.asarray(m.render_block()) for _ in range(K)]
    return np.concatenate(out, axis=-1), m


def _stream_render(buffer, calls, **kw):
    """Render via the device hop scan; ``calls`` is a list of K values."""
    old = wsola.USE_DEVICE_SEARCH
    wsola.USE_DEVICE_SEARCH = True
    try:
        m = _mixer(buffer, **kw)
        from libgooey_tpu.mixer import stream as stream_mod

        assert stream_mod.stream_config(m, 0) is not None, "stream ineligible"
        out = [np.asarray(m.render_blocks(k)) for k in calls]
        return np.concatenate(out, axis=-1), m
    finally:
        wsola.USE_DEVICE_SEARCH = old


def test_stream_matches_host_scheduler_noise():
    buf = _noise_buffer(seed=1)
    K = 12
    ref, _ = _host_reference(buf, K)
    got, m = _stream_render(buf, [K])
    np.testing.assert_allclose(got, ref, atol=1.5e-3, rtol=0)


def test_stream_matches_host_warp_down_and_speed():
    buf = _noise_buffer(seed=2)
    K = 10
    ref, _ = _host_reference(buf, K, bpm=90.0, speed=1.3)  # warp 0.75
    got, _ = _stream_render(buf, [K], bpm=90.0, speed=1.3)
    np.testing.assert_allclose(got, ref, atol=1.5e-3, rtol=0)


@pytest.mark.slow  # three n_hops variants -> three scan compiles
def test_stream_batch_boundaries_are_seamless():
    buf = _noise_buffer(seed=3)
    ref, mr = _stream_render(buf, [12])
    got, mg = _stream_render(buf, [3, 5, 4])
    np.testing.assert_allclose(got, ref, atol=1.5e-3, rtol=0)
    assert abs(mg.channels[0].cursor - mr.channels[0].cursor) < 1e-3


def test_stream_state_writeback_continues_on_host_path():
    """Stream a batch, then keep rendering per-block: the written-back
    scheduler state must continue the same hop sequence."""
    buf = _noise_buffer(seed=4)
    ref, _ = _host_reference(buf, 16)
    old = wsola.USE_DEVICE_SEARCH
    wsola.USE_DEVICE_SEARCH = True
    try:
        m = _mixer(buf)
        first = np.asarray(m.render_blocks(8))
        m.channels[0]._stretcher.use_device = False  # host search from here
        rest = [np.asarray(m.render_block()) for _ in range(8)]
    finally:
        wsola.USE_DEVICE_SEARCH = old
    got = np.concatenate([first] + rest, axis=-1)
    np.testing.assert_allclose(got, ref, atol=1.5e-3, rtol=0)


def test_stream_wrap_window():
    buf = _noise_buffer(n=1 << 13, seed=5)
    K = 10
    win = (0.7, 0.45)  # wrap-around loop region
    ref, _ = _host_reference(buf, K, window=win)
    got, _ = _stream_render(buf, [K], window=win)
    np.testing.assert_allclose(got, ref, atol=1.5e-3, rtol=0)


def test_stream_loop_seam_restarts():
    """A buffer short enough that the analysis cursor wraps mid-render:
    the wrap resets have_prev exactly like the host scheduler."""
    buf = _noise_buffer(n=3000, seed=6)
    K = 14  # 14 * 256 output samples at warp 1.5 sweeps past the seam twice
    ref, _ = _host_reference(buf, K)
    got, _ = _stream_render(buf, [K])
    np.testing.assert_allclose(got, ref, atol=1.5e-3, rtol=0)


def test_stream_warp_change_between_batches():
    """BPM (warp) changes between batched renders: the static config is
    rebuilt per batch and the written-back scheduler state must continue
    exactly like the per-block host path does."""
    buf = _noise_buffer(seed=9)
    ref_m = _mixer(buf)  # bpm 180 -> warp 1.5
    refs = [np.asarray(ref_m.render_block()) for _ in range(6)]
    ref_m.set_bpm(100.0)  # warp ~0.833 mid-stream
    refs += [np.asarray(ref_m.render_block()) for _ in range(6)]
    ref = np.concatenate(refs, axis=-1)

    old = wsola.USE_DEVICE_SEARCH
    wsola.USE_DEVICE_SEARCH = True
    try:
        m = _mixer(buf)
        a = np.asarray(m.render_blocks(6))
        m.set_bpm(100.0)
        b = np.asarray(m.render_blocks(6))
    finally:
        wsola.USE_DEVICE_SEARCH = old
    got = np.concatenate([a, b], axis=-1)
    np.testing.assert_allclose(got, ref, atol=1.5e-3, rtol=0)


def test_stream_ineligible_cases_fall_back():
    from libgooey_tpu.mixer import stream as stream_mod

    buf = _noise_buffer(seed=7)
    old = wsola.USE_DEVICE_SEARCH
    wsola.USE_DEVICE_SEARCH = True
    try:
        m = _mixer(buf)
        m.channels[0].speed = -1.0  # reverse → resample fallback path
        assert stream_mod.stream_config(m, 0) is None
        m.channels[0].speed = 1.0
        m.channels[0].queue_swap(_noise_buffer(seed=8))
        assert stream_mod.stream_config(m, 0) is None
        # render_blocks still works (host path), and the swap still lands
        out = np.asarray(m.render_blocks(6))
        assert out.shape == (2, 6 * B)
    finally:
        wsola.USE_DEVICE_SEARCH = old


def test_stream_engages_under_running_transport():
    """A RUNNING clip-grid transport with no action scheduled inside the
    span keeps every channel on the batched device scan (r4 Weak #5: the
    stream path used to disengage exactly during live clip-grid use), and
    the result still matches the per-block host path."""
    from libgooey_tpu.mixer import stream as stream_mod
    from libgooey_tpu.mixer import wsola as wsola_mod
    from libgooey_tpu.mixer.mixer import Mixer
    from libgooey_tpu.mixer.stereo_buffer import StereoSampleBuffer

    rng = np.random.RandomState(3)
    K = 8

    def mk():
        m = Mixer(SR, block_size=B, buffer_capacity=1 << 16)
        m.set_bpm(180.0)
        for col in range(2):
            tone = (rng.randn(22050) * 0.3).astype(np.float32)
            buf = StereoSampleBuffer.from_channels(tone, tone, SR, 120.0)
            m.clip_grid.load(col, 0, buf, 120.0)
        m.clip_grid.transport_start(m.channels)
        for col in range(2):
            m.clip_grid.launch_at(col, 0, 0.0)
        return m

    rng_state = rng.get_state()
    wsola_mod.USE_DEVICE_SEARCH = True
    try:
        ma = mk()
        rng.set_state(rng_state)
        mb = mk()
        # land the launches identically on both
        a0 = np.asarray(ma.render_blocks(1))
        b0 = np.concatenate([np.asarray(mb.render_block())], axis=-1)
        np.testing.assert_allclose(a0, b0, atol=2e-5)
        # batched span under the RUNNING transport must be eligible...
        assert all(
            stream_mod.stream_config(ma, i, K) is not None
            for i in range(2)
        ), "running transport must not disqualify streaming"
        # ...and match K per-block host renders
        a = np.asarray(ma.render_blocks(K))
        b = np.concatenate(
            [np.asarray(mb.render_block()) for _ in range(K)], axis=-1)
        assert np.abs(a - b).max() < 1e-3   # device-vs-host search class
        assert np.abs(a).max() > 1e-4
        assert abs(ma.clip_grid.transport_beat - mb.clip_grid.transport_beat) < 1e-9
    finally:
        wsola_mod.USE_DEVICE_SEARCH = False
