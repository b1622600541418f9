"""EngineOutput realtime adapter tests (engine_output.rs parity)."""

import time

import numpy as np

from libgooey_tpu.engine.output import EngineOutput


class RampEngine:
    """render(frames) → interleaved ramp so channel mapping is checkable."""

    block = 64

    def __init__(self):
        self.pos = 0

    def render(self, frames):
        n = np.arange(self.pos, self.pos + frames, dtype=np.float32)
        self.pos += frames
        out = np.empty(frames * 2, np.float32)
        out[0::2] = n          # L = sample index
        out[1::2] = -n         # R = negated
        return out


class SlowEngine(RampEngine):
    def render(self, frames):
        time.sleep(0.05)
        return super().render(frames)


def test_fill_channel_mapping_synchronous():
    out = EngineOutput(prefetch_blocks=0)  # synchronous render-in-callback
    out.initialize(44100.0)
    out.create_stream_with_engine(RampEngine())
    out.start()
    # stereo: L/R pass through
    buf = np.zeros(32 * 2, np.float32)
    assert out.fill(buf, 2) == 32
    np.testing.assert_array_equal(buf[0::2], np.arange(32, dtype=np.float32))
    np.testing.assert_array_equal(buf[1::2], -np.arange(32, dtype=np.float32))
    # mono: downmix (L+R)/2 == 0 for the ramp
    buf = np.ones(16, np.float32)
    out.fill(buf, 1)
    np.testing.assert_array_equal(buf, np.zeros(16, np.float32))
    # 4-channel: ch0=L ch1=R ch2..=downmix
    buf = np.ones(8 * 4, np.float32)
    out.fill(buf, 4)
    frames = buf.reshape(8, 4)
    np.testing.assert_array_equal(frames[:, 0], -frames[:, 1])
    np.testing.assert_array_equal(frames[:, 2], np.zeros(8, np.float32))
    assert out.sample_counter == 32 + 16 + 8
    out.stop()


def test_fill_continuity_across_block_boundaries():
    out = EngineOutput(prefetch_blocks=0)
    out.create_stream_with_engine(RampEngine())  # block=64
    out.start()
    got = []
    for frames in (48, 48, 100):  # straddles 64-sample blocks
        buf = np.zeros(frames * 2, np.float32)
        out.fill(buf, 2)
        got.append(buf[0::2])
    seq = np.concatenate(got)
    np.testing.assert_array_equal(seq, np.arange(len(seq), dtype=np.float32))
    out.stop()


def test_prefetch_pipeline_and_underrun_overrun():
    out = EngineOutput(prefetch_blocks=2)
    out.create_stream_with_engine(SlowEngine())  # 50 ms per 64-frame block
    out.start()
    deadline = time.time() + 2.0
    while time.time() < deadline:  # let the pipeline prime
        time.sleep(0.01)
        with out._lock:
            if len(out._queue) >= 2:
                break
    buf = np.zeros(64 * 2, np.float32)
    out.fill(buf, 2)
    assert buf[0::2].max() > 0  # served from the queue
    # drain far past what the slow renderer can sustain → underruns count
    for _ in range(8):
        out.fill(np.zeros(256 * 2, np.float32), 2)
    assert out.overrun_count() > 0
    # stop_if_overruns stops and resets the counter
    assert out.stop_if_overruns(1)
    assert not out.is_active and out.overrun_count() == 0


def test_take_overrun_count_resets():
    out = EngineOutput(prefetch_blocks=0)
    out.create_stream_with_engine(SlowEngine())
    out.initialize(44100.0)
    out.start()
    out.fill(np.zeros(64 * 2, np.float32), 2)  # 50ms render ≫ 1.45ms budget
    assert out.take_overrun_count() >= 1
    assert out.take_overrun_count() == 0
    out.stop()


class JitterEngine(RampEngine):
    """Render time alternates fast/slow per block (a jittery device)."""

    def __init__(self, fast_s=0.0, slow_s=0.004, period=3):
        super().__init__()
        self.calls = 0
        self.fast_s = fast_s
        self.slow_s = slow_s
        self.period = period

    def render(self, frames):
        self.calls += 1
        time.sleep(self.slow_s if self.calls % self.period == 0 else self.fast_s)
        return RampEngine.render(self, frames)


def test_jittery_callback_clock_absorbed_by_prefetch():
    """A simulated jittery callback clock (irregular fill() arrival) plus a
    jittery renderer: with enough prefetch depth the occasional slow block
    must NOT count as an overrun — the queue absorbs it
    (engine_output.rs:293-311: overruns measure sustained deadline misses,
    not one-off jitter).

    Timings are deliberately coarse (2048-frame blocks = 46.4 ms budget,
    60 ms isolated slow renders, 5-25 ms callback jitter) so that OS
    scheduling noise on a loaded 1-CPU box stays two orders of magnitude
    below the budget — the original 64-frame/1.45 ms version false-failed
    whenever the fill thread lost the CPU for a couple of milliseconds.
    """
    eng = JitterEngine(slow_s=0.060, period=3)  # avg 20 ms/blk, sustainable
    eng.block = 2048
    out = EngineOutput(prefetch_blocks=4)
    out.initialize(44100.0)
    out.create_stream_with_engine(eng)
    out.start()
    deadline = time.time() + 10.0
    while time.time() < deadline:  # prime the queue
        with out._lock:
            if len(out._queue) >= 3:
                break
        time.sleep(0.01)
    got = []
    # jittery callback paced at real time on average (46.4 ms per 2048-frame
    # block) with ±16 ms arrival jitter
    for i in range(12):
        time.sleep([0.030, 0.060, 0.049][i % 3])
        buf = np.zeros(2048 * 2, np.float32)
        out.fill(buf, 2)
        got.append(buf[0::2].copy())
    seq = np.concatenate(got)
    np.testing.assert_array_equal(seq, np.arange(len(seq), dtype=np.float32))
    assert out.overrun_count() == 0, out.overrun_count()
    out.stop()


def test_sustained_deadline_miss_counts_and_threshold_stops():
    """Sustained too-slow rendering drains the queue → every starved fill
    counts; stop_if_overruns below threshold does NOT stop, at/above does
    (engine_output.rs:507-528)."""
    out = EngineOutput(prefetch_blocks=2)
    out.create_stream_with_engine(SlowEngine())  # 50 ms per 64-frame block
    out.start()
    for _ in range(6):
        out.fill(np.zeros(256 * 2, np.float32), 2)
    n = out.overrun_count()
    assert n >= 3, n
    # below threshold: stream keeps running, counter was still consumed
    assert not out.stop_if_overruns(n + 100)
    assert out.is_active
    # counter reset by the take; accumulate again and stop at threshold
    for _ in range(4):
        out.fill(np.zeros(256 * 2, np.float32), 2)
    assert out.stop_if_overruns(1)
    assert not out.is_active
    # stopped stream: fill outputs silence and reports 0 frames
    buf = np.ones(32 * 2, np.float32)
    assert out.fill(buf, 2) == 0
    np.testing.assert_array_equal(buf, np.zeros_like(buf))


def test_output_drives_real_engine():
    """The prefetch adapter streams a real GooeyEngine: sequenced kick
    audio flows through fill() with the stereo contract intact."""
    from libgooey_tpu.gooey import GooeyEngine

    g = GooeyEngine(44100.0)
    g.sequencers[0].set_step_with_settings(0, True, 1.0)
    g.sequencers[0].start()
    out = EngineOutput(prefetch_blocks=0)  # deterministic: render in callback
    out.initialize(44100.0)
    out.create_stream_with_engine(g)
    out.start()
    buf = np.zeros(2048 * 2, np.float32)
    assert out.fill(buf, 2) == 2048
    frames = buf.reshape(-1, 2)
    assert np.all(np.isfinite(frames))
    assert np.abs(frames).max() > 1e-4          # the kick fired
    np.testing.assert_allclose(frames[:, 0], frames[:, 1], atol=1e-6)
    assert out.sample_counter == 2048
    out.stop()


def test_realtime_stream_null_backend_paces_callbacks():
    """RealtimeStream drives fill() at device cadence on the headless null
    backend: sample counter advances in real time, frames reach the sink,
    and the overrun counter stays quiet for a trivially fast engine."""
    from libgooey_tpu.engine.output import RealtimeStream

    # prefetch must cover a whole device buffer: 8 x 64-frame blocks > 256
    out = EngineOutput(prefetch_blocks=8)
    out.initialize(44100.0)
    out.create_stream_with_engine(RampEngine())
    got = []
    stream = RealtimeStream(out, backend="null", frames_per_buffer=256,
                            sink=got.append)
    stream.start()
    time.sleep(0.15)   # ~25 callbacks at 5.8 ms/256-frame buffer
    stream.stop()
    assert len(got) >= 10, len(got)
    assert out.sample_counter >= 10 * 256
    # callbacks were paced, not free-running: 0.15 s admits ~26 buffers
    assert out.sample_counter <= 0.25 * 44100
    first = got[0].reshape(-1, 2)
    np.testing.assert_array_equal(first[:, 0], -first[:, 1])  # L == -R ramp
    assert out.take_overrun_count() <= 1  # startup fill at most


def test_realtime_stream_sounddevice_backend():
    """Audible path — runs only where the optional sounddevice (PortAudio)
    package exists (engine_output.rs:162-249's device negotiation role)."""
    import pytest

    from libgooey_tpu.engine import output as out_mod

    if not out_mod.sounddevice_available():
        pytest.skip("sounddevice not installed (no audio stack in image)")
    out = EngineOutput(prefetch_blocks=2)
    out.initialize(44100.0)
    out.create_stream_with_engine(RampEngine())
    stream = out_mod.RealtimeStream(out, backend="sounddevice")
    stream.start()
    time.sleep(0.2)
    stream.stop()
    assert out.sample_counter > 0
