"""Performance (chord clip) recorder: the reference's FFI integration tests
plus record→playback→overdub round-trips (tests/performance_recording.rs,
performance/mod.rs).

Everything drives the real render path — `capi.engine_render` advances the
clip clock exactly like ffi.rs:1212-1235 — no direct recorder poking."""

import numpy as np
import pytest

from libgooey_tpu import capi

SR = 44100.0
BPM = 120.0

PERF_RECORD_MODE_OVERDUB = 0
PERF_RECORD_MODE_PUNCH_OUT = 1


def samples_per_step(bpm=BPM, sr=SR) -> float:
    return (60.0 / bpm) / 4.0 * sr


@pytest.fixture
def h():
    handle = capi.engine_new(SR)
    capi.engine_set_bpm(handle, BPM)
    yield handle
    capi.engine_free(handle)


def test_perf_defaults_disarmed_empty_clip(h):
    """performance_recording.rs:18-35."""
    assert capi.engine_perf_is_record_armed(h) == 0
    assert capi.engine_perf_is_recording(h) == 0
    assert capi.engine_perf_get_record_mode(h) == PERF_RECORD_MODE_PUNCH_OUT
    assert capi.engine_perf_get_event_count(h) == 0
    assert capi.engine_perf_get_length_steps(h) == 16
    assert capi.engine_perf_get_length_ticks(h) == 384


@pytest.mark.slow
def test_perf_record_punch_out_one_chord(h):
    """performance_recording.rs:37-98: punch-out disarms after one loop and
    the stamped event round-trips degree/duration/velocity."""
    capi.engine_perf_set_record_mode(h, PERF_RECORD_MODE_PUNCH_OUT)
    capi.engine_perf_set_record_armed(h, 1)
    capi.engine_transport_start(h)

    capi.engine_render(h, 64)
    assert capi.engine_perf_is_recording(h) == 1

    capi.engine_poly_trigger_chord(h, 0, 0, 0, 0, 1, 4, 0.9)
    hold = int(samples_per_step()) * 4
    capi.engine_render(h, hold)
    capi.engine_poly_release(h)
    assert capi.engine_perf_get_event_count(h) == 1

    rest = int(samples_per_step()) * 12
    capi.engine_render(h, rest + 512)

    assert capi.engine_perf_is_record_armed(h) == 0, \
        "punch-out should disarm after one loop"
    assert capi.engine_perf_get_event_count(h) == 1

    (start, dur, root, scale, degree, voicing, preset, octave, velocity) = \
        capi.engine_perf_get_event(h, 0)
    assert degree == 0
    assert dur > 0
    assert abs(velocity - 0.9) < 1e-3


@pytest.mark.slow
def test_perf_overdub_keeps_arm_and_appends(h):
    """performance_recording.rs:100-135."""
    capi.engine_perf_set_record_mode(h, PERF_RECORD_MODE_OVERDUB)
    capi.engine_perf_set_record_armed(h, 1)
    capi.engine_transport_start(h)
    capi.engine_render(h, 64)

    capi.engine_poly_trigger_chord(h, 0, 0, 0, 0, 1, 4, 0.9)
    q = int(samples_per_step()) * 4
    capi.engine_render(h, q)
    capi.engine_poly_release(h)
    assert capi.engine_perf_get_event_count(h) == 1

    capi.engine_render(h, int(samples_per_step()) * 12 + 256)
    assert capi.engine_perf_is_record_armed(h) == 1

    capi.engine_poly_trigger_chord(h, 0, 0, 4, 0, 1, 4, 0.8)
    capi.engine_render(h, q)
    capi.engine_poly_release(h)

    assert capi.engine_perf_get_event_count(h) >= 2
    assert capi.engine_perf_is_record_armed(h) == 1


def test_perf_clear_clip(h):
    """performance_recording.rs:137-155."""
    capi.engine_perf_set_record_mode(h, PERF_RECORD_MODE_OVERDUB)
    capi.engine_perf_set_record_armed(h, 1)
    capi.engine_transport_start(h)
    capi.engine_render(h, 128)
    capi.engine_poly_trigger_chord(h, 0, 0, 1, 0, 1, 4, 1.0)
    capi.engine_render(h, 1024)
    capi.engine_poly_release(h)
    assert capi.engine_perf_get_event_count(h) >= 1

    capi.engine_perf_clear_clip(h)
    assert capi.engine_perf_get_event_count(h) == 0


def test_live_chord_still_works_without_arm(h):
    """performance_recording.rs:157-171."""
    capi.engine_poly_trigger_chord(h, 0, 0, 0, 0, 1, 4, 0.9)
    buf = capi.engine_render(h, 1024)
    assert np.abs(buf).max() > 1e-3, \
        "live chord should produce audio without recording"
    assert capi.engine_perf_get_event_count(h) == 0


@pytest.mark.slow
def test_perf_record_then_replay_next_loop(h):
    """A recorded chord REPLAYS on the following loops (ffi.rs:1212-1235):
    the second pass re-triggers the poly chord without any live input."""
    capi.engine_perf_set_record_mode(h, PERF_RECORD_MODE_PUNCH_OUT)
    capi.engine_perf_set_record_armed(h, 1)
    capi.engine_transport_start(h)
    capi.engine_render(h, 64)

    capi.engine_poly_trigger_chord(h, 0, 0, 2, 0, 1, 4, 0.9)
    capi.engine_render(h, int(samples_per_step()) * 2)
    capi.engine_poly_release(h)
    # silence the rest of the recording loop
    capi.engine_render(h, int(samples_per_step()) * 14 + 512)
    assert capi.engine_perf_get_event_count(h) == 1
    assert capi.engine_perf_is_record_armed(h) == 0

    # let any release tail die, then capture the replayed loop
    bar = int(samples_per_step()) * 16
    replay = capi.engine_render(h, bar)
    # the replayed chord is audible in the playback-only loop
    assert np.abs(replay).max() > 1e-3, "clip should replay the chord"


@pytest.mark.slow
def test_perf_overdub_gate_cutting(h):
    """A new chord recorded OVER an old one cuts the old gate at that tick
    (performance/mod.rs cut_gates_at): total event count stays consistent
    and no event covers the new chord's start."""
    capi.engine_perf_set_record_mode(h, PERF_RECORD_MODE_OVERDUB)
    capi.engine_perf_set_record_armed(h, 1)
    capi.engine_transport_start(h)
    capi.engine_render(h, 64)

    # loop 1: one long chord covering most of the bar
    capi.engine_poly_trigger_chord(h, 0, 0, 0, 0, 1, 4, 0.9)
    capi.engine_render(h, int(samples_per_step()) * 10)
    capi.engine_poly_release(h)
    capi.engine_render(h, int(samples_per_step()) * 6 + 256)
    assert capi.engine_perf_get_event_count(h) == 1
    ev0 = capi.engine_perf_get_event(h, 0)

    # loop 2 (still armed in overdub): drop a chord in the middle of the old
    capi.engine_render(h, int(samples_per_step()) * 4)
    capi.engine_poly_trigger_chord(h, 0, 0, 4, 0, 1, 4, 0.8)
    capi.engine_render(h, int(samples_per_step()) * 2)
    capi.engine_poly_release(h)

    assert capi.engine_perf_get_event_count(h) == 2
    a = capi.engine_perf_get_event(h, 0)
    b = capi.engine_perf_get_event(h, 1)
    first, second = (a, b) if a[0] <= b[0] else (b, a)
    # the earlier event's gate was cut: it no longer reaches the new start
    length = capi.engine_perf_get_length_ticks(h)
    assert (first[0] + first[1]) % length <= second[0], (first, second)
    assert first[1] < ev0[1] or ev0[0] != first[0]


def test_perf_stop_finalizes_open_chord(h):
    """Stopping the transport mid-chord finalizes the open event
    (performance/mod.rs update_clock stop path)."""
    capi.engine_perf_set_record_mode(h, PERF_RECORD_MODE_OVERDUB)
    capi.engine_perf_set_record_armed(h, 1)
    capi.engine_transport_start(h)
    capi.engine_render(h, 64)
    capi.engine_poly_trigger_chord(h, 0, 0, 3, 0, 1, 4, 0.7)
    capi.engine_render(h, int(samples_per_step()) * 3)
    capi.engine_transport_stop(h)
    capi.engine_render(h, 512)

    assert capi.engine_perf_get_event_count(h) == 1
    ev = capi.engine_perf_get_event(h, 0)
    assert ev[1] > 0  # duration was stamped at the stop tick
