"""GooeyEngine (the FFI-surface engine) + PerformanceRecorder tests.

Mirrors tests/ffi_stereo.rs, tests/channel_instrument_swap.rs,
tests/mute_solo.rs, tests/performance_recording.rs at the Python surface.
"""

import numpy as np

from libgooey_tpu.core.blendable import PresetBlender
from libgooey_tpu.gooey import INSTRUMENT_SNARE, GooeyEngine
from libgooey_tpu.instruments.kick import KickConfig
from libgooey_tpu.performance import (
    MODE_PUNCH_OUT, PerformanceRecorder, TICKS_PER_STEP,
)
import pytest

SR = 44100.0


def test_render_stereo_contract_and_error_latch():
    g = GooeyEngine()
    g.trigger_channel(0, 1.0)
    out = g.render(2048)
    assert out.shape == (4096,)
    l, r = out[0::2], out[1::2]
    np.testing.assert_allclose(l, r, atol=1e-6)  # center-panned kick
    assert np.abs(l).max() > 1e-4
    # error latch: force an internal failure → silence forever + callback
    msgs = []
    g.error_callback = msgs.append
    g.graph = None  # sabotage
    out = g.render(512)
    assert np.all(out == 0.0) and g.error is not None and msgs
    out = g.render(512)
    assert np.all(out == 0.0)  # terminal


def test_channel_instrument_hot_swap():
    g = GooeyEngine()
    g.trigger_channel(1, 1.0)  # snare by default
    a = g.render(4096)
    g2 = GooeyEngine()
    assert g2.set_channel_instrument(1, 0)  # swap to kick
    g2.trigger_channel(1, 1.0)
    b = g2.render(4096)
    assert np.abs(a - b).max() > 1e-3  # audibly different instrument


def test_strip_mute_solo_and_peaks():
    g = GooeyEngine()
    g.trigger_channel(0, 1.0)
    g.strip_mute[0] = True
    out = g.render(4096)
    assert np.abs(out).max() < 1e-4  # muted strip gates the trigger
    g = GooeyEngine()
    g.strip_solo[1] = True  # solo snare strip; kick trigger inaudible
    g.trigger_channel(0, 1.0)
    out = g.render(4096)
    assert np.abs(out).max() < 1e-4


def test_blend_pad_snaps_config():
    g = GooeyEngine()
    g.set_blender(0, PresetBlender(
        KickConfig.tight(), KickConfig.dirt(), KickConfig.loose(),
        KickConfig.punch_preset(),
    ))
    assert g.blend_to(0, 1.0, 0.0)
    assert abs(g.get_param(0, "frequency") - 0.62) < 1e-6  # dirt corner


def test_param_round_trip():
    g = GooeyEngine()
    g.set_param(0, "frequency", 0.42)
    assert abs(g.get_param(0, "frequency") - 0.42) < 1e-7
    g.set_effect_param(1, 1, 0.66)  # delay feedback
    assert abs(g.get_effect_param(1, 1) - 0.66) < 1e-6


@pytest.mark.slow
def test_effect_order_changes_sound():
    def render(order):
        g = GooeyEngine()
        g.set_effect_enabled(2, True)   # saturation
        g.set_effect_enabled(0, True)   # lowpass
        g.set_effect_param(2, 0, 0.9)
        g.set_effect_param(0, 0, 500.0)
        assert g.set_effect_order(order)
        g.trigger_channel(0, 1.0)
        return g.render(4096)

    a = render([2, 0, 4, 1, 3, 7, 8, 6, 9])
    b = render([0, 2, 4, 1, 3, 7, 8, 6, 9])
    assert np.abs(a - b).max() > 1e-6


def test_performance_recorder_loop_and_replay():
    p = PerformanceRecorder()
    # transport running; arm from loop start
    p.update_clock(0.0, True)
    p.set_armed(True)
    p.update_clock(0.0, True)
    assert p.is_recording()
    p.last_beat = 0.25  # step 1
    p.record_chord_on(0, 0, 0, 0, 0, 4, 0.9)
    p.last_beat = 0.75
    p.record_chord_off()
    assert len(p.events) == 1
    ev = p.events[0]
    assert ev.start_tick == TICKS_PER_STEP and ev.duration_ticks == 2 * TICKS_PER_STEP
    # wrap makes the event playable; replay fires at its tick
    p.set_armed(False)
    fired = []
    for beat in np.arange(4.0, 8.0, 0.01):  # second pass of the 4-beat loop
        a = p.update_clock(float(beat), True)
        if a is not None:
            fired.append((round(beat, 2), a[0]))
    kinds = [k for _, k in fired]
    assert "trigger" in kinds and "release" in kinds
    trig_beat = fired[kinds.index("trigger")][0]
    assert abs((trig_beat % 4.0) - 0.25) < 0.02


def test_performance_punch_out_disarms():
    p = PerformanceRecorder()
    p.mode = MODE_PUNCH_OUT
    p.update_clock(0.0, True)
    p.set_armed(True)
    p.update_clock(0.0, True)
    assert p.is_recording()
    # advance a full clip length (4 beats) → punch-out auto-disarms
    for beat in np.arange(0.0, 4.2, 0.05):
        p.update_clock(float(beat), True)
    assert not p.armed and not p.is_recording()


@pytest.mark.slow
def test_perf_chords_drive_poly_through_engine():
    g = GooeyEngine()
    g.mixer.clip_grid.transport_running = True
    g.perf_chord_on(0, 0, 0, 0, 0, 4, 0.9)  # C major triad on the poly pad
    out = g.render(8192)
    assert np.abs(out).max() > 1e-4
    g.perf_chord_off()
    out2 = g.render(int(SR))
    tail = out2[-8000:]
    assert np.abs(tail).max() < np.abs(out2).max()  # released and decaying
