"""Engine orchestration: multi-family kit, LFO routes, blend snaps, global FX
chain, gain staging, bounce (mirrors tests/ffi_gain_staging.rs,
tests/effect_order.rs, tests/drum_volume_linearity.rs at engine level)."""

import numpy as np

from libgooey_tpu.core.blendable import PresetBlender
from libgooey_tpu.engine.engine import Engine
from libgooey_tpu.instruments import kick as kick_mod
from libgooey_tpu.instruments.snare import SnareConfig


def make_engine(**kw):
    e = Engine(**kw)
    e.add_instrument("kick", "kick", kick_mod.KickConfig.tight())
    return e


def test_master_gain_linearity():
    def render(master):
        e = make_engine()
        e.set_master_gain(master)
        e.prepare_for_bounce()
        e.trigger("kick", 0.8)
        return e.render_mono(4096)

    a = render(0.05)
    b = render(0.1)
    # the default soft limiter (tanh) deviates from exact linearity at third
    # order (~2a^3) — the same is true of the reference's default chain;
    # at these low levels that residual sits below the -80 dBFS budget
    np.testing.assert_allclose(b, a * 2.0, rtol=0, atol=5e-5)


def test_mono_vs_stereo_center_pan():
    e = make_engine()
    e.prepare_for_bounce()
    e.trigger("kick", 1.0)
    out, mono = e.render_block()
    out, mono = np.asarray(out), np.asarray(mono)
    # center pan: l == r == mono * 0.7071 (equal-power center)
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)
    # the soft limiter is applied post-pan, so limit(x*.707) vs limit(x)*.707
    # differ at third order — compare within the audible budget
    np.testing.assert_allclose(out[0], mono * np.sqrt(0.5), rtol=0, atol=5e-4)


def test_lfo_route_modulates_param():
    def render(with_lfo):
        e = make_engine()
        if with_lfo:
            e.set_lfo(0, frequency_hz=4.0, amount=1.0)
            e.add_lfo_route(0, "kick", "frequency", depth=1.0)
        e.prepare_for_bounce()
        e.trigger("kick", 1.0)
        return e.render_mono(8192)

    plain = render(False)
    wobble = render(True)
    assert np.abs(plain - wobble).max() > 1e-3  # audibly different
    assert np.all(np.isfinite(wobble))


def test_blend_snap_on_step():
    e = make_engine()
    e.blenders["kick"] = PresetBlender(
        kick_mod.KickConfig.tight(), kick_mod.KickConfig.dirt(),
        kick_mod.KickConfig.loose(), kick_mod.KickConfig.punch_preset(),
    )
    seq = e.new_sequencer("kick", 240.0)
    seq.set_step_with_settings(0, True, 1.0, blend=(1.0, 0.0))  # full dirt
    seq.start()
    out = e.render_mono(8192)
    assert np.abs(out).max() > 1e-4
    # the blended (dirt) frequency target should now be staged
    assert abs(e.get_param("kick", "frequency") - 0.62) < 1e-6


def test_global_fx_chain_and_order():
    def render(order):
        e = make_engine()
        e.add_global_effect("saturation", [0.8, 0.5, 1.0])
        e.add_global_effect("lowpass", [800.0, 0.3])
        e.set_effect_order(order)
        e.prepare_for_bounce()
        e.trigger("kick", 1.0)
        return e.render(4096)

    a = render(["saturation", "lowpass"])
    b = render(["lowpass", "saturation"])
    assert np.abs(a - b).max() > 1e-6  # order matters
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))


def test_full_kit_with_fx_and_sidechain():
    e = Engine()
    e.add_instrument("kick", "kick", kick_mod.KickConfig.tight())
    e.add_instrument("snare", "snare", SnareConfig.smack())
    e.add_global_effect("compressor", [-30.0, 8.0, 1.0, 60.0, 1.0])
    e.set_sidechain_source("kick")
    sk = e.new_sequencer("kick", 120.0)
    sk.set_pattern_string("x...x...x...x...")
    ss = e.new_sequencer("snare", 120.0)
    ss.set_pattern_string("....x.......x...")
    sk.start(); ss.start()
    out = e.render(50000)
    assert np.all(np.isfinite(out))
    assert np.abs(out).max() > 0.01
    midi = e.drain_midi_out()
    # kick at samples 0/22050/44100, snare at 22050 → ≥4 events with offsets
    assert len(midi) >= 4, midi
    assert midi[0][0] == 0 and midi[0][1] == "kick"


def test_param_round_trip_getters():
    """Every setter has a getter for host state recovery
    (tests/param_getters.rs)."""
    e = make_engine()
    e.set_param("kick", "frequency", 0.33)
    assert abs(e.get_param("kick", "frequency") - 0.33) < 1e-7
    e.add_global_effect("delay")
    e.set_effect_param("delay", 1, 0.7)
    assert abs(e.get_effect_param("delay", 1) - 0.7) < 1e-7


def test_render_is_deterministic():
    """Same program twice → bit-identical audio (counter-based RNG, pure
    functional render; the reference's reset==fresh determinism tests)."""
    def run():
        e = Engine(44100.0)
        e.add_instrument("k", "kick")
        e.add_instrument("h", "hihat2")
        e.add_instrument("s", "snare")
        seq = e.new_sequencer("k", 150.0)
        seq.set_pattern_string("x.x.x.x.")
        seq.start()
        e.trigger("h", 0.9)
        e.trigger("s", 0.7)
        return np.asarray(e.render(4096))

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)
