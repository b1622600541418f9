"""Ports of the reference integration tests that had no direct analog yet:

* tests/volume_zero_mute.rs — volume 0 fully silences each kit instrument on
  the FFI render path, both for fresh triggers after settling and mid-playback.
* tests/engine_basics.rs — engine creation defaults, BPM round-trip,
  sequencer registration/access, multi-instrument mix.
* tests/lfo_modulation.rs — every published drum param is LFO-modulatable;
  invalid params/instruments error; multiple LFOs coexist on one instrument.
* tests/ffi_granulator.rs:26-88 — the 1-sample placeholder-buffer contract
  and set_buffer input validation.
"""

import numpy as np
import pytest

from libgooey_tpu import capi


SR = 44100.0
B = 512


def _render(h, frames=B):
    out = np.asarray(capi.engine_render(h, frames))
    return out.reshape(-1)


# --------------------------------------------------------------------------
# volume_zero_mute.rs
# --------------------------------------------------------------------------

_VOLUME_SETTERS = {
    # channel -> (typed setter, its param tuple); default kit layout is
    # ch0 kick / ch1 snare / ch2 hihat2 / ch3 tom2 (gooey.py
    # DEFAULT_CHANNEL_KINDS).
    0: (capi.engine_set_kick_param, capi.KICK_PARAMS),
    1: (capi.engine_set_snare_param, capi.SNARE_PARAMS),
    2: (capi.engine_set_hihat_param, capi.HIHAT_PARAMS),
    3: (capi.engine_set_tom_param, capi.TOM_PARAMS),
}


@pytest.mark.parametrize("channel", [0, 1, 2, 3])
def test_volume_zero_silences(channel):
    """volume_zero_mute.rs::assert_volume_zero_silences — audio at default
    volume, silence (< 1e-6 peak) for triggers landed after volume 0
    settles."""
    h = capi.engine_new(SR)
    try:
        setter, params = _VOLUME_SETTERS[channel]
        capi.engine_trigger_instrument(h, channel)
        buf = _render(h)
        assert np.max(np.abs(buf)) > 1e-3, "audible at default volume"

        setter(h, channel, params.index("volume"), 0.0)
        # The reference settles 10x1024 = 10240 samples before asserting
        # (volume_zero_mute.rs:28-31): 15 ms is the smoother's *time
        # constant*; crossing the 1e-4 snap threshold from default volume
        # takes ~6k samples. Match it with 20x512. (Channel 3/tom2 would
        # pass immediately: the reference applies Tom2 params unsmoothed,
        # ffi.rs:129 "Tom2 uses plain f32, already immediate".)
        for _ in range(20):
            _render(h)

        capi.engine_trigger_instrument(h, channel)
        for _ in range(3):
            buf = _render(h)
            assert np.max(np.abs(buf)) < 1e-6, "silent at volume 0"
    finally:
        capi.engine_free(h)


def test_volume_zero_silences_mid_playback():
    """volume_zero_mute.rs::assert_volume_zero_silences_mid_playback — a
    sounding kick fades to silence once volume reaches 0."""
    h = capi.engine_new(SR)
    try:
        capi.engine_trigger_instrument(h, 0)
        buf = _render(h)
        assert np.max(np.abs(buf)) > 1e-3
        capi.engine_set_kick_param(h, 0, capi.KICK_PARAMS.index("volume"), 0.0)
        # 20x512 = 10240 samples, matching the reference's 10x1024 settle
        # (volume_zero_mute.rs) — see note in test_volume_zero_silences.
        for _ in range(20):
            buf = _render(h)
        assert np.max(np.abs(buf)) < 1e-6
    finally:
        capi.engine_free(h)


# --------------------------------------------------------------------------
# engine_basics.rs
# --------------------------------------------------------------------------

def test_engine_creation_defaults():
    """engine_basics.rs::test_engine_creation / test_bpm_setting."""
    h = capi.engine_new(SR)
    try:
        assert capi.engine_get_bpm(h) == 120.0  # default BPM
        capi.engine_set_bpm(h, 140.0)
        assert capi.engine_get_bpm(h) == 140.0
        capi.engine_set_bpm(h, 80.0)
        assert capi.engine_get_bpm(h) == 80.0
    finally:
        capi.engine_free(h)


def test_sequencer_registration_and_bounds():
    """engine_basics.rs::test_add_sequencer / test_sequencer_access."""
    from libgooey_tpu.engine.engine import Engine

    eng = Engine(SR, B)
    eng.add_instrument("kick", "kick")
    assert len(eng.sequencers) == 0
    seq = eng.new_sequencer("kick", 120.0)
    assert len(eng.sequencers) == 1
    assert eng.sequencers[0] is seq
    with pytest.raises(KeyError):  # out-of-names: unknown target
        eng.new_sequencer("nonexistent", 120.0)


def test_multiple_instruments_mix():
    """engine_basics.rs::test_multiple_instruments_mix — two instruments
    triggered together produce output differing from either alone."""
    def render_triggered(channels):
        h = capi.engine_new(SR)
        try:
            for c in channels:
                capi.engine_trigger_instrument(h, c)
            return _render(h, 2 * B)
        finally:
            capi.engine_free(h)

    kick = render_triggered([0])
    snare = render_triggered([1])
    both = render_triggered([0, 1])
    assert np.max(np.abs(both)) > 1e-3
    assert np.max(np.abs(both - kick)) > 1e-4
    assert np.max(np.abs(both - snare)) > 1e-4


# --------------------------------------------------------------------------
# lfo_modulation.rs
# --------------------------------------------------------------------------

def _engine_with_kick():
    from libgooey_tpu.engine.engine import Engine

    eng = Engine(SR, B)
    eng.add_instrument("kick", "kick")
    return eng


def test_kick_params_modulatable():
    """lfo_modulation.rs::test_kick_drum_modulation — the published
    normalized params accept an LFO route."""
    eng = _engine_with_kick()
    for i, param in enumerate(
        ["frequency", "punch", "sub", "click", "oscillator_decay", "tuning"]
    ):
        eng.add_lfo_route(0, "kick", param, 1.0)


def test_invalid_parameter_errors():
    """lfo_modulation.rs::test_invalid_parameter_returns_error."""
    eng = _engine_with_kick()
    with pytest.raises(KeyError):
        eng.add_lfo_route(0, "kick", "invalid_param", 1.0)


def test_invalid_instrument_errors():
    """lfo_modulation.rs::test_invalid_instrument_returns_error."""
    eng = _engine_with_kick()
    with pytest.raises(KeyError):
        eng.add_lfo_route(0, "nonexistent", "frequency", 1.0)


def test_multiple_lfos_on_same_instrument():
    """lfo_modulation.rs::test_multiple_lfos_on_same_instrument — two LFOs
    on different params of one instrument render cleanly."""
    eng = _engine_with_kick()
    eng.set_lfo(0, division=2, bpm=120.0, amount=1.0)  # 4 beats = one bar
    eng.set_lfo(1, division=4, bpm=120.0, amount=0.5)  # quarter
    eng.add_lfo_route(0, "kick", "frequency", 1.0)
    eng.add_lfo_route(1, "kick", "tuning", 0.5)
    eng.trigger("kick", 1.0)
    out = eng.render(B)
    assert np.all(np.isfinite(out))
    assert np.max(np.abs(out)) > 1e-4


# --------------------------------------------------------------------------
# ffi_granulator.rs:26-88
# --------------------------------------------------------------------------

def test_granulator_placeholder_until_set_buffer():
    h = capi.engine_new(SR)
    try:
        # length 1 is the "no host buffer loaded yet" contract
        assert capi.engine_granulator_buffer_len(h) == 1
        assert capi.engine_granulator_buffer_sample_rate(h) > 0.0
    finally:
        capi.engine_free(h)


def test_granulator_set_buffer_replaces_placeholder():
    h = capi.engine_new(SR)
    try:
        t = np.sin(2 * np.pi * 220.0 * np.arange(int(SR)) / SR).astype(np.float32)
        assert capi.engine_granulator_set_buffer(h, t, SR) == 1
        assert capi.engine_granulator_buffer_len(h) == t.size
        assert capi.engine_granulator_buffer_sample_rate(h) == SR
    finally:
        capi.engine_free(h)


def test_granulator_set_buffer_rejects_invalid():
    h = capi.engine_new(SR)
    try:
        t = np.sin(2 * np.pi * 440.0 * np.arange(4410) / SR).astype(np.float32)
        assert capi.engine_granulator_set_buffer(h, None, SR) == 0
        assert capi.engine_granulator_set_buffer(h, t[:0], SR) == 0
        assert capi.engine_granulator_set_buffer(h, t, 0.0) == 0
        # SampleBuffer::from_mono also rejects non-finite rates and samples
        assert capi.engine_granulator_set_buffer(h, t, float("nan")) == 0
        bad = t.copy()
        bad[7] = np.inf
        assert capi.engine_granulator_set_buffer(h, bad, SR) == 0
        # still the 1-sample placeholder
        assert capi.engine_granulator_buffer_len(h) == 1
    finally:
        capi.engine_free(h)
