"""C-ABI adapter: integer-id parameter dispatch for the native shim.

Maps the FFI's integer constants (ffi.rs:1548-1970 — the ABI the iOS host
compiles against) onto the GooeyEngine Python surface.  The native shim
(native/gooey_shim.cpp) calls these flat functions through the embedded
interpreter; everything here must stay exception-safe per the C contract
(the shim converts Python exceptions into the engine error latch).
"""

from __future__ import annotations

import os

import numpy as np

# Embedded hosts select the jax backend before any tracing happens (the
# environment's site hook may pre-register a TPU backend regardless of
# JAX_PLATFORMS, so an explicit config update is the reliable override).
_platform = os.environ.get("LIBGOOEY_TPU_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)

from libgooey_tpu.gooey import GooeyEngine

# Per-instrument-family param-id → smoothed-param name (§2.9 constants).
KICK_PARAMS = (
    "frequency", "punch", "sub", "click", "oscillator_decay",
    "pitch_envelope_amount", "volume", "tuning",
)
HIHAT_PARAMS = ("pitch", "decay", "attack", "tone", "volume", "tuning")  # HiHat2
SNARE_PARAMS = (
    "frequency", "decay", "brightness", "volume", "tonal", "noise",
    "pitch_drop", "tonal_decay", "noise_decay", "noise_tail_decay",
    "filter_cutoff", "filter_resonance", "filter_type", "xfade",
    "phase_mod_amount", "overdrive", "amp_decay", "amp_decay_curve",
    "tonal_decay_curve", "tuning",
)
TOM_PARAMS = (  # Tom2 (0-100 Max ranges except tuning)
    "tune", "bend", "tone", "color", "decay", "membrane", "membrane_q",
    "volume", "tuning",
)
BASS_PARAMS = (
    "frequency", "sub_level", "osc_level", "detune_level", "detune_amount",
    "osc_shape", "filter_cutoff", "filter_resonance", "filter_env_amount",
    "filter_env_decay", "filter_env_curve", "amp_decay", "amp_decay_curve",
    "overdrive", "volume", "tuning",
)
GRANULATOR_PARAMS = (
    "scan_position", "grain_length", "spray", "pitch", "density", "texture",
    "direction", "cloud_duration", "volume", "random_timing", "random_amp",
    "drive",
)

_FAMILY_TABLES = {
    "kick": KICK_PARAMS,
    "snare": SNARE_PARAMS,
    "hihat2": HIHAT_PARAMS,
    "tom2": TOM_PARAMS,
    "bass": BASS_PARAMS,
}

_engines = {}
_next_handle = 1


def engine_new(sample_rate: float) -> int:
    global _next_handle
    h = _next_handle
    _next_handle += 1
    _engines[h] = GooeyEngine(sample_rate)
    return h


def engine_free(handle: int):
    _engines.pop(handle, None)


def _e(handle: int) -> GooeyEngine:
    return _engines[handle]


def engine_render(handle: int, frames: int) -> np.ndarray:
    """Interleaved stereo float32 of length frames*2."""
    return _e(handle).render(int(frames))


def engine_last_error(handle: int) -> str:
    return _e(handle).error or ""


def engine_set_bpm(handle: int, bpm: float):
    _e(handle).set_bpm(bpm)


def engine_set_master_gain(handle: int, gain: float):
    _e(handle).set_master_gain(gain)


def engine_trigger_channel_with_velocity(handle: int, channel: int, velocity: float):
    _e(handle).trigger_channel(int(channel), float(velocity))


def engine_set_channel_instrument(handle: int, channel: int, instrument: int) -> int:
    return int(_e(handle).set_channel_instrument(int(channel), int(instrument)))


def engine_get_channel_instrument(handle: int, channel: int) -> int:
    return _e(handle).get_channel_instrument(int(channel))


def _param_name(engine: GooeyEngine, strip: int, param_id: int) -> str:
    kind = engine.channel_kind[strip] if strip < 4 else "bass"
    table = _FAMILY_TABLES[kind]
    return table[int(param_id)]


def engine_set_channel_param(handle: int, channel: int, param_id: int, value: float) -> int:
    e = _e(handle)
    try:
        name = _param_name(e, int(channel), int(param_id))
        if name == "filter_type":  # snare: static u8, not a smoothed param
            import dataclasses

            kind, slot = e.engine._names[e._strip_name(int(channel))]
            cfgs = e.engine._configs[kind]
            cfgs[slot] = dataclasses.replace(cfgs[slot], filter_type=int(value))
            st = e.engine._state
            if st is not None:
                st[kind] = st[kind]._replace(
                    filter_type=st[kind].filter_type.at[slot].set(int(value))
                )
            return 1
        e.set_param(int(channel), name, float(value))
        return 1
    except (KeyError, IndexError):
        return 0


def engine_get_channel_param(handle: int, channel: int, param_id: int) -> float:
    e = _e(handle)
    name = _param_name(e, int(channel), int(param_id))
    if name == "filter_type":
        kind, slot = e.engine._names[e._strip_name(int(channel))]
        return float(e.engine._configs[kind][slot].filter_type)
    return e.get_param(int(channel), name)


def engine_sequencer_set_step(handle: int, channel: int, step: int, enabled: int,
                              velocity: float):
    _e(handle).sequencers[int(channel)].set_step_with_settings(
        int(step), bool(enabled), float(velocity)
    )


def engine_sequencer_set_step_note(handle: int, channel: int, step: int, note: int):
    _e(handle).sequencers[int(channel)].set_step_note(int(step), int(note))


def engine_sequencer_set_swing(handle: int, channel: int, swing: float):
    _e(handle).sequencers[int(channel)].set_swing(float(swing))


def engine_sequencer_start(handle: int, channel: int):
    _e(handle).sequencers[int(channel)].start()


def engine_sequencer_stop(handle: int, channel: int):
    _e(handle).sequencers[int(channel)].stop()


def engine_sequencer_arm_at_samples(handle: int, channel: int, samples: int,
                                    beat: float):
    _e(handle).sequencers[int(channel)].arm_at_samples(int(samples), float(beat))


def engine_set_effect_enabled(handle: int, effect_id: int, enabled: int):
    _e(handle).set_effect_enabled(int(effect_id), bool(enabled))


def engine_set_effect_param(handle: int, effect_id: int, param: int, value: float) -> int:
    return int(_e(handle).set_effect_param(int(effect_id), int(param), float(value)))


def engine_get_effect_param(handle: int, effect_id: int, param: int) -> float:
    return _e(handle).get_effect_param(int(effect_id), int(param))


def engine_granulator_set_param(handle: int, param_id: int, value: float) -> int:
    try:
        _e(handle).granulator_set_param(GRANULATOR_PARAMS[int(param_id)], float(value))
        return 1
    except (KeyError, IndexError):
        return 0


def engine_granulator_trigger(handle: int, velocity: float):
    _e(handle).granulator_trigger(float(velocity))


def engine_granulator_load(handle: int, samples: np.ndarray, sample_rate: float):
    _e(handle).granulator_load(samples, float(sample_rate))


def engine_take_channel_peak(handle: int, channel: int) -> float:
    return _e(handle).take_strip_peak(int(channel))


def engine_transport_beat(handle: int) -> float:
    return _e(handle).transport_beat()
