#!/usr/bin/env python3
"""Generate the scalar C wrappers (gooey_shim_gen.cpp) and their header
(include/gooey_tpu_gen.h) from the signature table below.

Each entry: (c_suffix, ret, args) where the C function is
``gooey_engine_<c_suffix>`` calling ``capi.engine_<c_suffix>``.
Arg codes: h=gooey_handle, i=int32_t, d=double, s=const char*.
Ret codes: v=void, i=int32_t, I=int64_t, f=double.

Run from native/:  python3 gen_shim.py   (outputs are committed).
"""

import inspect
import os
import sys

# (suffix, ret, argcodes) — first arg is always the handle unless noted.
TABLE = [
    # global / transport
    ("set_bpm", "v", "hd"),
    ("get_bpm", "f", "h"),
    ("set_master_gain", "v", "hd"),
    ("get_master_gain", "f", "h"),
    ("has_error", "i", "h"),
    ("set_link_enabled", "v", "hi"),
    ("is_link_enabled", "i", "h"),
    ("set_render_host_time", "v", "hd"),
    ("transport_start", "v", "h"),
    ("transport_stop", "v", "h"),
    ("transport_beat", "f", "h"),
    ("transport_get_beat_position", "f", "h"),
    ("instrument_count", "i", "h"),
    ("bounce_to_wav", "i", "hsIi"),
    # channels
    ("trigger_channel_with_velocity", "v", "hid"),
    ("set_channel_instrument", "i", "hii"),
    ("get_channel_instrument", "i", "hi"),
    ("set_channel_param", "i", "hiid"),
    ("get_channel_param", "f", "hii"),
    ("take_channel_peak", "f", "hi"),
    ("set_channel_tuning", "i", "hid"),
    ("get_channel_tuning", "f", "hi"),
    # typed instrument params
    ("set_kick_param", "i", "hiid"),
    ("get_kick_param", "f", "hii"),
    ("set_snare_param", "i", "hiid"),
    ("get_snare_param", "f", "hii"),
    ("set_hihat_param", "i", "hiid"),
    ("get_hihat_param", "f", "hii"),
    ("set_tom_param", "i", "hiid"),
    ("get_tom_param", "f", "hii"),
    ("set_bass_param", "i", "hid"),
    ("get_bass_param", "f", "hi"),
    ("kick_param_count", "i", "h"),
    ("snare_param_count", "i", "h"),
    ("hihat_param_count", "i", "h"),
    ("tom_param_count", "i", "h"),
    ("load_bass_preset", "i", "hi"),
    # strips
    ("set_instrument_gain", "i", "hid"),
    ("get_instrument_gain", "f", "hi"),
    ("set_instrument_pan", "i", "hid"),
    ("get_instrument_pan", "f", "hi"),
    ("set_instrument_mute", "i", "hii"),
    ("get_instrument_mute", "i", "hi"),
    ("set_instrument_solo", "i", "hii"),
    ("get_instrument_solo", "i", "hi"),
    ("trigger_instrument", "v", "hi"),
    ("trigger_instrument_with_velocity", "v", "hid"),
    ("trigger_kick", "i", "hd"),
    # sequencers
    ("sequencer_set_step", "v", "hiiid"),
    ("sequencer_set_step_note", "v", "hiii"),
    ("sequencer_set_swing", "v", "hid"),
    ("sequencer_start", "v", "hi"),
    ("sequencer_stop", "v", "hi"),
    ("sequencer_reset", "v", "hi"),
    ("sequencer_arm_at_samples", "v", "hiId"),
    ("sequencer_start_at_host_time", "v", "hidd"),
    ("sequencer_step_count", "i", "hi"),
    ("sequencer_get_current_step", "i", "hi"),
    ("sequencer_get_step_with_lookahead", "i", "hii"),
    ("sequencer_get_beat_position", "f", "hi"),
    ("sequencer_set_beat_position", "v", "hid"),
    ("get_swing", "f", "hi"),
    ("set_sequencer_triggers_enabled", "v", "hii"),
    ("get_sequencer_triggers_enabled", "i", "hi"),
    ("sequencer_set_instrument_step_with_settings", "v", "hiiid"),
    ("sequencer_set_instrument_step_velocity", "v", "hiid"),
    ("sequencer_set_instrument_step_note", "v", "hiii"),
    ("sequencer_clear_instrument_step_note", "v", "hii"),
    ("sequencer_set_instrument_step_blend", "v", "hiidd"),
    ("sequencer_clear_instrument_step_blend", "v", "hii"),
    ("sequencer_set_instrument_pattern", "v", "hiI"),
    ("sequencer_get_instrument_step_enabled", "i", "hii"),
    ("sequencer_get_instrument_step_velocity", "f", "hii"),
    ("sequencer_get_instrument_step_note", "i", "hii"),
    ("sequencer_get_instrument_step_blend_x", "f", "hii"),
    ("sequencer_get_instrument_step_blend_y", "f", "hii"),
    ("sequencer_get_instrument_step_blend_enabled", "i", "hii"),
    # LFOs
    ("lfo_count", "i", "h"),
    ("lfo_timing_count", "i", "h"),
    ("set_lfo_timing", "i", "hii"),
    ("get_lfo_timing", "i", "hi"),
    ("set_lfo_amount", "v", "hid"),
    ("get_lfo_amount", "f", "hi"),
    ("set_lfo_offset", "v", "hid"),
    ("get_lfo_offset", "f", "hi"),
    ("set_lfo_enabled", "v", "hii"),
    ("get_lfo_enabled", "i", "hi"),
    ("get_lfo_phase", "f", "hi"),
    ("reset_lfo_phase", "v", "hi"),
    ("add_lfo_route", "i", "hiiid"),
    ("remove_lfo_route", "i", "hiii"),
    ("clear_lfo_routes", "v", "hi"),
    ("get_lfo_route_count", "i", "hi"),
    # global FX
    ("set_effect_enabled", "v", "hii"),
    ("set_effect_param", "i", "hiid"),
    ("get_effect_param", "f", "hii"),
    ("global_effect_count", "i", "h"),
    ("reorderable_effect_count", "i", "h"),
    ("get_global_effect_enabled", "i", "hi"),
    ("set_compressor_sidechain", "i", "hi"),
    ("get_compressor_sidechain", "i", "h"),
    # poly
    ("poly_set_param", "i", "hid"),
    ("poly_get_param", "f", "hi"),
    ("poly_set_preset", "i", "hi"),
    ("poly_trigger_chord", "i", "hiiiiiid"),
    ("poly_release", "v", "h"),
    ("poly_available_voicing_count", "i", "h"),
    # blend pads
    ("blend_enable", "i", "hi"),
    ("blend_disable", "i", "hi"),
    ("blend_is_enabled", "i", "hi"),
    ("blend_set_position", "i", "hidd"),
    ("blend_get_position_x", "f", "hi"),
    ("blend_get_position_y", "f", "hi"),
    ("blend_set_corner_preset", "i", "hiii"),
    ("blend_get_corner_preset", "i", "hii"),
    ("blend_reset_corners", "i", "hi"),
    # granulator
    ("granulator_set_param", "i", "hid"),
    ("granulator_get_param", "f", "hi"),
    ("granulator_trigger", "v", "hd"),
    ("granulator_set_seed", "v", "hI"),
    ("granulator_snap_params", "v", "h"),
    ("granulator_active_grain_count", "i", "h"),
    ("granulator_buffer_len", "I", "h"),
    ("granulator_buffer_sample_rate", "f", "h"),
    # mixer graph + track effects
    ("mixer_add_track", "i", "hs"),
    ("mixer_get_track_count", "i", "h"),
    ("mixer_find_track", "i", "hs"),
    ("mixer_set_track_name", "i", "his"),
    ("mixer_set_track_gain", "i", "hid"),
    ("mixer_get_track_gain", "f", "hi"),
    ("mixer_set_track_pan", "i", "hid"),
    ("mixer_get_track_pan", "f", "hi"),
    ("mixer_set_track_mute", "i", "hii"),
    ("mixer_get_track_mute", "i", "hi"),
    ("mixer_set_track_solo", "i", "hii"),
    ("mixer_get_track_solo", "i", "hi"),
    ("mixer_get_track_peak", "f", "hi"),
    ("mixer_route_source", "i", "hii"),
    ("mixer_unroute_source", "i", "hi"),
    ("mixer_get_source_route", "i", "hi"),
    ("mixer_clear_layout", "i", "h"),
    ("mixer_reset_default_layout", "i", "h"),
    ("track_effect_add", "i", "hii"),
    ("track_effect_remove", "i", "hii"),
    ("track_effect_move", "i", "hiii"),
    ("track_effect_clear", "i", "hi"),
    ("track_effect_count", "i", "hi"),
    ("track_effect_type_at", "i", "hii"),
    ("track_effect_set_param", "i", "hiiid"),
    # loop channels
    ("loop_set_playing", "v", "hii"),
    ("loop_set_gain", "v", "hid"),
    ("loop_set_mute", "v", "hii"),
    ("loop_set_solo", "v", "hii"),
    ("loop_set_speed", "v", "hid"),
    ("loop_set_start", "v", "hid"),
    ("loop_set_end", "v", "hid"),
    ("loop_set_position", "v", "hid"),
    ("loop_get_position", "f", "hi"),
    ("loop_set_pitch_mode", "i", "hii"),
    ("loop_get_pitch_mode", "i", "hi"),
    ("loop_set_source_bpm", "i", "hid"),
    ("loop_get_source_bpm", "f", "hi"),
    ("loop_restart", "v", "hi"),
    ("loop_cancel_queued_swap", "v", "hi"),
    ("loop_swaps_completed", "i", "hi"),
    ("loop_effect_add", "i", "hii"),
    ("loop_effect_remove", "i", "hii"),
    ("loop_effect_move", "i", "hiii"),
    ("loop_effect_clear", "v", "hi"),
    ("loop_effect_count", "i", "hi"),
    ("loop_effect_type_at", "i", "hii"),
    ("loop_effect_set_param", "i", "hiiid"),
    ("loop_render_to_wav", "i", "hiIsi"),
    # clip grid
    ("clip_unload", "i", "hii"),
    ("clip_clear", "i", "h"),
    ("clip_launch", "i", "hiii"),
    ("clip_launch_at_beat", "i", "hiid"),
    ("clip_launch_scene", "i", "hii"),
    ("clip_launch_scene_at_beat", "i", "hid"),
    ("clip_stop", "i", "hii"),
    ("clip_stop_at_beat", "i", "hid"),
    ("clip_cancel", "v", "hi"),
    ("clip_cancel_all", "v", "h"),
    ("clip_get_state", "i", "hii"),
    ("clip_get_active_row", "i", "hi"),
    ("clip_get_queued_row", "i", "hi"),
    ("clip_is_stop_queued", "i", "hi"),
    ("clip_get_scheduled_beat", "f", "hi"),
    ("clip_get_active_playhead", "f", "hi"),
    ("clip_set_trim", "i", "hiiddi"),
    ("clip_get_trim_start", "f", "hii"),
    ("clip_get_trim_end", "f", "hii"),
    ("clip_set_default_quantization", "i", "hi"),
    ("clip_get_default_quantization", "i", "h"),
    # sampler racks
    ("sampler_register", "i", "h"),
    ("sampler_clear_slot", "i", "hii"),
    ("sampler_trigger", "i", "hiid"),
    ("sampler_set_step", "i", "hiiiid"),
    ("sampler_start_pattern", "i", "hid"),
    ("sampler_stop_pattern", "v", "hi"),
    ("sampler_is_pattern_running", "i", "hi"),
    ("sampler_cancel_pattern_start", "v", "hi"),
    ("sampler_get_pending_start_beat", "f", "hi"),
    ("sampler_slot_is_loaded", "i", "hii"),
    ("sampler_slot_frames", "I", "hii"),
    ("sampler_slot_channels", "i", "hii"),
    ("sampler_slot_sample_rate", "f", "hii"),
    ("sampler_get_source_id", "i", "hi"),
    # performance recorder
    ("perf_set_record_armed", "v", "hi"),
    ("perf_is_record_armed", "i", "h"),
    ("perf_is_recording", "i", "h"),
    ("perf_set_record_mode", "i", "hi"),
    ("perf_get_record_mode", "i", "h"),
    ("perf_clear_clip", "v", "h"),
    ("perf_get_event_count", "i", "h"),
    ("perf_get_sampler_event_count", "i", "h"),
    ("perf_get_length_steps", "i", "h"),
    ("perf_get_length_ticks", "i", "h"),
    # reference-ABI aliases (name parity with ffi.rs)
    ("trigger_channel", "v", "hi"),
    ("set_channel_instrument_type", "i", "hii"),
    ("get_channel_instrument_type", "i", "hi"),
    ("set_global_effect_enabled", "v", "hii"),
    ("set_global_effect_param", "i", "hiid"),
    ("get_global_effect_param", "f", "hii"),
    ("set_swing", "v", "hid"),
    ("move_effect", "i", "hii"),
    ("sequencer_set_instrument_step", "v", "hiii"),
    ("sequencer_set_instrument_step_with_velocity", "v", "hiiid"),
    ("sequencer_set_instrument_step_settings", "v", "hiiid"),
    ("sequencer_get_instrument_step", "i", "hii"),
    ("sequencer_get_instrument_step_with_lookahead", "i", "hii"),
    ("sequencer_set_instrument_step_blend_override", "v", "hiidd"),
    ("sequencer_clear_instrument_step_blend_override", "v", "hii"),
    ("sequencer_get_instrument_step_blend_override_x", "f", "hii"),
    ("sequencer_get_instrument_step_blend_override_y", "f", "hii"),
]

C_TYPE = {"h": "gooey_handle", "i": "int32_t", "I": "int64_t", "d": "double",
          "s": "const char *"}
RET_TYPE = {"v": "void", "i": "int32_t", "I": "int64_t", "f": "double"}
FMT = {"h": "L", "i": "i", "I": "L", "d": "d", "s": "s"}
CAST = {"h": "(long long)", "i": "(int)", "I": "(long long)", "d": "",
        "s": ""}


def emit():
    decls, defs = [], []
    for suffix, ret, args in TABLE:
        params = []
        fmt = ""
        passed = []
        for k, code in enumerate(args):
            name = "h" if code == "h" and k == 0 else f"a{k}"
            params.append(f"{C_TYPE[code]} {name}")
            fmt += FMT[code]
            passed.append(f"{CAST[code]}{name}")
        sig = f"{RET_TYPE[ret]} gooey_engine_{suffix}({', '.join(params)})"
        decls.append(sig + ";")
        body = [sig + " {"]
        guard = {"v": "return", "i": "return 0", "I": "return 0",
                 "f": "return 0.0"}[ret]
        body.append(f"  if (!gooey_shim::g_capi) {guard};")
        body.append("  gooey_shim::Gil gil;")
        call = (f'gooey_shim::call("engine_{suffix}", "({fmt})", '
                + ", ".join(passed) + ")")
        if ret == "v":
            body.append(f"  gooey_shim::drop({call});")
        elif ret == "f":
            body.append(f"  return gooey_shim::as_double({call}, 0.0);")
        elif ret == "I":
            body.append(f"  return (int64_t)gooey_shim::as_int({call}, 0);")
        else:
            body.append(f"  return (int32_t)gooey_shim::as_int({call}, 0);")
        body.append("}")
        defs.append("\n".join(body))

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "..", "include", "gooey_tpu_gen.h"), "w") as f:
        f.write("/* Generated by native/gen_shim.py — do not edit. */\n")
        f.write("#ifndef GOOEY_TPU_GEN_H\n#define GOOEY_TPU_GEN_H\n\n")
        f.write("#include <stdint.h>\n\n")
        f.write('#ifdef __cplusplus\nextern "C" {\n#endif\n\n')
        f.write("typedef int64_t gooey_handle;\n\n")
        f.write("\n".join(decls))
        f.write('\n\n#ifdef __cplusplus\n} /* extern "C" */\n#endif\n')
        f.write("#endif /* GOOEY_TPU_GEN_H */\n")
    with open(os.path.join(here, "gooey_shim_gen.cpp"), "w") as f:
        f.write("// Generated by gen_shim.py — do not edit.\n")
        f.write('#include "../include/gooey_tpu.h"\n')
        f.write('#include "shim_internal.h"\n\n')
        f.write('extern "C" {\n\n')
        f.write("\n\n".join(defs))
        f.write("\n\n}  // extern \"C\"\n")
    print(f"generated {len(TABLE)} wrappers")


if __name__ == "__main__":
    emit()
