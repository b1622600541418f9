"""Full C-API surface: one behavioral test per FFI family (ffi.rs parity)."""

import numpy as np
import pytest

from libgooey_tpu import capi


@pytest.fixture
def h():
    handle = capi.engine_new(44100.0)
    yield handle
    capi.engine_free(handle)


def test_global_and_transport(h):
    capi.engine_set_bpm(h, 140.0)
    assert capi.engine_get_bpm(h) == 140.0
    capi.engine_set_master_gain(h, 0.5)
    assert abs(capi.engine_get_master_gain(h) - 0.5) < 1e-7
    assert capi.engine_has_error(h) == 0
    capi.engine_set_link_enabled(h, 1)
    assert capi.engine_is_link_enabled(h) == 1
    capi.engine_transport_start(h)
    assert capi.engine_transport_get_beat_position(h) == 0.0
    capi.engine_render(h, 512)
    assert capi.engine_transport_get_beat_position(h) > 0.0
    capi.engine_transport_stop(h)
    assert capi.engine_instrument_count() == 5


def test_typed_instrument_params_and_presets(h):
    # channel 0 is a kick by default; snare-typed setter must refuse it
    assert capi.engine_set_kick_param(h, 0, 1, 0.8) == 1     # PUNCH
    assert abs(capi.engine_get_kick_param(h, 0, 1) - 0.8) < 1e-7
    assert capi.engine_set_snare_param(h, 0, 1, 0.5) == 0
    assert capi.engine_set_snare_param(h, 1, 0, 0.3) == 1    # FREQUENCY
    assert capi.engine_set_hihat_param(h, 2, 1, 0.6) == 1    # DECAY
    assert capi.engine_set_tom_param(h, 3, 0, 55.0) == 1     # TUNE (0-100)
    assert abs(capi.engine_get_tom_param(h, 3, 0) - 55.0) < 1e-5
    assert capi.engine_set_bass_param(h, 6, 0.4) == 1        # FILTER_CUTOFF
    assert abs(capi.engine_get_bass_param(h, 6) - 0.4) < 1e-7
    assert capi.engine_load_bass_preset(h, 2) == 1           # REESE
    assert capi.engine_kick_param_count() == 8
    assert capi.engine_snare_param_count() == 20
    assert capi.engine_hihat_param_count() == 6
    assert capi.engine_tom_param_count() == 9
    capi.engine_set_channel_tuning(h, 0, 0.75)
    assert abs(capi.engine_get_channel_tuning(h, 0) - 0.75) < 1e-7


def test_strip_mixer_controls(h):
    assert capi.engine_set_instrument_gain(h, 0, 0.7) == 1
    assert abs(capi.engine_get_instrument_gain(h, 0) - 0.7) < 1e-6
    capi.engine_set_instrument_pan(h, 1, 0.25)
    assert abs(capi.engine_get_instrument_pan(h, 1) - 0.25) < 1e-6
    capi.engine_set_instrument_mute(h, 2, 1)
    assert capi.engine_get_instrument_mute(h, 2) == 1
    capi.engine_set_instrument_solo(h, 3, 1)
    assert capi.engine_get_instrument_solo(h, 3) == 1
    capi.engine_set_instrument_solo(h, 3, 0)
    capi.engine_set_instrument_mute(h, 2, 0)
    assert capi.engine_trigger_kick(h, 1.0) == 1
    out = capi.engine_render(h, 2048)
    assert np.abs(out).max() > 1e-4
    peaks = capi.engine_get_channel_peaks(h)
    assert peaks.shape == (5,) and peaks[0] > 0.0
    assert capi.engine_get_channel_peaks(h)[0] == 0.0  # read-and-reset


def test_sequencer_step_round_trip(h):
    capi.engine_sequencer_set_instrument_step_with_settings(h, 0, 3, 1, 0.9)
    capi.engine_sequencer_set_instrument_step_note(h, 0, 3, 48)
    capi.engine_sequencer_set_instrument_step_blend(h, 0, 3, 0.2, 0.8)
    assert capi.engine_sequencer_get_instrument_step_enabled(h, 0, 3) == 1
    assert abs(capi.engine_sequencer_get_instrument_step_velocity(h, 0, 3) - 0.9) < 1e-7
    assert capi.engine_sequencer_get_instrument_step_note(h, 0, 3) == 48
    assert capi.engine_sequencer_get_instrument_step_blend_enabled(h, 0, 3) == 1
    assert abs(capi.engine_sequencer_get_instrument_step_blend_x(h, 0, 3) - 0.2) < 1e-7
    capi.engine_sequencer_clear_instrument_step_note(h, 0, 3)
    assert capi.engine_sequencer_get_instrument_step_note(h, 0, 3) == 255
    capi.engine_sequencer_clear_instrument_step_blend(h, 0, 3)
    assert capi.engine_sequencer_get_instrument_step_blend_enabled(h, 0, 3) == 0
    capi.engine_sequencer_set_instrument_pattern(h, 0, 0b1000100010001)
    assert capi.engine_sequencer_get_instrument_step_enabled(h, 0, 0) == 1
    assert capi.engine_sequencer_get_instrument_step_enabled(h, 0, 1) == 0
    assert capi.engine_sequencer_step_count(h, 0) == 16
    # triggers_enabled keeps phase but silences output
    capi.engine_set_sequencer_triggers_enabled(h, 0, 0)
    assert capi.engine_get_sequencer_triggers_enabled(h, 0) == 0
    capi.engine_sequencer_start(h, 0)
    out = capi.engine_render(h, 8192)
    assert np.abs(out).max() < 1e-5
    assert capi.engine_sequencer_get_beat_position(h, 0) > 0.0


def test_lfo_pool_and_routes(h):
    assert capi.engine_lfo_count() == 8 and capi.engine_lfo_timing_count() == 8
    assert capi.engine_set_lfo_timing(h, 0, 2) == 1
    assert capi.engine_get_lfo_timing(h, 0) == 2
    capi.engine_set_lfo_amount(h, 0, 0.4)
    assert abs(capi.engine_get_lfo_amount(h, 0) - 0.4) < 1e-7
    capi.engine_set_lfo_offset(h, 0, 0.1)
    capi.engine_set_lfo_enabled(h, 0, 1)
    assert capi.engine_add_lfo_route(h, 0, 0, 0) == 1  # kick frequency
    assert capi.engine_get_lfo_route_count(h, 0) == 1
    assert capi.engine_remove_lfo_route(h, 0, 0, 0) == 1
    assert capi.engine_get_lfo_route_count(h) == 0
    capi.engine_add_lfo_route(h, 1, 1, 1)
    capi.engine_clear_lfo_routes(h)
    assert capi.engine_get_lfo_route_count(h) == 0
    capi.engine_reset_lfo_phase(h, 0)
    assert capi.engine_get_lfo_phase(h, 0) == 0.0


def test_global_fx_and_sidechain(h):
    assert capi.engine_reorderable_effect_count() == 9
    assert capi.engine_global_effect_count(h) == 10
    capi.engine_set_effect_enabled(h, 2, 1)
    assert capi.engine_get_global_effect_enabled(h, 2) == 1
    order = capi.engine_get_effect_order(h)
    assert sorted(order) == [0, 1, 2, 3, 4, 6, 7, 8, 9]
    assert capi.engine_set_compressor_sidechain(h, 0) == 1
    assert capi.engine_get_compressor_sidechain(h) == 0
    # render with the sidechained compressor enabled must not error
    capi.engine_set_effect_enabled(h, 3, 1)
    capi.engine_trigger_channel_with_velocity(h, 0, 1.0)
    out = capi.engine_render(h, 1024)
    assert np.all(np.isfinite(out)) and capi.engine_last_error(h) == ""
    capi.engine_set_compressor_sidechain(h, -1)
    assert capi.engine_get_compressor_sidechain(h) == -1


def test_poly_family(h):
    assert capi.engine_poly_available_voicing_count() == 10
    assert capi.engine_poly_set_preset(h, 4) == 1  # strings
    assert capi.engine_poly_set_param(h, 13, 0.9) == 1  # volume
    assert abs(capi.engine_poly_get_param(h, 13) - 0.9) < 1e-7
    assert capi.engine_poly_trigger_chord(h, 0, 0, 0, 0, 0, 4, 0.9) == 1
    out = capi.engine_render(h, 8192)
    assert np.abs(out).max() > 1e-4
    capi.engine_poly_release(h)


def test_blend_pads(h):
    assert capi.engine_blend_enable(h, 0) == 1
    assert capi.engine_blend_is_enabled(h, 0) == 1
    assert capi.engine_blend_set_corner_preset(h, 0, 1, 3) == 1  # BR = dirt
    assert capi.engine_blend_get_corner_preset(h, 0, 1) == 3
    assert capi.engine_blend_set_position(h, 0, 1.0, 0.0) == 1
    assert capi.engine_blend_get_position_x(h, 0) == 1.0
    assert abs(capi.engine_get_channel_param(h, 0, 0) - 0.62) < 1e-6  # dirt freq
    capi.engine_blend_reset_corners(h, 0)
    assert capi.engine_blend_get_corner_preset(h, 0, 1) == 1
    capi.engine_blend_disable(h, 0)
    assert capi.engine_blend_set_position(h, 0, 0.5, 0.5) == 0


def test_granulator_extras(h):
    t = np.sin(2 * np.pi * 220 * np.arange(44100) / 44100).astype(np.float32)
    assert capi.engine_granulator_set_buffer(h, t, 44100.0) == 1
    assert capi.engine_granulator_buffer_len(h) == 44100
    assert capi.engine_granulator_buffer_sample_rate(h) == 44100.0
    capi.engine_granulator_set_seed(h, 1234)
    capi.engine_granulator_set_param(h, 4, 0.9)  # density
    assert abs(capi.engine_granulator_get_param(h, 4) - 0.9) < 1e-6
    capi.engine_granulator_snap_params(h)
    capi.engine_granulator_trigger(h, 1.0)
    out = capi.engine_render(h, 8192)
    assert np.abs(out).max() > 1e-5
    assert capi.engine_granulator_active_grain_count(h) >= 0


def test_mixer_graph_and_track_effects(h):
    assert capi.engine_mixer_get_track_count(h) == 4
    t = capi.engine_mixer_add_track(h, "Aux")
    assert capi.engine_mixer_find_track(h, "Aux") == t
    assert capi.engine_mixer_get_track_name(h, t) == "Aux"
    capi.engine_mixer_set_track_gain(h, t, 1.5)
    assert abs(capi.engine_mixer_get_track_gain(h, t) - 1.5) < 1e-7
    capi.engine_mixer_set_track_pan(h, t, 0.2)
    capi.engine_mixer_set_track_mute(h, t, 1)
    capi.engine_mixer_set_track_solo(h, t, 1)
    assert capi.engine_mixer_get_track_mute(h, t) == 1
    assert capi.engine_mixer_get_track_solo(h, t) == 1
    capi.engine_mixer_set_track_mute(h, t, 0)
    capi.engine_mixer_set_track_solo(h, t, 0)
    assert capi.engine_mixer_route_source(h, 0, t) == 1
    assert capi.engine_mixer_get_source_route(h, 0) == t
    assert capi.engine_mixer_unroute_source(h, 0) == 1
    assert capi.engine_mixer_get_source_route(h, 0) == -1
    assert capi.engine_track_effect_add(h, t, 0) == 1  # lowpass
    assert capi.engine_track_effect_count(h, t) == 1
    assert capi.engine_track_effect_type_at(h, t, 0) == 0
    assert capi.engine_track_effect_set_param(h, t, 0, 0, 2000.0) == 1
    capi.engine_track_effect_clear(h, t)
    assert capi.engine_track_effect_count(h, t) == 0
    capi.engine_mixer_reset_default_layout(h)
    assert capi.engine_mixer_get_track_count(h) == 4


def test_loop_family(h):
    ramp = (np.arange(2000, dtype=np.float32) % 500) / 500.0
    inter = np.repeat(ramp, 2)  # stereo interleaved
    assert capi.engine_loop_load(h, 0, inter, 2, 44100.0, 120.0) == 1
    capi.engine_loop_set_gain(h, 0, 0.8)
    capi.engine_loop_set_speed(h, 0, 1.0)
    assert capi.engine_loop_set_pitch_mode(h, 0, 1) == 1  # Resample
    assert capi.engine_loop_get_pitch_mode(h, 0) == 1
    assert capi.engine_loop_get_source_bpm(h, 0) == 120.0
    capi.engine_loop_set_start(h, 0, 0.0)
    capi.engine_loop_set_end(h, 0, 0.5)
    capi.engine_loop_set_playing(h, 0, 1)
    capi.engine_transport_start(h)
    out = capi.engine_render(h, 4096)
    assert np.abs(out).max() > 1e-4
    assert 0.0 <= capi.engine_loop_get_position(h, 0) <= 1.0
    assert capi.engine_loop_effect_add(h, 0, 2) == 1  # saturation
    assert capi.engine_loop_effect_count(h, 0) == 1
    assert capi.engine_loop_effect_type_at(h, 0, 0) == 2
    assert capi.engine_loop_effect_set_param(h, 0, 0, 0, 0.8) == 1
    capi.engine_loop_effect_clear(h, 0)
    # quantized swap: queue a different buffer, render until it lands
    other = np.zeros(1000 * 2, np.float32)
    assert capi.engine_loop_queue_swap(h, 0, other, 2, 44100.0, 1) == 1
    for _ in range(8):
        capi.engine_render(h, 512)
    assert capi.engine_loop_swaps_completed(h, 0) == 1
    capi.engine_loop_restart(h, 0)
    capi.engine_loop_set_playing(h, 0, 0)


def test_clip_family(h):
    ones = np.ones(44100 * 2, np.float32)
    assert capi.engine_clip_load(h, 1, 2, ones, 2, 44100.0, 120.0) == 1
    assert capi.engine_clip_get_state(h, 1, 2) & 1  # LOADED
    assert capi.engine_clip_set_default_quantization(h, 1) == 1  # quarter
    assert capi.engine_clip_get_default_quantization(h) == 1
    capi.engine_transport_start(h)
    assert capi.engine_clip_launch(h, 1, 2) == 1
    assert capi.engine_clip_get_queued_row(h, 1) == 2
    assert capi.engine_clip_get_scheduled_beat(h, 1) >= 0.0
    for _ in range(200):  # one quarter at 120 BPM = 22050 samples
        capi.engine_render(h, 512)
        if capi.engine_clip_get_active_row(h, 1) == 2:
            break
    assert capi.engine_clip_get_active_row(h, 1) == 2
    assert capi.engine_clip_get_active_playhead(h, 1) >= 0.0
    assert capi.engine_clip_set_trim(h, 1, 2, 0.1, 0.9, 0) == 1
    assert abs(capi.engine_clip_get_trim_start(h, 1, 2) - 0.1) < 1e-7
    assert capi.engine_clip_stop_at_beat(
        h, 1, capi.engine_transport_get_beat_position(h)) == 1
    assert capi.engine_clip_is_stop_queued(h, 1) == 1
    capi.engine_render(h, 512)
    assert capi.engine_clip_get_active_row(h, 1) == -1
    assert capi.engine_clip_unload(h, 1, 2) == 1
    capi.engine_clip_clear(h)


def test_sampler_family(h):
    assert capi.engine_sampler_register(h) == 0
    src = capi.engine_sampler_get_source_id(h, 0)
    assert src >= 4
    # unrouted sources are silent (graph.rs:343-350): route to a track
    assert capi.engine_mixer_route_source(h, src, 3) == 1
    # (a lone impulse would vanish in the 32-frame edge fade — use a tone)
    tone = np.sin(2 * np.pi * 440 * np.arange(256) / 44100).astype(np.float32)
    assert capi.engine_sampler_set_slot_buffer(h, 0, 3, tone, 1, 44100.0) == 1
    assert capi.engine_sampler_slot_is_loaded(h, 0, 3) == 1
    assert capi.engine_sampler_slot_frames(h, 0, 3) == 256
    assert capi.engine_sampler_slot_sample_rate(h, 0, 3) == 44100.0
    assert capi.engine_sampler_trigger(h, 0, 3, 1.0) == 1
    out = capi.engine_render(h, 1024)
    assert np.abs(out).max() > 1e-4
    assert capi.engine_sampler_set_step(h, 0, 0, 1, 3, 1.0) == 1
    assert capi.engine_sampler_get_step(h, 0, 0) == (1, 3, 1.0)
    assert capi.engine_sampler_start_pattern(h, 0, 0.0) == 1
    assert capi.engine_sampler_get_pending_start_beat(h, 0) == 0.0
    capi.engine_transport_start(h)
    capi.engine_render(h, 512)
    assert capi.engine_sampler_is_pattern_running(h, 0) == 1
    capi.engine_sampler_stop_pattern(h, 0)
    assert capi.engine_sampler_is_pattern_running(h, 0) == 0
    assert capi.engine_sampler_clear_slot(h, 0, 3) == 1
    assert capi.engine_sampler_slot_is_loaded(h, 0, 3) == 0


def test_perf_family(h):
    p = capi._perf(h)
    capi.engine_perf_set_record_mode(h, 1)
    assert capi.engine_perf_get_record_mode(h) == 1
    capi.engine_perf_set_record_mode(h, 0)
    p.update_clock(0.0, True)
    capi.engine_perf_set_record_armed(h, 1)
    assert capi.engine_perf_is_record_armed(h) == 1
    p.update_clock(0.0, True)
    assert capi.engine_perf_is_recording(h) == 1
    p.last_beat = 0.25
    p.record_chord_on(2, 0, 1, 0, 0, 4, 0.8)
    p.last_beat = 0.5
    p.record_chord_off()
    assert capi.engine_perf_get_event_count(h) == 1
    ev = capi.engine_perf_get_event(h, 0)
    assert ev[2] == 2 and ev[4] == 1 and abs(ev[8] - 0.8) < 1e-7
    assert capi.engine_perf_get_length_ticks(h) == \
        capi.engine_perf_get_length_steps(h) * 24
    capi.engine_perf_clear_clip(h)
    assert capi.engine_perf_get_event_count(h) == 0


def test_bounce_and_midi(h):
    capi.engine_trigger_channel_with_velocity(h, 0, 1.0)
    buf = capi.engine_bounce_to_buffer(h, 1024)
    assert buf.shape == (2048,) and np.abs(buf).max() > 1e-4
    capi.engine_sequencer_set_step(h, 0, 0, 1, 1.0)
    capi.engine_sequencer_start(h, 0)
    capi.engine_render(h, 512)
    events = capi.engine_drain_midi_events(h)
    assert len(events) >= 1
    assert capi.engine_drain_midi_events(h) == []
