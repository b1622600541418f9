"""Long-form soak: every subsystem on at once, several seconds of audio.

Catches cross-subsystem interactions the focused tests can't: NaN/Inf
creep, denormal buildup, error-latch misfires, peak-meter anomalies and
transport drift over hundreds of blocks.
"""

import numpy as np

from libgooey_tpu import capi
import pytest


@pytest.mark.slow
def test_everything_on_soak():
    h = capi.engine_new(44100.0)
    try:
        capi.engine_set_bpm(h, 174.0)
        # all four kit sequencers + swing + per-step notes/blends
        for ch in range(4):
            capi.engine_sequencer_set_instrument_pattern(h, ch, 0b1010101010101010)
            capi.engine_sequencer_set_swing(h, ch, 0.6)
            capi.engine_sequencer_start(h, ch)
        capi.engine_blend_enable(h, 0)
        capi.engine_blend_set_position(h, 0, 0.7, 0.3)
        # LFOs routed across instruments
        for lfo, (ch, pid) in enumerate(((0, 0), (1, 1), (2, 1), (2, 3))):
            capi.engine_set_lfo_timing(h, lfo, 3 + lfo)
            capi.engine_set_lfo_amount(h, lfo, 0.5)
            capi.engine_add_lfo_route(h, lfo, ch, pid)
        # granulator cloud
        t = np.arange(44100) / 44100.0
        capi.engine_granulator_load(
            h, (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32), 44100.0)
        capi.engine_granulator_set_param(h, 4, 0.8)
        capi.engine_granulator_set_param(h, 7, 1.0)  # long cloud
        capi.engine_granulator_trigger(h, 1.0)
        # sampler rack routed + pattern
        rack = capi.engine_sampler_register(h)
        capi.engine_mixer_route_source(
            h, capi.engine_sampler_get_source_id(h, rack), 3)
        tone = (0.3 * np.sin(2 * np.pi * 880 * t[:2000])).astype(np.float32)
        capi.engine_sampler_set_slot_buffer(h, rack, 0, tone, 1, 44100.0)
        capi.engine_sampler_set_step(h, rack, 0, 1, 0, 1.0)
        capi.engine_sampler_set_step(h, rack, 8, 1, 0, 0.8)
        capi.engine_sampler_start_pattern(h, rack, 0.0)
        # loop clip launched on the grid
        bar = int(44100 * 60 / 174.0 * 4)
        loop = np.repeat((0.2 * np.sin(2 * np.pi * 110 * np.arange(bar)
                                       / 44100)).astype(np.float32), 2)
        capi.engine_clip_load(h, 0, 0, loop, 2, 44100.0, 174.0)
        capi.engine_transport_start(h)
        capi.engine_clip_launch(h, 0, 0, 3)  # immediate
        # poly chord + perf recorder armed
        capi.engine_perf_set_record_armed(h, 1)
        capi.engine_poly_trigger_chord(h, 0, 0, 0, 0, 0, 4, 0.8)
        # global FX all on, sidechained compressor, reordered
        for eid in range(10):
            capi.engine_set_effect_enabled(h, eid, 1)
        capi.engine_set_compressor_sidechain(h, 0)
        capi.engine_set_effect_order_list(h, [2, 0, 4, 1, 3, 7, 8, 6, 9])

        # ~2.3 s of audio in 2048-frame chunks (halved in round 2: the
        # everything-on pipeline compile dominates this test; execution
        # length only needs to cover >5 transport beats at 174 BPM)
        peak = 0.0
        for _ in range(50):
            out = capi.engine_render(h, 2048)
            assert np.all(np.isfinite(out))
            peak = max(peak, float(np.abs(out).max()))
        assert capi.engine_last_error(h) == ""
        assert peak > 1e-3               # audibly alive
        assert peak <= 1.0 + 1e-5        # soft limiter holds the ceiling
        assert capi.engine_transport_get_beat_position(h) > 5.0
        peaks = capi.engine_get_channel_peaks(h)
        assert np.all(np.isfinite(peaks)) and peaks.max() > 0.0
    finally:
        capi.engine_free(h)
