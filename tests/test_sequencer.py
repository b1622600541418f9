"""Sequencer timing: sample-exact semantics vs a per-sample reference loop,
swing tempo invariance (sequencer.rs:262-304), armed starts (rs:377-489)."""

import numpy as np

from libgooey_tpu.engine.sequencer import Sequencer


def reference_tick_loop(seq_cfg, n_samples):
    """Direct per-sample transcription of tick_with_settings for comparison."""
    bpm, sr, steps, pattern, swing = seq_cfg
    sps = np.float32((60.0 / bpm) / 4.0 * sr)
    sample_count = 0
    next_trigger = 0
    current = 0
    fired = []
    for n in range(n_samples):
        if sample_count >= next_trigger:
            if pattern[current]:
                fired.append(n)
            current = (current + 1) % steps
            offs = (np.float32(swing) - np.float32(0.5)) * 2.0 * sps
            signed = offs if current % 2 == 1 else -offs
            next_trigger = int(round(float(np.float32(next_trigger) + sps + np.float32(signed))))
        sample_count += 1
    return fired


def collect_triggers(seq: Sequencer, n_samples, block=512):
    fired = []
    done = 0
    while done < n_samples:
        b = min(block, n_samples - done)
        for t in seq.tick_block(b):
            fired.append(done + t.offset)
        done += b
    return fired


def test_block_tick_matches_per_sample_loop():
    for bpm in [120.0, 97.3, 174.0]:
        for swing in [0.5, 0.66, 1.0]:
            pattern = [True, False, True, True] * 4
            seq = Sequencer(bpm, 44100.0, 16)
            seq.set_pattern(pattern)
            seq.set_swing(swing)
            seq.swing.current = seq.swing.target  # settle for determinism
            seq.start()
            got = collect_triggers(seq, 120_000, block=512)
            want = reference_tick_loop((bpm, 44100.0, 16, pattern, swing), 120_000)
            assert got == want, (bpm, swing, got[:6], want[:6])


def test_block_boundary_irrelevant():
    for block in [1, 7, 128, 512, 4096]:
        seq = Sequencer(133.0, 48000.0, 16)
        seq.set_pattern([True] * 16)
        seq.start()
        fired = collect_triggers(seq, 60_000, block=block)
        ref = collect_triggers(
            _started(Sequencer(133.0, 48000.0, 16), [True] * 16), 60_000, block=977
        )
        assert fired == ref


def _started(seq, pattern):
    seq.set_pattern(pattern)
    seq.start()
    return seq


def test_swing_preserves_average_tempo():
    """Two-step span stays within ±2 samples of 2*samples_per_step
    (sequencer.rs:287-304)."""
    seq = Sequencer(120.0, 44100.0, 16)
    seq.set_pattern([True] * 16)
    seq.set_swing(0.75)
    seq.swing.current = seq.swing.target
    seq.start()
    fired = collect_triggers(seq, 44100 * 4)
    sps = seq.samples_per_step
    pairs = [fired[i + 2] - fired[i] for i in range(0, len(fired) - 2, 2)]
    for span in pairs:
        assert abs(span - 2 * sps) <= 2.0, span
    # and the off-beats really are delayed
    odd_gaps = [fired[i + 1] - fired[i] for i in range(0, len(fired) - 1, 2)]
    assert all(g > sps * 1.3 for g in odd_gaps)


def test_velocity_and_note_blend_payload():
    seq = Sequencer(120.0, 44100.0, 16)
    seq.set_step_with_settings(0, True, 0.3, blend=(0.1, 0.9), note=42)
    seq.set_step_with_settings(4, True, 0.8)
    seq.start()
    trigs = seq.tick_block(44100)
    assert trigs[0].velocity == 0.3 and trigs[0].note == 42
    assert trigs[0].blend == (0.1, 0.9)
    assert trigs[1].velocity == 0.8 and trigs[1].note is None
    # note 255 clears (sequencer.rs:788-795)
    seq.set_step_note(0, 255)
    assert seq.pattern[0].note is None


def test_set_beat_position_silent_teleport():
    """Teleport does not fire the landing step; it fires at the next boundary
    (sequencer.rs:658-682)."""
    seq = Sequencer(120.0, 44100.0, 16)
    seq.set_pattern([True] * 16)
    seq.start()
    _ = seq.tick_block(100)  # fire step 0
    seq.set_beat_position(1.0)  # step 4, exactly at its start
    trigs = seq.tick_block(int(seq.samples_per_step) + 10)
    # the first fire after the teleport is step 4's *next* boundary → step 4
    # fires one full step later
    assert trigs[0].step == 4
    assert trigs[0].offset == int(round(seq.samples_per_step)) - 0  # full step away


def test_armed_start_counts_down_silently_then_fires():
    seq = Sequencer(120.0, 44100.0, 16)
    seq.set_pattern([True] * 16)
    seq.arm_at_samples(1000, 0.0)
    assert seq.is_armed
    trigs = seq.tick_block(999)
    assert trigs == [] and not seq.is_running
    trigs = seq.tick_block(512)
    # fires exactly at the 1000th sample: offset 1 within this block
    assert seq.is_running
    assert trigs[0].offset == 1 and trigs[0].step == 0


def test_armed_start_split_across_blocks():
    for block in [64, 256, 700]:
        seq = Sequencer(120.0, 44100.0, 16)
        seq.set_pattern([True] + [False] * 15)
        seq.arm_at_samples(1500, 0.0)
        fired = collect_triggers(seq, 4000, block=block)
        assert fired[0] == 1500, (block, fired)


def test_stop_freezes_pattern_phase():
    seq = Sequencer(120.0, 44100.0, 16)
    seq.set_pattern([True] * 16)
    seq.start()
    seq.tick_block(10_000)
    step_before = seq.current_step
    seq.stop()
    seq.tick_block(44_100)  # silence, but sample_count advances
    assert seq.current_step == step_before
    assert not seq.is_running


def test_pattern_string():
    seq = Sequencer(120.0, 44100.0, 16)
    seq.set_pattern_string("x.x.|9.3.|....|xxxx")
    assert seq.pattern[0].enabled and not seq.pattern[1].enabled
    assert seq.pattern[4].enabled and abs(seq.pattern[4].velocity - 1.0) < 1e-6
    assert abs(seq.pattern[6].velocity - 3 / 9) < 1e-6
    assert all(seq.pattern[i].enabled for i in (12, 13, 14, 15))
