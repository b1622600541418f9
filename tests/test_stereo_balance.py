"""Ports of tests/stereo_effects.rs and tests/effect_distortion_balance.rs.

1. Dual-mono invariance: every reorderable global effect processes a true
   L/R pair, but mono input with no stereo behavior engaged must keep
   left == right (guards per-channel state drift).
2. Ping-pong delay breaks that symmetry on purpose.
3. The feedback waveshaper's envelope-referenced makeup gain keeps its
   loudness within ~1.5 dB of the plain saturator at matched drive, with
   at least comparable harmonic distortion.
"""

import jax.numpy as jnp
import numpy as np

from libgooey_tpu.mixer import chain as chain_mod

SR = 44100.0
B = 512
N = 1 << 14
FUND_BIN = 64  # coherent: 64 cycles in N samples ≈ 172 Hz


def mono_stimulus():
    t = np.arange(N)
    sig = (0.5 * np.sin(2 * np.pi * FUND_BIN * t / N)).astype(np.float32)
    return np.stack([sig, sig])


def run_effect(effect_id, params, x, pingpong=False, raw_targets=None):
    chain = chain_mod.EffectChain(SR, 120.0)
    chain.add(effect_id)
    for p, v in params:
        chain.set_param(0, p, v)
    if raw_targets:
        for idx, v in raw_targets.items():
            chain.entries[0].targets[idx] = v
    chain.entries[0].pingpong = pingpong
    state = chain.states[0]
    outs = []
    for i in range(0, x.shape[-1], B):
        state, y = chain_mod.process_entry(
            effect_id, state, jnp.asarray(x[:, i:i + B]),
            jnp.asarray(chain.entries[0].targets), sample_rate=SR,
            pingpong=pingpong,
        )
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


#: the dual-mono invariants (stereo_effects.rs:22-55 tests these six;
#: the reverbs are EXCLUDED — their L/R decorrelation is by design)
DUAL_MONO_SETTINGS = [
    (chain_mod.EFFECT_LOWPASS_FILTER, [(0, 2000.0), (1, 0.5)]),
    (chain_mod.EFFECT_DELAY, [(1, 0.6), (2, 0.7)]),
    (chain_mod.EFFECT_SATURATION, [(0, 0.8), (2, 1.0)]),
    (chain_mod.EFFECT_COMPRESSOR, [(0, -25.0), (1, 8.0), (4, 1.0)]),
    (chain_mod.EFFECT_TILT_FILTER, [(0, 0.2)]),
    (chain_mod.EFFECT_WAVESHAPER, [(0, 6.0), (1, 1.0)]),
    (chain_mod.EFFECT_FEEDBACK_WAVESHAPER, [(0, 40.0), (1, 0.5), (3, 1.0)]),
]


def test_mono_input_stays_dual_mono_through_every_effect():
    x = mono_stimulus()
    for effect_id, params in DUAL_MONO_SETTINGS:
        out = run_effect(effect_id, params, x)
        drift = np.abs(out[0] - out[1]).max()
        assert drift < 1e-6, (effect_id, drift)
        assert np.abs(out).max() > 1e-3, effect_id


def test_reverbs_decorrelate_by_design():
    """Spring/plate use different L/R structures (reverb.rs:30-39,
    plate_reverb.rs tap matrices) — mono in must come out decorrelated."""
    x = mono_stimulus()
    for effect_id, params in (
        (chain_mod.EFFECT_REVERB, [(0, 0.6), (1, 0.5), (2, 0.6)]),
        (chain_mod.EFFECT_PLATE_REVERB, [(0, 0.6), (1, 0.5), (2, 0.6)]),
    ):
        out = run_effect(effect_id, params, x)
        assert np.abs(out[0] - out[1]).max() > 1e-3, effect_id


def test_pingpong_breaks_symmetry():
    x = np.zeros((2, N), np.float32)
    x[:, 100] = 0.9  # centered impulse
    # 50 ms delay so several echoes land inside the render window
    out = run_effect(chain_mod.EFFECT_DELAY, [(1, 0.6), (2, 0.8)], x,
                     pingpong=True, raw_targets={0: 0.05})
    assert np.abs(out[0] - out[1]).max() > 1e-3


def _rms(x):
    return float(np.sqrt(np.mean(np.square(x, dtype=np.float64))))


def _gain_db(processed, dry):
    return 20.0 * np.log10(_rms(processed) / max(_rms(dry), 1e-30))


def _bin_power(x, b):
    n = len(x)
    ph = 2.0 * np.pi * b * np.arange(n) / n
    re = float(np.dot(x.astype(np.float64), np.cos(ph)))
    im = float(-np.dot(x.astype(np.float64), np.sin(ph)))
    return re * re + im * im


def _distortion(x):
    fund = max(_bin_power(x, FUND_BIN), 1e-30)
    harm = sum(_bin_power(x, FUND_BIN * h) for h in range(2, 11)
               if FUND_BIN * h < N // 2)
    return float(np.sqrt(harm / fund))


def test_feedback_waveshaper_gain_matches_saturation():
    """effect_distortion_balance.rs: at max drive+feedback the feedback
    waveshaper stays within 1.5 dB of the saturator's loudness with at
    least comparable distortion; at mid settings within 3 dB."""
    dry = mono_stimulus()
    sat_hi = run_effect(chain_mod.EFFECT_SATURATION, [(0, 1.0), (1, 0.5),
                                                      (2, 1.0)], dry)[0]
    fb_hi = run_effect(chain_mod.EFFECT_FEEDBACK_WAVESHAPER,
                       [(0, 100.0), (1, 0.98), (3, 1.0)], dry)[0]
    diff_hi = _gain_db(fb_hi, dry[0]) - _gain_db(sat_hi, dry[0])
    assert abs(diff_hi) <= 1.5, diff_hi
    assert _distortion(fb_hi) >= 0.9 * _distortion(sat_hi)

    sat_mid = run_effect(chain_mod.EFFECT_SATURATION, [(0, 0.5), (1, 0.4),
                                                       (2, 1.0)], dry)[0]
    fb_mid = run_effect(chain_mod.EFFECT_FEEDBACK_WAVESHAPER,
                        [(0, 50.0), (1, 0.49), (3, 1.0)], dry)[0]
    diff_mid = _gain_db(fb_mid, dry[0]) - _gain_db(sat_mid, dry[0])
    assert abs(diff_mid) <= 3.0, diff_mid
