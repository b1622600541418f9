"""Fused voice-bank instrument kernels: a whole family block in two kernels.

At product voice counts (a 4/16-voice strip per family) the stage-by-stage
XLA graph of an instrument bank is kernel-launch bound: the 16-voice kick
block compiles to ~150 fusions/custom-calls (~360 us/block on a v5e, ~2 us
a launch, for microseconds of actual math).  This module collapses the
ENTIRE render_block — parameter smoothing, trigger latches, time-based
envelopes, oscillators, filter scans, and the 4x-oversampled drive chain —
into two `pallas_call`s around the (genuinely nonlinear, sample-sequential)
envelope-follower bank kernel:

    kernel A:  params/trigger/envelopes/oscillators/filters  -> total, amp
    env_follow_bank (ops/pallas_fx.py):  |total| -> env
    XLA glue:  gain_compensation(env)  (transcendental, one fusion)
    kernel B:  4x-oversampled tanh drive + DC block + amp    -> out

Layout: voices on sublanes, samples on lanes ([V, B] tiles, V padded to 8).
Linear recurrences run as Hillis-Steele lane scans (pallas_fx._affine_scan
and friends); the polyphase half-band chains stack both phase chains as
row groups 0:V / V:2V of one [2V, B] array (the generalized
pallas_fx._ovs4_pipeline).  Everything else is a pure function of
samples-since-trigger, exactly like the XLA path it mirrors.

Behavioral reference: src/instruments/kick.rs:971-1286 via
libgooey_tpu/instruments/kick.py render_block (the XLA twin; pinned by
tests/test_pallas_voice.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libgooey_tpu.ops import noise as noise_mod
from libgooey_tpu.ops import oversample as ovs_mod
from libgooey_tpu.ops.pallas_fx import (
    _IN_IDX,
    _K_IN,
    _K_OUT,
    _OUT_IDX,
    _affine_scan,
    _affine_scan2,
    _ovs4_pipeline,
    _shift_right,
    _vmem,
)

#: "auto" -> fused kernels on TPU for eligible configs; "xla" disables;
#: "pallas" forces (tests, interpret mode off-TPU).
IMPL = "auto"

#: Largest bank the un-tiled fused kernels accept: every [V, B] live value
#: is V*B*4 bytes of VMEM and kernel A keeps ~20 alive (~1.3 MB at V=128).
MAX_FUSED_VOICES = 128

_LN_2 = float(np.log(2.0))


# --- in-kernel math helpers ---------------------------------------------------


def _apply_curve(progress, c):
    """EnvelopeCurve::apply — formula-identical to core/envelope.py
    apply_curve (time-based oscillators amplify any ULP difference in the
    smoothed/enveloped frequency into phase drift, so every op in the
    frequency path must match the XLA twin bit-for-bit in interpret mode)."""
    c = jnp.clip(c, 0.1, 10.0)
    return jnp.power(jnp.maximum(progress, 0.0), c)


def _adsr_amp(elapsed, attack, decay, sustain, attack_curve, decay_curve):
    """Time-based ADSR amplitude (core/envelope.py amplitude, no release)."""
    attack_amp = _apply_curve(elapsed / attack, attack_curve)
    decay_prog = _apply_curve((elapsed - attack) / decay, decay_curve)
    decay_amp = 1.0 - (1.0 - sustain) * decay_prog
    in_attack = elapsed < attack
    in_decay = elapsed < attack + decay
    held = jnp.where(in_attack, attack_amp, jnp.where(in_decay, decay_amp, sustain))
    return jnp.where(elapsed >= 0.0, held, 0.0)


def _phase_mod_env(elapsed, active):
    """DS-style PhaseModulator transient (instruments/common.py)."""
    rise = jnp.power(jnp.maximum(elapsed / 0.001, 0.0), 0.3)
    fall = 1.0 - jnp.power(jnp.maximum((elapsed - 0.001) / 0.005, 0.0), 0.4)
    env = jnp.where(elapsed < 0.001, rise, fall)
    return jnp.where((elapsed >= 0.0) & (elapsed <= 0.006) & active, env, 0.0)


def _white(counter_u32, seed):
    """core/rng.py white(): murmur-style counter hash -> [-1, 1] float."""
    s = jnp.uint32(seed)
    x = s * jnp.uint32(0x9E3779B9) + jnp.uint32(0x85EBCA6B)
    # mix32(seed-derived scalar) folds to a compile-time constant stream
    def mix(v):
        v = v ^ (v >> jnp.uint32(16))
        v = v * jnp.uint32(0x7FEB352D)
        v = v ^ (v >> jnp.uint32(15))
        v = v * jnp.uint32(0x846CA68B)
        v = v ^ (v >> jnp.uint32(16))
        return v

    bits = mix(counter_u32 ^ mix(x)) >> jnp.uint32(8)
    # Mosaic has no uint32->f32 cast; bits < 2^24 so a bitcast through int32
    # is value-preserving (and bit-identical to the XLA path's direct cast)
    bits_i = jax.lax.bitcast_convert_type(bits, jnp.int32)
    norm = bits_i.astype(jnp.float32) / np.float32((1 << 24) - 1)
    return norm * 2.0 - 1.0


def _triangle_additive(idx_f, freq, sr, max_harmonics):
    """Additive odd-harmonic 'triangle' (ops/osc.py triangle_additive)."""
    theta = idx_f * freq * np.float32(2.0 * np.pi / sr)
    nyquist = np.float32(sr / 2.0)
    sin1 = jnp.sin(theta)
    cos2x2 = 2.0 * jnp.cos(2.0 * theta)
    max_i = jnp.floor(nyquist / jnp.maximum(freq, 1e-6))

    def body(k, carry):
        prev, curr, acc = carry
        i = 2.0 * k + 1.0
        hfreq = freq * i
        ratio = hfreq / nyquist
        t = (ratio - 0.75) * 4.0
        taper = jnp.where(ratio > 0.75, 1.0 - t * t, 1.0)
        gain = taper / (i * i)
        active = (i <= max_i) & (hfreq <= nyquist)
        acc = acc + jnp.where(active, gain * curr, 0.0)
        nxt = cos2x2 * curr - prev
        return curr, nxt, acc

    n_terms = (max_harmonics + 1) // 2
    _, _, out = jax.lax.fori_loop(
        0,
        n_terms,
        lambda k, c: body(jnp.asarray(k, jnp.float32), c),
        (-sin1, sin1, jnp.zeros_like(sin1)),
    )
    return out


def _svf_tpt_reset(x, g, h, reset, ic1_0, ic2_0):
    """TPT SVF lane scan with trigger-reset masking (filters.svf_tpt_block)."""
    hg = h * g
    keep = jnp.where(reset, 0.0, 1.0)
    a11 = (2.0 * h - 1.0) * keep
    a12 = -2.0 * hg * keep
    a21 = 2.0 * g * h * keep
    a22 = (1.0 - 2.0 * g * g * h) * keep
    b1 = 2.0 * hg * x
    b2 = 2.0 * g * g * h * x
    s1, s2 = _affine_scan2(a11, a12, a21, a22, b1, b2, (ic1_0, ic2_0))
    ic1_prev = jnp.where(reset, 0.0, _shift_right(s1, 1, ic1_0))
    ic2_prev = jnp.where(reset, 0.0, _shift_right(s2, 1, ic2_0))
    v1 = (g * (x - ic2_prev) + ic1_prev) * h
    v2 = ic2_prev + g * v1
    return v1, v2, s1[:, -1:], s2[:, -1:]


def _accessors_h(st_ref, nst_ref, half):
    """pallas_fx._accessors generalized to [2*half, K] packed chain states."""
    ld = lambda key, i=0: st_ref[:, _IN_IDX[key] + i:_IN_IDX[key] + i + 1]
    lds = lambda key: st_ref[0:half, _IN_IDX[key]:_IN_IDX[key] + 1]

    def stv(key, i, v):
        nst_ref[:, _OUT_IDX[key] + i:_OUT_IDX[key] + i + 1] = v

    def stvs(key, v, i=0):
        c = _OUT_IDX[key] + i
        nst_ref[0:half, c:c + 1] = v
        nst_ref[half:2 * half, c:c + 1] = v

    return ld, lds, stv, stvs


def _dc_block_h(sat, bypass, lds, stvs):
    """Bypass-gated DC blocker (pallas_fx._dc_block, any row count)."""
    A1 = jnp.where(bypass, 1.0, 0.0)
    A2 = jnp.where(bypass, 1.0, 0.995)
    x1 = _affine_scan(A1, (1.0 - A1) * sat, lds("dc_x1"))
    x1_prev = _shift_right(x1, 1, lds("dc_x1"))
    y1 = _affine_scan(A2, (1.0 - A1) * (sat - x1_prev), lds("dc_y1"))
    stvs("dc_x1", x1[:, -1:])
    stvs("dc_y1", y1[:, -1:])
    return y1


# --- [V]-batched oversampler state packing ------------------------------------


def pack_voice_ovs(ovs: ovs_mod.OversamplerState, dc_x1, dc_y1):
    """[V]-batched OversamplerState + DC state -> [2V, K_in] stacked chains.

    Rows 0:V = polyphase chain 0, rows V:2V = chain 1; per-voice scalars
    are duplicated across both halves (the voice-bank analog of
    pallas_fx.pack_ovs4_dc).
    """
    s2 = lambda c0, c1: jnp.concatenate([c0, c1], axis=0)   # [V,n]+[V,n]
    scol = lambda v: jnp.concatenate([v, v], axis=0)[:, None]  # [V]->[2V,1]
    parts = [
        s2(ovs.up1.ap0, ovs.up1.ap1), s2(ovs.up1.ap0x, ovs.up1.ap1x),
        s2(ovs.up2.ap0y2, ovs.up2.ap1y2), s2(ovs.up2.ap0x2, ovs.up2.ap1x2),
        s2(ovs.up2.ap0x, ovs.up2.ap1x),
        s2(ovs.down2.ap0y2, ovs.down2.ap1y2),
        s2(ovs.down2.ap0x2, ovs.down2.ap1x2),
        s2(ovs.down2.ap0x, ovs.down2.ap1x),
        s2(ovs.down1.ap0, ovs.down1.ap1), s2(ovs.down1.ap0x, ovs.down1.ap1x),
        scol(ovs.down2.x1), scol(ovs.down1.x1),
        scol(dc_x1), scol(dc_y1),
    ]
    return jnp.concatenate(parts, axis=-1)


def unpack_voice_ovs(nst, V, ovs: ovs_mod.OversamplerState):
    """[2V, K_out] -> (OversamplerState, dc_x1, dc_y1).  ``ovs`` supplies
    fields the 4x flow never touches (up1.x1, up2.x1)."""
    n1 = len(ovs_mod._split(ovs_mod.STAGE1)[0])
    n2 = len(ovs_mod._split(ovs_mod.STAGE2)[0])
    blk = lambda key, w, c: nst[c * V:(c + 1) * V, _OUT_IDX[key]:_OUT_IDX[key] + w]
    col = lambda key: nst[0:V, _OUT_IDX[key]]

    def stage1(pref, x1):
        return ovs_mod.HalfbandState(
            ap0=blk(f"{pref}_y", n1, 0), ap0x=blk(f"{pref}_x", n1, 0),
            ap1=blk(f"{pref}_y", n1, 1), ap1x=blk(f"{pref}_x", n1, 1),
            x1=x1,
            ap0y2=blk(f"{pref}_y2", n1, 0), ap0x2=blk(f"{pref}_x2", n1, 0),
            ap1y2=blk(f"{pref}_y2", n1, 1), ap1x2=blk(f"{pref}_x2", n1, 1),
        )

    def stage2(pref, x1):
        return ovs_mod.HalfbandState(
            ap0=blk(f"{pref}_yo", n2, 0), ap0x=blk(f"{pref}_xo", n2, 0),
            ap1=blk(f"{pref}_yo", n2, 1), ap1x=blk(f"{pref}_xo", n2, 1),
            x1=x1,
            ap0y2=blk(f"{pref}_ye", n2, 0), ap0x2=blk(f"{pref}_xe", n2, 0),
            ap1y2=blk(f"{pref}_ye", n2, 1), ap1x2=blk(f"{pref}_xe", n2, 1),
        )

    new_ovs = ovs_mod.OversamplerState(
        up1=stage1("u1", ovs.up1.x1),
        up2=stage2("u2", ovs.up2.x1),
        down2=stage2("d2", col("d2_x1")),
        down1=stage1("d1", col("d1_x1")),
    )
    return new_ovs, col("dc_x1"), col("dc_y1")


# --- kick kernel A: sources ----------------------------------------------------

# kick param indices (instruments/kick.py PARAM_NAMES order)
_KP = dict(
    frequency=0, punch=1, sub=2, click=3, oscillator_decay=4,
    pitch_envelope_amount=5, pitch_envelope_curve=6, volume=7,
    pitch_start_ratio=8, phase_mod_amount=9, noise_amount=10,
    noise_cutoff=11, noise_resonance=12, overdrive=13, feedback=14,
    feedback_cutoff=15, amp_decay=16, amp_decay_curve=17, tuning=18,
)
_KICK_NP = len(_KP)

#: latch rows in the [V, 6] latch state (kernel A I/O order)
_LAT = dict(velocity=0, pitch_mult=1, pitch_curve=2, amp_decay=3,
            amp_curve=4, pm_active=5)
#: filter-state rows in the [V, 6] state (click one-pole, SVF ic1/ic2,
#: pink poles 0-2)
_FST = dict(click=0, ic1=1, ic2=2, p0=3, p1=4, p2=5)


def _denorm(x, lo, hi):
    return lo + jnp.clip(x, 0.0, 1.0) * (hi - lo)


def _kick_a_kernel(cur_ref, tgt_ref, off_ref, vel_ref, trig_ref, lat_ref,
                   fst_ref, bs_ref,
                   total_ref, ampsc_ref, ncur_ref, nlat_ref, ntrig_ref,
                   nfst_ref, *, sr, coeff, max_harmonics, B, seed):
    Vp = cur_ref.shape[0]
    q = np.float32(1.0 - coeff)   # VoiceBlock.q, exactly
    n = jax.lax.broadcasted_iota(jnp.int32, (Vp, B), 1)
    nf1 = n[0:1].astype(jnp.float32) + 1.0                     # [1, B]
    powq = jnp.power(q, nf1)                                   # VoiceBlock.powers

    off = off_ref[...]                                         # [Vp, 1] i32
    has = off < B
    after = (n >= off) & has
    at_trig = (n == off) & has
    bs = bs_ref[0]
    offf = jnp.clip(off, 0, B).astype(jnp.float32)
    qoff = jnp.power(q, offf)                                  # [Vp, 1]

    def ptraj(name):
        i = _KP[name]
        c, t = cur_ref[:, i:i + 1], tgt_ref[:, i:i + 1]
        d = (c - t) * powq
        return t + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)       # [Vp, B]

    def vat(name):
        i = _KP[name]
        c, t = cur_ref[:, i:i + 1], tgt_ref[:, i:i + 1]
        d = (c - t) * qoff
        return t + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)       # [Vp, 1]

    def eff(new, old):
        return jnp.where(after, new, old)                      # [Vp, B]

    def latch(new, old):
        return jnp.where(has, new, old)                        # [Vp, 1]

    # --- trigger-time snapshots (kick.rs:971-1086) --------------------------
    vel_new = jnp.clip(vel_ref[...], 0.0, 1.0)
    pea = vat("pitch_envelope_amount")
    psr = _denorm(vat("pitch_start_ratio"), 1.0, 10.0)
    pitch_mult_new = 1.0 + (psr - 1.0) * pea
    pc = _denorm(vat("pitch_envelope_curve"), 0.1, 4.0)
    pitch_curve_new = jnp.where(jnp.abs(pc - 1.0) < 0.01, 1.0, pc)
    decay_scale_new = 1.0 - 0.5 * vel_new * vel_new
    ad = _denorm(vat("amp_decay"), 0.0, 4.0) * decay_scale_new
    ac = _denorm(vat("amp_decay_curve"), 0.1, 10.0)
    amp_curve_new = jnp.where(jnp.abs(ac - 1.0) < 0.01, 1.0, ac)
    pm_active_new = (vat("phase_mod_amount") > 0.001).astype(jnp.float32)

    lat = lat_ref[...]
    vel = eff(vel_new, lat[:, _LAT["velocity"]:_LAT["velocity"] + 1])
    pitch_mult = eff(pitch_mult_new, lat[:, _LAT["pitch_mult"]:_LAT["pitch_mult"] + 1])
    pitch_curve = eff(pitch_curve_new, lat[:, _LAT["pitch_curve"]:_LAT["pitch_curve"] + 1])
    amp_decay_s = eff(ad, lat[:, _LAT["amp_decay"]:_LAT["amp_decay"] + 1])
    amp_curve = eff(amp_curve_new, lat[:, _LAT["amp_curve"]:_LAT["amp_curve"] + 1])
    pm_active = eff(pm_active_new, lat[:, _LAT["pm_active"]:_LAT["pm_active"] + 1])

    trig_eff = jnp.where(after, bs + off, trig_ref[...])
    elapsed_i = (bs + n) - trig_eff
    idx_f = elapsed_i.astype(jnp.float32)
    elapsed = idx_f * np.float32(1.0 / sr)

    # --- live smoothed params (kick.rs:1097-1232) ---------------------------
    decay_scale = 1.0 - 0.5 * vel * vel
    base_decay = _denorm(ptraj("oscillator_decay"), 0.01, 4.0) * decay_scale
    # core/dsp.py tuning_to_multiplier, op-for-op
    semitones = (jnp.clip(ptraj("tuning"), 0.0, 1.0) - 0.5) * 24.0
    tune_mult = jnp.exp2(semitones * (1.0 / 12.0))
    base_freq = _denorm(ptraj("frequency"), 30.0, 120.0) * tune_mult

    pitch_env = _adsr_amp(elapsed, 0.001, base_decay, 0.0, 1.0, pitch_curve)
    fmult = 1.0 + (pitch_mult - 1.0) * pitch_env
    pm_amt = ptraj("phase_mod_amount")
    pm_env = _phase_mod_env(elapsed, pm_active > 0.5)
    fmult = fmult * jnp.where(pm_amt > 0.001, 1.0 + pm_env * pm_amt * 2.0, 1.0)

    osc_env = _adsr_amp(elapsed, 0.001, base_decay, 0.0, 1.0, 1.0)
    # ops/osc.py sine: sin(idx * f * (TWO_PI / sr)), f built first
    sub_out = jnp.sin(idx_f * (base_freq * fmult) * (2.0 * np.pi / sr))
    sub_out = sub_out * osc_env * ptraj("sub")

    if max_harmonics > 0:
        punch_out = (
            _triangle_additive(idx_f, base_freq * 2.5 * fmult, sr, max_harmonics)
            * osc_env * (ptraj("punch") * 0.7)
        )
    else:
        punch_out = jnp.zeros_like(sub_out)

    click_env = _adsr_amp(elapsed, 0.001, base_decay * 0.2, 0.0, 1.0, 1.0)
    click_vel_scale = 0.6 + 0.4 * vel
    # ops/osc.py noise hashes floor(idx_f); the pink source hashes the raw
    # integer counter — two distinct streams, as in the XLA path
    as_u32 = lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32)
    click_white = _white(as_u32(jnp.floor(idx_f).astype(jnp.int32)), seed)
    pink_white = _white(as_u32(elapsed_i), seed)
    click_raw = click_white * click_env * (
        ptraj("click") * 0.15 * click_vel_scale)

    # cheap resonant HP at 8 kHz / res 4 (resonant_highpass.rs:22-53)
    alpha = np.float32(1.0 - np.exp(-2.0 * np.pi * 8000.0 / sr))
    A = jnp.where(at_trig, 0.0, np.float32(1.0 - alpha))
    click_y0 = fst_ref[:, _FST["click"]:_FST["click"] + 1]
    click_y = _affine_scan(A, alpha * click_raw, click_y0)
    s_prev = jnp.where(at_trig, 0.0, _shift_right(click_y, 1, click_y0))
    click_out = (click_raw - s_prev) * np.float32(1.0 + 4.0 * 0.1)

    # --- pink-noise layer (kick.rs:1174-1193) --------------------------------
    # ops/noise.py pink_block: outs[0] + outs[1] + outs[2] + w*DIRECT, *OUT
    poles, gains = noise_mod.coefficients(sr)
    youts = []
    pstate = []
    for i in range(3):
        Ai = jnp.where(at_trig, 0.0, np.float32(poles[i]))
        y = _affine_scan(Ai, np.float32(gains[i]) * pink_white,
                         fst_ref[:, _FST["p0"] + i:_FST["p0"] + i + 1])
        youts.append(y)
        pstate.append(y[:, -1:])
    pink = (youts[0] + youts[1] + youts[2]
            + pink_white * noise_mod.DIRECT_GAIN) * noise_mod.OUTPUT_GAIN

    noise_cut = _denorm(ptraj("noise_cutoff"), 20.0, 10_000.0)
    noise_res = _denorm(ptraj("noise_resonance"), 0.0, 5.0)
    # ops/filters.py svf_coeffs, op-for-op
    cutoff = jnp.clip(noise_cut, 20.0, min(20_000.0, sr * 0.45))
    g = jnp.tan(np.pi * cutoff / sr)
    r = 1.0 / jnp.clip(noise_res, 0.5, 10.0)
    h = 1.0 / (1.0 + r * g + g * g)
    v1, v2, ic1_l, ic2_l = _svf_tpt_reset(
        pink, g, h, at_trig,
        fst_ref[:, _FST["ic1"]:_FST["ic1"] + 1],
        fst_ref[:, _FST["ic2"]:_FST["ic2"] + 1])
    noise_filtered = jnp.where(jnp.abs(v2) < 1e-15, 0.0, v2)
    noise_env = _adsr_amp(elapsed, 0.001, base_decay, 0.0, 1.0, 1.0)
    noise_amt = ptraj("noise_amount")
    noise_out = jnp.where(
        noise_amt > 0.001, noise_filtered * noise_env * noise_amt * 0.5, 0.0)

    total_ref[...] = sub_out + punch_out + click_out + noise_out

    # --- master amplitude scale (kick.rs:1264-1284) --------------------------
    dmax = jnp.maximum(amp_decay_s, 0.001)
    amp_env = _adsr_amp(elapsed, 0.001, dmax, 0.0, 0.5, amp_curve)
    ampsc_ref[...] = amp_env * jnp.sqrt(vel) * ptraj("volume")

    # --- state advance (VoiceBlock.advance_bank: q ** f32(B), in numpy) ------
    dB = (cur_ref[...] - tgt_ref[...]) * (q ** np.float32(B))
    ncur_ref[...] = tgt_ref[...] + jnp.where(jnp.abs(dB) < 1e-4, 0.0, dB)
    nlat = [None] * 6
    nlat[_LAT["velocity"]] = latch(vel_new, lat[:, 0:1])
    nlat[_LAT["pitch_mult"]] = latch(pitch_mult_new, lat[:, 1:2])
    nlat[_LAT["pitch_curve"]] = latch(pitch_curve_new, lat[:, 2:3])
    nlat[_LAT["amp_decay"]] = latch(ad, lat[:, 3:4])
    nlat[_LAT["amp_curve"]] = latch(amp_curve_new, lat[:, 4:5])
    nlat[_LAT["pm_active"]] = latch(pm_active_new, lat[:, 5:6])
    for i, v in enumerate(nlat):
        nlat_ref[:, i:i + 1] = v
    ntrig_ref[...] = jnp.where(has, bs + off, trig_ref[...])
    nfst_ref[:, _FST["click"]:_FST["click"] + 1] = click_y[:, -1:]
    nfst_ref[:, _FST["ic1"]:_FST["ic1"] + 1] = ic1_l
    nfst_ref[:, _FST["ic2"]:_FST["ic2"] + 1] = ic2_l
    for i in range(3):
        nfst_ref[:, _FST["p0"] + i:_FST["p0"] + i + 1] = pstate[i]


# --- kick kernel B: 4x-oversampled drive + amp ---------------------------------


def _kick_b_kernel(total_ref, comps_ref, ampsc_ref, cur_ref, tgt_ref,
                   st_ref, filt_ref,
                   out_ref, nst_ref, nfilt_ref, *, sr, coeff, B):
    Vp = total_ref.shape[0]
    q = np.float32(1.0 - coeff)
    nf1 = (jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(jnp.float32)
           + 1.0)
    powq = jnp.power(q, nf1)

    def ptraj(name):
        i = _KP[name]
        c, t = cur_ref[:, i:i + 1], tgt_ref[:, i:i + 1]
        d = (c - t) * powq
        return t + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)

    x = total_ref[...]
    od = ptraj("overdrive")
    drive = 1.0 + od * od * od * 40.0
    # effects/feedback_waveshaper.py filter_coeff, op-for-op
    fbc_hz = 200.0 + ptraj("feedback_cutoff") * 3800.0
    fbc = jnp.clip(1.0 - jnp.exp(-2.0 * np.pi * fbc_hz / sr), 0.0, 0.9)

    comp_signed = comps_ref[...]
    bypass = comp_signed < 0.0
    comp = jnp.abs(comp_signed)

    ld, lds, stv, stvs = _accessors_h(st_ref, nst_ref, Vp)
    shaped = _ovs4_pipeline(drive * x, jnp.tanh, ld, stv, lds, stvs)
    compensated = shaped * comp
    dc = jnp.where(bypass, 0.0, _dc_block_h(compensated, bypass, lds, stvs))

    # feedback-filter bookkeeping (loop gain 0 on this path)
    filt = _affine_scan(
        jnp.where(bypass, 1.0, 1.0 - fbc),
        jnp.where(bypass, 0.0, fbc * dc), filt_ref[...])
    filt = jnp.where(jnp.abs(filt) < 1e-15, 0.0, filt)
    nfilt_ref[...] = filt[:, -1:]

    out = jnp.where(bypass, x, dc)          # mix == 1 on the kick drive
    out_ref[...] = out * ampsc_ref[...]


# --- host-side dispatch ---------------------------------------------------------


def _pad_rows(a, Vp, fill=0.0):
    V = a.shape[0]
    if V == Vp:
        return jnp.asarray(a)
    pad = jnp.full((Vp - V,) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([jnp.asarray(a), pad], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "sample_rate", "block_size", "smooth_coeff", "max_harmonics", "interpret"))
def kick_render_fused(state, trig_offset, trig_velocity, block_start, *,
                      sample_rate, block_size, smooth_coeff,
                      max_harmonics=128, interpret=None):
    """Fused-kernel kick bank block; the XLA twin is kick.render_block.

    Eligibility (callers gate): single-trigger offsets ([V]), no overrides,
    feedback_path=False, os_mode=4, V <= MAX_FUSED_VOICES.

    Returns ``(new_state, out[V, B])`` exactly like render_block.
    """
    from libgooey_tpu.effects import feedback_waveshaper as fbws
    from libgooey_tpu.instruments import kick as kick_mod
    from libgooey_tpu.ops import pallas_fx

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = block_size
    V = state.trig_sample.shape[0]
    Vp = max(8, ((V + 7) // 8) * 8)

    cur = _pad_rows(state.params.current, Vp, 0.5)
    tgt = _pad_rows(state.params.target, Vp, 0.5)
    off = _pad_rows(jnp.asarray(trig_offset, jnp.int32)[:, None], Vp, B)
    vel = _pad_rows(jnp.asarray(trig_velocity, jnp.float32)[:, None], Vp)
    trig = _pad_rows(state.trig_sample[:, None], Vp,
                     np.int32(-(2 ** 30)))
    lat = _pad_rows(jnp.stack([
        state.velocity, state.pitch_mult, state.pitch_curve,
        state.amp_decay, state.amp_curve, state.pm_active], axis=1), Vp, 1.0)
    fst = _pad_rows(jnp.concatenate([
        state.click_hp.y[:, None], state.noise_svf.ic1[:, None],
        state.noise_svf.ic2[:, None], state.pink.fstate], axis=1), Vp)
    bs = jnp.asarray(block_start, jnp.int32).reshape(1)

    kern_a = functools.partial(
        _kick_a_kernel, sr=float(sample_rate), coeff=float(smooth_coeff),
        max_harmonics=int(max_harmonics), B=B, seed=0x9ABCDEF0)
    total, ampsc, ncur, nlat, ntrig, nfst = pl.pallas_call(
        kern_a,
        out_shape=(
            jax.ShapeDtypeStruct((Vp, B), jnp.float32),
            jax.ShapeDtypeStruct((Vp, B), jnp.float32),
            jax.ShapeDtypeStruct((Vp, _KICK_NP), jnp.float32),
            jax.ShapeDtypeStruct((Vp, 6), jnp.float32),
            jax.ShapeDtypeStruct((Vp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Vp, 6), jnp.float32),
        ),
        in_specs=[_vmem()] * 7 + [
            pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(_vmem(),) * 6,
        interpret=interpret,
    )(cur, tgt, off, vel, trig, lat, fst, bs)

    # --- envelope follower + makeup gain (XLA + env bank kernel) -----------
    q = np.float32(1.0 - smooth_coeff)
    powq = q ** jnp.arange(1, B + 1, dtype=jnp.float32)

    def traj(idx):
        d = (cur[:V, idx, None] - tgt[:V, idx, None]) * powq
        return tgt[:V, idx, None] + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)

    od = traj(_KP["overdrive"])
    drive = 1.0 + od * od * od * 40.0
    fb = traj(_KP["feedback"]) * 0.98
    bypass = drive <= 1.0          # mix is 1.0: bypass iff drive <= 1
    att, rel = fbws.env_coeffs(sample_rate)
    env, env_last = pallas_fx.env_follow_bank(
        jnp.abs(total[:V]), bypass, state.shaper.env,
        att=float(att), rel=float(rel), interpret=interpret)
    comp = fbws.gain_compensation(env, drive, fb)
    comp_signed = jnp.where(bypass, -1.0, comp)

    packed = pack_voice_ovs(state.shaper.ovs, state.shaper.dc_x1,
                            state.shaper.dc_y1)
    packed = jnp.concatenate([
        packed[:V], jnp.zeros((Vp - V, packed.shape[1]), jnp.float32),
        packed[V:], jnp.zeros((Vp - V, packed.shape[1]), jnp.float32),
    ], axis=0) if Vp != V else packed
    filt0 = _pad_rows(state.shaper.filter_state[:, None], Vp)

    kern_b = functools.partial(
        _kick_b_kernel, sr=float(sample_rate), coeff=float(smooth_coeff), B=B)
    out, nst, nfilt = pl.pallas_call(
        kern_b,
        out_shape=(
            jax.ShapeDtypeStruct((Vp, B), jnp.float32),
            jax.ShapeDtypeStruct((2 * Vp, _K_OUT), jnp.float32),
            jax.ShapeDtypeStruct((Vp, 1), jnp.float32),
        ),
        in_specs=[_vmem()] * 7,
        out_specs=(_vmem(),) * 3,
        interpret=interpret,
    )(total, _pad_rows(comp_signed, Vp, -1.0), ampsc, cur, tgt, packed, filt0)

    if Vp != V:
        nst = jnp.concatenate([nst[:V], nst[Vp:Vp + V]], axis=0)
    new_ovs, dc_x1, dc_y1 = unpack_voice_ovs(nst, V, state.shaper.ovs)
    filt_last = nfilt[:V, 0]

    from libgooey_tpu.core.smoother import SmootherBank
    from libgooey_tpu.ops import filters as filt_mod
    from libgooey_tpu.ops import noise as _noise

    new_state = kick_mod.KickState(
        params=SmootherBank(current=ncur[:V], target=state.params.target),
        trig_sample=ntrig[:V, 0],
        velocity=nlat[:V, _LAT["velocity"]],
        pitch_mult=nlat[:V, _LAT["pitch_mult"]],
        pitch_curve=nlat[:V, _LAT["pitch_curve"]],
        amp_decay=nlat[:V, _LAT["amp_decay"]],
        amp_curve=nlat[:V, _LAT["amp_curve"]],
        pm_active=nlat[:V, _LAT["pm_active"]],
        click_hp=filt_mod.OnePoleState(y=nfst[:V, _FST["click"]]),
        noise_svf=filt_mod.SVFState(ic1=nfst[:V, _FST["ic1"]],
                                    ic2=nfst[:V, _FST["ic2"]]),
        pink=_noise.PinkState(fstate=nfst[:V, _FST["p0"]:_FST["p0"] + 3]),
        shaper=fbws.FBShaperState(
            last_out=filt_last, filter_state=filt_last,
            dc_x1=dc_x1, dc_y1=dc_y1, env=env_last, ovs=new_ovs),
    )
    return new_state, out[:V]
