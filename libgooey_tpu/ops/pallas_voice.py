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
    _scan_const,
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


#: voice rows per additive-triangle grid tile: [TV, B] x 3 live arrays x
#: ~4 loop temporaries stays ~1.5 MB of VMEM at B=512
_TRI_TILE = 128


def _tri_bank_kernel(idx_ref, freq_ref, out_ref, *, sr, max_harmonics):
    out_ref[...] = _triangle_additive(
        idx_ref[...], freq_ref[...], np.float32(sr), max_harmonics)


def triangle_additive_bank(idx_f, freq, sr, max_harmonics: int,
                           interpret=None):
    """Gridded [V, B] additive-triangle bank (ops/osc.py semantics).

    The XLA formulation runs the 2-term Chebyshev recurrence as a
    ``fori_loop`` whose [V, B] carries round-trip HBM every harmonic —
    ~570 MB of traffic for a 1,024-voice 64-harmonic snare block
    (~1.6 ms/block, the whole five-family kit's dominant cost at target
    scale).  Here each 128-voice tile keeps the recurrence resident in
    VMEM: total HBM traffic is the three [V, B] operands once.  The loop
    body is byte-identical to the XLA path's (`_triangle_additive` is the
    shared in-kernel helper the fused voice kernels already use); the
    only deviation is Mosaic's vector sin/cos vs XLA libm (~1e-6, same
    as every fused voice kernel twin).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, B = idx_f.shape
    # operate on [B, V] (voices on lanes): the engine's logical [V, B]
    # arrays are physically B-major (propagated from the bank kernels'
    # [B, G, 128] outputs) — a V-major kernel here forces a whole-graph
    # relayout around the custom call (measured 3.5x on the full kit;
    # same rule as _bank_tilt)
    TV = min(_TRI_TILE, max(128, ((V + 127) // 128) * 128))
    Vp = ((V + TV - 1) // TV) * TV
    xT = jnp.asarray(idx_f, jnp.float32).T
    fT = jnp.asarray(freq, jnp.float32).T
    if Vp != V:
        xT = jnp.pad(xT, ((0, 0), (0, Vp - V)))
        fT = jnp.pad(fT, ((0, 0), (0, Vp - V)), constant_values=1.0)
    out = pl.pallas_call(
        functools.partial(_tri_bank_kernel, sr=float(sr),
                          max_harmonics=int(max_harmonics)),
        grid=(Vp // TV,),
        out_shape=jax.ShapeDtypeStruct((B, Vp), jnp.float32),
        in_specs=[pl.BlockSpec((B, TV), lambda i: (0, i)),
                  pl.BlockSpec((B, TV), lambda i: (0, i))],
        out_specs=pl.BlockSpec((B, TV), lambda i: (0, i)),
        interpret=interpret,
    )(xT, fT)
    return out[:, :V].T


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


class _Ctx:
    """Shared in-kernel trigger/latch/trajectory context (VoiceBlock's
    single-trigger mode, op-for-op).  All refs are [Vp, ...] row-padded."""

    def __init__(self, cur_ref, tgt_ref, off_ref, trig_ref, bs, kp, coeff,
                 B, sr):
        Vp = cur_ref.shape[0]
        self.kp = kp
        self.B = B
        self.q = np.float32(1.0 - coeff)
        self.cur, self.tgt = cur_ref[...], tgt_ref[...]
        self.n = jax.lax.broadcasted_iota(jnp.int32, (Vp, B), 1)
        nf1 = self.n[0:1].astype(jnp.float32) + 1.0
        self.powq = jnp.power(self.q, nf1)
        self.off = off_ref[...]                       # [Vp, 1] i32
        self.has = self.off < B
        self.after = (self.n >= self.off) & self.has
        self.at_trig = (self.n == self.off) & self.has
        self.bs = bs
        offf = jnp.clip(self.off, 0, B).astype(jnp.float32)
        self.qoff = jnp.power(self.q, offf)
        self.trig_prev = trig_ref[...]                # [Vp, 1] i32
        trig_eff = jnp.where(self.after, bs + self.off, self.trig_prev)
        self.elapsed_i = (bs + self.n) - trig_eff
        self.idx_f = self.elapsed_i.astype(jnp.float32)
        self.elapsed = self.idx_f * np.float32(1.0 / sr)

    def ptraj(self, name):
        i = self.kp[name]
        c, t = self.cur[:, i:i + 1], self.tgt[:, i:i + 1]
        d = (c - t) * self.powq
        return t + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)

    def vat(self, name):
        i = self.kp[name]
        c, t = self.cur[:, i:i + 1], self.tgt[:, i:i + 1]
        d = (c - t) * self.qoff
        return t + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)

    def eff(self, new, old_col):
        return jnp.where(self.after, new, old_col)

    def latch(self, new, old_col):
        return jnp.where(self.has, new, old_col)

    def advance(self):
        d = (self.cur - self.tgt) * (self.q ** np.float32(self.B))
        return self.tgt + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)

    def new_trig(self):
        return jnp.where(self.has, self.bs + self.off, self.trig_prev)


def _tuning_mult(traj):
    """core/dsp.py tuning_to_multiplier, op-for-op."""
    semitones = (jnp.clip(traj, 0.0, 1.0) - 0.5) * 24.0
    return jnp.exp2(semitones * (1.0 / 12.0))


def _phase_cumsum_reset(inc, reset, carry_col):
    """ops/scan.py phase_cumsum_reset in lane-scan form.

    The split-increment exactness argument carries over unchanged; the only
    reassociation is the tiny residual cumsum (inc - inc0, ~1e-9/sample for
    smoothed frequency trajectories).  The base latch's coefficients are in
    {0, 1} so its Hillis-Steele scan is exact.
    """
    B = inc.shape[-1]
    n1 = (jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(jnp.float32)
          + 1.0)
    reset_f = reset.astype(jnp.float32) if reset.dtype != jnp.float32 else reset
    inc0 = inc[:, 0:1]
    hi = jnp.floor(inc0 * 2048.0) * jnp.float32(1.0 / 2048.0)
    lo = inc0 - hi
    ramp_hi = hi * n1
    ramp_hi = ramp_hi - jnp.floor(ramp_hi)
    ramp = ramp_hi + lo * n1
    ones = jnp.ones(inc.shape, jnp.float32)
    resid = _affine_scan(ones, inc - inc0, jnp.zeros_like(inc0))
    p = jnp.mod(ramp + resid, 1.0)
    p_prev = _shift_right(p, 1, 0.0)
    base = _affine_scan(1.0 - reset_f, reset_f * p_prev, -carry_col)
    return jnp.mod(p - base, 1.0)


def _waveshape_fn(drive):
    """effects/waveshaper.py process()'s fn, for _ovs4_pipeline (drive is
    the engine-rate [V, B] trajectory; each sample's four phases see the
    same value, exactly repeat_to_rate's semantics)."""
    drive4 = jnp.concatenate([drive, drive], axis=0)
    d = jnp.maximum(drive4, 1.0 + 1e-6)
    compensation = jnp.tanh(0.5) / jnp.tanh(0.5 * d)

    def fn(v):
        return jnp.tanh(v * d) * compensation

    return fn


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


class _Phase:
    """One family's contribution to a merged pallas_call.

    The composed product kit is LAUNCH-bound: each in-graph pallas call
    costs ~20 us regardless of its work (measured by scaling identical
    hihat2 banks), so the five family source kernels and the two drive
    kernels merge into ONE call each via :func:`_mega_pallas`.  A phase
    records the family's kernel body, its VMEM operands, its output
    shapes, and where the shared SMEM ``block_start`` ref slots into the
    kernel's positional ref list (None = kernel takes no bs).
    """

    def __init__(self, kern, ins, out_shapes, bs_index):
        self.kern = kern
        self.ins = list(ins)
        self.out_shapes = tuple(out_shapes)
        self.bs_index = bs_index


def _mega_pallas(phases, bs, interpret):
    """Run several family kernels as ONE pallas_call; returns per-phase
    output tuples.  Each phase's kernel body executes sequentially inside
    the merged kernel on its own ref subset — bodies are unchanged, so
    twin equality per family is preserved exactly."""
    all_ins = [a for ph in phases for a in ph.ins]
    n_in = len(all_ins)
    out_shapes = tuple(s for ph in phases for s in ph.out_shapes)
    counts = [(len(ph.ins), len(ph.out_shapes), ph.kern, ph.bs_index)
              for ph in phases]

    def body(*refs):
        ins = refs[:n_in]
        bs_ref = refs[n_in]
        outs = refs[n_in + 1:]
        i = o = 0
        for n_i, n_o, kern, bsi in counts:
            args = list(ins[i:i + n_i])
            if bsi is not None:
                args.insert(bsi, bs_ref)
            kern(*(args + list(outs[o:o + n_o])))
            i += n_i
            o += n_o

    flat = pl.pallas_call(
        body,
        out_shape=out_shapes,
        in_specs=[_vmem()] * n_in + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(_vmem(),) * len(out_shapes),
        interpret=interpret,
    )(*(all_ins + [jnp.asarray(bs, jnp.int32).reshape(1)]))
    if len(out_shapes) == 1:
        flat = (flat,)
    res, o = [], 0
    for ph in phases:
        res.append(tuple(flat[o:o + len(ph.out_shapes)]))
        o += len(ph.out_shapes)
    return res


def _kick_phase_a(state, trig_offset, trig_velocity, B, sr, coeff,
                  max_harmonics):
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

    kern_a = functools.partial(
        _kick_a_kernel, sr=float(sr), coeff=float(coeff),
        max_harmonics=int(max_harmonics), B=B, seed=0x9ABCDEF0)
    shapes = (
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, _KICK_NP), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 6), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 1), jnp.int32),
        jax.ShapeDtypeStruct((Vp, 6), jnp.float32),
    )
    ins = [cur, tgt, off, vel, trig, lat, fst]
    return _Phase(kern_a, ins, shapes, len(ins)), dict(V=V, Vp=Vp, cur=cur,
                                                       tgt=tgt)


def _kick_phase_m(state, ctx, outs_a, sr, coeff, B, interpret):
    """Envelope follower + makeup gain between kernels A and B; returns
    kick's B-kernel phase and the middle context."""
    from libgooey_tpu.effects import feedback_waveshaper as fbws
    from libgooey_tpu.ops import pallas_fx

    V, Vp, cur, tgt = ctx["V"], ctx["Vp"], ctx["cur"], ctx["tgt"]
    sample_rate, smooth_coeff = sr, coeff
    total, ampsc, ncur, nlat, ntrig, nfst = outs_a
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
    shapes_b = (
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((2 * Vp, _K_OUT), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 1), jnp.float32),
    )
    ins_b = [total, _pad_rows(comp_signed, Vp, -1.0), ampsc, cur, tgt,
             packed, filt0]
    phase_b = _Phase(kern_b, ins_b, shapes_b, None)
    return phase_b, dict(bypass=bypass, env_last=env_last)


def _kick_finish(state, ctx, mctx, outs_a, outs_b):
    from libgooey_tpu.effects import feedback_waveshaper as fbws
    from libgooey_tpu.instruments import kick as kick_mod

    V, Vp = ctx["V"], ctx["Vp"]
    _total, _ampsc, ncur, nlat, ntrig, nfst = outs_a
    bypass, env_last = mctx["bypass"], mctx["env_last"]
    out, nst, nfilt = outs_b

    if Vp != V:
        nst = jnp.concatenate([nst[:V], nst[Vp:Vp + V]], axis=0)
    new_ovs, dc_x1, dc_y1 = unpack_voice_ovs(nst, V, state.shaper.ovs)
    # exact bypass freeze of the drive oversampler at block granularity
    # (feedback_waveshaper.rs:117-118 early return; effects/freeze.py)
    from libgooey_tpu.effects import freeze as frz

    new_ovs = frz.hold_where(jnp.all(bypass, axis=-1),
                             state.shaper.ovs, new_ovs)
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
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, sr, coeff = block_size, sample_rate, smooth_coeff
    phase_a, ctx = _kick_phase_a(state, trig_offset, trig_velocity, B, sr,
                                 coeff, max_harmonics)
    (outs_a,) = _mega_pallas([phase_a], block_start, interpret)
    phase_b, mctx = _kick_phase_m(state, ctx, outs_a, sr, coeff, B, interpret)
    (outs_b,) = _mega_pallas([phase_b], block_start, interpret)
    return _kick_finish(state, ctx, mctx, outs_a, outs_b)

# --- snare: sources kernel + (sequential Chamberlin) + drive kernel ------------

# snare param indices (instruments/snare.py PARAM_NAMES order)
_SP = dict(
    frequency=0, tonal=1, noise=2, brightness=3, decay=4, pitch_drop=5,
    volume=6, tonal_decay=7, tonal_decay_curve=8, noise_decay=9,
    noise_tail_decay=10, filter_cutoff=11, filter_resonance=12, xfade=13,
    phase_mod_amount=14, overdrive=15, amp_decay=16, amp_decay_curve=17,
    tuning=18,
)
_SNARE_NP = len(_SP)
_SLAT = dict(velocity=0, pitch_mult=1, amp_curve=2, tonal_curve=3,
             amp_decay=4, pm_active=5)


def _snare_a_kernel(cur_ref, tgt_ref, off_ref, vel_ref, trig_ref, lat_ref,
                    bs_ref,
                    dry_ref, nraw_ref, ncur_ref, nlat_ref, ntrig_ref,
                    *, sr, coeff, max_harmonics, B, seed):
    ctx = _Ctx(cur_ref, tgt_ref, off_ref, trig_ref, bs_ref[0], _SP, coeff,
               B, sr)
    lat = lat_ref[...]

    # --- trigger snapshots (snare.rs:873-1027) --------------------------------
    vel_new = jnp.clip(vel_ref[...], 0.0, 1.0)
    decay_scale_new = 1.0 - 0.45 * vel_new * vel_new
    pitch_mult_new = 1.0 + ctx.vat("pitch_drop") * 1.5
    tc = _denorm(ctx.vat("tonal_decay_curve"), 0.1, 10.0)
    ad = _denorm(ctx.vat("amp_decay"), 0.0, 4.0) * decay_scale_new
    ac = _denorm(ctx.vat("amp_decay_curve"), 0.1, 10.0)
    pm_active_new = (ctx.vat("phase_mod_amount") > 0.001).astype(jnp.float32)

    vel = ctx.eff(vel_new, lat[:, _SLAT["velocity"]:_SLAT["velocity"] + 1])
    pitch_mult = ctx.eff(pitch_mult_new,
                         lat[:, _SLAT["pitch_mult"]:_SLAT["pitch_mult"] + 1])
    tonal_curve = ctx.eff(tc, lat[:, _SLAT["tonal_curve"]:_SLAT["tonal_curve"] + 1])
    pm_active = ctx.eff(pm_active_new,
                        lat[:, _SLAT["pm_active"]:_SLAT["pm_active"] + 1])
    elapsed, idx_f = ctx.elapsed, ctx.idx_f

    # --- live decays (snare.rs:1058-1105) --------------------------------------
    vel2 = vel * vel
    decay_scale = 1.0 - 0.45 * vel2
    pitch_decay_scale = 1.0 - 0.5 * vel2
    scaled_decay = _denorm(ctx.ptraj("decay"), 0.05, 3.5) * decay_scale
    pitch_decay = jnp.minimum(
        scaled_decay * 0.3 * pitch_decay_scale, scaled_decay * 0.25)
    base_freq = _denorm(ctx.ptraj("frequency"), 100.0, 600.0) * _tuning_mult(
        ctx.ptraj("tuning"))

    pitch_env = _adsr_amp(elapsed, 0.001, pitch_decay, 0.0, 1.0, 1.0)
    fmult = 1.0 + (pitch_mult - 1.0) * pitch_env
    pm_amt = ctx.ptraj("phase_mod_amount")
    pm = _phase_mod_env(elapsed, pm_active > 0.5)
    fmult = fmult * jnp.where(pm_amt > 0.001, 1.0 + pm * pm_amt * 1.0, 1.0)

    hold_env = _adsr_amp(elapsed, 0.001, 0.001, 1.0, 1.0, 1.0)

    # --- tonal --------------------------------------------------------------
    if max_harmonics > 0:
        tonal_raw = _triangle_additive(idx_f, base_freq * fmult, sr,
                                       max_harmonics)
    else:
        tonal_raw = jnp.sin(idx_f * (base_freq * fmult) * (2.0 * np.pi / sr))
    tonal_env = _adsr_amp(
        elapsed, 0.001,
        _denorm(ctx.ptraj("tonal_decay"), 0.0, 3.5) * decay_scale,
        0.0, 1.0, tonal_curve)
    xfade = ctx.ptraj("xfade")
    tonal_out = tonal_raw * hold_env * ctx.ptraj("tonal") * tonal_env * (
        1.0 - xfade)

    # --- noise (pre-filter gain; the Chamberlin runs OUTSIDE, sequentially) --
    as_u32 = lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32)
    white = _white(as_u32(jnp.floor(idx_f).astype(jnp.int32)), seed)
    nraw_ref[...] = white * hold_env * (ctx.ptraj("noise") * 0.8)

    # --- crack ----------------------------------------------------------------
    crack_env = _adsr_amp(elapsed, 0.001, scaled_decay * 0.2, 0.0, 1.0, 1.0)
    crack_out = (white * crack_env) * (
        ctx.ptraj("brightness") * 0.4 * (0.7 + 0.3 * vel))

    dry_ref[...] = tonal_out + crack_out

    # --- state advance ----------------------------------------------------------
    ncur_ref[...] = ctx.advance()
    nlat_ref[:, _SLAT["velocity"]:_SLAT["velocity"] + 1] = ctx.latch(
        vel_new, lat[:, 0:1])
    nlat_ref[:, _SLAT["pitch_mult"]:_SLAT["pitch_mult"] + 1] = ctx.latch(
        pitch_mult_new, lat[:, 1:2])
    nlat_ref[:, _SLAT["amp_curve"]:_SLAT["amp_curve"] + 1] = ctx.latch(
        ac, lat[:, 2:3])
    nlat_ref[:, _SLAT["tonal_curve"]:_SLAT["tonal_curve"] + 1] = ctx.latch(
        tc, lat[:, 3:4])
    nlat_ref[:, _SLAT["amp_decay"]:_SLAT["amp_decay"] + 1] = ctx.latch(
        ad, lat[:, 4:5])
    nlat_ref[:, _SLAT["pm_active"]:_SLAT["pm_active"] + 1] = ctx.latch(
        pm_active_new, lat[:, 5:6])
    ntrig_ref[...] = ctx.new_trig()


def _snare_b_kernel(cur_ref, tgt_ref, off_ref, vel_ref, trig_ref, lat_ref,
                    bs_ref, dry_ref, filt_ref, st_ref,
                    out_ref, nst_ref, *, sr, coeff, B):
    ctx = _Ctx(cur_ref, tgt_ref, off_ref, trig_ref, bs_ref[0], _SP, coeff,
               B, sr)
    lat = lat_ref[...]
    Vp = dry_ref.shape[0]
    vel_new = jnp.clip(vel_ref[...], 0.0, 1.0)
    vel = ctx.eff(vel_new, lat[:, _SLAT["velocity"]:_SLAT["velocity"] + 1])
    ad = _denorm(ctx.vat("amp_decay"), 0.0, 4.0) * (
        1.0 - 0.45 * vel_new * vel_new)
    ac = _denorm(ctx.vat("amp_decay_curve"), 0.1, 10.0)
    amp_decay_s = ctx.eff(ad, lat[:, _SLAT["amp_decay"]:_SLAT["amp_decay"] + 1])
    amp_curve = ctx.eff(ac, lat[:, _SLAT["amp_curve"]:_SLAT["amp_curve"] + 1])
    elapsed = ctx.elapsed
    decay_scale = 1.0 - 0.45 * vel * vel

    noise_env = _adsr_amp(
        elapsed, 0.001,
        _denorm(ctx.ptraj("noise_decay"), 0.0, 3.5) * decay_scale,
        0.0, 1.0, 1.0)
    tail_env = _adsr_amp(
        elapsed, 0.001,
        _denorm(ctx.ptraj("noise_tail_decay"), 0.0, 3.5) * decay_scale,
        0.0, 1.0, 1.0)
    xfade = ctx.ptraj("xfade")
    noise_out = filt_ref[...] * (noise_env * 0.7 + tail_env * 0.3) * xfade
    total = dry_ref[...] + noise_out

    # --- overdrive: plain tanh waveshaper at 4x (snare.rs:1166) --------------
    drive = 1.0 + ctx.ptraj("overdrive") * 9.0
    ld, lds, stv, stvs = _accessors_h(st_ref, nst_ref, Vp)
    sat = _ovs4_pipeline(total, _waveshape_fn(drive), ld, stv, lds, stvs)
    wet = total * (1.0 - 1.0) + sat * 1.0      # ws.process with mix == 1.0
    bypass = drive <= 1.0
    shaped = jnp.where(bypass, total, wet)
    shaped = jnp.where(jnp.isfinite(total), shaped, 0.0)

    amp_env = _adsr_amp(elapsed, 0.001, jnp.maximum(amp_decay_s, 0.001),
                        0.0, 1.0, amp_curve)
    out_ref[...] = shaped * amp_env * jnp.sqrt(vel) * ctx.ptraj("volume")


def _snare_phase_a(state, trig_offset, trig_velocity, B, sr, coeff,
                   max_harmonics):
    V = state.trig_sample.shape[0]
    Vp = max(8, ((V + 7) // 8) * 8)

    cur = _pad_rows(state.params.current, Vp, 0.5)
    tgt = _pad_rows(state.params.target, Vp, 0.5)
    off = _pad_rows(jnp.asarray(trig_offset, jnp.int32)[:, None], Vp, B)
    vel = _pad_rows(jnp.asarray(trig_velocity, jnp.float32)[:, None], Vp)
    trig = _pad_rows(state.trig_sample[:, None], Vp, np.int32(-(2 ** 30)))
    lat = _pad_rows(jnp.stack([
        state.velocity, state.pitch_mult, state.amp_curve, state.tonal_curve,
        state.amp_decay, state.pm_active], axis=1), Vp, 1.0)

    kern_a = functools.partial(
        _snare_a_kernel, sr=float(sr), coeff=float(coeff),
        max_harmonics=int(max_harmonics), B=B, seed=0x9ABCDEF0)
    shapes = (
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, _SNARE_NP), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 6), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 1), jnp.int32),
    )
    ins = [cur, tgt, off, vel, trig, lat]
    ctx = dict(V=V, Vp=Vp, cur=cur, tgt=tgt, off=off, vel=vel, trig=trig,
               lat=lat)
    return _Phase(kern_a, ins, shapes, len(ins)), ctx


def _snare_phase_m(state, ctx, outs_a, trig_offset, sr, coeff, B, interpret):
    """Chamberlin SVF (sequential linrec2 bank) + tap select between the
    source and drive kernels; returns snare's B-kernel phase."""
    from libgooey_tpu.instruments import snare as snare_mod
    from libgooey_tpu.ops import filters as filt_mod

    V, Vp, cur, tgt = ctx["V"], ctx["Vp"], ctx["cur"], ctx["tgt"]
    sample_rate, smooth_coeff = sr, coeff
    dry, nraw, ncur, nlat, ntrig = outs_a
    q = np.float32(1.0 - smooth_coeff)
    powq = q ** jnp.arange(1, B + 1, dtype=jnp.float32)

    def traj(idx):
        d = (cur[:V, idx, None] - tgt[:V, idx, None]) * powq
        return tgt[:V, idx, None] + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)

    cutoff = 100.0 + jnp.clip(traj(_SP["filter_cutoff"]), 0.0, 1.0) * (
        10_000.0 - 100.0)
    res = 0.5 + jnp.clip(traj(_SP["filter_resonance"]), 0.0, 1.0) * (10.0 - 0.5)
    offs_v = jnp.asarray(trig_offset, jnp.int32)[:, None]
    at_trig = ((jnp.arange(B, dtype=jnp.int32)[None, :] == offs_v)
               & (offs_v < B))
    svf_state, lo, bp, hp, notch = filt_mod.chamberlin_block(
        state.noise_svf, nraw[:V], cutoff, res, sample_rate, reset=at_trig)
    ft = state.filter_type[:, None]
    filtered = jnp.where(
        ft == snare_mod.FILTER_LP, lo,
        jnp.where(ft == snare_mod.FILTER_HP, hp,
                  jnp.where(ft == snare_mod.FILTER_NOTCH, notch, bp)))

    packed = pack_voice_ovs(
        state.ovs, jnp.zeros((V,), jnp.float32), jnp.zeros((V,), jnp.float32))
    if Vp != V:
        z = jnp.zeros((Vp - V, packed.shape[1]), jnp.float32)
        packed = jnp.concatenate([packed[:V], z, packed[V:], z], axis=0)

    kern_b = functools.partial(
        _snare_b_kernel, sr=float(sample_rate), coeff=float(smooth_coeff), B=B)
    shapes_b = (
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((2 * Vp, _K_OUT), jnp.float32),
    )
    # snare's B kernel takes bs between its 6 state refs and the 3 signal
    # refs (index 6 of the positional ref list)
    ins_b = [ctx["cur"], ctx["tgt"], ctx["off"], ctx["vel"], ctx["trig"],
             ctx["lat"], dry, _pad_rows(filtered, Vp), packed]
    phase_b = _Phase(kern_b, ins_b, shapes_b, 6)
    od = traj(_SP["overdrive"])
    return phase_b, dict(svf_state=svf_state, od=od)


def _snare_finish(state, ctx, mctx, outs_a, outs_b):
    from libgooey_tpu.core.smoother import SmootherBank
    from libgooey_tpu.instruments import snare as snare_mod

    V, Vp = ctx["V"], ctx["Vp"]
    _dry, _nraw, ncur, nlat, ntrig = outs_a
    svf_state, _od = mctx["svf_state"], mctx["od"]
    out, nst = outs_b

    if Vp != V:
        nst = jnp.concatenate([nst[:V], nst[Vp:Vp + V]], axis=0)
    new_ovs, _dcx, _dcy = unpack_voice_ovs(nst, V, state.ovs)
    # exact bypass freeze of the overdrive oversampler at block granularity
    # (waveshaper.rs:55-57 early return at drive <= 1, i.e. od == 0;
    # effects/freeze.py).  drive = 1 + od*9 <= 1 <=> od traj <= 0.
    from libgooey_tpu.effects import freeze as frz

    new_ovs = frz.hold_where(jnp.all(_od <= 0.0, axis=-1), state.ovs, new_ovs)

    new_state = snare_mod.SnareState(
        params=SmootherBank(current=ncur[:V], target=state.params.target),
        ovs=new_ovs,
        filter_type=state.filter_type,
        trig_sample=ntrig[:V, 0],
        velocity=nlat[:V, _SLAT["velocity"]],
        pitch_mult=nlat[:V, _SLAT["pitch_mult"]],
        amp_curve=nlat[:V, _SLAT["amp_curve"]],
        tonal_curve=nlat[:V, _SLAT["tonal_curve"]],
        amp_decay=nlat[:V, _SLAT["amp_decay"]],
        pm_active=nlat[:V, _SLAT["pm_active"]],
        noise_svf=svf_state,
    )
    return new_state, out[:V]


@functools.partial(jax.jit, static_argnames=(
    "sample_rate", "block_size", "smooth_coeff", "max_harmonics", "os_mode",
    "interpret"))
def snare_render_fused(state, trig_offset, trig_velocity, block_start, *,
                       sample_rate, block_size, smooth_coeff,
                       max_harmonics=128, os_mode=4, interpret=None):
    """Fused snare bank block; XLA twin: snare.render_block.

    The Chamberlin SVF runs OUTSIDE via filters.chamberlin_block so its
    recurrence keeps the sample-sequential bank kernel (high-Q resonators
    amplify lane-scan reassociation noise past the oracle bar; see
    ops/scan.py LINREC2_IMPL).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, sr, coeff = block_size, sample_rate, smooth_coeff
    phase_a, ctx = _snare_phase_a(state, trig_offset, trig_velocity, B, sr,
                                  coeff, max_harmonics)
    (outs_a,) = _mega_pallas([phase_a], block_start, interpret)
    phase_b, mctx = _snare_phase_m(state, ctx, outs_a, trig_offset, sr,
                                   coeff, B, interpret)
    (outs_b,) = _mega_pallas([phase_b], block_start, interpret)
    return _snare_finish(state, ctx, mctx, outs_a, outs_b)

# --- bass: one fused kernel + (sequential SVF bank) ----------------------------

# bass param indices (instruments/bass.py PARAM_NAMES order)
_BP = dict(
    frequency=0, sub_level=1, osc_level=2, detune_level=3, detune_amount=4,
    osc_shape=5, filter_cutoff=6, filter_resonance=7, filter_env_amount=8,
    filter_env_decay=9, filter_env_curve=10, amp_decay=11, amp_decay_curve=12,
    overdrive=13, volume=14, tuning=15,
)
_BASS_NP = len(_BP)
_BLAT = dict(velocity=0, trig_freq=1, amp_decay=2, amp_curve=3,
             fenv_decay=4, fenv_curve=5)


def _poly_blep(t, dt):
    """ops/osc.py poly_blep, op-for-op."""
    dt = jnp.maximum(dt, 1e-12)
    early = t / dt
    late = (t - 1.0) / dt
    return jnp.where(
        t < dt,
        2.0 * early - early * early - 1.0,
        jnp.where(t > 1.0 - dt, late * late + 2.0 * late + 1.0, 0.0),
    )


def _bass_kernel(cur_ref, tgt_ref, off_ref, vel_ref, nf_ref, trig_ref,
                 lat_ref, ph_ref, st_ref, bs_ref,
                 satur_ref, cut_ref, res_ref, ampsc_ref,
                 ncur_ref, nlat_ref, ntrig_ref, nph_ref, nst_ref,
                 *, sr, coeff, B):
    ctx = _Ctx(cur_ref, tgt_ref, off_ref, trig_ref, bs_ref[0], _BP, coeff,
               B, sr)
    lat = lat_ref[...]
    Vp = lat.shape[0]

    # --- trigger snapshots (bass.rs:747-791) -----------------------------------
    vel_new = jnp.clip(vel_ref[...], 0.0, 1.0)
    freq_new = _denorm(ctx.vat("frequency"), 30.0, 200.0)
    nf = nf_ref[...]
    freq_new = jnp.where(nf > 0.0, nf, freq_new)
    ad_new = _denorm(ctx.vat("amp_decay"), 0.05, 4.0)
    ac_new = _denorm(ctx.vat("amp_decay_curve"), 0.1, 10.0)
    fd_new = _denorm(ctx.vat("filter_env_decay"), 0.01, 2.0)
    fc_new = _denorm(ctx.vat("filter_env_curve"), 0.1, 8.0)

    vel = ctx.eff(vel_new, lat[:, _BLAT["velocity"]:_BLAT["velocity"] + 1])
    freq0 = ctx.eff(freq_new, lat[:, _BLAT["trig_freq"]:_BLAT["trig_freq"] + 1])
    ad = ctx.eff(ad_new, lat[:, _BLAT["amp_decay"]:_BLAT["amp_decay"] + 1])
    ac = ctx.eff(ac_new, lat[:, _BLAT["amp_curve"]:_BLAT["amp_curve"] + 1])
    fd = ctx.eff(fd_new, lat[:, _BLAT["fenv_decay"]:_BLAT["fenv_decay"] + 1])
    fc = ctx.eff(fc_new, lat[:, _BLAT["fenv_curve"]:_BLAT["fenv_curve"] + 1])
    elapsed = ctx.elapsed
    reset = ctx.at_trig

    # --- oscillators (phase accumulators, reset at trigger) --------------------
    freq = freq0 * _tuning_mult(ctx.ptraj("tuning"))
    detune_cents = _denorm(ctx.ptraj("detune_amount"), 0.0, 30.0)
    det_freq = freq * jnp.exp2(detune_cents / 1200.0)

    sub_inc = freq / sr
    osc_inc = freq / sr
    det_inc = det_freq / sr
    sub_phase = _phase_cumsum_reset(sub_inc, reset, ph_ref[:, 0:1])
    osc_phase = _phase_cumsum_reset(osc_inc, reset, ph_ref[:, 1:2])
    det_phase = _phase_cumsum_reset(det_inc, reset, ph_ref[:, 2:3])

    sub_out = jnp.sin(sub_phase * np.float32(2.0 * np.pi))
    shape = ctx.ptraj("osc_shape")

    def blep_pair(phase, inc):
        saw = (2.0 * phase - 1.0) - _poly_blep(phase, inc)
        naive_sq = jnp.where(phase < 0.5, 1.0, -1.0)
        sq = naive_sq + _poly_blep(phase, inc) - _poly_blep(
            jnp.mod(phase + 0.5, 1.0), inc)
        return saw, sq

    saw_m, sq_m = blep_pair(osc_phase, osc_inc)
    saw_d, sq_d = blep_pair(det_phase, det_inc)
    osc_out = saw_m * (1.0 - shape) + sq_m * shape
    det_out = saw_d * (1.0 - shape) + sq_d * shape

    mix = (
        sub_out * ctx.ptraj("sub_level")
        + osc_out * ctx.ptraj("osc_level")
        + det_out * ctx.ptraj("detune_level")
    )

    # --- pre-filter saturation (always advances the oversampler state) ---------
    od = ctx.ptraj("overdrive")
    drive = 1.0 + od * 9.0
    ld, lds, stv, stvs = _accessors_h(st_ref, nst_ref, Vp)
    sat = _ovs4_pipeline(mix, _waveshape_fn(drive), ld, stv, lds, stvs)
    ws_bypass = drive <= 1.0      # ws.process: mix arg is 1.0
    ws_out = jnp.where(ws_bypass, mix, sat)
    ws_out = jnp.where(jnp.isfinite(mix), ws_out, 0.0)
    satur_ref[...] = jnp.where(od > 0.001, ws_out, mix)

    # --- swept-filter trajectories (SVF runs OUTSIDE, sequentially) ------------
    fenv = _adsr_amp(elapsed, 0.001, fd, 0.0, 1.0, fc)
    base_cutoff = 20.0 * jnp.power(
        np.float32(18_000.0 / 20.0), jnp.clip(ctx.ptraj("filter_cutoff"), 0.0, 1.0))
    env_offset = (18_000.0 - base_cutoff) * ctx.ptraj("filter_env_amount") * fenv
    cut_ref[...] = jnp.clip(base_cutoff + env_offset, 20.0, 18_000.0)
    res_ref[...] = _denorm(ctx.ptraj("filter_resonance"), 0.5, 15.0)

    amp_env = _adsr_amp(elapsed, 0.002, ad, 0.0, 1.0, ac)
    ampsc_ref[...] = amp_env * jnp.sqrt(vel) * ctx.ptraj("volume")

    # --- state advance ----------------------------------------------------------
    ncur_ref[...] = ctx.advance()
    nlat_ref[:, _BLAT["velocity"]:_BLAT["velocity"] + 1] = ctx.latch(vel_new, lat[:, 0:1])
    nlat_ref[:, _BLAT["trig_freq"]:_BLAT["trig_freq"] + 1] = ctx.latch(freq_new, lat[:, 1:2])
    nlat_ref[:, _BLAT["amp_decay"]:_BLAT["amp_decay"] + 1] = ctx.latch(ad_new, lat[:, 2:3])
    nlat_ref[:, _BLAT["amp_curve"]:_BLAT["amp_curve"] + 1] = ctx.latch(ac_new, lat[:, 3:4])
    nlat_ref[:, _BLAT["fenv_decay"]:_BLAT["fenv_decay"] + 1] = ctx.latch(fd_new, lat[:, 4:5])
    nlat_ref[:, _BLAT["fenv_curve"]:_BLAT["fenv_curve"] + 1] = ctx.latch(fc_new, lat[:, 5:6])
    ntrig_ref[...] = ctx.new_trig()
    nph_ref[:, 0:1] = sub_phase[:, -1:]
    nph_ref[:, 1:2] = osc_phase[:, -1:]
    nph_ref[:, 2:3] = det_phase[:, -1:]


def _bass_phase_a(state, trig_offset, trig_velocity, note_freq, B, sr, coeff):
    V = state.trig_sample.shape[0]
    Vp = max(8, ((V + 7) // 8) * 8)

    cur = _pad_rows(state.params.current, Vp, 0.5)
    tgt = _pad_rows(state.params.target, Vp, 0.5)
    off = _pad_rows(jnp.asarray(trig_offset, jnp.int32)[:, None], Vp, B)
    vel = _pad_rows(jnp.asarray(trig_velocity, jnp.float32)[:, None], Vp)
    if note_freq is None:
        nf = jnp.zeros((Vp, 1), jnp.float32)
    else:
        nf = _pad_rows(jnp.asarray(note_freq, jnp.float32)[:, None], Vp)
    trig = _pad_rows(state.trig_sample[:, None], Vp, np.int32(-(2 ** 30)))
    lat = _pad_rows(jnp.stack([
        state.velocity, state.trig_freq, state.amp_decay_s, state.amp_curve,
        state.fenv_decay_s, state.fenv_curve], axis=1), Vp, 1.0)
    ph = _pad_rows(jnp.stack([
        state.sub_phase, state.osc_phase, state.det_phase], axis=1), Vp)
    packed = pack_voice_ovs(
        state.ovs, jnp.zeros((V,), jnp.float32), jnp.zeros((V,), jnp.float32))
    if Vp != V:
        z = jnp.zeros((Vp - V, packed.shape[1]), jnp.float32)
        packed = jnp.concatenate([packed[:V], z, packed[V:], z], axis=0)

    kern = functools.partial(
        _bass_kernel, sr=float(sr), coeff=float(coeff), B=B)
    shapes = (
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, _BASS_NP), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 6), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 1), jnp.int32),
        jax.ShapeDtypeStruct((Vp, 3), jnp.float32),
        jax.ShapeDtypeStruct((2 * Vp, _K_OUT), jnp.float32),
    )
    ins = [cur, tgt, off, vel, nf, trig, lat, ph, packed]
    return _Phase(kern, ins, shapes, len(ins)), dict(V=V, Vp=Vp, cur=cur,
                                                     tgt=tgt)


def _bass_finish(state, ctx, outs_a, trig_offset, sr, coeff, B, interpret):
    from libgooey_tpu.core.smoother import SmootherBank
    from libgooey_tpu.instruments import bass as bass_mod
    from libgooey_tpu.ops import filters as filt_mod

    V, Vp, cur, tgt = ctx["V"], ctx["Vp"], ctx["cur"], ctx["tgt"]
    sample_rate = sr
    smooth_coeff = coeff
    satur, cut, res, ampsc, ncur, nlat, ntrig, nph, nst = outs_a

    # --- swept SVF low-pass (sequential bank kernel, svf_tpt_outputs) ----------
    offs_v = jnp.asarray(trig_offset, jnp.int32)[:, None]
    at_trig = ((jnp.arange(B, dtype=jnp.int32)[None, :] == offs_v)
               & (offs_v < B))
    svf_state, filtered, _bp, _hp = filt_mod.svf_tpt_outputs(
        state.svf, satur[:V], cut[:V], res[:V], sample_rate, reset=at_trig)
    out = filtered * ampsc[:V]

    if Vp != V:
        nst = jnp.concatenate([nst[:V], nst[Vp:Vp + V]], axis=0)
    new_ovs, _dcx, _dcy = unpack_voice_ovs(nst, V, state.ovs)
    # exact bypass freeze of the pre-filter drive oversampler at block
    # granularity (bass.rs:846 ticks the shaper only when od > 0.001;
    # effects/freeze.py).  Uses the XLA-twin traj formula for the gate.
    from libgooey_tpu.effects import freeze as frz

    _q = np.float32(1.0 - smooth_coeff)
    _powq = _q ** jnp.arange(1, B + 1, dtype=jnp.float32)
    _odi = bass_mod.PARAM_INDEX["overdrive"]
    _d = (cur[:V, _odi, None] - tgt[:V, _odi, None]) * _powq
    _od = tgt[:V, _odi, None] + jnp.where(jnp.abs(_d) < 1e-4, 0.0, _d)
    new_ovs = frz.hold_where(jnp.all(_od <= 0.001, axis=-1),
                             state.ovs, new_ovs)

    new_state = bass_mod.BassState(
        ovs=new_ovs,
        params=SmootherBank(current=ncur[:V], target=state.params.target),
        trig_sample=ntrig[:V, 0],
        velocity=nlat[:V, _BLAT["velocity"]],
        trig_freq=nlat[:V, _BLAT["trig_freq"]],
        amp_decay_s=nlat[:V, _BLAT["amp_decay"]],
        amp_curve=nlat[:V, _BLAT["amp_curve"]],
        fenv_decay_s=nlat[:V, _BLAT["fenv_decay"]],
        fenv_curve=nlat[:V, _BLAT["fenv_curve"]],
        sub_phase=nph[:V, 0],
        osc_phase=nph[:V, 1],
        det_phase=nph[:V, 2],
        svf=svf_state,
    )
    return new_state, out


@functools.partial(jax.jit, static_argnames=(
    "sample_rate", "block_size", "smooth_coeff", "os_mode", "interpret"))
def bass_render_fused(state, trig_offset, trig_velocity, block_start, *,
                      sample_rate, block_size, smooth_coeff, note_freq=None,
                      os_mode=4, interpret=None):
    """Fused bass bank block; XLA twin: bass.render_block.

    The swept TPT SVF (Q up to 15) keeps the sample-sequential svf_bank
    kernel; oscillators/bleps/drive/envelopes fuse into one kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    phase, ctx = _bass_phase_a(state, trig_offset, trig_velocity, note_freq,
                               block_size, sample_rate, smooth_coeff)
    (outs,) = _mega_pallas([phase], block_start, interpret)
    return _bass_finish(state, ctx, outs, trig_offset, sample_rate,
                        smooth_coeff, block_size, interpret)

# --- hihat2: one fused kernel ---------------------------------------------------

_HP = dict(pitch=0, decay=1, attack=2, tone=3, volume=4, tuning=5)
_HH2_NP = len(_HP)


def _maxlin_scan(A, Bc, Cc, y0):
    """Inclusive scan of ``y[n] = max(A[n], Bc[n]*y[n-1] + Cc[n])`` along
    lanes (ops/scan.py maxlin's combine, Hillis-Steele form)."""
    C = A.shape[-1]
    step = 1
    while step < C:
        As = _shift_right(A, step, -3.0e38)
        Bs = _shift_right(Bc, step, 1.0)
        Cs = _shift_right(Cc, step, 0.0)
        A = jnp.maximum(A, Bc * As + Cc)
        Cc = Bc * Cs + Cc
        Bc = Bc * Bs
        step *= 2
    return jnp.maximum(A, Bc * y0 + Cc)


def _max_curve(progress, curve):
    """core/max_curve.py max_curve, op-for-op (static python-float curve)."""
    p = jnp.clip(progress, 0.0, 1.0)
    c = float(curve)
    cabs = abs(c)
    hp = ((cabs + 1e-20) * 1.2) ** 0.41 * 0.91   # static scalar math
    fp = np.float32(hp / (1.0 - hp))

    def one_sided(p):
        # Mosaic has no expm1; exp(x)-1 differs by ~1e-8 abs for the small
        # fp*p corner (envelope path, not phase — inside tolerance)
        gp = (jnp.exp(fp * p) - 1.0) / np.float32(np.expm1(float(fp)))
        return p if abs(float(fp)) < 1e-6 else gp

    out = 1.0 - one_sided(1.0 - p) if c < 0.0 else one_sided(p)
    return p if cabs < 1e-6 else out


def _biquad_df1(x, coeffs, reset_f, x1, x2, y1, y2):
    """DF-I biquad lane scan with reset (ops/filters.py biquad_df1_block).

    ``x1/x2/y1/y2``: [V, 1] carried state columns.  Returns
    ``(out, (x1', x2', y1', y2'))``; output flushed at 1e-15.
    """
    b0, b1, b2, a1, a2 = coeffs
    x_prev1 = _shift_right(x, 1, x1)
    x_prev2 = _shift_right(x_prev1, 1, x2)
    keepm = 1.0 - reset_f
    reset_prev = _shift_right(reset_f, 1, 0.0)
    x_prev1 = x_prev1 * keepm
    x_prev2 = x_prev2 * keepm * (1.0 - reset_prev)
    w = b0 * x + b1 * x_prev1 + b2 * x_prev2
    zeros = jnp.zeros_like(w)
    s1, s2 = _affine_scan2(
        -a1 * keepm, -a2 * keepm, keepm, zeros, w, zeros, (y1, y2))
    out = jnp.where(jnp.abs(s1) < 1e-15, 0.0, s1)
    return out, (x[:, -1:], x_prev1[:, -1:], s1[:, -1:], s2[:, -1:])


def _hihat2_kernel(cur_ref, tgt_ref, off_ref, vel_ref, trig_ref, lat_ref,
                   color_ref, slope_ref, ph_ref, hpf_ref, svf_ref, pink_ref,
                   salt_ref, bs_ref,
                   out_ref, ncur_ref, nlat_ref, ntrig_ref, nph_ref, nhpf_ref,
                   nsvf_ref, npink_ref, *, sr, coeff, B, seed):
    ctx = _Ctx(cur_ref, tgt_ref, off_ref, trig_ref, bs_ref[0], _HP, coeff,
               B, sr)
    Vp = cur_ref.shape[0]
    vel_new = jnp.clip(vel_ref[...], 0.0, 1.0)
    vel = ctx.eff(vel_new, lat_ref[:, 0:1])
    elapsed = ctx.elapsed
    reset = ctx.at_trig
    reset_f = reset.astype(jnp.float32)

    attack_s = _denorm(ctx.ptraj("attack"), 0.5, 200.0) * 0.001
    decay_s = _denorm(ctx.ptraj("decay"), 0.5, 4000.0) * 0.001
    pn = ctx.ptraj("pitch")
    pitch_hz = _denorm(pn * pn, 3500.0, 10_000.0) * _tuning_mult(
        ctx.ptraj("tuning"))

    # --- noise source (never reset; counter = global sample + voice salt;
    # the salt is the CARRIED global voice index, not a local iota — under
    # shard_map a local iota would duplicate noise across shards) ----------
    n_glob_i = ctx.bs + ctx.n                                   # [Vp, B] i32
    n_glob = jax.lax.bitcast_convert_type(n_glob_i, jnp.uint32)
    salt = jax.lax.bitcast_convert_type(salt_ref[...], jnp.uint32)
    white = _white(n_glob + salt * jnp.uint32(0x9E3779B9), seed)
    poles, gains = noise_mod.coefficients(sr)
    pwhite = _white(n_glob, seed)   # pink_block's counter-only stream
    youts = []
    pstate = []
    for i in range(3):
        y = _scan_const(np.float32(gains[i]) * pwhite, float(poles[i]),
                        pink_ref[:, i:i + 1])
        youts.append(y)
        pstate.append(y[:, -1:])
    pink = (youts[0] + youts[1] + youts[2]
            + pwhite * noise_mod.DIRECT_GAIN) * noise_mod.OUTPUT_GAIN
    noise_sig = jnp.where(color_ref[...] == 1, pink, white)

    # --- phase-mod oscillator chain (hihat2.rs:256-285, 497-505) -------------
    mod_inc = pitch_hz * 0.1 / sr
    main_inc = pitch_hz / sr
    mod_phase = _phase_cumsum_reset(mod_inc, reset_f, ph_ref[:, 0:1])
    main_phase = _phase_cumsum_reset(main_inc, reset_f, ph_ref[:, 1:2])
    two_pi = np.float32(2.0 * np.pi)
    mod_sig = noise_sig * 0.25
    mod_out = jnp.sin(two_pi * jnp.mod(mod_phase + mod_sig, 1.0))
    main_out = jnp.sin(two_pi * jnp.mod(main_phase + mod_out * 0.75, 1.0))

    # --- highpass stages at pitch (RBJ, q = 1) --------------------------------
    omega = 2.0 * np.pi * pitch_hz / sr
    sin_o, cos_o = jnp.sin(omega), jnp.cos(omega)
    alpha = sin_o / (2.0 * 1.0)
    a0 = 1.0 + alpha
    hb0 = (1.0 + cos_o) / 2.0 / a0
    hb1 = -(1.0 + cos_o) / a0
    hb2 = (1.0 + cos_o) / 2.0 / a0
    ha1 = -2.0 * cos_o / a0
    ha2 = (1.0 - alpha) / a0
    coeffs = (hb0, hb1, hb2, ha1, ha2)
    y1, st1 = _biquad_df1(main_out, coeffs, reset_f,
                          hpf_ref[:, 0:1], hpf_ref[:, 1:2],
                          hpf_ref[:, 2:3], hpf_ref[:, 3:4])
    y2, st2 = _biquad_df1(y1, coeffs, reset_f,
                          hpf_ref[:, 4:5], hpf_ref[:, 5:6],
                          hpf_ref[:, 6:7], hpf_ref[:, 7:8])
    filtered = jnp.where(slope_ref[...] == 1, y2 * 0.8, y1)

    # --- MaxCurve envelope through the asymmetric smoother --------------------
    in_attack = elapsed < attack_s
    attack_prog = jnp.where(attack_s > 0,
                            elapsed / jnp.maximum(attack_s, 1e-9), 1.0)
    decay_prog = jnp.where(
        decay_s > 0, (elapsed - attack_s) / jnp.maximum(decay_s, 1e-9), 1.0)
    env_raw = jnp.where(
        in_attack,
        _max_curve(attack_prog, -0.3),
        1.0 - _max_curve(jnp.clip(decay_prog, 0.0, 1.0), -0.8),
    )
    env_raw = jnp.where(elapsed < 0.0, 0.0, env_raw)
    down_coeff = np.float32(1.0 - np.exp(-1.0 / 100.0))
    bmul = jnp.where(reset, 0.0, jnp.full_like(env_raw, 1.0 - down_coeff))
    env = _maxlin_scan(env_raw, bmul, down_coeff * env_raw, ph_ref[:, 2:3])

    output = filtered * env * vel * 0.35

    # --- tone SVF highpass + volume -------------------------------------------
    tone_hz = _denorm(ctx.ptraj("tone"), 500.0, 10_000.0)
    cutoff = jnp.clip(tone_hz, 20.0, sr * 0.45)
    g = jnp.tan(np.pi * cutoff / sr)
    r = 1.0 / jnp.maximum(0.5, 0.5)
    h = 1.0 / (1.0 + r * g + g * g)
    v1, v2, ic1_l, ic2_l = _svf_tpt_reset(
        output, g, h, reset, svf_ref[:, 0:1], svf_ref[:, 1:2])
    hp = output - (r * v1 + v2)
    out_ref[...] = hp * ctx.ptraj("volume")

    # --- state advance ----------------------------------------------------------
    ncur_ref[...] = ctx.advance()
    nlat_ref[:, 0:1] = ctx.latch(vel_new, lat_ref[:, 0:1])
    ntrig_ref[...] = ctx.new_trig()
    nph_ref[:, 0:1] = mod_phase[:, -1:]
    nph_ref[:, 1:2] = main_phase[:, -1:]
    nph_ref[:, 2:3] = env[:, -1:]
    for i, v in enumerate(st1 + st2):
        nhpf_ref[:, i:i + 1] = v
    nsvf_ref[:, 0:1] = ic1_l
    nsvf_ref[:, 1:2] = ic2_l
    for i in range(3):
        npink_ref[:, i:i + 1] = pstate[i]


def _hihat2_phase_a(state, trig_offset, trig_velocity, B, sr, coeff):
    V = state.trig_sample.shape[0]
    Vp = max(8, ((V + 7) // 8) * 8)

    cur = _pad_rows(state.params.current, Vp, 0.5)
    tgt = _pad_rows(state.params.target, Vp, 0.5)
    off = _pad_rows(jnp.asarray(trig_offset, jnp.int32)[:, None], Vp, B)
    vel = _pad_rows(jnp.asarray(trig_velocity, jnp.float32)[:, None], Vp)
    trig = _pad_rows(state.trig_sample[:, None], Vp, np.int32(-(2 ** 30)))
    lat = _pad_rows(state.velocity[:, None], Vp, 1.0)
    color = _pad_rows(state.noise_color[:, None], Vp)
    slope = _pad_rows(state.filter_slope[:, None], Vp)
    ph = _pad_rows(jnp.stack([
        state.mod_phase, state.main_phase, state.env_smooth], axis=1), Vp)
    hpf = _pad_rows(jnp.stack([
        state.hpf1.x1, state.hpf1.x2, state.hpf1.y1, state.hpf1.y2,
        state.hpf2.x1, state.hpf2.x2, state.hpf2.y1, state.hpf2.y2], axis=1),
        Vp)
    svf = _pad_rows(jnp.stack([state.svf.ic1, state.svf.ic2], axis=1), Vp)
    pink = _pad_rows(state.pink.fstate, Vp)
    salt = _pad_rows(state.voice_salt.astype(jnp.int32)[:, None], Vp)

    kern = functools.partial(
        _hihat2_kernel, sr=float(sr), coeff=float(coeff), B=B,
        seed=0x9ABCDEF0)
    shapes = (
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, _HH2_NP), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 1), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 1), jnp.int32),
        jax.ShapeDtypeStruct((Vp, 3), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 8), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 2), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 3), jnp.float32),
    )
    ins = [cur, tgt, off, vel, trig, lat, color, slope, ph, hpf, svf, pink,
           salt]
    return _Phase(kern, ins, shapes, len(ins)), dict(V=V)


def _hihat2_finish(state, ctx, outs_a):
    from libgooey_tpu.core.smoother import SmootherBank
    from libgooey_tpu.instruments import hihat2 as hh2_mod
    from libgooey_tpu.ops import filters as filt_mod
    from libgooey_tpu.ops import noise as _noise

    V = ctx["V"]
    out, ncur, nlat, ntrig, nph, nhpf, nsvf, npink = outs_a
    new_state = hh2_mod.HiHat2State(
        params=SmootherBank(current=ncur[:V], target=state.params.target),
        noise_color=state.noise_color,
        filter_slope=state.filter_slope,
        trig_sample=ntrig[:V, 0],
        velocity=nlat[:V, 0],
        mod_phase=nph[:V, 0],
        main_phase=nph[:V, 1],
        env_smooth=nph[:V, 2],
        hpf1=filt_mod.BiquadState(x1=nhpf[:V, 0], x2=nhpf[:V, 1],
                                  y1=nhpf[:V, 2], y2=nhpf[:V, 3]),
        hpf2=filt_mod.BiquadState(x1=nhpf[:V, 4], x2=nhpf[:V, 5],
                                  y1=nhpf[:V, 6], y2=nhpf[:V, 7]),
        svf=filt_mod.SVFState(ic1=nsvf[:V, 0], ic2=nsvf[:V, 1]),
        pink=_noise.PinkState(fstate=npink[:V]),
        voice_salt=state.voice_salt,
    )
    return new_state, out[:V]


@functools.partial(jax.jit, static_argnames=(
    "sample_rate", "block_size", "smooth_coeff", "interpret"))
def hihat2_render_fused(state, trig_offset, trig_velocity, block_start, *,
                        sample_rate, block_size, smooth_coeff, interpret=None):
    """Fused HiHat2 bank block; XLA twin: hihat2.render_block."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    phase, ctx = _hihat2_phase_a(state, trig_offset, trig_velocity,
                                 block_size, sample_rate, smooth_coeff)
    (outs,) = _mega_pallas([phase], block_start, interpret)
    return _hihat2_finish(state, ctx, outs)


# --- tom2 sources kernel --------------------------------------------------------

# tom2 param indices (instruments/tom2.py PARAM_NAMES order; plain 0-100
# values, not smoothed — tom2.rs does not smooth its params)
_T2P = dict(tune=0, bend=1, tone=2, color=3, decay=4, membrane=5,
            membrane_q=6, volume=7, tuning=8)
_T2_NP = len(_T2P)

_T2_TWO_PI = np.float32(2.0 * np.pi)
_T2_RAND_SEED = 0x12345678     # ops/morph.py RAND_SEED
_T2_WHITE_SEED = 0x9ABCDEF0    # core/rng.py DEFAULT_SEED


def _tom2_kernel(par_ref, off_ref, trig_ref, dec_ref, ph_ref, seg_ref,
                 bs_ref,
                 mixed_ref, env_ref, done_ref, fade_ref, freq_ref,
                 ntrig_ref, ndec_ref, nph_ref, nseg_ref,
                 *, sr, B, triangle_enabled):
    """Tom2 bank *sources* in one kernel (XLA twin: the front half of
    tom2.render_block, single-trigger mode).  Behavioral reference:
    src/instruments/tom2.rs:427-594 — MaxCurve env, bend-squared pitch,
    ClickOsc + triangle + MorphOsc sources.

    The pitch-tracking RBJ bandpass and 5-band membrane resonator
    deliberately stay OUTSIDE this kernel, on the shared XLA/bank-kernel
    recurrence path: they are lightly-damped resonators whose state rings
    across blocks, so Hillis-Steele scan reassociation compounds to ~1e-3
    within a few blocks (measured) — the same reason snare's Chamberlin
    and bass's swept SVF run on the sample-sequential bank path.

    Outputs: ``mixed``/``env``/``main_done``(f32)/``fade_factor``/
    ``modulated_freq`` [V, B] plus the front-half state advance.  Packed
    state columns: ``ph`` [V, 6] = (tri_phase, morph main/tri/fixed/gated
    phases, rand_frac); ``seg`` [V, 1] i32 rand segment.
    """
    Vp = par_ref.shape[0]
    n = jax.lax.broadcasted_iota(jnp.int32, (Vp, B), 1)
    off = off_ref[...]                       # [Vp, 1] i32
    has = off < B
    after = (n >= off) & has
    at_trig = (n == off) & has
    reset_f = at_trig.astype(jnp.float32)
    bs = bs_ref[0]
    trig_prev = trig_ref[...]
    trig_eff = jnp.where(after, bs + off, trig_prev)
    elapsed_i = (bs + n) - trig_eff
    elapsed = elapsed_i.astype(jnp.float32) * np.float32(1.0 / sr)

    p = lambda name: par_ref[:, _T2P[name]:_T2P[name] + 1]   # [Vp, 1]

    # --- decay latch + envelope [(1, 1ms, 0.8), (0, decay, -0.83)] ----------
    decay_new = (0.5 + (p("decay") / 100.0) * (4000.0 - 0.5)) * 0.001
    decay_s = jnp.where(after, decay_new, dec_ref[...])
    attack_s = np.float32(0.001)
    in_attack = elapsed < attack_s
    env = jnp.where(
        in_attack,
        _max_curve(elapsed / 0.001, 0.8),
        1.0 - _max_curve(jnp.clip((elapsed - attack_s) / decay_s, 0.0, 1.0),
                         -0.83),
    )
    env = jnp.where(elapsed < 0.0, 0.0, env)
    env_complete = elapsed >= (attack_s + decay_s)

    # --- pitch ---------------------------------------------------------------
    tn = p("tune") / 100.0
    base_freq = (40.0 + tn * tn * (600.0 - 40.0)) * _tuning_mult(p("tuning"))
    bend_scaled = (p("bend") / 100.0) * 2.0
    pitch_mod = jnp.square(env * bend_scaled)
    raw_freq = base_freq * (1.0 + pitch_mod)

    past_attack = (elapsed >= attack_s) | (env > 0.9)
    main_done = env_complete | (past_attack & (raw_freq < 20.0))
    fade_factor = jnp.where(
        past_attack & (raw_freq < 40.0),
        (raw_freq - 20.0) / (40.0 - 20.0),
        1.0,
    )
    modulated_freq = jnp.maximum(raw_freq, 40.0)

    # --- ClickOsc: 64-sample one-shot wavetable as an unrolled select tree
    # (morph.click_block; a 64-entry VMEM gather would serialize on the
    # scalar core — 42 vector selects are cheaper at any V) -----------------
    click = jnp.zeros((Vp, B), jnp.float32)
    from libgooey_tpu.ops import morph as _morph_mod

    for k, val in enumerate(_morph_mod.TOM_IMPULSE):
        if float(val) != 0.0:
            click = jnp.where(elapsed_i == k, np.float32(val), click)
    click_out = click * 1.1

    # --- standalone triangle -------------------------------------------------
    inc = modulated_freq / sr
    tri_phase = _phase_cumsum_reset(inc, reset_f, ph_ref[:, 0:1])

    def _triangle(t):
        return jnp.where(t < 0.5, 4.0 * t - 1.0, 3.0 - 4.0 * t)

    def _used(phase, step):
        return jnp.mod(phase - step, 1.0)

    if triangle_enabled:
        tri_out = _triangle(_used(tri_phase, inc)) * 0.5
    else:
        tri_out = jnp.zeros_like(click_out)

    # --- MorphOsc (ops/morph.py morph_block, op-for-op) ----------------------
    tone = p("tone") + jnp.zeros_like(env)            # [Vp, B]
    mix_control = (p("tone") / 100.0) * 2.0 - 1.0
    color_midi = 30.0 + (p("color") / 100.0) * 20.0
    cf1 = 440.0 * jnp.exp2((color_midi - 69.0) / 12.0)

    m_main = _phase_cumsum_reset(inc, reset_f, ph_ref[:, 1:2])
    m_tri = _phase_cumsum_reset(inc, reset_f, ph_ref[:, 2:3])
    fixed_inc = jnp.full((Vp, B), np.float32(190.0 / sr))
    m_fixed = _phase_cumsum_reset(fixed_inc, reset_f, ph_ref[:, 3:4])
    m_gated = _phase_cumsum_reset(inc, reset_f, ph_ref[:, 4:5])

    main_sine = jnp.sin(_T2_TWO_PI * _used(m_main, inc)) * 0.5
    tri_m = _triangle(_used(m_tri, inc)) * 0.5
    fixed_sine = jnp.sin(_T2_TWO_PI * _used(m_fixed, np.float32(190.0 / sr))) * 0.5
    gated_sine = jnp.where(
        tone < 99.0, jnp.sin(_T2_TWO_PI * _used(m_gated, inc)) * 0.2, 0.0)

    elapsed_u = jax.lax.bitcast_convert_type(elapsed_i, jnp.uint32)
    white = _white(elapsed_u, _T2_WHITE_SEED) * 0.2

    # rand~ S&H with linear ramps at mtof(mtof(color_midi)) Hz; split-
    # increment unwrapped accumulator, op-for-op with morph.accum (the
    # {0,1}-coefficient base latch is exact under any scan order)
    rand_freq = 440.0 * jnp.exp2((cf1 - 69.0) / 12.0)
    inc_r = rand_freq / sr + jnp.zeros_like(env)
    n1r = (jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(jnp.float32)
           + 1.0)
    inc0_r = inc_r[:, 0:1]
    hi_r = jnp.floor(inc0_r * 2048.0) / 2048.0
    lo_r = inc0_r - hi_r
    ramp_r = hi_r * n1r + lo_r * n1r
    resid_r = _affine_scan(jnp.ones_like(inc_r), inc_r - inc0_r,
                           jnp.zeros_like(inc0_r))
    p_r = ramp_r + resid_r
    p_prev_r = _shift_right(p_r, 1, 0.0)
    base_r = _affine_scan(1.0 - reset_f, reset_f * p_prev_r, -ph_ref[:, 5:6])
    total = p_r - base_r
    seg_local = jnp.floor(total)
    frac = total - seg_local
    seg_base = jnp.where(after, 0, seg_ref[...])
    seg = seg_base + seg_local.astype(jnp.int32)
    segu = jax.lax.bitcast_convert_type(seg, jnp.uint32)
    tgt_r = jnp.where(seg >= 1, _white(segu, _T2_RAND_SEED), 0.0)
    cur_r = jnp.where(seg >= 2, _white(segu - jnp.uint32(1), _T2_RAND_SEED), 0.0)
    rand_value = cur_r + (tgt_r - cur_r) * frac

    noise_combined = (white + rand_value) * 0.4
    ch1 = main_sine * fixed_sine
    ch2 = tri_m + noise_combined
    ch3 = noise_combined + gated_sine
    w1 = jnp.clip(-mix_control, 0.0, 1.0)
    w2 = jnp.clip(1.0 - jnp.abs(mix_control), 0.0, 1.0)
    w3 = jnp.clip(mix_control, 0.0, 1.0)
    morph_out = ch1 * w1 + ch2 * w2 + ch3 * w3

    mixed_ref[...] = click_out + tri_out + morph_out
    env_ref[...] = env
    done_ref[...] = main_done.astype(jnp.float32)
    fade_ref[...] = fade_factor
    freq_ref[...] = modulated_freq

    # --- state advance --------------------------------------------------------
    ntrig_ref[...] = jnp.where(has, bs + off, trig_prev)
    ndec_ref[...] = jnp.where(has, decay_new, dec_ref[...])
    nph_ref[:, 0:1] = jnp.mod(tri_phase[:, -1:], 1.0)
    nph_ref[:, 1:2] = m_main[:, -1:]
    nph_ref[:, 2:3] = m_tri[:, -1:]
    nph_ref[:, 3:4] = m_fixed[:, -1:]
    nph_ref[:, 4:5] = m_gated[:, -1:]
    nph_ref[:, 5:6] = frac[:, -1:]
    nseg_ref[...] = seg[:, -1:]


def _tom2_phase_a(state, trig_offset, B, sr, triangle_enabled):
    V = state.trig_sample.shape[0]
    Vp = max(8, ((V + 7) // 8) * 8)

    par = _pad_rows(state.params, Vp, 50.0)
    off = _pad_rows(jnp.asarray(trig_offset, jnp.int32)[:, None], Vp, B)
    trig = _pad_rows(state.trig_sample[:, None], Vp, np.int32(-(2 ** 30)))
    dec = _pad_rows(state.decay_s[:, None], Vp, 1.0)
    ph = _pad_rows(jnp.stack([
        state.tri_phase, state.morph.main_phase, state.morph.tri_phase,
        state.morph.fixed_phase, state.morph.gated_phase,
        state.morph.rand_frac], axis=1), Vp)
    seg = _pad_rows(state.morph.rand_seg[:, None], Vp)

    kern = functools.partial(
        _tom2_kernel, sr=float(sr), B=B,
        triangle_enabled=bool(triangle_enabled))
    shapes = (
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, B), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 1), jnp.int32),
        jax.ShapeDtypeStruct((Vp, 1), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 6), jnp.float32),
        jax.ShapeDtypeStruct((Vp, 1), jnp.int32),
    )
    ins = [par, off, trig, dec, ph, seg]
    return _Phase(kern, ins, shapes, len(ins)), dict(V=V)


def _tom2_finish(state, ctx, outs_a):
    from libgooey_tpu.ops import morph as morph_mod

    V = ctx["V"]
    mixed, env, done, fade, freq, ntrig, ndec, nph, nseg = outs_a
    front = (
        ntrig[:V, 0],
        ndec[:V, 0],
        nph[:V, 0],
        morph_mod.MorphState(
            main_phase=nph[:V, 1],
            tri_phase=nph[:V, 2],
            fixed_phase=nph[:V, 3],
            gated_phase=nph[:V, 4],
            rand_seg=nseg[:V, 0],
            rand_frac=nph[:V, 5],
        ),
    )
    return (front, mixed[:V], env[:V], done[:V] > 0.5, fade[:V], freq[:V])


@functools.partial(jax.jit, static_argnames=(
    "sample_rate", "block_size", "triangle_enabled", "interpret"))
def tom2_sources_fused(state, trig_offset, block_start, *,
                       sample_rate, block_size, triangle_enabled=True,
                       interpret=None):
    """Fused tom2 source stage; XLA twin: tom2.render_block's front half.

    Eligibility (callers gate): single-trigger offsets ([V]),
    V <= MAX_FUSED_VOICES.  Velocity is ignored (tom2.rs trigger).

    Returns ``(front, mixed, env, main_done, fade_factor, modulated_freq)``
    where ``front = (trig_sample, decay_s, tri_phase, MorphState)`` are the
    advanced front-half state leaves; the caller runs the bandpass/membrane
    recurrences and output composition on the shared XLA path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    phase, ctx = _tom2_phase_a(state, trig_offset, block_size, sample_rate,
                               triangle_enabled)
    (outs,) = _mega_pallas([phase], block_start, interpret)
    return _tom2_finish(state, ctx, outs)


# --- kit composition: all families in two merged pallas calls -------------------


def kit_render_fused(states, offs, vels, block_start, *, kinds, sample_rate,
                     block_size, smooth_coeff, kick_max_harmonics=256,
                     snare_max_harmonics=256, tom2_triangle=True,
                     bass_note_freq=None, interpret=None):
    """Render several instrument families through TWO merged pallas calls.

    The composed product kit is launch-bound (~20 us per in-graph pallas
    call, measured by scaling identical banks), so instead of 5 source
    kernels + 2 drive kernels this runs ONE merged source call (kick A,
    snare A, hihat2, bass, tom2 sources) and ONE merged drive call
    (kick B + snare B).  Kernel bodies are the per-family ones, unchanged
    — twin equality per family is untouched; the sample-sequential
    recurrences (kick env follower, snare Chamberlin, bass swept SVF,
    tom2 bandpass/membrane) stay on their bank paths between the calls.

    ``kinds`` is the static tuple of families to render (each present in
    ``states``/``offs``/``vels``); returns ``{kind: (new_state, out)}``.
    Callers gate eligibility exactly like the per-family wrappers
    (single-trigger [V] offsets, no overrides, kick feedback_path=False,
    V <= MAX_FUSED_VOICES).
    """
    from libgooey_tpu.instruments import tom2 as tom2_mod

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, sr, coeff = block_size, sample_rate, smooth_coeff

    phases_a, ctxs = [], {}
    for kind in kinds:
        if kind == "kick":
            ph, ctx = _kick_phase_a(states[kind], offs[kind], vels[kind],
                                    B, sr, coeff, kick_max_harmonics)
        elif kind == "snare":
            ph, ctx = _snare_phase_a(states[kind], offs[kind], vels[kind],
                                     B, sr, coeff, snare_max_harmonics)
        elif kind == "hihat2":
            ph, ctx = _hihat2_phase_a(states[kind], offs[kind], vels[kind],
                                      B, sr, coeff)
        elif kind == "bass":
            ph, ctx = _bass_phase_a(states[kind], offs[kind], vels[kind],
                                    bass_note_freq, B, sr, coeff)
        elif kind == "tom2":
            ph, ctx = _tom2_phase_a(states[kind], offs[kind], B, sr,
                                    tom2_triangle)
        else:
            raise KeyError(f"kit_render_fused: unsupported family {kind!r}")
        phases_a.append(ph)
        ctxs[kind] = ctx
    outs_a = dict(zip(kinds, _mega_pallas(phases_a, block_start, interpret)))

    # --- middles (bank-path recurrences) + merged drive call ---------------
    phases_b, b_order, mctxs = [], [], {}
    if "kick" in kinds:
        ph, mctx = _kick_phase_m(states["kick"], ctxs["kick"],
                                 outs_a["kick"], sr, coeff, B, interpret)
        phases_b.append(ph)
        b_order.append("kick")
        mctxs["kick"] = mctx
    if "snare" in kinds:
        ph, mctx = _snare_phase_m(states["snare"], ctxs["snare"],
                                  outs_a["snare"], offs["snare"], sr, coeff,
                                  B, interpret)
        phases_b.append(ph)
        b_order.append("snare")
        mctxs["snare"] = mctx
    outs_b = (dict(zip(b_order, _mega_pallas(phases_b, block_start,
                                             interpret)))
              if phases_b else {})

    results = {}
    for kind in kinds:
        if kind == "kick":
            results[kind] = _kick_finish(states[kind], ctxs[kind],
                                         mctxs[kind], outs_a[kind],
                                         outs_b[kind])
        elif kind == "snare":
            results[kind] = _snare_finish(states[kind], ctxs[kind],
                                          mctxs[kind], outs_a[kind],
                                          outs_b[kind])
        elif kind == "hihat2":
            results[kind] = _hihat2_finish(states[kind], ctxs[kind],
                                           outs_a[kind])
        elif kind == "bass":
            results[kind] = _bass_finish(states[kind], ctxs[kind],
                                         outs_a[kind], offs[kind], sr,
                                         coeff, B, interpret)
        elif kind == "tom2":
            front = _tom2_finish(states[kind], ctxs[kind], outs_a[kind])
            results[kind] = tom2_mod.finish_fused(
                states[kind], offs[kind], block_start, *front,
                sample_rate=sr, block_size=B)
    return results
