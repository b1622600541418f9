"""Merged bus-effect chain: a run of effects as ONE ``pallas_call``.

The composed product block is launch-bound: each in-graph ``pallas_call``
costs ~20 µs regardless of its work, and a 9-effect chain spends ~200 µs
just launching the per-effect kernels (`tools/bench_kit_parts.py`).  The
same trick that merged the five instrument source kernels
(`pallas_voice._mega_pallas`) applies here, with one twist: chain effects
are *sequential* — each consumes the previous effect's output — so the
merged kernel threads the stereo signal through a single VMEM ref that
every phase reads and rewrites in place (every effect kernel body loads
its input once up front, so input/output aliasing is safe).

Two effects (the Moog-style lowpass and the compressor / feedback-
waveshaper envelope detectors) are genuinely serial scalar loops that
live in SMEM.  They join the merged kernel via in-kernel DMA: the signal
round-trips VMEM → SMEM scratch → VMEM around the scalar loop (verified
supported by Mosaic on v5e).  Their loop arithmetic here is op-for-op
the flat-SMEM kernels' (`pallas_fx._env_kernel` / ``_lowpass_kernel``)
with 2-D indexing.

Phase bodies **reuse the standalone kernel functions unchanged**
(`pallas_fx._delay_kernel`, ``_sat4_kernel``, ``_comp_kernel``,
``_tilt_kernel``, ``_spring_kernel``, ``_ws4_kernel``, ``_fbws_kernel``)
— the merged path is pinned against the per-effect path by
`tests/test_pallas_chain.py`.  Known deviations: the lowpass's output
saturation runs as the in-kernel vector ``tanh`` instead of XLA's libm
tanh (~1e-5), matching the documented per-kernel tolerance.

The plate reverb keeps its own call (its modulated-tap machinery has
per-call scratch sized from state), so the all-10 product chain becomes
TWO pallas calls instead of eleven.

Host-side pre/post glue (param trajectories, ring-buffer gather/write,
oversampler state pack/unpack, block-granular bypass freezes) replicates
each effect module's TPU branch exactly — see the per-effect builders
below, each citing its source.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libgooey_tpu.core.smoother import SmootherBank, smoothing_coeff
from libgooey_tpu.ops import pallas_fx as pfx
from libgooey_tpu.ops import ringbuf


def _vspec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _sspec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


class Phase(NamedTuple):
    name: str
    ins: tuple          # ((array, "vmem"|"smem"), ...)
    aux: tuple          # ((shape, "vmem"|"smem"), ...) extra outputs, f32
    scratch: tuple      # extra pltpu scratch specs for this phase
    body: Callable      # body(t, in_refs, aux_refs, scratch_refs)


class _Tools(NamedTuple):
    sig: object         # [2, B] VMEM — the chain signal (in place)
    vtmp: object        # [2, B] VMEM scratch
    venv: object        # [2, B] VMEM scratch (detector envelopes)
    s_x: object         # [2, B] SMEM scratch (scalar-loop input)
    s_a: object         # [2, B] SMEM scratch (coefficient A)
    s_b: object         # [2, B] SMEM scratch (coefficient B)
    s_out: object       # [2, B] SMEM scratch (scalar-loop output)
    sem: object         # one DMA semaphore
    B: int

    def copy(self, src, dst):
        # whole-ref copies only: Mosaic requires SMEM slices to stay
        # sublane-aligned, so each scalar-loop operand gets its own
        # (2, B) scratch instead of slots in one (8, B) buffer
        cp = pltpu.make_async_copy(src, dst, self.sem)
        cp.start()
        cp.wait()


def chain_fused(x, phases: Sequence[Phase], *, interpret=None):
    """Run ``phases`` sequentially inside ONE pallas_call.

    Returns ``(y [2, B], [phase aux tuples])``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x.shape[-1]
    ins_flat, in_specs = [jnp.asarray(x, jnp.float32)], [_vspec()]
    for ph in phases:
        for arr, space in ph.ins:
            ins_flat.append(jnp.asarray(arr, jnp.float32))
            in_specs.append(_vspec() if space == "vmem" else _sspec())
    out_shapes = [jax.ShapeDtypeStruct((2, B), jnp.float32)]
    out_specs = [_vspec()]
    for ph in phases:
        for shape, space in ph.aux:
            out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))
            out_specs.append(_vspec() if space == "vmem" else _sspec())
    scratch = [
        pltpu.VMEM((2, B), jnp.float32),
        pltpu.VMEM((2, B), jnp.float32),
        pltpu.SMEM((2, B), jnp.float32),
        pltpu.SMEM((2, B), jnp.float32),
        pltpu.SMEM((2, B), jnp.float32),
        pltpu.SMEM((2, B), jnp.float32),
        pltpu.SemaphoreType.DMA,
    ]
    for ph in phases:
        scratch.extend(ph.scratch)
    n_in = len(ins_flat)
    n_out = len(out_shapes)
    counts = [(len(ph.ins), len(ph.aux), len(ph.scratch), ph.body)
              for ph in phases]

    def kernel(*refs):
        in_refs = refs[:n_in]
        out_refs = refs[n_in:n_in + n_out]
        scr = refs[n_in + n_out:]
        sig = out_refs[0]
        t = _Tools(sig, scr[0], scr[1], scr[2], scr[3], scr[4], scr[5],
                   scr[6], B)
        sig[...] = in_refs[0][...]
        i, o, s = 1, 1, 7
        for n_i, n_o, n_s, body in counts:
            body(t, in_refs[i:i + n_i], out_refs[o:o + n_o],
                 scr[s:s + n_s])
            i += n_i
            o += n_o
            s += n_s

    flat = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ins_flat)
    y = flat[0]
    auxs, o = [], 1
    for ph in phases:
        auxs.append(tuple(flat[o:o + len(ph.aux)]))
        o += len(ph.aux)
    return y, auxs


# --- shared trajectory helper (the modules' closed-form smoothers) ----------

def _trajs(bank: SmootherBank, coeff: float, B: int, idxs):
    powers = jnp.power(np.float32(1.0 - coeff),
                       jnp.arange(1, B + 1, dtype=jnp.float32))

    def one(idx):
        tgt = bank.target[:, idx, None]
        d = (bank.current[:, idx] - bank.target[:, idx])[:, None] * powers
        return tgt + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)

    return [one(i) for i in idxs]


# --- SMEM scalar-loop phase bodies (2-D twins of the flat kernels) ----------

def _env_loop_body(t, n_valid):
    """Attack/release follower over the SMEM scratch (x=rect, a=att,
    b=rel → out=env).  Op order == pallas_fx._env_kernel."""
    def body(n, carry):
        new = [None, None]
        for ch in range(2):
            env = carry[ch]
            r = t.s_x[ch, n]
            c = jnp.where(r > env, t.s_a[ch, n], t.s_b[ch, n])
            e = c * env + (1.0 - c) * r
            e = jnp.where(e < 1e-15, 0.0, e)
            t.s_out[ch, n] = e
            new[ch] = e
        return tuple(new)
    return body


def _lowpass_loop_body(t):
    """Moog-ish 2-pole loop over the SMEM scratch (x, a=g, b=fb → out =
    raw stage-2).  Op order == pallas_fx._lowpass_kernel."""
    def body(n, carry):
        s = list(carry)
        for ch in range(2):
            s1, s2 = s[2 * ch], s[2 * ch + 1]
            xn = t.s_x[ch, n]
            gn = t.s_a[ch, n]
            fbn = t.s_b[ch, n]
            infb = xn - jnp.tanh(s2 * fbn) * jnp.minimum(fbn, 1.0)
            s1 = s1 + gn * (infb - s1)
            s2 = s2 + gn * (s1 - s2)
            s1 = jnp.where(jnp.abs(s1) < 1e-15, 0.0, s1)
            s2 = jnp.where(jnp.abs(s2) < 1e-15, 0.0, s2)
            ok = ~(s2 != s2)
            s1 = jnp.where(ok, s1, 0.0)
            s2 = jnp.where(ok, s2, 0.0)
            t.s_out[ch, n] = s2
            s[2 * ch], s[2 * ch + 1] = s1, s2
        return tuple(s)
    return body


# --- per-effect phase builders ----------------------------------------------
# Each returns (phases, finish) where finish(aux_tuples) -> new_state,
# replicating the effect module's TPU-branch pre/post glue exactly.

def _lowpass_phases(state, targets, sample_rate, B):
    """effects/lowpass.py process_block pallas branch."""
    from libgooey_tpu.effects import lowpass as m

    coeff = smoothing_coeff(sample_rate, 30.0)
    bank = state.smooth.with_targets(
        jnp.broadcast_to(jnp.asarray(targets, jnp.float32), (2, 2)))
    cut_raw, res = _trajs(bank, coeff, B, (m.P_CUTOFF, m.P_RES))
    cutoff = jnp.minimum(cut_raw, sample_rate * 0.40)
    g = jnp.clip(1.0 - jnp.exp(-2.0 * np.pi * cutoff / sample_rate),
                 0.0, 0.90)
    freq_ratio = jnp.minimum(cutoff / 5000.0, 1.0)
    res_eff = res * (1.0 - freq_ratio * freq_ratio * 0.7)
    fb = res_eff * 3.5

    def body(t, ins, auxs, scr):
        g_ref, fb_ref, st0 = ins
        (stl,) = auxs
        t.copy(t.sig, t.s_x)
        t.copy(g_ref, t.s_a)
        t.copy(fb_ref, t.s_b)
        final = lax.fori_loop(
            0, t.B, _lowpass_loop_body(t),
            (st0[0], st0[1], st0[2], st0[3]))
        for k in range(4):
            stl[k] = final[k]
        t.copy(t.s_out, t.vtmp)
        # output saturation: in-kernel vector tanh (vs libm in the
        # standalone wrapper, ~1e-5)
        t.sig[...] = jnp.tanh(t.vtmp[...])

    st0 = jnp.asarray(state.stages, jnp.float32).reshape(4)
    ph = Phase("lowpass", ((g, "vmem"), (fb, "vmem"), (st0, "smem")),
               (((4,), "smem"),), (), body)

    def finish(aux):
        (stl,) = aux
        return m.LowpassState(
            stages=stl.reshape(2, 2),
            smooth=SmootherBank(
                current=jnp.stack([cut_raw[:, -1], res[:, -1]], axis=-1),
                target=bank.target),
        )

    return [ph], finish


def _delay_phases(state, targets, sample_rate, B, pingpong):
    """effects/delay.py process_block pallas branch (ring stays XLA-side)."""
    from libgooey_tpu.effects import delay as m

    c_time, c_other = m.smoothing_coeffs(sample_rate)
    bank = state.smooth.with_targets(
        jnp.broadcast_to(jnp.asarray(targets, jnp.float32), (2, 4)))
    pw_time = jnp.power(1.0 - c_time,
                        jnp.arange(1, B + 1, dtype=jnp.float32))
    tgt0 = bank.target[:, m.PARAM_TIME, None]
    d0 = (bank.current[:, m.PARAM_TIME] - bank.target[:, m.PARAM_TIME])[:, None]
    dec = d0 * pw_time
    time_traj = tgt0 + jnp.where(jnp.abs(dec) < 1e-4, 0.0, dec)
    delayed = ringbuf.read_frac(state.ring, time_traj * sample_rate,
                                min_offset=1.0)
    st = jnp.concatenate(
        [state.filter_z, jnp.zeros((2, 3), jnp.float32)], axis=-1)
    cur = state.smooth.current[:, 1:4]
    tgt = bank.target[:, 1:4]
    kern = functools.partial(
        pfx._delay_kernel, coeff=float(c_other),
        sample_rate=float(sample_rate), pingpong=bool(pingpong))

    def body(t, ins, auxs, scr):
        delayed_r, cur_r, tgt_r, st_r = ins
        write_r, nst_r = auxs
        kern(t.sig, delayed_r, cur_r, tgt_r, st_r, t.sig, write_r, nst_r)

    ph = Phase(
        "delay",
        ((delayed, "vmem"), (cur, "vmem"), (tgt, "vmem"), (st, "vmem")),
        (((2, B), "vmem"), ((2, 5), "vmem")), (), body)

    def finish(aux):
        write, nst = aux
        return m.DelayState(
            ring=ringbuf.write_block(state.ring, write),
            filter_z=nst[:, 0:2],
            smooth=SmootherBank(
                current=jnp.concatenate(
                    [time_traj[:, -1:], nst[:, 2:5]], axis=-1),
                target=bank.target),
        )

    return [ph], finish


def _saturation_phases(state, targets, sample_rate, B):
    """effects/saturation.py process_block pallas branch."""
    from libgooey_tpu.effects import freeze as frz
    from libgooey_tpu.effects import saturation as m

    coeff = smoothing_coeff(sample_rate, 30.0)
    bank = state.smooth.with_targets(
        jnp.broadcast_to(jnp.asarray(targets, jnp.float32), (2, 3)))
    held = frz.traj_all_below(
        bank.current[:, m.P_MIX], bank.target[:, m.P_MIX],
        jnp.float32(1.0 - coeff), B, 1e-4)
    packed = pfx.pack_ovs4_dc(state.ovs, state.dc.x1, state.dc.y1)
    kern = functools.partial(pfx._sat4_kernel, coeff=float(coeff))

    def body(t, ins, auxs, scr):
        cur_r, tgt_r, st_r = ins
        (nst_r,) = auxs
        kern(t.sig, cur_r, tgt_r, st_r, t.sig, nst_r)

    ph = Phase(
        "saturation",
        ((bank.current, "vmem"), (bank.target, "vmem"), (packed, "vmem")),
        (((4, pfx._K_OUT), "vmem"),), (), body)

    def finish(aux):
        (nst,) = aux
        new_ovs, dc_x1, dc_y1, sm_cur = pfx.unpack_ovs4_dc(nst, state.ovs)
        return m.SaturationState(
            dc=m.DCBlockState(x1=dc_x1, y1=dc_y1),
            ovs=frz.hold_where(held, state.ovs, new_ovs),
            smooth=SmootherBank(current=sm_cur, target=bank.target),
        )

    return [ph], finish


def _compressor_phases(state, targets, sample_rate, B):
    """effects/compressor.py process_block pallas branch: detector phase
    (SMEM loop on |sig|) + post-detector phase."""
    from libgooey_tpu.effects import compressor as m

    coeff = smoothing_coeff(sample_rate, 30.0)
    bank = state.smooth.with_targets(
        jnp.broadcast_to(jnp.asarray(targets, jnp.float32), (2, 5)))
    thr, ratio, att_ms, rel_ms, mix = _trajs(
        bank, coeff, B, (m.P_THRESH, m.P_RATIO, m.P_ATTACK, m.P_RELEASE,
                         m.P_MIX))
    bypass = mix < 1e-4
    att_c = jnp.exp(-1.0 / (att_ms * 0.001 * sample_rate))
    rel_c = jnp.exp(-1.0 / (rel_ms * 0.001 * sample_rate))
    frozen = bypass
    ac = jnp.where(frozen, 1.0, att_c)
    rc = jnp.where(frozen, 1.0, rel_c)
    env0 = jnp.asarray(state.envelope, jnp.float32).reshape(2)

    def env_body(t, ins, auxs, scr):
        ac_r, rc_r, env0_r = ins
        (envl_r,) = auxs
        t.vtmp[...] = jnp.abs(t.sig[...])
        t.copy(t.vtmp, t.s_x)
        t.copy(ac_r, t.s_a)
        t.copy(rc_r, t.s_b)
        final = lax.fori_loop(0, t.B, _env_loop_body(t, t.B),
                              (env0_r[0], env0_r[1]))
        envl_r[0] = final[0]
        envl_r[1] = final[1]
        t.copy(t.s_out, t.venv)

    env_ph = Phase(
        "comp_env",
        ((ac, "vmem"), (rc, "vmem"), (env0, "smem")),
        (((2,), "smem"),), (), env_body)

    packed = pfx.pack_ovs4_dc(state.ovs, state.dc.x1, state.dc.y1)
    packed_g = jnp.concatenate(
        [packed.astype(jnp.float32), pfx._scol(state.gain)], axis=-1)

    def comp_body(t, ins, auxs, scr):
        thr_r, ratio_r, mix_r, st_r = ins
        (nst_r,) = auxs
        pfx._comp_kernel(t.sig, t.venv, thr_r, ratio_r, mix_r, st_r,
                         t.sig, nst_r)

    comp_ph = Phase(
        "compressor",
        ((thr, "vmem"), (ratio, "vmem"), (mix, "vmem"),
         (packed_g, "vmem")),
        (((4, pfx._K_OUT), "vmem"),), (), comp_body)

    def finish(aux_env, aux_comp):
        (env_last,) = aux_env
        (nst,) = aux_comp
        new_ovs, dc_x1, dc_y1, _ = pfx.unpack_ovs4_dc(nst, state.ovs)
        return m.CompressorState(
            envelope=env_last,
            gain=nst[0:2, pfx._OUT_IDX["gain"]],
            dc=m.DCBlockState(x1=dc_x1, y1=dc_y1),
            ovs=new_ovs,
            smooth=SmootherBank(
                current=jnp.stack(
                    [thr[:, -1], ratio[:, -1], att_ms[:, -1],
                     rel_ms[:, -1], mix[:, -1]], axis=-1),
                target=bank.target),
        )

    return [env_ph, comp_ph], finish


def _tilt_phases(state, targets, sample_rate, B):
    """effects/tilt.py process_block pallas branch."""
    from libgooey_tpu.effects import freeze as frz
    from libgooey_tpu.effects import tilt as m
    from libgooey_tpu.ops import filters

    coeff = smoothing_coeff(sample_rate, 30.0)
    bank = state.smooth.with_targets(
        jnp.broadcast_to(jnp.asarray(targets, jnp.float32), (2, 2)))
    q = jnp.float32(1.0 - coeff)
    _delta = bank.current[:, m.P_CUTOFF] - bank.target[:, m.P_CUTOFF]
    _d1, _dB = _delta * q, _delta * q ** jnp.float32(B)
    _k_first = bank.target[:, m.P_CUTOFF] + jnp.where(
        jnp.abs(_d1) < 1e-4, 0.0, _d1)
    _k_last = bank.target[:, m.P_CUTOFF] + jnp.where(
        jnp.abs(_dB) < 1e-4, 0.0, _dB)
    held = (jnp.abs(2.0 * _k_first - 1.0) < 0.001) & (
        jnp.abs(2.0 * _k_last - 1.0) < 0.001)
    st = jnp.stack(
        [state.svf.ic1, state.svf.ic2,
         jnp.zeros(2, jnp.float32), jnp.zeros(2, jnp.float32)], axis=-1)
    kern = functools.partial(pfx._tilt_kernel, coeff=float(coeff),
                             sample_rate=float(sample_rate))

    def body(t, ins, auxs, scr):
        cur_r, tgt_r, st_r = ins
        (nst_r,) = auxs
        kern(t.sig, cur_r, tgt_r, st_r, t.sig, nst_r)

    ph = Phase(
        "tilt",
        ((bank.current, "vmem"), (bank.target, "vmem"), (st, "vmem")),
        (((2, 4), "vmem"),), (), body)

    def finish(aux):
        (nst,) = aux
        return m.TiltState(
            svf=frz.hold_where(
                held, state.svf,
                filters.SVFState(ic1=nst[:, 0], ic2=nst[:, 1])),
            smooth=SmootherBank(current=nst[:, 2:4], target=bank.target),
        )

    return [ph], finish


def _spring_phases(state, targets, sample_rate, B):
    """effects/reverb_spring.py process_block pallas branch."""
    from libgooey_tpu.effects import reverb_spring as m

    C = m.chunk_size(sample_rate, B)
    coeff = smoothing_coeff(sample_rate)
    bank = state.smooth.with_targets(
        jnp.broadcast_to(jnp.asarray(targets, jnp.float32), (2, 3)))
    decay_t, mix_t, damping_t = _trajs(
        bank, coeff, B, (m.PARAM_DECAY, m.PARAM_MIX, m.PARAM_DAMPING))
    fb_gain_t = jnp.power(jnp.maximum(decay_t, 0.0), 0.4) * m.MAX_FEEDBACK
    dl, dr = m.delay_lengths(sample_rate)
    delays = dl + dr
    D = state.hist.shape[-1]
    alpha = float(np.prod(m.GAINS))
    p2 = 1.0 - damping_t
    fbgp = jnp.concatenate(
        [jnp.zeros((2, 1), jnp.float32), fb_gain_t[:, :-1]], axis=-1)
    A = damping_t + p2 * alpha * fbgp
    A = A.at[:, 0].set(damping_t[:, 0])
    fb0 = jnp.asarray(state.fb, jnp.float32).reshape(2, 1)
    kern = functools.partial(
        pfx._spring_kernel, B=B, C=int(C), D=D,
        delays=tuple(int(d) for d in delays),
        gains=tuple(float(g) for g in m.GAINS))

    def body(t, ins, auxs, scr):
        A_r, p2_r, fbgp_r, hist_r, damp_r, mix_r, fb0_r = ins
        hist_out_r, dlast_r = auxs
        (W,) = scr
        col = lax.broadcasted_iota(jnp.int32, (2, t.B), 1)
        # xeff = x with the carried feedback sample added at n=0
        # (reverb_spring.py: x.at[:, 0].add(state.fb))
        t.vtmp[...] = t.sig[...] + jnp.where(col == 0, fb0_r[...], 0.0)
        kern(t.vtmp, A_r, p2_r, fbgp_r, hist_r, damp_r,
             t.vtmp, hist_out_r, dlast_r, W)
        mix = mix_r[...]
        t.sig[...] = t.sig[...] * (1.0 - mix) + t.vtmp[...] * mix

    ph = Phase(
        "spring",
        ((A, "vmem"), (p2, "vmem"), (fbgp, "vmem"),
         (state.hist, "vmem"), (state.damp.reshape(2, 1), "vmem"),
         (mix_t, "vmem"), (fb0, "vmem")),
        (((state.hist.shape[0], D), "vmem"), ((2, 1), "vmem")),
        (pltpu.VMEM((state.hist.shape[0], D + B), jnp.float32),),
        body)

    def finish(aux):
        new_hist, dlast = aux
        d_last = dlast.reshape(2)
        return m.SpringState(
            hist=new_hist,
            fb=fb_gain_t[:, -1] * d_last,
            damp=d_last,
            smooth=SmootherBank(
                current=jnp.stack(
                    [decay_t[:, -1], mix_t[:, -1], damping_t[:, -1]],
                    axis=-1),
                target=bank.target),
        )

    return [ph], finish


def _waveshaper_phases(state, targets, sample_rate, B):
    """mixer/chain.py EFFECT_WAVESHAPER pallas branch (state is the bare
    OversamplerState; block-scalar drive/mix)."""
    from libgooey_tpu.effects import freeze as frz

    drive = jnp.asarray(targets[0], jnp.float32)
    mix = jnp.asarray(targets[1], jnp.float32)
    held = (mix <= 1e-4) | (drive <= 1.0)
    zeros = jnp.zeros(2, jnp.float32)
    packed = pfx.pack_ovs4_dc(state, zeros, zeros)
    prm = jnp.stack([
        jnp.broadcast_to(jnp.asarray(drive, jnp.float32), (2,)),
        jnp.broadcast_to(jnp.asarray(mix, jnp.float32), (2,)),
    ], axis=-1)

    def body(t, ins, auxs, scr):
        prm_r, st_r = ins
        (nst_r,) = auxs
        pfx._ws4_kernel(t.sig, prm_r, st_r, t.sig, nst_r)

    ph = Phase("waveshaper", ((prm, "vmem"), (packed, "vmem")),
               (((4, pfx._K_OUT), "vmem"),), (), body)

    def finish(aux):
        (nst,) = aux
        new_state, _, _, _ = pfx.unpack_ovs4_dc(nst, state)
        return frz.hold_where(held, state, new_state)

    return [ph], finish


def _fbws_phases(state, targets, sample_rate, B):
    """effects/feedback_waveshaper.py zero-feedback fast path (the chain's
    static key guarantees feedback == 0 here)."""
    from libgooey_tpu.effects import feedback_waveshaper as m
    from libgooey_tpu.effects import freeze as frz

    drive = jnp.asarray(targets[0], jnp.float32)
    feedback = jnp.asarray(targets[1], jnp.float32)
    fbc = jnp.asarray(m.filter_coeff(targets[2], sample_rate), jnp.float32)
    mix = jnp.asarray(targets[3], jnp.float32)
    att_r, rel_r = m.env_coeffs(sample_rate)
    byp_scalar = (mix <= 1e-4) | (drive <= 1.0)
    byp = jnp.broadcast_to(byp_scalar.astype(jnp.float32), (2, B))
    ac = jnp.where(byp > 0.5, 1.0, jnp.float32(att_r)) * jnp.ones((2, B))
    rc = jnp.where(byp > 0.5, 1.0, jnp.float32(rel_r)) * jnp.ones((2, B))
    env0 = jnp.asarray(state.env, jnp.float32).reshape(2)

    def env_body(t, ins, auxs, scr):
        ac_r, rc_r, env0_r = ins
        (envl_r,) = auxs
        t.vtmp[...] = jnp.abs(t.sig[...])
        t.copy(t.vtmp, t.s_x)
        t.copy(ac_r, t.s_a)
        t.copy(rc_r, t.s_b)
        final = lax.fori_loop(0, t.B, _env_loop_body(t, t.B),
                              (env0_r[0], env0_r[1]))
        envl_r[0] = final[0]
        envl_r[1] = final[1]
        t.copy(t.s_out, t.venv)

    env_ph = Phase("fbws_env", ((ac, "vmem"), (rc, "vmem"),
                                (env0, "smem")),
                   (((2,), "smem"),), (), env_body)

    packed = pfx.pack_ovs4_dc(state.ovs, state.dc_x1, state.dc_y1)
    packed_f = jnp.concatenate(
        [packed.astype(jnp.float32), pfx._scol(state.filter_state)],
        axis=-1)
    prm = jnp.stack([
        jnp.broadcast_to(p, (2,))
        for p in (drive, feedback, fbc, mix)
    ], axis=-1)

    def main_body(t, ins, auxs, scr):
        prm_r, st_r = ins
        (nst_r,) = auxs
        pfx._fbws_kernel(t.sig, t.venv, prm_r, st_r, t.sig, nst_r)

    main_ph = Phase("fbws", ((prm, "vmem"), (packed_f, "vmem")),
                    (((4, pfx._K_OUT), "vmem"),), (), main_body)

    def finish(aux_env, aux_main):
        (env_last,) = aux_env
        (nst,) = aux_main
        new_ovs2, dc_x1, dc_y1, _ = pfx.unpack_ovs4_dc(nst, state.ovs)
        filt_last = nst[0:2, pfx._OUT_IDX["gain"]]
        held = byp_scalar
        return m.FBShaperState(
            last_out=filt_last,
            filter_state=filt_last,
            dc_x1=dc_x1,
            dc_y1=dc_y1,
            env=env_last,
            ovs=frz.hold_where(held, state.ovs, new_ovs2),
        )

    return [env_ph, main_ph], finish


# --- chain assembly ---------------------------------------------------------

#: effect ids with a merged-phase builder (mixer/chain.py ids)
_BUILDERS = {
    0: _lowpass_phases,       # EFFECT_LOWPASS_FILTER
    1: _delay_phases,         # EFFECT_DELAY (pingpong-aware)
    2: _saturation_phases,    # EFFECT_SATURATION
    3: _compressor_phases,    # EFFECT_COMPRESSOR
    4: _tilt_phases,          # EFFECT_TILT_FILTER
    6: _spring_phases,        # EFFECT_REVERB
    7: _waveshaper_phases,    # EFFECT_WAVESHAPER
    8: _fbws_phases,          # EFFECT_FEEDBACK_WAVESHAPER
}


def mergeable(effect_id: int, flag: bool) -> bool:
    if effect_id == 8 and not flag:
        return False  # general feedback path: per-sample loop, not fused
    return effect_id in _BUILDERS


def process_run(entries, states, x, targets_list, *, sample_rate: float,
                interpret=None):
    """Process a mergeable run of chain entries as ONE pallas_call.

    ``entries``: [(effect_id, flag)] from the chain static key.  Returns
    ``(new_states, y)``.  The per-effect glue and kernel bodies are the
    standalone TPU path's; only the launch granularity changes.
    """
    B = x.shape[-1]
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    phases, finishers, span = [], [], []
    for (eid, flag), st, tg in zip(entries, states, targets_list):
        if eid == 1:
            phs, fin = _delay_phases(st, tg, sample_rate, B, flag)
        else:
            phs, fin = _BUILDERS[eid](st, tg, sample_rate, B)
        phases.extend(phs)
        finishers.append(fin)
        span.append(len(phs))
    y, auxs = chain_fused(x, phases, interpret=interpret)
    new_states, o = [], 0
    for fin, n in zip(finishers, span):
        new_states.append(fin(*auxs[o:o + n]))
        o += n
    return new_states, y
