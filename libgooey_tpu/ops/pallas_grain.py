"""Pallas TPU kernels for per-grain cubic / per-voice linear buffer reads.

The granulator/sampler hot loop reads ``[G, B]`` interpolated samples at
positions ``pos[g, n] = p0[g] + step[g] * n`` — linear in n.  XLA lowers
this to a random gather (descriptor-rate bound: ~62 ms for 4000x512 taps
on a v5e).  These kernels exploit the linearity: each CH-sample output
chunk touches one CONTIGUOUS source window, so per (grain, chunk) they

1. DMA that window HBM->VMEM as one flat ``[WINR*128]`` lane row,
   double-buffered so the next window's transfer hides behind the
   current chunk's compute;
2. build a TRANSPOSED selection matrix ``Oh[WINR*128, CH]`` — a single
   ``j == floor(pos[n])`` ONE-HOT per output sample, from iota
   arithmetic — rows outside the chunk's tap span are zeroed, not
   built (for |step| <= 2 that skips ~2/3 of the rows);
3. gather all four cubic taps with ONE MXU pass: the LHS stacks the
   window's (bf16-hi, bf16-lo) split under lane-rolls of +1/+2/+3
   (``pltpu.roll``), so ``lhs[8, K] @ Oh[K, CH]`` returns tap streams
   ``t_k[n] = win[rel[n]+k]`` and the Catmull-Rom combine runs on
   [1, CH] vectors afterwards.

Two earlier revisions, kept for the record: (a) one [128, 128] matvec
per active window row — the ~150 ns per-matmul dispatch latency
dominated (48k matvecs = 7.3 ms/block at 4000 grains); (b) a DENSE
cubic weight band (weights folded into the matrix, bf16x3 via
``_dot3``) — the [128, CH] per-row weight construction on the VPU
(~6-8 ops/element over the whole tap band) was ~70 % of kernel time,
and the hi/lo x3 product needed 2 MXU dispatches per chunk.  The
one-hot form costs ~2 ops/element over a NARROWER band (taps ride the
rolled LHS rows, not extra band rows), runs ONE MXU dispatch per
chunk, and moved config-5 (4,128 lanes) from 7.8k to >=15k aggregate
RTF.

Positions are clipped to the buffer exactly like the XLA path; the
buffer is edge-padded by (1, 2) so the 4-tap stencil never leaves the
window.  Valid for ``|step| <= MAX_STEP`` (~7); the wrapper clips steps
to that range — the reference's pitch map tops out at 4x.

Numerics: every LHS value is bf16-representable by construction (hi =
bf16(win), lo = bf16(win - hi)) and the one-hot entries are exactly
0/1, so the MXU's default-precision operand rounding is LOSSLESS and
the TPU dot bit-matches the interpret-mode f32 dot.  The only error vs
the XLA gather path is the dropped sub-lo residual of the hi+lo split
(~2^-18 relative on the buffer values, ~-100 dBFS); the Catmull-Rom
combine reuses the gather path's exact Horner op order on the
recovered taps.  (Round-1 note: default MXU precision on RAW f32
operands costs -39 dBFS; HIGHEST costs 6 passes — the split sidesteps
both.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256               # output samples per window chunk (<= engine block)
TG = 8                    # grains per grid program
MAX_STEP = float((15 * 128 - 5 - 127) / (CHUNK - 1))  # largest tier, ~7.02


def _split_hi_lo(wf):
    """bf16 (hi, lo) split of an f32 row, RETURNED AS f32: both halves are
    exactly bf16-representable, so the MXU's default-precision operand
    rounding is lossless and TPU/interpret paths agree bit-for-bit.  The
    dropped residual (win - hi - lo) is ~2^-18 relative."""
    hi = wf.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (wf - hi).astype(jnp.bfloat16).astype(jnp.float32)
    return hi, lo


#: per-grain window tiers (rows of 128): the smallest R with
#: R*128 - 5 - 127 >= (CH-1)|step| is picked per grain (step is constant
#: over the block), so a |step|<=0.99 grain builds/dots 384 lanes instead
#: of a worst-case 1920.  (1-D HBM slices must align to 1024 elements, so
#: windows stay row-granular: up to 127 lanes of alignment waste.)  The
#: -5 (one lane beyond the 4-tap stencil) buys ulp slack: the roll-wrap
#: guarantee rel <= K-4 holds exactly in exact arithmetic at -4, but fp
#: rounding of a chunk-endpoint position at a tier boundary could push
#: rel one lane higher, where the +3 rolled plane would wrap lane K-3
#: to win[0] and select a wrong tap (ADVICE r3).
_TIERS_R = (3, 5, 6, 15)


def _kernel(p0_ref, step_ref, buf_ref, out_ref, win_ref, oh_ref, lhs_ref, sem,
            *, B, NR, L, CH):
    """Tiered double-buffered windows: each (grain, chunk) DMAs the
    smallest row span covering its tap band.  win_ref: [2, RMAX, 128];
    oh_ref: [RMAX*128, CH] one-hot; lhs_ref: [8, RMAX*128] rolled hi/lo
    planes; buf_ref: [NR, 128] HBM rows.  (A variant that stored the
    LHS planes in bf16 directly measured SLOWER in the dense-band
    revision — bf16 stores retile (8,128)->(16,128) and cost more than
    the f32 plane's cast round-trip saves.)"""
    LF = np.float32(L - 1)
    RMAX = _TIERS_R[-1]
    ncols = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1).astype(jnp.float32)
    krow = jax.lax.broadcasted_iota(jnp.int32, (128, CH), 0)
    NCH = B // CH
    NK = TG * NCH

    def tier_of(t):
        sab = jnp.abs(step_ref[t, 0])
        tier = len(_TIERS_R) - 1
        for i in range(len(_TIERS_R) - 2, -1, -1):
            tier = jnp.where(
                sab <= np.float32((_TIERS_R[i] * 128 - 5 - 127) / (CH - 1)),
                i, tier)
        return tier

    def w0row(t, c, R):
        p0 = p0_ref[t, 0]
        stp = step_ref[t, 0]
        n0 = jnp.asarray(c * CH, jnp.float32)
        a = jnp.clip(p0 + stp * n0, 0.0, LF)
        b = jnp.clip(p0 + stp * (n0 + CH - 1), 0.0, LF)
        w0 = jnp.floor(jnp.minimum(a, b)).astype(jnp.int32)
        return jnp.clip(w0 // 128, 0, NR - R)

    def dma(k, slot, R):
        t, c = k // NCH, k % NCH
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(w0row(t, c, R), R)],
            win_ref.at[slot, 0:R], sem.at[slot],
        )

    def start_dma(k, slot):
        tier = tier_of(k // NCH)
        for i, R in enumerate(_TIERS_R):
            @pl.when(tier == i)
            def _(R=R):
                dma(k, slot, R).start()

    start_dma(0, 0)

    def body(k, _):
        t, c = k // NCH, k % NCH
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < NK)
        def _():
            start_dma(k + 1, jax.lax.rem(k + 1, 2))

        p0 = p0_ref[t, 0]
        stp = step_ref[t, 0]
        n0 = jnp.asarray(c * CH, jnp.float32)
        pos = jnp.clip(p0 + stp * (n0 + ncols), 0.0, LF)   # [1, CH]
        i1f = jnp.floor(pos)
        f = pos - i1f

        tier = tier_of(t)
        for i, R in enumerate(_TIERS_R):
            @pl.when(tier == i)
            def _(R=R):
                w0r = w0row(t, c, R)
                # padded coords: tap p0 (= buf[i1-1]) sits at window rel
                rel = i1f.astype(jnp.int32) - w0r * 128     # [1, CH]
                a = jnp.clip(p0 + stp * n0, 0.0, LF)
                b = jnp.clip(p0 + stp * (n0 + CH - 1), 0.0, LF)
                rel_a = jnp.floor(a).astype(jnp.int32) - w0r * 128
                rel_b = jnp.floor(b).astype(jnp.int32) - w0r * 128
                rmin = jnp.minimum(rel_a, rel_b)
                # the band only needs the d == 0 row (taps +1..+3 ride
                # the rolled LHS planes), so no +3 here
                rmax = jnp.maximum(rel_a, rel_b)
                for r in range(R):
                    overlap = (r * 128 <= rmax) & ((r + 1) * 128 > rmin)

                    @pl.when(overlap)
                    def _(r=r):
                        d = (r * 128 + krow) - rel          # [128, CH]
                        oh_ref[r * 128:(r + 1) * 128, :] = (
                            d == 0).astype(jnp.float32)

                    @pl.when(jnp.logical_not(overlap))
                    def _(r=r):
                        oh_ref[r * 128:(r + 1) * 128, :] = jnp.zeros(
                            (128, CH), jnp.float32)

                dma(k, slot, R).wait()
                K = R * 128
                wf = win_ref[slot, 0:R].reshape(1, K)
                hi, lo = _split_hi_lo(wf)
                lhs_ref[0:1, 0:K] = hi
                lhs_ref[4:5, 0:K] = lo
                for kk in (1, 2, 3):
                    # pltpu.roll(x, K-kk) == jnp.roll(x, -kk): lane j
                    # holds win[j+kk]; rel <= K-5 (tier margin incl.
                    # one lane of ulp slack), so the wrapped top lanes
                    # are never selected
                    lhs_ref[kk:kk + 1, 0:K] = pltpu.roll(hi, K - kk, 1)
                    lhs_ref[4 + kk:5 + kk, 0:K] = pltpu.roll(lo, K - kk, 1)
                g = jnp.dot(lhs_ref[0:8, 0:K], oh_ref[0:K, :],
                            preferred_element_type=jnp.float32)   # [8, CH]
                t0 = g[0:1] + g[4:5]
                t1 = g[1:2] + g[5:6]
                t2 = g[2:3] + g[6:7]
                t3 = g[3:4] + g[7:8]
                # gather path's exact Horner combine (see gather_read_cubic)
                a0 = -0.5 * t0 + 1.5 * t1 - 1.5 * t2 + 0.5 * t3
                a1 = t0 - 2.5 * t1 + 2.0 * t2 - 0.5 * t3
                a2 = -0.5 * t0 + 0.5 * t2
                out_ref[pl.ds(t, 1), pl.ds(c * CH, CH)] = (
                    (a0 * f + a1) * f + a2) * f + t1

        return 0

    jax.lax.fori_loop(0, NK, body, 0)


def grain_read_cubic(buffer, p0, step, *, B: int, interpret=None):
    """Cubic reads at ``clip(p0 + step*n, 0, L-1)`` -> ``[G, B]``.

    Semantics match the XLA gather path (per-tap edge clamping via the
    padded buffer).  ``B % CH == 0``; G padded to a TG multiple.
    """
    if interpret is None:  # CPU (tests) runs the same kernel interpreted
        interpret = jax.default_backend() != "tpu"
    CH = min(CHUNK, B)
    L = buffer.shape[0]
    G = p0.shape[0]
    RMAX = _TIERS_R[-1]
    padded = jnp.concatenate([buffer[:1], buffer, buffer[-1:], buffer[-1:]])
    # rows of 128; pad one full window of extra rows so any w0r fits
    NR = -(-(L + 3) // 128) + RMAX
    padded = jnp.pad(padded, (0, NR * 128 - (L + 3)))
    # NOTE: p0 is NOT pre-clipped — the kernel clips pos per sample, which
    # preserves edge-hold ramps that start outside the buffer
    p0p = jnp.asarray(p0, jnp.float32)
    stp = jnp.clip(step, -MAX_STEP, MAX_STEP)
    Gp = ((G + TG - 1) // TG) * TG
    p0p = jnp.pad(p0p, (0, Gp - G))
    stp = jnp.pad(stp, (0, Gp - G))
    p0p = jnp.nan_to_num(p0p, nan=0.0, posinf=3e38, neginf=-3e38)
    args = (p0p.reshape(Gp, 1).astype(jnp.float32),
            stp.reshape(Gp, 1).astype(jnp.float32),
            padded.reshape(NR, 128).astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_kernel, B=B, NR=NR, L=L, CH=CH),
        out_shape=jax.ShapeDtypeStruct((Gp, B), jnp.float32),
        grid=(Gp // TG,),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TG, B), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, RMAX, 128), jnp.float32),
            pltpu.VMEM((RMAX * 128, CH), jnp.float32),
            pltpu.VMEM((8, RMAX * 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)
    return out[:G]


def gather_read_cubic(buffer, p0, step, *, B: int):
    """The XLA gather path (granulator.py's inline math) -- the semantics
    this kernel must match."""
    L = buffer.shape[0]
    n = jnp.arange(B, dtype=jnp.float32)
    pos = jnp.clip(p0[:, None] + step[:, None] * n[None, :], 0.0, L - 1.0)
    i1 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - jnp.floor(pos)
    p0_ = buffer[jnp.clip(i1 - 1, 0, L - 1)]
    p1 = buffer[i1]
    p2 = buffer[jnp.clip(i1 + 1, 0, L - 1)]
    p3 = buffer[jnp.clip(i1 + 2, 0, L - 1)]
    a0 = -0.5 * p0_ + 1.5 * p1 - 1.5 * p2 + 0.5 * p3
    a1 = p0_ - 2.5 * p1 + 2.0 * p2 - 0.5 * p3
    a2 = -0.5 * p0_ + 0.5 * p2
    return ((a0 * frac + a1) * frac + a2) * frac + p1


# --- sampler variant: linear-interp stereo reads over an interleaved arena ---

#: increment clip: reference increments are buffer_sr/engine_sr
#: (sampler.rs:118) <= ~2.2 even for 96 kHz buffers in a 44.1 kHz engine;
#: 4.0 leaves margin while keeping the stride-2 window at 17 rows
MAX_INC = 4.0


def _kernel_lin(p0_ref, step_ref, hi_ref, base_ref, buf_ref, out_ref,
                win_ref, oh_ref, lhs_ref, sem, *, B, NR, CH, WR):
    """Each chunk emits BOTH channels from one window: the output tile is
    [1, 2*CH] with L samples in lanes 0:CH and R in CH:2CH (R taps sit one
    flat index above L in the interleaved arena), so stereo costs one DMA
    + one dot instead of two.  Same one-hot + rolled-LHS scheme as
    ``_kernel``; the interleaved second tap sits at flat +2, so the LHS
    rows are [row0=hi, row1=hi rolled +2, row2=lo, row3=lo rolled +2]
    and ONE M=4 dot returns both taps."""
    KW = WR * 128
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * CH), 1)
    is_r = (lane2 >= CH).astype(jnp.int32)                  # channel offset
    ncols2 = (lane2 - is_r * CH).astype(jnp.float32)        # sample-in-chunk
    krow = jax.lax.broadcasted_iota(jnp.int32, (128, 2 * CH), 0)
    NCH = B // CH
    NK = TG * NCH

    def w0row(t, c):
        p0 = p0_ref[t, 0]
        stp = step_ref[t, 0]
        hi = hi_ref[t, 0]
        flat_base = base_ref[t, 0]
        n0 = jnp.asarray(c * CH, jnp.float32)
        a = jnp.clip((p0 + n0) * stp, 0.0, hi)
        b = jnp.clip((p0 + n0 + CH - 1) * stp, 0.0, hi)
        w0 = 2 * jnp.floor(jnp.minimum(a, b)).astype(jnp.int32) + flat_base
        return jnp.clip(w0 // 128, 0, NR - WR)

    def dma(k, slot):
        t, c = k // NCH, k % NCH
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(w0row(t, c), WR)],
            win_ref.at[slot], sem.at[slot],
        )

    dma(0, 0).start()

    def body(k, _):
        t, c = k // NCH, k % NCH
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < NK)
        def _():
            dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        p0 = p0_ref[t, 0]
        stp = step_ref[t, 0]
        hi = hi_ref[t, 0]
        flat_base = base_ref[t, 0]
        w0r = w0row(t, c)
        n0 = jnp.asarray(c * CH, jnp.float32)
        # positions in SLOT-RELATIVE frame coords computed as
        # (age0 + n) * inc — the gather path's exact f32 order, so the
        # two paths agree bit-for-bit (p0 here carries age0)
        pos = jnp.clip((p0 + n0 + ncols2) * stp, 0.0, hi)   # [1, 2CH]
        i0f = jnp.floor(pos)
        f = pos - i0f
        rel = 2 * i0f.astype(jnp.int32) + flat_base - w0r * 128 + is_r
        a = jnp.clip((p0 + n0) * stp, 0.0, hi)
        b = jnp.clip((p0 + n0 + CH - 1) * stp, 0.0, hi)
        rel_a = 2 * jnp.floor(a).astype(jnp.int32) + flat_base - w0r * 128
        rel_b = 2 * jnp.floor(b).astype(jnp.int32) + flat_base - w0r * 128
        rmin = jnp.minimum(rel_a, rel_b)
        rmax = jnp.maximum(rel_a, rel_b) + 1    # +1 R-channel offset only

        for r in range(WR):
            overlap = (r * 128 <= rmax) & ((r + 1) * 128 > rmin)

            @pl.when(overlap)
            def _(r=r):
                d = (r * 128 + krow) - rel                 # [128, 2CH]
                oh_ref[r * 128:(r + 1) * 128, :] = (d == 0).astype(jnp.float32)

            @pl.when(jnp.logical_not(overlap))
            def _(r=r):
                oh_ref[r * 128:(r + 1) * 128, :] = jnp.zeros((128, 2 * CH),
                                                             jnp.float32)

        dma(k, slot).wait()
        win = win_ref[slot].reshape(1, KW)  # [WR, 128] rows -> one lane row
        whi, wlo = _split_hi_lo(win)
        lhs_ref[0:1, :] = whi
        lhs_ref[2:3, :] = wlo
        # second tap = frame+1 = flat +2 in the interleaved arena
        lhs_ref[1:2, :] = pltpu.roll(whi, KW - 2, 1)
        lhs_ref[3:4, :] = pltpu.roll(wlo, KW - 2, 1)
        g = jnp.dot(lhs_ref[...], oh_ref[...],
                    preferred_element_type=jnp.float32)     # [4, 2CH]
        t0 = g[0:1] + g[2:3]
        t1 = g[1:2] + g[3:4]
        # gather path's exact combine: f0 + (f1 - f0) * frac
        out_ref[pl.ds(t, 1), pl.ds(c * 2 * CH, 2 * CH)] = t0 + (t1 - t0) * f
        return 0

    jax.lax.fori_loop(0, NK, body, 0)


def sampler_read_linear(arena, base, end_frames, age0, inc, *, B: int,
                        interpret=None):
    """Linear-interp stereo reads over an interleaved arena → ``[V, B, 2]``.

    Per voice: frame position ``clip((age0 + n) * inc, 0, end-1)`` relative
    to ``base`` (the slot's arena offset), taps ``frame`` and ``frame+1``
    clamped to the slot end — bit-matching sampler.py's gather path.
    ``arena``: [F, 2] float32.  One kernel voice emits BOTH channels per
    chunk (they share the window), so stereo is free.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    CH = min(CHUNK, B)
    WR = -(-int(2 * (CH - 1) * MAX_INC + 7 + 127) // 128)
    F = arena.shape[0]
    V = age0.shape[0]
    flat = arena.reshape(2 * F)
    NR = -(-(2 * F) // 128) + WR
    flat = jnp.pad(flat, (0, NR * 128 - 2 * F))
    # slot-relative clip bound.  The gather path clamps the i0+1 tap to
    # int(end-1), which collapses the fractional last frame to a hold at
    # arena[floor(end-1)]; clipping the position to the INTEGER end
    # reproduces that hold exactly (frac == 0 on the plateau, so the d==2
    # tap never reads past the slot).
    hi = jnp.floor(jnp.maximum(end_frames - 1.0, 0.0))
    p0a = jnp.asarray(age0, jnp.float32)
    stp = jnp.clip(inc, -MAX_INC, MAX_INC)
    Gp = ((V + TG - 1) // TG) * TG
    padv = lambda x: jnp.pad(x, (0, Gp - V))
    NCH = B // CH
    args = (padv(p0a).reshape(Gp, 1), padv(stp).reshape(Gp, 1),
            padv(hi).reshape(Gp, 1),
            padv(2 * jnp.asarray(base, jnp.int32)).reshape(Gp, 1),
            flat.reshape(NR, 128).astype(jnp.float32))

    def call(wr):
        return pl.pallas_call(
            functools.partial(_kernel_lin, B=B, NR=NR, CH=CH, WR=wr),
            out_shape=jax.ShapeDtypeStruct((Gp, 2 * B), jnp.float32),
            grid=(Gp // TG,),
            in_specs=[
                pl.BlockSpec((TG, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TG, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TG, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TG, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TG, 2 * B), lambda i: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, wr, 128), jnp.float32),
                pltpu.VMEM((wr * 128, 2 * CH), jnp.float32),
                pltpu.VMEM((4, wr * 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )

    # two-tier windows: the narrow kernel covers inc <= ~2.25 (every
    # realistic buffer_sr/engine_sr ratio) with ~1.7x fewer MXU passes
    WR_FAST = 10
    fast_max = (WR_FAST * 128 - 7 - 127) / (2 * (CH - 1))
    if interpret:
        out = call(WR)(*args)  # interpreter: one instance, full window
    else:
        ok = jnp.max(jnp.abs(stp)) <= np.float32(fast_max)
        out = jax.lax.cond(
            ok, lambda a, b, c, d, e: call(WR_FAST)(a, b, c, d, e),
            lambda a, b, c, d, e: call(WR)(a, b, c, d, e), *args)
    # per chunk the 2CH lanes are [L(c), R(c)]: -> [V, B, 2]
    return out[:V].reshape(V, NCH, 2, CH).transpose(0, 1, 3, 2).reshape(V, B, 2)
