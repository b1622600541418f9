"""Pallas TPU kernel for per-grain cubic buffer reads.

The granulator/sampler hot loop reads ``[G, B]`` cubic-interpolated
samples at positions ``pos[g, n] = p0[g] + step[g] * n`` — linear in n.
XLA lowers this to a random gather (descriptor-rate bound: ~62 ms for
4000x512 taps on a v5e).  This kernel exploits the linearity: each
128-sample output chunk touches one CONTIGUOUS source window, so it

1. DMAs that window HBM->VMEM as ``WINR`` 128-float rows at an arbitrary
   row offset (a handful of descriptors per chunk instead of one per
   tap),
2. builds the Catmull-Rom weights as dense ``[CHUNK, 128]`` tiles from
   iota arithmetic -- no gather anywhere -- and
3. accumulates the chunk as ``WINR`` MXU matvecs ``W_r @ window_row_r``.

Positions are clipped to the buffer exactly like the XLA path; the
buffer is edge-padded by (1, 2) so the 4-tap stencil never leaves the
window.  Valid for ``|step| <= MAX_STEP`` (~7); the wrapper clips steps
to that range -- the reference's pitch map tops out at 4x.

Numerics: the kernel evaluates the interpolation in basis form
(c0*p0 + c1*p1 + c2*p2 + c3*p3) while the gather path uses Horner form;
both are f32 roundings of the same polynomial and sit within
~eps(pos)*slope of the f64 truth (positions at ~4k: ~1e-3 absolute), on
opposite sides.  Same precision class as the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
WINR = 8                  # window rows of 128 floats DMA'd per chunk
TG = 8                    # grains per grid program
MAX_STEP = float((WINR * 128 - 4 - 127) / (CHUNK - 1))  # ~7.03


def _kernel(p0_ref, step_ref, buf_ref, out_ref, win_ref, acc_ref, sem, *, B, NR, L):
    LF = np.float32(L - 1)

    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0).astype(jnp.float32)

    for t in range(TG):  # static unroll over the program's grains
        p0 = p0_ref[t, 0]
        stp = step_ref[t, 0]

        def chunk_body(c, _, t=t, p0=p0, stp=stp):
            n0 = (c * CHUNK).astype(jnp.float32)
            a = jnp.clip(p0 + stp * n0, 0.0, LF)
            b = jnp.clip(p0 + stp * (n0 + CHUNK - 1), 0.0, LF)
            w0 = jnp.floor(jnp.minimum(a, b)).astype(jnp.int32)
            w0r = jnp.clip(w0 // 128, 0, NR - WINR)   # window start row
            dma = pltpu.make_async_copy(
                buf_ref.at[pl.ds(w0r, WINR)], win_ref, sem
            )
            dma.start()

            pos = jnp.clip(p0 + stp * (n0 + row), 0.0, LF)     # [CHUNK, 1]
            i1f = jnp.floor(pos)
            f = pos - i1f
            # padded coords: tap p0 (= buf[i1-1]) sits at window index rel
            rel = i1f.astype(jnp.int32) - w0r * 128            # [CHUNK, 1]
            f2 = f * f
            f3 = f2 * f
            c0 = -0.5 * f3 + f2 - 0.5 * f
            c1 = 1.5 * f3 - 2.5 * f2 + 1.0
            c2 = -1.5 * f3 + 2.0 * f2 + 0.5 * f
            c3 = 0.5 * f3 - 0.5 * f2

            # chunk-level tap bounds: rows outside [rmin, rmax+3] hold no
            # taps, so their weight tiles are skipped (predicated) — for
            # |step| <= 1 that's 5 of the 8 rows
            rel_a = jnp.floor(a).astype(jnp.int32) - w0r * 128
            rel_b = jnp.floor(b).astype(jnp.int32) - w0r * 128
            rmin = jnp.minimum(rel_a, rel_b)
            rmax = jnp.maximum(rel_a, rel_b) + 3

            dma.wait()
            acc_ref[...] = jnp.zeros((CHUNK, 1), jnp.float32)
            for r in range(WINR):  # static: one weight tile + matvec per row
                overlap = (r * 128 <= rmax) & ((r + 1) * 128 > rmin)

                @pl.when(overlap)
                def _(r=r):
                    d = (r * 128 + col) - rel                  # [CHUNK, 128]
                    W = (jnp.where(d == 0, c0, 0.0)
                         + jnp.where(d == 1, c1, 0.0)
                         + jnp.where(d == 2, c2, 0.0)
                         + jnp.where(d == 3, c3, 0.0))
                    wr = win_ref[r].reshape(128, 1)
                    acc_ref[...] += jnp.dot(W, wr,
                                            preferred_element_type=jnp.float32)

            out_ref[t, pl.ds(c * CHUNK, CHUNK)] = acc_ref[...][:, 0]
            return 0

        jax.lax.fori_loop(0, B // CHUNK, chunk_body, 0)


def grain_read_cubic(buffer, p0, step, *, B: int, interpret=None):
    """Cubic reads at ``clip(p0 + step*n, 0, L-1)`` -> ``[G, B]``.

    Semantics match the XLA gather path (per-tap edge clamping via the
    padded buffer).  ``B % CHUNK == 0``; G padded to a TG multiple.
    """
    if interpret is None:  # CPU (tests) runs the same kernel interpreted
        interpret = jax.default_backend() != "tpu"
    L = buffer.shape[0]
    G = p0.shape[0]
    padded = jnp.concatenate([buffer[:1], buffer, buffer[-1:], buffer[-1:]])
    # rows of 128; pad one full window of extra rows so any w0r fits
    NR = -(-(L + 3) // 128) + WINR
    padded = jnp.pad(padded, (0, NR * 128 - (L + 3)))
    # NOTE: p0 is NOT pre-clipped — the kernel clips pos per sample, which
    # preserves edge-hold ramps that start outside the buffer
    p0p = jnp.asarray(p0, jnp.float32)
    stp = jnp.clip(step, -MAX_STEP, MAX_STEP)
    Gp = ((G + TG - 1) // TG) * TG
    p0p = jnp.pad(p0p, (0, Gp - G))
    stp = jnp.pad(stp, (0, Gp - G))
    p0p = jnp.nan_to_num(p0p, nan=0.0, posinf=3e38, neginf=-3e38)
    out = pl.pallas_call(
        functools.partial(_kernel, B=B, NR=NR, L=L),
        out_shape=jax.ShapeDtypeStruct((Gp, B), jnp.float32),
        grid=(Gp // TG,),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TG, B), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((WINR, 128), jnp.float32),
            pltpu.VMEM((CHUNK, 1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(p0p.reshape(Gp, 1).astype(jnp.float32),
      stp.reshape(Gp, 1).astype(jnp.float32),
      padded.reshape(NR, 128).astype(jnp.float32))
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

SWINR = 16                # sampler window rows (stride-2 flat positions; sublane-aligned)
MAX_INC = float((SWINR * 128 - 6 - 127) / (2 * (CHUNK - 1)))  # ~5.5 frames/sample


def _kernel_lin(p0_ref, step_ref, hi_ref, base_ref, ch_ref, buf_ref, out_ref,
                win_ref, sem, *, B, NR):
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0).astype(jnp.float32)

    for t in range(TG):
        p0 = p0_ref[t, 0]
        stp = step_ref[t, 0]
        hi = hi_ref[t, 0]
        flat_base = base_ref[t, 0]  # 2*base + ch (int)
        ch = ch_ref[t, 0]
        del ch  # folded into flat_base

        def chunk_body(c, _, t=t, p0=p0, stp=stp, hi=hi, flat_base=flat_base):
            n0 = (c * CHUNK).astype(jnp.float32)
            # positions in SLOT-RELATIVE frame coords computed as
            # (age0 + n) * inc — the gather path's exact f32 order, so the
            # two paths agree bit-for-bit (p0 here carries age0)
            a = jnp.clip((p0 + n0) * stp, 0.0, hi)
            b = jnp.clip((p0 + n0 + CHUNK - 1) * stp, 0.0, hi)
            w0 = 2 * jnp.floor(jnp.minimum(a, b)).astype(jnp.int32) + flat_base
            w0r = jnp.clip(w0 // 128, 0, NR - SWINR)
            dma = pltpu.make_async_copy(
                buf_ref.at[pl.ds(w0r, SWINR)], win_ref, sem
            )
            dma.start()

            pos = jnp.clip((p0 + n0 + row) * stp, 0.0, hi)     # frame coords
            i0f = jnp.floor(pos)
            f = pos - i0f
            rel = 2 * i0f.astype(jnp.int32) + flat_base - w0r * 128
            rel_a = 2 * jnp.floor(a).astype(jnp.int32) + flat_base - w0r * 128
            rel_b = 2 * jnp.floor(b).astype(jnp.int32) + flat_base - w0r * 128
            rmin = jnp.minimum(rel_a, rel_b)
            rmax = jnp.maximum(rel_a, rel_b) + 2

            dma.wait()
            acc_shape = (CHUNK, 1)
            acc = jnp.zeros(acc_shape, jnp.float32)
            for r in range(SWINR):
                overlap = (r * 128 <= rmax) & ((r + 1) * 128 > rmin)
                d = (r * 128 + col) - rel                      # [CHUNK, 128]
                W = jnp.where(d == 0, 1.0 - f, 0.0) + jnp.where(d == 2, f, 0.0)
                wr = win_ref[r].reshape(128, 1)
                part = jnp.dot(W, wr, preferred_element_type=jnp.float32)
                acc = acc + jnp.where(overlap, part, 0.0)
            out_ref[t, pl.ds(c * CHUNK, CHUNK)] = acc[:, 0]
            return 0

        jax.lax.fori_loop(0, B // CHUNK, chunk_body, 0)


def sampler_read_linear(arena, base, end_frames, age0, inc, *, B: int,
                        interpret=None):
    """Linear-interp stereo reads over an interleaved arena → ``[V, B, 2]``.

    Per voice: frame position ``clip((age0 + n) * inc, 0, end-1)`` relative
    to ``base`` (the slot's arena offset), taps ``frame`` and ``frame+1``
    clamped to the slot end — bit-matching sampler.py's gather path.
    ``arena``: [F, 2] float32.  Runs L and R as 2V grains of one kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    F = arena.shape[0]
    V = age0.shape[0]
    flat = arena.reshape(2 * F)
    NR = -(-(2 * F) // 128) + SWINR
    flat = jnp.pad(flat, (0, NR * 128 - 2 * F))
    # slot-relative clip bound.  The gather path clamps the i0+1 tap to
    # int(end-1), which collapses the fractional last frame to a hold at
    # arena[floor(end-1)]; clipping the position to the INTEGER end
    # reproduces that hold exactly (frac == 0 on the plateau, so the d==2
    # tap never reads past the slot).
    hi = jnp.floor(jnp.maximum(end_frames - 1.0, 0.0))
    p0a = jnp.asarray(age0, jnp.float32)
    stp = jnp.clip(inc, -MAX_INC, MAX_INC)
    # NOTE: the i0+1 tap is clamped to the slot end by construction: at
    # pos == hi the weight of tap d==2 is frac(hi)... the gather path
    # clamps i1 = min(i0+1, end-1); at integer hi frac == 0 so the d==2
    # tap (one past the end) has zero weight — identical output.
    V2 = 2 * V
    Gp = ((V2 + TG - 1) // TG) * TG

    def dup(x):
        return jnp.pad(jnp.stack([x, x], axis=1).reshape(V2), (0, Gp - V2))

    ch = jnp.pad(jnp.tile(jnp.asarray([0, 1], jnp.int32), (V,)), (0, Gp - V2))
    base2 = jnp.pad(jnp.stack([2 * base, 2 * base], axis=1).reshape(V2),
                    (0, Gp - V2)) + ch
    out = pl.pallas_call(
        functools.partial(_kernel_lin, B=B, NR=NR),
        out_shape=jax.ShapeDtypeStruct((Gp, B), jnp.float32),
        grid=(Gp // TG,),
        in_specs=[
            pl.BlockSpec((TG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TG, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TG, B), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((SWINR, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(dup(p0a).reshape(Gp, 1), dup(stp).reshape(Gp, 1),
      dup(hi).reshape(Gp, 1), base2.astype(jnp.int32).reshape(Gp, 1),
      ch.reshape(Gp, 1), flat.reshape(NR, 128))
    return out[:V2].reshape(V, 2, B).transpose(0, 2, 1)  # [V, B, 2]
