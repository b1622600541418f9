"""HBM ring buffers with fractional reads: the delay-line substrate.

All delay-line systems (filter delay, reverb tanks, sample playback) keep
their audio history in device ring buffers and process per block:

* reads whose minimum lag exceeds the processed chunk length reference only
  previously written data, so a whole chunk of reads is one gather;
* writes land as one scatter (or aligned dynamic-update) per chunk;
* sub-block feedback (reverb one-poles, cross-feeds) collapses to linear
  scans because every Schroeder allpass is *affine* in its input.

Position convention: ``pos`` counts total samples written (monotone int32);
sample ``t``'s value lives at slot ``t % L``.  "offset w ago, before this
sample's write" at local sample n reads slot ``(pos + n - w) % L``
(reference: plate_reverb.rs DelayLine::read_frac/tap_frac).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Ring(NamedTuple):
    buf: jnp.ndarray  # [..., L]
    pos: jnp.ndarray  # scalar int32: total samples written

    @staticmethod
    def init(length: int, batch=()) -> "Ring":
        return Ring(
            buf=jnp.zeros(tuple(batch) + (int(length),), jnp.float32),
            pos=jnp.zeros((), jnp.int32),
        )


def write_block(ring: Ring, x) -> Ring:
    """Append ``x[..., C]`` at the current position.

    When ``L % C == 0`` the write is one aligned dynamic-update-slice (a
    contiguous DMA) instead of a per-element scatter: every writer appends
    fixed-size blocks starting from pos 0, so ``pos % L`` is then always a
    multiple of C and the slice never wraps.
    """
    import jax

    L = ring.buf.shape[-1]
    C = x.shape[-1]
    if L % C == 0:
        start = (jnp.int32(0),) * (ring.buf.ndim - 1) + (jnp.mod(ring.pos, L),)
        buf = jax.lax.dynamic_update_slice(
            ring.buf, x.reshape(ring.buf.shape[:-1] + (C,)), start
        )
    else:
        idx = jnp.mod(ring.pos + jnp.arange(C, dtype=jnp.int32), L)
        buf = ring.buf.at[..., idx].set(x)
    # keep pos reduced mod L: a free-running int32 wraps after ~13.5 h at
    # 44.1 kHz and L is rarely a power of two, so the wrap would misindex
    # (and un-align the dynamic-update-slice fast path above).  Every
    # consumer reduces mod L, so the reduction is free.
    return Ring(buf=buf, pos=jnp.mod(ring.pos + C, L))


def read_frac(ring: Ring, offsets, min_offset: float = 1.0):
    """Fractional read of ``offsets[..., C]`` samples ago (pre-write).

    Linear interpolation between the samples ``whole`` and ``whole+1`` ago
    (plate_reverb.rs:120-129).  Offsets are clamped to [min_offset, L-2].
    Local sample n (trailing axis position) reads relative to ``pos + n``.
    """
    L = ring.buf.shape[-1]
    C = offsets.shape[-1]
    offsets = jnp.clip(offsets, min_offset, L - 2.0)
    whole = jnp.floor(offsets)
    frac = offsets - whole
    n = jnp.arange(C, dtype=jnp.int32)
    base = ring.pos + n - whole.astype(jnp.int32)
    ia = jnp.mod(base, L)
    ib = jnp.mod(base - 1, L)
    a = jnp.take_along_axis(
        ring.buf, jnp.broadcast_to(ia, offsets.shape).astype(jnp.int32), axis=-1
    ) if ring.buf.ndim == offsets.ndim else ring.buf[ia]
    b = jnp.take_along_axis(
        ring.buf, jnp.broadcast_to(ib, offsets.shape).astype(jnp.int32), axis=-1
    ) if ring.buf.ndim == offsets.ndim else ring.buf[ib]
    return a + frac * (b - a)


def read_int(ring: Ring, lags):
    """Integer-lag read: ``lags[..., C]`` samples ago (pre-write)."""
    L = ring.buf.shape[-1]
    C = lags.shape[-1]
    n = jnp.arange(C, dtype=jnp.int32)
    idx = jnp.mod(ring.pos + n - jnp.asarray(lags, jnp.int32), L)
    if ring.buf.ndim == idx.ndim:
        return jnp.take_along_axis(ring.buf, idx, axis=-1)
    return ring.buf[idx]


def tap_frac(ring_after_write: Ring, offsets, n_written: int):
    """Post-write fractional tap: offset 0 = this sample's own write.

    ``ring_after_write.pos`` has already advanced by ``n_written``; local
    sample n's tap reads relative to write position ``pos - n_written + n``.
    (plate_reverb.rs:134-142: slot ``idx - 1 - whole``.)
    """
    L = ring_after_write.buf.shape[-1]
    C = offsets.shape[-1]
    offsets = jnp.clip(offsets, 0.0, L - 2.0)
    whole = jnp.floor(offsets)
    frac = offsets - whole
    n = jnp.arange(C, dtype=jnp.int32)
    base = ring_after_write.pos - n_written + n - whole.astype(jnp.int32)
    ia = jnp.mod(base, L)
    ib = jnp.mod(base - 1, L)
    if ring_after_write.buf.ndim == offsets.ndim:
        a = jnp.take_along_axis(ring_after_write.buf, ia.astype(jnp.int32), axis=-1)
        b = jnp.take_along_axis(ring_after_write.buf, ib.astype(jnp.int32), axis=-1)
    else:
        a = ring_after_write.buf[ia]
        b = ring_after_write.buf[ib]
    return a + frac * (b - a)


def affine_allpass_reads(rings, gains, offsets_list, min_offset=1.0):
    """Series-Schroeder-allpass chain as an affine map of its input chunk.

    Each allpass ``out = g*v + delayed`` with ``v = in - g*delayed`` is
    affine in ``in`` given its (pre-chunk) delayed reads: out = g*in +
    (1-g^2)*delayed.  For a chain, the composition gives

        out[n]   = (prod g_i) * in[n] + beta[n]
        in_i[n]  = (prod_{j<i} g_j) * in[n] + gamma_i[n]

    Returns ``(alpha, beta, stage_direct, stage_offsets_values)`` where
    ``stage_direct[i]`` is the coefficient of the chain input at stage i's
    input and ``stage_offsets_values[i]`` the additive part — enough to
    reconstruct every stage's write ``v_i = in_i - g_i*delayed_i`` once the
    true chunk input is known.  (Used by the spring/plate reverbs,
    reverb.rs:189-217, plate_reverb.rs:455-462.)
    """
    delayed = [
        read_frac(r, jnp.asarray(o), min_offset) for r, o in zip(rings, offsets_list)
    ]
    alpha = 1.0
    beta = 0.0
    stage_direct = []
    stage_add = []
    for g, d in zip(gains, delayed):
        stage_direct.append(alpha)
        stage_add.append(beta)
        beta = g * beta + (1.0 - g * g) * d
        alpha = alpha * g
    return alpha, beta, stage_direct, stage_add, delayed
