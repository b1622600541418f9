"""Pallas TPU kernel for first-order linear recurrences.

``y[n] = a[n] * y[n-1] + b[n]`` over ``[V, B]`` blocks — the workhorse
under every smoother, one-pole, DC blocker and allpass section.

Why a kernel: XLA lowers ``jax.lax.associative_scan`` to log2(B) full
passes over HBM (~18 array traversals for B=512).  This kernel reads
``a``/``b`` from HBM once per 128-column chunk and runs the log-depth
Hillis-Steele combine entirely in VMEM/registers, carrying the running
value across chunks — one HBM read + one write total, with every step a
full-width [TV, 128] VPU op.

Exact same affine-composition order as ops.scan.linrec1's associative
scan (a_new = a * a_shift, b_new = b + a * b_shift), so results agree to
float32 reassociation noise.

Used automatically by ops.scan.linrec1 on the TPU backend for 2-D
inputs whose batch divides the row tile; everything else falls back to
the associative scan.  ``interpret=True`` runs the same kernel through
the Pallas interpreter for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128          # lane width of one in-VMEM scan chunk
ROW_TILE = 256       # voices per grid program (3 x 256 x B x 4B VMEM)


def _kernel(a_ref, b_ref, y0_ref, out_ref):
    TV, B = a_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (TV, CHUNK), 1)

    def chunk(c, carry):
        av = a_ref[:, pl.ds(c * CHUNK, CHUNK)]
        bv = b_ref[:, pl.ds(c * CHUNK, CHUNK)]
        d = 1
        while d < CHUNK:  # static unroll: log2(CHUNK) combine steps in VMEM
            a_sh = jnp.pad(av, ((0, 0), (d, 0)))[:, :CHUNK]
            b_sh = jnp.pad(bv, ((0, 0), (d, 0)))[:, :CHUNK]
            valid = col >= d
            bv = jnp.where(valid, bv + av * b_sh, bv)
            av = jnp.where(valid, av * a_sh, av)
            d *= 2
        y = bv + av * carry
        out_ref[:, pl.ds(c * CHUNK, CHUNK)] = y
        return y[:, CHUNK - 1:CHUNK]

    carry0 = y0_ref[:, 0:1]
    jax.lax.fori_loop(0, B // CHUNK, chunk, carry0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def linrec1_pallas(a, b, y0, *, interpret: bool = False):
    """[V, B] first-order recurrence; V % ROW_TILE == 0, B % CHUNK == 0."""
    V, B = a.shape
    grid = (V // ROW_TILE,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((V, B), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, B), lambda i: (i, 0)),
            pl.BlockSpec((ROW_TILE, B), lambda i: (i, 0)),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, B), lambda i: (i, 0)),
        interpret=interpret,
    )(a.astype(jnp.float32), b.astype(jnp.float32),
      y0.reshape(V, 1).astype(jnp.float32))


def supported(a, y0) -> bool:
    """Shapes this kernel accepts (checked at trace time — all static)."""
    return (
        a.ndim == 2
        and a.shape[0] % ROW_TILE == 0
        and a.shape[1] % CHUNK == 0
        and y0.ndim == 1
        and y0.shape[0] == a.shape[0]
    )
