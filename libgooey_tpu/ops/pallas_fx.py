"""Pallas TPU kernels for the serial bus effects.

The bus effects (reverbs, delay, tilt, compressor — one stereo instance
per bus, not per voice) are per-sample recurrences over small state.  The
XLA path expresses them as chunked affine scans, which is correct but
kernel-launch bound on TPU: a 512-sample spring-reverb block lowers to
hundreds of small fused kernels (~0.9 ms/block ≈ 13x real-time).

These kernels fuse a whole block into ONE ``pallas_call`` with the delay
lines resident in VMEM.  The algorithm is the same chunked-affine
factoring as the XLA path (see effects/reverb_spring.py): within a chunk
of C <= min-delay samples every delayed read is history, the allpass
chain collapses to ``alpha*x + beta[n]``, and the only recurrence is a
first-order affine scan solved with a vectorized Hillis-Steele pass.
Everything is static contiguous slices of a [rings, D+B] work buffer —
vector loads/stores, no gathers, nothing serial per sample.

Mosaic notes: delayed reads at different ring offsets carry different
internal vector layouts, and ``tpu.concatenate`` requires matching
layouts — so shifts are expressed as ``pltpu.roll`` + iota masks and the
channels are processed as separate [1, C] rows (elementwise ops relayout
automatically; concatenation does not).

An earlier revision ran the reference's per-sample loop on the scalar
unit with rings in SMEM; TPU SMEM tops out around ~24 KB and overflows
are silent garbage, so buffers of this size must live in VMEM (and the
vectorized formulation is faster anyway).

Division of labor: everything transcendental (smoothed parameter
trajectories, ``pow``) is computed vectorized outside and passed in as
[2, B] trajectories; the kernel does only the delay-line-coupled part.

Behavioral reference for the spring kernel: src/effects/reverb.rs
(6 series Schroeder allpasses in a global damped feedback loop,
reverb.rs:189-217).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_AP = 6  # allpasses per channel (reverb.rs:30-39)

#: Largest block the flat-SMEM kernels (env follower, resonant LP) accept in
#: one pallas_call: ~5 x [2*B] f32 refs must stay under the ~24 KB SMEM
#: ceiling (overflow is silent garbage, not a compile error).  Larger blocks
#: are split and the scalar carries chained.
_SMEM_MAX_B = 512


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _shift_right(x, step, fill):
    """[1, C] lane shift right by ``step``; positions < step get ``fill``."""
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(idx < step, fill, pltpu.roll(x, step, 1))


def _affine_scan(A, Bv, d0):
    """Inclusive scan of ``d[n] = A[n]*d[n-1] + Bv[n]`` along axis -1.

    Hillis-Steele over the lane axis: log2(C) vectorized doubling steps
    (identity fill: A=1, B=0).  A, Bv: [1, C]; d0: [1, 1] seed.
    """
    C = A.shape[-1]
    Aa, Bb = A, Bv
    step = 1
    while step < C:
        Bb = Bb + Aa * _shift_right(Bb, step, 0.0)
        Aa = Aa * _shift_right(Aa, step, 1.0)
        step *= 2
    return Aa * d0 + Bb


def _spring_kernel(xeff_ref, A_ref, p2_ref, fbgp_ref, hist_ref, damp0_ref,
                   wet_ref, hist_out_ref, dlast_ref, W,
                   *, B, C, D, delays, gains):
    """Whole-block spring reverb; W: [12, D+B] VMEM scratch work buffer.

    Row layout: rings 0..5 = left channel allpasses, 6..11 = right.
    W[i, D+n] holds ring i's write for block sample n; the leading D
    columns are the carried history (right-aligned per ring).  All reads
    ``W[i, D+s-d_i : +C]`` and writes ``W[i, D+s : +C]`` are static
    slices (chunk starts s and delays are compile-time constants).
    """
    alpha = float(np.prod(gains))
    W[:, :D] = hist_ref[...]
    for ch in range(2):
        damp0 = damp0_ref[ch:ch + 1, 0:1]  # [1, 1]
        rows = [ch * NUM_AP + i for i in range(NUM_AP)]
        for c in range(B // C):
            s = c * C
            delayed = [
                W[r:r + 1, D + s - delays[r]:D + s - delays[r] + C]
                for r in rows
            ]
            beta = jnp.zeros((1, C), jnp.float32)
            for g, dly in zip(gains, delayed):
                beta = g * beta + (1.0 - g * g) * dly
            xc = xeff_ref[ch:ch + 1, s:s + C]
            Bv = p2_ref[ch:ch + 1, s:s + C] * (alpha * xc + beta)
            d_traj = _affine_scan(A_ref[ch:ch + 1, s:s + C], Bv, damp0)
            d_prev = _shift_right(d_traj, 1, damp0)
            sig = xc + fbgp_ref[ch:ch + 1, s:s + C] * d_prev
            for g, r, dly in zip(gains, rows, delayed):
                v = sig - g * dly
                W[r:r + 1, D + s:D + s + C] = v
                sig = g * v + dly
            wet_ref[ch:ch + 1, s:s + C] = sig
            damp0 = d_traj[:, C - 1:C]
        dlast_ref[ch:ch + 1, 0:1] = damp0
    hist_out_ref[...] = W[:, B:B + D]


@functools.partial(
    jax.jit, static_argnames=("delays", "gains", "chunk", "interpret")
)
def spring_block(xeff, A, p2, fbgp, hist, damp, *,
                 delays, gains, chunk, interpret=None):
    """One spring-reverb block via the fused VMEM kernel.

    xeff, A, p2, fbgp: [2, B] float32 precomputed trajectories (see
    effects/reverb_spring.py for their derivation).  hist: [12, D]
    right-aligned delay histories.  damp: [2] carried damping state.
    Returns ``(wet[2, B], new_hist[12, D], d_last[2])``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = xeff.shape[-1]
    D = hist.shape[-1]
    kernel = functools.partial(
        _spring_kernel, B=B, C=int(chunk), D=D,
        delays=tuple(int(d) for d in delays),
        gains=tuple(float(g) for g in gains),
    )
    wet, new_hist, d_last = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct(hist.shape, jnp.float32),
            jax.ShapeDtypeStruct((2, 1), jnp.float32),
        ),
        in_specs=[_vmem()] * 6,
        out_specs=(_vmem(), _vmem(), _vmem()),
        scratch_shapes=[pltpu.VMEM((hist.shape[0], D + B), jnp.float32)],
        interpret=interpret,
    )(
        xeff.astype(jnp.float32), A.astype(jnp.float32),
        p2.astype(jnp.float32), fbgp.astype(jnp.float32),
        hist.astype(jnp.float32),
        jnp.asarray(damp, jnp.float32).reshape(2, 1),
    )
    return wet, new_hist, d_last.reshape(2)



# ---------------------------------------------------------------------------
# Fused 4x-oversampled waveshaper (saturation / waveshaper bus effects)
# ---------------------------------------------------------------------------
#
# The polyphase half-band chains (ops/oversample.py) are first-order allpass
# recurrences; the XLA path runs 12 associative scans per block (~120 small
# kernels).  Here the whole smoother -> up1 -> up2 -> shape -> down2 ->
# down1 -> DC-block -> mix pipeline is ONE kernel.  Three tricks:
#
# * Constant-coefficient scans: section coefficients are compile-time floats,
#   so the Hillis-Steele doubling pass needs one fused multiply-add per step
#   (coefficient powers are scalar constants), not the 3-op general form.
#
# * Stage-2 sections process the INTERLEAVED 2x stream s = (e0,o0,e1,o1,...).
#   Substituting the odd equation into the even one turns each section into a
#   half-length scan over the even subsequence with coefficient a^2 plus an
#   elementwise odd reconstruction:
#
#       ye[m] = a^2*ye[m-1] + a*xe[m] + (1-a^2)*xo[m-1] - a*xe[m-1]
#       yo[m] = a*xo[m] + xe[m] - a*ye[m]
#
#   so no interleave/deinterleave shuffles are ever materialized; the four
#   4x phase streams stay separate end to end (the shaper is elementwise and
#   engine-rate parameters repeat across a sample's four phases anyway).
#
# * The parameter smoothers run in-kernel too (closed form, the reference's
#   settle snap included), and per-section state lives in ONE packed [2, K]
#   vector with field-contiguous layout: packing is a single concatenate and
#   unpacking ~25 static slices, so the whole effect is one pallas_call plus
#   a handful of fusable XLA glue ops — not ~160 per-scalar stack/slices.
#
# Seeds for the even-subsequence scans are the previous block's last
# even-position values — index [-2] of the interleaved stream — which is why
# HalfbandState carries ap*y2/ap*x2 (second-to-last) memories.

from libgooey_tpu.ops import oversample as _ovs

_C0_1, _C1_1 = _ovs._split(_ovs.STAGE1)   # 4 + 4 sections (audio band)
_C0_2, _C1_2 = _ovs._split(_ovs.STAGE2)   # 2 + 2 sections (cleanup octave)
_FRAC_2_PI = float(2.0 / np.pi)


def _layout(blocks):
    """[(key, width)] -> ({key: offset}, total)."""
    off, idx = 0, {}
    for key, w in blocks:
        idx[key] = off
        off += w
    return idx, off


_N1, _N2 = len(_C0_1), len(_C0_2)

# Packed state is [4, K]: rows 0:2 hold polyphase chain 0 (both channels),
# rows 2:4 chain 1 — the same stacked row order the pipeline computes in
# (see _ovs4_pipeline), so every section state is ONE [4, 1] column slice
# (Mosaic cannot concatenate two [2, 1] sublane slices in-kernel).
# Per-channel scalars (x1/dc/gain/sm) live in rows 0:2 of their column.

_IN_IDX, _K_IN = _layout(
    [("u1_y", _N1), ("u1_x", _N1)]
    + [("u2_ye", _N2), ("u2_xe", _N2), ("u2_xo", _N2)]
    + [("d2_ye", _N2), ("d2_xe", _N2), ("d2_xo", _N2)]
    + [("d1_y", _N1), ("d1_x", _N1)]
    + [("d2_x1", 1), ("d1_x1", 1), ("dc_x1", 1), ("dc_y1", 1)]
)

_OUT_IDX, _K_OUT = _layout(
    [("u1_y", _N1), ("u1_x", _N1), ("u1_y2", _N1), ("u1_x2", _N1)]
    + [("u2_yo", _N2), ("u2_xo", _N2), ("u2_ye", _N2), ("u2_xe", _N2)]
    + [("d2_yo", _N2), ("d2_xo", _N2), ("d2_ye", _N2), ("d2_xe", _N2)]
    + [("d1_y", _N1), ("d1_x", _N1), ("d1_y2", _N1), ("d1_x2", _N1)]
    + [("d2_x1", 1), ("d1_x1", 1), ("dc_x1", 1), ("dc_y1", 1),
       ("gain", 1), ("sm", 5)]
)
# The OUT tail is a union across effects (saturation: sm[0:3]; compressor:
# gain; waveshaper: neither) — columns an effect never writes are junk and
# never read by its unpack.


def _accessors(st_ref, nst_ref):
    """Packed-state accessors: [4, 1] chain columns + duplicated scalars.

    Scalar (per-channel) columns hold the same [2] value in rows 0:2 AND
    2:4, so ``ld`` of a scalar key is directly usable as a [4, 1] fill for
    stacked [4, C] arrays and ``lds`` (rows 0:2) feeds [2, C] math.
    ``stvs`` maintains the duplication.
    """
    ld = lambda key, i=0: st_ref[:, _IN_IDX[key] + i:_IN_IDX[key] + i + 1]
    lds = lambda key: st_ref[0:2, _IN_IDX[key]:_IN_IDX[key] + 1]

    def stv(key, i, v):
        nst_ref[:, _OUT_IDX[key] + i:_OUT_IDX[key] + i + 1] = v

    def stvs(key, v, i=0):
        c = _OUT_IDX[key] + i
        nst_ref[0:2, c:c + 1] = v
        nst_ref[2:4, c:c + 1] = v

    return ld, lds, stv, stvs


def _scan_const(b, a, y0):
    """``y[n] = a*y[n-1] + b[n]`` with compile-time-constant ``a``.

    One fused multiply-add per doubling step (the general form needs three);
    the y0 fix-up powers are built in-kernel from scalar constants
    (pallas_call rejects captured array constants).  b: [R, N]; y0: [R, 1].
    ``a`` may be a scalar or an (a0, a1) pair (same sign) applied to row
    groups 0:2 / 2:4 — per-group coefficients let independent polyphase
    chains run stacked in one scan (see :func:`_ovs4_pipeline`).
    """
    N = b.shape[-1]
    a0, a1 = (float(a[0]), float(a[1])) if isinstance(a, tuple) else (float(a),) * 2
    paired = a0 != a1
    half = b.shape[0] // 2  # rows 0:half = group 0, half: = group 1
    if paired:  # in-kernel [R, 1] column (pallas rejects captured np arrays)
        riot = jax.lax.broadcasted_iota(jnp.int32, (b.shape[0], 1), 0)
        col = lambda v0, v1: jnp.where(riot < half, np.float32(v0), np.float32(v1))
    step = 1
    while step < N:  # powers in f64, cast once (ULP parity with scalar form)
        p = col(a0 ** step, a1 ** step) if paired else np.float32(a0 ** step)
        b = b + p * _shift_right(b, step, 0.0)
        step *= 2
    iot = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
    n1 = iot.astype(jnp.float32) + 1.0
    la = (col(np.log(abs(a0)), np.log(abs(a1))) if paired
          else np.float32(np.log(abs(a0))))
    fix = jnp.exp(la * n1)
    if a0 < 0 and a1 < 0:
        fix = fix * ((iot % 2).astype(jnp.float32) * 2.0 - 1.0)
    else:
        assert a0 >= 0 and a1 >= 0, "mixed-sign scan coefficients"
    return b + fix * y0


def _pair(a):
    """Normalize a scalar-or-pair coefficient to an (a0, a1) float tuple."""
    return ((float(a[0]), float(a[1])) if isinstance(a, tuple)
            else (float(a), float(a)))


def _paircol(rows, v0, v1):
    """Per-row-group constant: rows 0:rows//2 get v0, the rest v1.

    Values are computed in python f64 and cast once; built in-kernel from
    scalars with an iota select (pallas rejects captured np array
    constants).  Collapses to a plain scalar when v0 == v1.
    """
    if float(v0) == float(v1):
        return np.float32(v0)
    riot = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    return jnp.where(riot < rows // 2, np.float32(v0), np.float32(v1))


def _ap_direct(sig, a, y0, x0):
    """First-order allpass ``y = a*x + x_prev - a*y_prev`` over independent
    streams (no interleave coupling).  Returns (y, (y_last, x_last, y2, x2)).
    ``a``: scalar, or an (a0, a1) pair for the stacked [4, C] form."""
    a0, a1 = _pair(a)
    ac = _paircol(sig.shape[0], a0, a1)
    x_prev = _shift_right(sig, 1, x0)
    y = _scan_const(ac * sig + x_prev, (-a0, -a1), y0)
    return y, (y[:, -1:], sig[:, -1:], y[:, -2:-1], sig[:, -2:-1])


def _ap_inter(xe, xo, a, ye0, xe0, xo0):
    """One allpass section over an interleaved stream, in (even, odd) form.

    Returns ``((ye, yo), (yo_last, xo_last, ye_last, xe_last))`` — the state
    tuple mirrors HalfbandState's (ap, apx, apy2, apx2) meaning for a section
    that processes an interleaved stream.  ``a``: scalar or (a0, a1) pair.
    """
    a0, a1 = _pair(a)
    R = xe.shape[0]
    ac = _paircol(R, a0, a1)
    one_m_a2 = _paircol(R, 1.0 - a0 * a0, 1.0 - a1 * a1)
    xe_prev = _shift_right(xe, 1, xe0)
    xo_prev = _shift_right(xo, 1, xo0)
    rhs = ac * xe + one_m_a2 * xo_prev - ac * xe_prev
    ye = _scan_const(rhs, (a0 * a0, a1 * a1), ye0)
    yo = ac * xo + xe - ac * ye
    return (ye, yo), (yo[:, -1:], xo[:, -1:], ye[:, -1:], xe[:, -1:])


def _atan(x):
    """Branchless Cephes atanf (Mosaic has no atan primitive); ~1e-7 abs."""
    ax = jnp.abs(x)
    big = ax > 2.414213562373095   # tan(3pi/8)
    mid = ax > 0.41421356237309503  # tan(pi/8)
    z = jnp.where(big, -1.0 / jnp.maximum(ax, 1e-30),
                  jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    zz = z * z
    p = ((((8.05374449538e-2 * zz - 1.38776856032e-1) * zz
           + 1.99777106478e-1) * zz - 3.33329491539e-1) * zz) * z + z
    y = jnp.where(big, p + np.float32(np.pi / 2),
                  jnp.where(mid, p + np.float32(np.pi / 4), p))
    return jnp.sign(x) * y


def _traj(cur, tgt, coeff, shape):
    """In-kernel SmoothedParam trajectory (closed form + settle snap).

    cur/tgt: [2, 1] column views; returns [2, B].
    """
    iot = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    n1 = iot.astype(jnp.float32) + 1.0
    d = (cur - tgt) * jnp.exp(np.float32(np.log(1.0 - coeff)) * n1)
    return tgt + jnp.where(jnp.abs(d) < 1e-4, 0.0, d)


def _tile4(v):
    """Tile a [2, ...] per-channel array to the [4, ...] stacked-phase rows."""
    return jnp.concatenate([v, v], axis=0)


def _swap_halves(v4):
    """Swap the two row groups of a [2H, C] array (a sublane roll)."""
    return pltpu.roll(v4, v4.shape[0] // 2, 0)


def _rowsel(lo4, hi4):
    """[lo4[0:H]; hi4[H:2H]] via a select — Mosaic cannot lower a
    tpu.concatenate whose operands sit at different sublane offsets, so
    stacked rows are combined with where(row < H) instead."""
    riot = jax.lax.broadcasted_iota(jnp.int32, lo4.shape, 0)
    return jnp.where(riot < lo4.shape[0] // 2, lo4, hi4)


def _ovs4_pipeline(x, shape_fn, ld, stv, lds, stvs):
    """up1 -> up2 -> shape -> down2 -> down1 through the packed state.

    ``shape_fn(v)``: elementwise nonlinearity at the 4x rate.  ``ld/stv``:
    [4, 1] chain-column accessors; ``lds/stvs``: duplicated-scalar
    accessors (see :func:`_accessors`).  Returns the band-limited shaped
    signal at the engine rate.

    The two polyphase chains of each stage are independent, so they run
    STACKED as a [4, C] array (rows 0:2 = chain 0 both channels, rows 2:4
    = chain 1) with per-row-group coefficient pairs: half the scan count
    of the two-[2, C]-calls form, and the (8, 128) vector tiles that a
    [2, C] op would leave three-quarters empty carry four rows instead.
    Per-row op order is unchanged, so results are bit-exact vs the
    unstacked form.  Half-stacks are combined with rolls/selects, never
    sublane concatenation (Mosaic lowering restriction).  ``shape_fn``
    receives [4, C]; per-channel captures must tile to 4 rows
    (``_tile4``).
    """
    def chain_direct2(sig4, coefs0, coefs1, pref):
        for i, aa in enumerate(zip(coefs0, coefs1)):
            sig4, (y_l, x_l, y2, x2) = _ap_direct(
                sig4, aa, ld(f"{pref}_y", i), ld(f"{pref}_x", i))
            stv(f"{pref}_y", i, y_l)
            stv(f"{pref}_x", i, x_l)
            stv(f"{pref}_y2", i, y2)
            stv(f"{pref}_x2", i, x2)
        return sig4

    def chain_inter2(xe4, xo4, coefs0, coefs1, pref):
        for i, aa in enumerate(zip(coefs0, coefs1)):
            (xe4, xo4), (yo_l, xo_l, ye_l, xe_l) = _ap_inter(
                xe4, xo4, aa,
                ld(f"{pref}_ye", i), ld(f"{pref}_xe", i), ld(f"{pref}_xo", i))
            stv(f"{pref}_yo", i, yo_l)
            stv(f"{pref}_xo", i, xo_l)
            stv(f"{pref}_ye", i, ye_l)
            stv(f"{pref}_xe", i, xe_l)
        return xe4, xo4

    # up1: both phase chains filter the engine-rate input independently
    s4 = chain_direct2(_tile4(x), _C0_1, _C1_1, "u1")
    # up2: both chains process the same interleaved 2x stream (e1, o1);
    # s4 rows = (e1, o1), swapped = (o1, e1)
    s4_sw = _swap_halves(s4)
    xe4, xo4 = chain_inter2(
        _rowsel(s4, s4_sw), _rowsel(s4_sw, s4), _C0_2, _C1_2, "u2")
    # nonlinearity at 4x — elementwise, all four phases in two stacked ops
    xe4 = shape_fn(xe4)   # rows: (q0, q1)
    xo4 = shape_fn(xo4)   # rows: (q2, q3)
    # down2: even 2x stream = (q0, q2); odd = (q1, q3) delayed one 4x step
    # -> xe_in = (q0, q3d): q3 already sits in xo4's upper rows, so one
    # stacked shift (lower rows discarded by the select) does it
    xo4_shift = _shift_right(xo4, 1, ld("d2_x1"))
    H = x.shape[0]  # rows per group (2 channels on the bus, V in voice banks)
    stvs("d2_x1", _swap_halves(xo4)[0:H, -1:])  # q3's last sample
    ye4, yo4 = chain_inter2(
        _rowsel(xe4, xo4_shift), _rowsel(xo4, xe4), _C0_2, _C1_2, "d2")
    # 2x downsampled stream: both row groups hold the same (d2e, d2o)
    d2e4 = 0.5 * (ye4 + _swap_halves(ye4))
    d2o4 = 0.5 * (yo4 + _swap_halves(yo4))
    stvs("d1_x1", d2o4[0:H, -1:])
    # down1: phases of the 2x stream run independent chains
    d2o_shift = _shift_right(d2o4, 1, ld("d1_x1"))
    y4 = chain_direct2(_rowsel(d2e4, d2o_shift), _C0_1, _C1_1, "d1")
    return 0.5 * (y4 + _swap_halves(y4))[0:H]


def _dc_block(sat, bypass, lds, stvs):
    """Bypass-gated DC blocker (per-sample poles -> general affine scans)."""
    A1 = jnp.where(bypass, 1.0, 0.0)
    A2 = jnp.where(bypass, 1.0, 0.995)
    x1 = _affine_scan(A1, (1.0 - A1) * sat, lds("dc_x1"))
    x1_prev = _shift_right(x1, 1, lds("dc_x1"))
    y1 = _affine_scan(A2, (1.0 - A1) * (sat - x1_prev), lds("dc_y1"))
    stvs("dc_x1", x1[:, -1:])
    stvs("dc_y1", y1[:, -1:])
    return y1


def _sat4_kernel(x_ref, cur_ref, tgt_ref, st_ref, out_ref, nst_ref, *, coeff):
    """Full TubeSaturation block (saturation.rs; effects/saturation.py)."""
    ld, lds, stv, stvs = _accessors(st_ref, nst_ref)
    x = x_ref[...]
    shape = x.shape
    t_drive = _traj(cur_ref[:, 0:1], tgt_ref[:, 0:1], coeff, shape)
    t_warm = _traj(cur_ref[:, 1:2], tgt_ref[:, 1:2], coeff, shape)
    mix = _traj(cur_ref[:, 2:3], tgt_ref[:, 2:3], coeff, shape)
    drive = 1.0 + t_drive * 7.0
    bias = t_warm * 0.4
    bypass = mix < 1e-4
    drive4 = _tile4(drive)  # shape_fn sees the [4, C] stacked phases
    bias4 = _tile4(bias)

    def shape_fn(v):
        driven = v * drive4
        biased = driven + bias4 * jnp.abs(driven)
        soft = _atan(biased) * _FRAC_2_PI
        return soft + jnp.square(soft) * jnp.sign(soft) * 0.15 * bias4

    sat = _ovs4_pipeline(x, shape_fn, ld, stv, lds, stvs)
    y1 = _dc_block(sat, bypass, lds, stvs)
    out = jnp.where(bypass, x, x * (1.0 - mix) + y1 * mix)
    out_ref[...] = jnp.where(jnp.isfinite(out), out, 0.0)
    stvs("sm", t_drive[:, -1:], 0)
    stvs("sm", t_warm[:, -1:], 1)
    stvs("sm", mix[:, -1:], 2)


@functools.partial(jax.jit, static_argnames=("coeff", "interpret"))
def saturation_block(x, cur, tgt, packed, *, coeff, interpret=None):
    """One fused TubeSaturation block.

    x: [2, B] input; cur/tgt: [2, 3] normalized smoother state (drive,
    warmth, mix); packed: [4, K_in] from :func:`pack_ovs4_dc`; coeff: the
    30 ms smoothing coefficient.  Returns ``(out[2, B], nst[4, K_out])``
    (new smoother currents ride in nst's trailing "sm" block).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x.shape[-1]
    out, nst = pl.pallas_call(
        functools.partial(_sat4_kernel, coeff=float(coeff)),
        out_shape=(
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct((4, _K_OUT), jnp.float32),
        ),
        in_specs=[_vmem()] * 4,
        out_specs=(_vmem(), _vmem()),
        interpret=interpret,
    )(x.astype(jnp.float32), cur.astype(jnp.float32),
      tgt.astype(jnp.float32), packed.astype(jnp.float32))
    return out, nst


def _scol(v):
    """Per-channel scalar [2] -> duplicated [4, 1] column (see _accessors)."""
    v2 = jnp.asarray(v, jnp.float32).reshape(2, 1)
    return jnp.concatenate([v2, v2], axis=0)


def pack_ovs4_dc(ovs, dc_x1, dc_y1):
    """OversamplerState + DC state -> [4, K_in] stacked-chain layout.

    Rows 0:2 = polyphase chain 0 (both channels), rows 2:4 = chain 1;
    scalar columns are duplicated across both halves.  Built XLA-side
    (cheap, fusable concatenates) so the kernels never assemble sublane
    stacks themselves.
    """
    s2 = lambda c0, c1: jnp.concatenate([c0, c1], axis=0)  # [2,N]+[2,N]
    parts = [
        s2(ovs.up1.ap0, ovs.up1.ap1), s2(ovs.up1.ap0x, ovs.up1.ap1x),
        s2(ovs.up2.ap0y2, ovs.up2.ap1y2), s2(ovs.up2.ap0x2, ovs.up2.ap1x2),
        s2(ovs.up2.ap0x, ovs.up2.ap1x),
        s2(ovs.down2.ap0y2, ovs.down2.ap1y2),
        s2(ovs.down2.ap0x2, ovs.down2.ap1x2),
        s2(ovs.down2.ap0x, ovs.down2.ap1x),
        s2(ovs.down1.ap0, ovs.down1.ap1), s2(ovs.down1.ap0x, ovs.down1.ap1x),
        _scol(ovs.down2.x1), _scol(ovs.down1.x1), _scol(dc_x1), _scol(dc_y1),
    ]
    return jnp.concatenate(parts, axis=-1)


def unpack_ovs4_dc(nst, ovs):
    """[4, K_out] -> (OversamplerState, dc_x1, dc_y1, smoother_current).

    ``ovs`` supplies untouched fields (up1.x1, up2.x1 — unused by 4x flow).
    """
    blk2 = lambda key, w, c: nst[2 * c:2 * c + 2, _OUT_IDX[key]:_OUT_IDX[key] + w]
    col = lambda key: nst[0:2, _OUT_IDX[key]]

    def stage1(pref, x1):
        return _ovs.HalfbandState(
            ap0=blk2(f"{pref}_y", _N1, 0), ap0x=blk2(f"{pref}_x", _N1, 0),
            ap1=blk2(f"{pref}_y", _N1, 1), ap1x=blk2(f"{pref}_x", _N1, 1),
            x1=x1,
            ap0y2=blk2(f"{pref}_y2", _N1, 0), ap0x2=blk2(f"{pref}_x2", _N1, 0),
            ap1y2=blk2(f"{pref}_y2", _N1, 1), ap1x2=blk2(f"{pref}_x2", _N1, 1),
        )

    def stage2(pref, x1):
        return _ovs.HalfbandState(
            ap0=blk2(f"{pref}_yo", _N2, 0), ap0x=blk2(f"{pref}_xo", _N2, 0),
            ap1=blk2(f"{pref}_yo", _N2, 1), ap1x=blk2(f"{pref}_xo", _N2, 1),
            x1=x1,
            ap0y2=blk2(f"{pref}_ye", _N2, 0), ap0x2=blk2(f"{pref}_xe", _N2, 0),
            ap1y2=blk2(f"{pref}_ye", _N2, 1), ap1x2=blk2(f"{pref}_xe", _N2, 1),
        )

    new_ovs = _ovs.OversamplerState(
        up1=stage1("u1", ovs.up1.x1),
        up2=stage2("u2", ovs.up2.x1),
        down2=stage2("d2", col("d2_x1")),
        down1=stage1("d1", col("d1_x1")),
    )
    return new_ovs, col("dc_x1"), col("dc_y1"), nst[0:2, _OUT_IDX["sm"]:_OUT_IDX["sm"] + 3]


def _ws4_kernel(x_ref, prm_ref, st_ref, out_ref, nst_ref):
    """Waveshaper bus entry: compensated-tanh at 4x (waveshaper.rs:59-68).

    prm: [2, 2] per-channel (drive, mix) — chain targets are per-block
    scalars, not smoothed trajectories (mixer/chain.py process_entry).
    """
    ld, lds, stv, stvs = _accessors(st_ref, nst_ref)
    x = x_ref[...]
    drive = jnp.maximum(prm_ref[:, 0:1], 1.0 + 1e-6)
    mix = prm_ref[:, 1:2]
    comp = np.float32(np.tanh(0.5)) / jnp.tanh(0.5 * drive)

    drive4, comp4 = _tile4(drive), _tile4(comp)
    shaped = _ovs4_pipeline(
        x, lambda v: jnp.tanh(v * drive4) * comp4, ld, stv, lds, stvs)
    wet = x * (1.0 - mix) + shaped * mix
    bypass = (prm_ref[:, 1:2] <= 1e-4) | (prm_ref[:, 0:1] <= 1.0)
    out = jnp.where(bypass, x, wet)
    out_ref[...] = jnp.where(jnp.isfinite(x), out, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def waveshaper_block(x, drive, mix, packed, *, interpret=None):
    """One fused 4x waveshaper block.  drive/mix: scalars (or [2]).

    packed: [4, K_in] from :func:`pack_ovs4_dc` (dc slots unused; pass
    zeros).  Returns ``(out[2, B], nst[4, K_out])``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x.shape[-1]
    prm = jnp.stack([
        jnp.broadcast_to(jnp.asarray(drive, jnp.float32), (2,)),
        jnp.broadcast_to(jnp.asarray(mix, jnp.float32), (2,)),
    ], axis=-1)
    return pl.pallas_call(
        _ws4_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct((4, _K_OUT), jnp.float32),
        ),
        in_specs=[_vmem()] * 3,
        out_specs=(_vmem(), _vmem()),
        interpret=interpret,
    )(x.astype(jnp.float32), prm, packed.astype(jnp.float32))


def _env_kernel(rect_ref, ac_ref, rc_ref, env0_ref,
                env_ref, envlast_ref, *, B):
    """Attack/release peak follower: the one truly nonlinear bus recurrence
    (compressor.rs:96-99).  All refs are flat [2*B] SMEM (≈20 KB — under
    the ~24 KB SMEM ceiling); the sample loop runs on the scalar unit with
    the two channel carries in registers.

    Bypass freezing is folded into the coefficients by the caller
    (ac=rc=1 -> e == env): exact, because a carried envelope is always 0
    or >= 1e-15 (the denormal clip enforces it), so the clip can't zero a
    bypassed-through value.
    """
    def body(n, carry):
        new = [None, None]
        for ch in range(2):
            env = carry[ch]
            i = ch * B + n
            r = rect_ref[i]
            c = jnp.where(r > env, ac_ref[i], rc_ref[i])
            e = c * env + (1.0 - c) * r
            e = jnp.where(e < 1e-15, 0.0, e)
            env_ref[i] = e
            new[ch] = e
        return tuple(new)

    # unroll must stay 1: Mosaic only lowers unroll=1 or unroll=num_steps
    # for loops inside TPU kernels, and a full 512-step unroll explodes
    # compile time for no measurable win on the scalar core.
    final = jax.lax.fori_loop(0, B, body, (env0_ref[0], env0_ref[1]))
    envlast_ref[0] = final[0]
    envlast_ref[1] = final[1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def env_follower_block(rect, att_c, rel_c, byp, env0, *, interpret=None):
    """Serial envelope follower over one block → ``(env[2, B], env_last[2])``.

    rect/att_c/rel_c/byp: [2, B] float32 (byp: 1.0 freezes the follower).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = rect.shape[-1]
    if B > _SMEM_MAX_B:
        # 5 flat [2*B] f32 SMEM refs overflow the ~24 KB SMEM budget past
        # B=512, and SMEM overflow is silent garbage on real TPUs — split
        # the block and chain the envelope carry instead.
        e0 = jnp.asarray(env0, jnp.float32).reshape(2)
        segs = []
        for s in range(0, B, _SMEM_MAX_B):
            sl = slice(s, min(s + _SMEM_MAX_B, B))
            seg, e0 = env_follower_block(
                rect[:, sl], att_c[:, sl], rel_c[:, sl], byp[:, sl], e0,
                interpret=interpret,
            )
            segs.append(seg)
        return jnp.concatenate(segs, axis=-1), e0
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    flat = lambda v: v.astype(jnp.float32).reshape(2 * B)
    frozen = byp > 0.5
    ac = jnp.where(frozen, 1.0, att_c)
    rc = jnp.where(frozen, 1.0, rel_c)
    env, env_last = pl.pallas_call(
        functools.partial(_env_kernel, B=B),
        out_shape=(
            jax.ShapeDtypeStruct((2 * B,), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.float32),
        ),
        in_specs=[smem] * 4,
        out_specs=(smem, smem),
        interpret=interpret,
    )(flat(rect), flat(ac), flat(rc),
      jnp.asarray(env0, jnp.float32).reshape(2))
    return env.reshape(2, B), env_last


_KNEE_DB = 6.0
_HALF_KNEE_DB = 3.0


def _comp_kernel(x_ref, env_ref, thr_ref, ratio_ref, mix_ref, st_ref,
                 out_ref, nst_ref):
    """Compressor post-detector path: knee gain, gain smoothing, 4x tube
    coloring, DC block, mix (compressor.rs:101-223; effects/compressor.py).
    """
    ld, lds, stv, stvs = _accessors(st_ref, nst_ref)
    x = x_ref[...]
    env = env_ref[...]
    thr = thr_ref[...]
    ratio = ratio_ref[...]
    mix = mix_ref[...]
    bypass = mix < 1e-4

    env_db = 20.0 / np.float32(np.log(10.0)) * jnp.log(env + 1e-20)
    over_db = env_db - thr
    slope = 1.0 - 1.0 / ratio
    knee = jnp.square(over_db + _HALF_KNEE_DB) / (2.0 * _KNEE_DB) * slope
    gr_db = jnp.where(
        over_db <= -_HALF_KNEE_DB, 0.0,
        jnp.where(over_db >= _HALF_KNEE_DB, over_db * slope, knee),
    )
    gain_lin = jnp.exp(np.float32(-0.05 * np.log(10.0)) * gr_db)

    A = jnp.where(bypass, 1.0, 0.95)
    Bv = jnp.where(bypass, 0.0, 0.05 * gain_lin)
    gain = _affine_scan(A, Bv, st_ref[0:2, _K_IN:_K_IN + 1])
    stvs("gain", gain[:, -1:])

    compressed = x * gain
    colored_os = _ovs4_pipeline(
        compressed, lambda v: _atan(v) * np.float32(_FRAC_2_PI * 1.1),
        ld, stv, lds, stvs
    )
    colored = jnp.where(gain < 0.99, colored_os, compressed)
    y1 = _dc_block(colored, bypass, lds, stvs)
    out = jnp.where(bypass, x, x * (1.0 - mix) + y1 * mix)
    out_ref[...] = jnp.where(jnp.isfinite(out), out, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def compressor_block(x, env, thr, ratio, mix, packed, gain0, *, interpret=None):
    """Fused compressor post-detector block.

    x/env/thr/ratio/mix: [2, B]; packed: [4, K_in] (pack_ovs4_dc with the
    compressor's DC state); gain0: [2] smoothed-gain carry.  Returns
    ``(out[2, B], nst[4, K_out])`` — new gain in nst's "gain" column.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x.shape[-1]
    packed_g = jnp.concatenate(
        [packed.astype(jnp.float32), _scol(gain0)], axis=-1
    )
    return pl.pallas_call(
        _comp_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct((4, _K_OUT), jnp.float32),
        ),
        in_specs=[_vmem()] * 6,
        out_specs=(_vmem(), _vmem()),
        interpret=interpret,
    )(x.astype(jnp.float32), env.astype(jnp.float32),
      thr.astype(jnp.float32), ratio.astype(jnp.float32),
      mix.astype(jnp.float32), packed_g)


def _affine_scan2(a11, a12, a21, a22, b1, b2, s0):
    """Inclusive scan of the 2-state affine recurrence ``s = A[n] s + b[n]``.

    Hillis-Steele over lanes with 2x2 matrix composition (the in-kernel
    analog of ops/scan.py linrec2).  All coefficient arrays [2, B];
    ``s0 = (s1_0, s2_0)`` with [2, 1] columns.  Returns (s1, s2).
    """
    C = a11.shape[-1]
    step = 1
    while step < C:
        p11 = _shift_right(a11, step, 1.0)
        p12 = _shift_right(a12, step, 0.0)
        p21 = _shift_right(a21, step, 0.0)
        p22 = _shift_right(a22, step, 1.0)
        q1 = _shift_right(b1, step, 0.0)
        q2 = _shift_right(b2, step, 0.0)
        b1 = a11 * q1 + a12 * q2 + b1
        b2 = a21 * q1 + a22 * q2 + b2
        n11 = a11 * p11 + a12 * p21
        n12 = a11 * p12 + a12 * p22
        n21 = a21 * p11 + a22 * p21
        n22 = a21 * p12 + a22 * p22
        a11, a12, a21, a22 = n11, n12, n21, n22
        step *= 2
    s1 = a11 * s0[0] + a12 * s0[1] + b1
    s2 = a21 * s0[0] + a22 * s0[1] + b2
    return s1, s2


def _svf_tpt(x, g, h, ic1_0, ic2_0):
    """TPT SVF block (ops/filters.py svf_tpt_block) in-kernel.

    Returns (v1, v2, ic1_last, ic2_last) — v1/v2 are the pre-update
    band/low taps (exactly the reference's outputs).
    """
    hg = h * g
    a11 = 2.0 * h - 1.0
    a12 = -2.0 * hg
    a21 = 2.0 * g * h
    a22 = 1.0 - 2.0 * g * g * h
    b1 = 2.0 * hg * x
    b2 = 2.0 * g * g * h * x
    s1, s2 = _affine_scan2(a11, a12, a21, a22, b1, b2, (ic1_0, ic2_0))
    ic1_prev = _shift_right(s1, 1, ic1_0)
    ic2_prev = _shift_right(s2, 1, ic2_0)
    v1 = (g * (x - ic2_prev) + ic1_prev) * h
    v2 = ic2_prev + g * v1
    return v1, v2, s1[:, -1:], s2[:, -1:]


_TILT_LP_FREQ = (80.0, 20000.0)
_TILT_HP_FREQ = (20.0, 8000.0)


def _tilt_kernel(x_ref, cur_ref, tgt_ref, st_ref, out_ref, nst_ref,
                 *, coeff, sample_rate):
    """TiltFilterEffect: one-knob LP<->HP sweep (tilt_filter.rs:99-125;
    effects/tilt.py).  st/nst: [2, 4] = (ic1, ic2, sm_knob, sm_res)."""
    x = x_ref[...]
    shape = x.shape
    knob = _traj(cur_ref[:, 0:1], tgt_ref[:, 0:1], coeff, shape)
    res = _traj(cur_ref[:, 1:2], tgt_ref[:, 1:2], coeff, shape)

    lp_mix = 1.0 - knob * 2.0
    lp_freq = _TILT_LP_FREQ[0] * jnp.exp(
        np.float32(np.log(_TILT_LP_FREQ[1] / _TILT_LP_FREQ[0])) * (knob * 2.0))
    hp_mix = (knob - 0.5) * 2.0
    hp_freq = _TILT_HP_FREQ[0] * jnp.exp(
        np.float32(np.log(_TILT_HP_FREQ[1] / _TILT_HP_FREQ[0]))
        * ((knob - 0.5) * 2.0))

    use_lp = knob < 0.5
    mix = jnp.where(use_lp, lp_mix, hp_mix)
    freq = jnp.where(use_lp, lp_freq, hp_freq)
    q = 0.5 + res * 8.0
    passthrough = mix < 0.001

    cutoff = jnp.clip(freq, 20.0, np.float32(sample_rate * 0.45))
    g = jnp.tan(np.float32(np.pi) * cutoff * np.float32(1.0 / sample_rate))
    r = 1.0 / jnp.maximum(q, 0.5)
    h = 1.0 / (1.0 + r * g + g * g)
    v1, v2, ic1_l, ic2_l = _svf_tpt(x, g, h, st_ref[:, 0:1], st_ref[:, 1:2])
    lp = v2
    hp = x - (r * v1 + v2)
    wet = jnp.where(use_lp, lp, hp)
    out = jnp.where(passthrough, x, x * (1.0 - mix) + wet * mix)
    out = jnp.where(jnp.isfinite(out), out, 0.0)
    out_ref[...] = jnp.where(jnp.abs(out) < 1e-15, 0.0, out)
    nst_ref[:, 0:1] = ic1_l
    nst_ref[:, 1:2] = ic2_l
    nst_ref[:, 2:3] = knob[:, -1:]
    nst_ref[:, 3:4] = res[:, -1:]


@functools.partial(jax.jit, static_argnames=("coeff", "sample_rate", "interpret"))
def tilt_block(x, cur, tgt, st, *, coeff, sample_rate, interpret=None):
    """One fused tilt-filter block.

    st: [2, 4] = (ic1, ic2, unused, unused); cur/tgt: [2, 2] normalized
    (knob, res).  Returns ``(out[2, B], nst[2, 4])`` with nst =
    (ic1', ic2', knob_cur, res_cur).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x.shape[-1]
    return pl.pallas_call(
        functools.partial(_tilt_kernel, coeff=float(coeff),
                          sample_rate=float(sample_rate)),
        out_shape=(
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct((2, 4), jnp.float32),
        ),
        in_specs=[_vmem()] * 4,
        out_specs=(_vmem(), _vmem()),
        interpret=interpret,
    )(x.astype(jnp.float32), cur.astype(jnp.float32),
      tgt.astype(jnp.float32), st.astype(jnp.float32))


_DELAY_RES = 0.3


def _delay_kernel(x_ref, delayed_ref, cur_ref, tgt_ref, st_ref,
                  out_ref, write_ref, nst_ref, *, coeff, sample_rate, pingpong):
    """Delay post-read path: darkening two-pole LP on the tap, feedback
    write computation, dry/wet mix (delay.rs:370-491; effects/delay.py).

    The 5 s ring stays an XLA-side HBM buffer (one gather before, one
    scatter after); ``delayed`` is the pre-gathered fractional tap.
    st/nst: [2, 5] = (z1, z2, sm_fb, sm_mix, sm_cutoff) — the time
    smoother (50 ms) lives outside with the gather.
    cur/tgt here: [2, 3] = (feedback, mix, cutoff).
    """
    x = x_ref[...]
    delayed = delayed_ref[...]
    shape = x.shape
    fb_t = _traj(cur_ref[:, 0:1], tgt_ref[:, 0:1], coeff, shape)
    mix_t = _traj(cur_ref[:, 1:2], tgt_ref[:, 1:2], coeff, shape)
    cut_t = _traj(cur_ref[:, 2:3], tgt_ref[:, 2:3], coeff, shape)

    g = 1.0 - jnp.exp(np.float32(-2.0 * np.pi / sample_rate) * cut_t)
    r = np.float32(_DELAY_RES)
    a11 = 1.0 - g + g * r
    a12 = -g * r
    b1 = g * delayed
    a21 = g * a11
    a22 = (1.0 - g) + g * a12
    b2 = g * b1
    z1, z2 = _affine_scan2(a11, a12, a21, a22, b1, b2,
                           (st_ref[:, 0:1], st_ref[:, 1:2]))
    filtered = z2

    if pingpong:
        # partner taps; dry injected left only (delay.rs:460-491)
        tap_for = pltpu.roll(filtered, 1, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        inject = jnp.where(row == 0, x, 0.0)
    else:
        tap_for = filtered
        inject = x
    write = inject + tap_for * fb_t
    write = jnp.where(
        jnp.isfinite(write) & (jnp.abs(write) > 1e-15), write, 0.0)
    write_ref[...] = write

    out = x * (1.0 - mix_t) + filtered * mix_t
    out_ref[...] = jnp.where(jnp.isfinite(out), out, x)
    nst_ref[:, 0:1] = z1[:, -1:]
    nst_ref[:, 1:2] = z2[:, -1:]
    nst_ref[:, 2:3] = fb_t[:, -1:]
    nst_ref[:, 3:4] = mix_t[:, -1:]
    nst_ref[:, 4:5] = cut_t[:, -1:]


@functools.partial(
    jax.jit, static_argnames=("coeff", "sample_rate", "pingpong", "interpret")
)
def delay_block(x, delayed, cur, tgt, st, *, coeff, sample_rate,
                pingpong=False, interpret=None):
    """Fused delay post-read block → ``(out[2,B], write[2,B], nst[2,5])``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x.shape[-1]
    return pl.pallas_call(
        functools.partial(_delay_kernel, coeff=float(coeff),
                          sample_rate=float(sample_rate),
                          pingpong=bool(pingpong)),
        out_shape=(
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct((2, 5), jnp.float32),
        ),
        in_specs=[_vmem()] * 5,
        out_specs=(_vmem(), _vmem(), _vmem()),
        interpret=interpret,
    )(x.astype(jnp.float32), delayed.astype(jnp.float32),
      cur.astype(jnp.float32), tgt.astype(jnp.float32),
      st.astype(jnp.float32))


def _lowpass_kernel(x_ref, g_ref, fb_ref, st0_ref, out_ref, stl_ref, *, B):
    """Moog-ish 2-pole LP with tanh'd resonance feedback — a true nonlinear
    recurrence (lowpass_filter.rs; effects/lowpass.py), run per sample on
    the scalar unit with everything in SMEM (flat [2*B], ≈16 KB).

    The scalar unit's tanh/exp are ~1e-5 approximations of the vector
    versions; the loop is contractive and the output tanh has slope <= 1,
    so path-vs-path error stays well under the suite's 2e-4 tolerance.
    """
    def body(n, carry):
        s = list(carry)
        for ch in range(2):
            i = ch * B + n
            s1, s2 = s[2 * ch], s[2 * ch + 1]
            xn = x_ref[i]
            gn = g_ref[i]
            fbn = fb_ref[i]
            infb = xn - jnp.tanh(s2 * fbn) * jnp.minimum(fbn, 1.0)
            s1 = s1 + gn * (infb - s1)
            s2 = s2 + gn * (s1 - s2)
            s1 = jnp.where(jnp.abs(s1) < 1e-15, 0.0, s1)
            s2 = jnp.where(jnp.abs(s2) < 1e-15, 0.0, s2)
            # the OUTPUT tanh runs vectorized in XLA after the kernel
            # (lowpass_block); tanh maps +-inf to +-1, so the old
            # isfinite(tanh(s2)) guard is exactly a NaN check on s2
            ok = ~(s2 != s2)
            s1 = jnp.where(ok, s1, 0.0)
            s2 = jnp.where(ok, s2, 0.0)
            out_ref[i] = s2
            s[2 * ch], s[2 * ch + 1] = s1, s2
        return tuple(s)

    # unroll=1 only: Mosaic rejects partial unrolls inside TPU kernels.
    final = jax.lax.fori_loop(
        0, B, body,
        (st0_ref[0], st0_ref[1], st0_ref[2], st0_ref[3]),
    )
    for k in range(4):
        stl_ref[k] = final[k]


@functools.partial(jax.jit, static_argnames=("interpret",))
def lowpass_block(x, g, fb, stages, *, interpret=None):
    """Serial resonant-LP block → ``(out[2, B], stages_last[2, 2])``.

    x/g/fb: [2, B]; stages: [2, 2] = (stage1, stage2) per channel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x.shape[-1]
    if B > _SMEM_MAX_B:
        # 4 flat [2*B] f32 SMEM refs exceed the ~24 KB SMEM budget past
        # B=512 (silent garbage, not a compile error) — split + chain.
        st = jnp.asarray(stages, jnp.float32)
        segs = []
        for s in range(0, B, _SMEM_MAX_B):
            sl = slice(s, min(s + _SMEM_MAX_B, B))
            seg, st = lowpass_block(x[:, sl], g[:, sl], fb[:, sl], st,
                                    interpret=interpret)
            segs.append(seg)
        return jnp.concatenate(segs, axis=-1), st
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    flat = lambda v: v.astype(jnp.float32).reshape(2 * B)
    out, stl = pl.pallas_call(
        functools.partial(_lowpass_kernel, B=B),
        out_shape=(
            jax.ShapeDtypeStruct((2 * B,), jnp.float32),
            jax.ShapeDtypeStruct((4,), jnp.float32),
        ),
        in_specs=[smem] * 4,
        out_specs=(smem, smem),
        interpret=interpret,
    )(flat(x), flat(g), flat(fb),
      jnp.asarray(stages, jnp.float32).reshape(4))
    # output saturation vectorized here (fuses with the chain's next op);
    # the kernel emits the raw stage-2 trajectory
    return jnp.tanh(out.reshape(2, B)), stl.reshape(2, 2)


_FBWS_DC = 0.995
_FBWS_ENV_FLOOR = 0.05
_FBWS_TAMING = 0.25
_FBWS_MAKEUP_DB = 5.1
_FBWS_MAX_COMP = 3.0


def _fbws_kernel(x_ref, env_ref, prm_ref, st_ref, out_ref, nst_ref):
    """Feedback-waveshaper zero-feedback fast path
    (feedback_waveshaper.rs; effects/feedback_waveshaper.py fast path):
    4x tanh, envelope-referenced makeup gain, bypass-gated DC blocker and
    feedback filter.  prm: [2, 4] = (drive, feedback, fb_filter_coeff,
    mix) per-block scalars; env: [2, B] from env_follower_block; the
    carried filter state rides the packed "gain" column.
    """
    ld, lds, stv, stvs = _accessors(st_ref, nst_ref)
    x = x_ref[...]
    env = env_ref[...]
    drive = prm_ref[:, 0:1]
    feedback = prm_ref[:, 1:2]
    fbc = prm_ref[:, 2:3]
    mix = prm_ref[:, 3:4]
    bypass = (mix <= 1e-4) | (drive <= 1.0)

    shaped = _ovs4_pipeline(x * drive, jnp.tanh, ld, stv, lds, stvs)

    # gain_compensation (feedback_waveshaper.rs:247-259)
    reference = jnp.maximum(env, _FBWS_ENV_FLOOR)
    driven_ref = jnp.maximum(jnp.abs(jnp.tanh(reference * drive)), 1e-6)
    comp_no_fb = jnp.tanh(reference) / driven_ref
    drive_norm = jnp.clip((drive - 1.0) / 99.0, 0.0, 1.0)
    feedback_norm = jnp.clip(feedback / 0.98, 0.0, 1.0)
    high_end = jnp.exp(1.35 * jnp.log(jnp.maximum(drive_norm, 1e-30))) \
        * jnp.square(feedback_norm)
    high_end = jnp.where(drive_norm <= 0.0, 0.0, high_end)
    makeup = jnp.exp(np.float32(_FBWS_MAKEUP_DB * np.log(10.0) / 20.0) * high_end)
    taming = 1.0 / (1.0 + comp_no_fb * feedback * _FBWS_TAMING)
    comp = jnp.minimum(comp_no_fb * taming * makeup, _FBWS_MAX_COMP)
    compensated = shaped * comp

    # _affine_scan needs full-width A (a [2,1] broadcast would keep the
    # coefficient from accumulating across doubling steps)
    bc = lambda v: jnp.broadcast_to(v, x.shape)
    A1 = bc(jnp.where(bypass, 1.0, 0.0))
    x1 = _affine_scan(A1, (1.0 - A1) * compensated, lds("dc_x1"))
    x1_prev = _shift_right(x1, 1, lds("dc_x1"))
    A2 = bc(jnp.where(bypass, 1.0, np.float32(_FBWS_DC)))
    y1 = _affine_scan(A2, (1.0 - A1) * (compensated - x1_prev), lds("dc_y1"))
    dc = jnp.where(bypass, 0.0, y1)
    Af = bc(jnp.where(bypass, 1.0, 1.0 - fbc))
    filt = _affine_scan(Af, (1.0 - A1) * fbc * dc, st_ref[0:2, _K_IN:_K_IN + 1])
    filt = jnp.where(jnp.abs(filt) < 1e-15, 0.0, filt)

    out = jnp.where(bypass, x, x * (1.0 - mix) + dc * mix)
    out_ref[...] = out
    stvs("dc_x1", x1[:, -1:])
    stvs("dc_y1", y1[:, -1:])
    stvs("gain", filt[:, -1:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def fbws_fast_block(x, env, drive, feedback, fbc, mix, packed, filt0, *,
                    interpret=None):
    """One fused zero-feedback-path feedback-waveshaper block.

    packed: [4, K_in] via pack_ovs4_dc(ovs, dc_x1, dc_y1); filt0: [2]
    carried feedback-filter state.  Returns ``(out[2, B], nst[4, K_out])``
    (new filter state in nst's "gain" column).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = x.shape[-1]
    prm = jnp.stack([
        jnp.broadcast_to(jnp.asarray(p, jnp.float32), (2,))
        for p in (drive, feedback, fbc, mix)
    ], axis=-1)
    packed_f = jnp.concatenate(
        [packed.astype(jnp.float32), _scol(filt0)], axis=-1
    )
    # the filter seed rides one column past the base layout (same slot the
    # compressor uses for its gain carry)
    return pl.pallas_call(
        _fbws_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct((4, _K_OUT), jnp.float32),
        ),
        in_specs=[_vmem()] * 4,
        out_specs=(_vmem(), _vmem()),
        interpret=interpret,
    )(x.astype(jnp.float32), env.astype(jnp.float32), prm, packed_f)


# ---------------------------------------------------------------------------
# Plate reverb: fused chunked recurrences (effects/reverb_plate.py)
# ---------------------------------------------------------------------------
#
# The tank is feed-forward at block level (reads gathered outside); this
# kernel runs everything sub-block: the input-bandwidth one-pole, the two
# damping one-poles, the 4-section input-diffusion chain (static fractional
# lags -> two static slices + lerp per section) and the two LFO-modulated
# allpasses.  The modulated reads have per-sample fractional offsets; each
# chunk extracts a window of its work row via a dynamic roll (runtime
# scalar base from SMEM) and gathers per-sample values as one-hot matmuls
# [1, WD] x [WD, C] on the MXU.  WD is static and sized from the size
# map's Lipschitz constant (see plate_block's travel bound), plus the LFO
# excursion; in-kernel index clamping guards the remaining edge.

_PLATE_IN_GAINS = (0.750, 0.750, 0.625, 0.625)
_PLATE_G1 = 0.70


def _plate_kernel(din_ref, fba_ref, fbb_ref, damp_ref, d1a_ref, d1b_ref,
                  modoff_ref, inh_ref, modh_ref, seeds_ref, wb_ref,
                  a1b1_ref, dadb_ref, inh_out_ref, modh_out_ref, seeds_out_ref,
                  Win, Wmod,
                  *, B, C, DIN, DMOD, WD, in_lags, bandwidth):
    Win[:, :DIN] = inh_ref[...]
    Wmod[:, :DMOD] = modh_ref[...]
    # VMEM scratch is not zero-initialized: the one-hot matmul multiplies
    # the ENTIRE rolled window, so 0 * NaN = NaN from ANY not-yet-written
    # column the window can cover (future chunks and the 128-lane pad tail)
    # poisons the whole chunk.  Zero everything past the history once.
    Wmod[:, DMOD:] = jnp.zeros_like(Wmod[:, DMOD:])

    bw_full = _scan_const(
        np.float32(bandwidth) * din_ref[...], 1.0 - bandwidth,
        seeds_ref[:, 0:1],
    )
    damp = damp_ref[...]
    da = _affine_scan(damp, d1a_ref[...] * (1.0 - damp), seeds_ref[:, 1:2])
    db = _affine_scan(damp, d1b_ref[...] * (1.0 - damp), seeds_ref[:, 2:3])
    dadb_ref[0:1, :] = da
    dadb_ref[1:2, :] = db
    seeds_out_ref[:, 0:1] = bw_full[:, -1:]
    seeds_out_ref[:, 1:2] = da[:, -1:]
    seeds_out_ref[:, 2:3] = db[:, -1:]

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (WD, C), 0)

    for c in range(B // C):
        s = c * C
        bw = bw_full[:, s:s + C]

        # input diffusion: static-lag lerp reads + affine chain
        alpha, beta = 1.0, 0.0
        sdir, sadd, sdel = [], [], []
        for i, (o, g) in enumerate(zip(in_lags, _PLATE_IN_GAINS)):
            w = int(np.floor(o))
            f = np.float32(o - w)
            col = DIN + s - w
            av = Win[i:i + 1, col:col + C]
            bv = Win[i:i + 1, col - 1:col - 1 + C]
            dv = av + f * (bv - av)
            sdir.append(alpha)
            sadd.append(beta)
            sdel.append(dv)
            beta = g * beta + (1.0 - g * g) * dv
            alpha = alpha * g
        sig = alpha * bw + beta
        for i, g in enumerate(_PLATE_IN_GAINS):
            Win[i:i + 1, DIN + s:DIN + s + C] = (
                (sdir[i] * bw + sadd[i]) - g * sdel[i]
            )

        ins = (sig + fbb_ref[:, s:s + C], sig + fba_ref[:, s:s + C])

        for br in range(2):
            wb = wb_ref[br, c]
            # positive dynamic shift only: the negative-shift lowering
            # miscompiles for non-power-of-two lane widths
            wmod_pad = Wmod.shape[-1]
            window = pltpu.roll(Wmod[br:br + 1, :], wmod_pad - wb, 1)[:, :WD]
            off = modoff_ref[br:br + 1, s:s + C]
            wn = jnp.floor(off)
            frac = off - wn
            idx_a = (DMOD + s) + iota_c - wn.astype(jnp.int32) - wb
            # belt-and-braces: an out-of-window index would select NOTHING
            # (silent zeros); clamp to the window edge instead so a
            # beyond-bound excursion degrades to a slightly-off read
            idx_a = jnp.clip(idx_a, 1, WD - 1)
            oh_a = (iota_w == idx_a).astype(jnp.float32)
            oh_b = (iota_w == idx_a - 1).astype(jnp.float32)
            dims = (((1,), (0,)), ((), ()))
            # HIGHEST: a bf16-multiply MXU pass would truncate the window
            # values; the one-hot "gather" must be bit-exact
            av = jax.lax.dot_general(window, oh_a, dims,
                                     precision=jax.lax.Precision.HIGHEST,
                                     preferred_element_type=jnp.float32)
            bv = jax.lax.dot_general(window, oh_b, dims,
                                     precision=jax.lax.Precision.HIGHEST,
                                     preferred_element_type=jnp.float32)
            delayed = av + frac * (bv - av)
            v = ins[br] - _PLATE_G1 * delayed
            a1b1_ref[br:br + 1, s:s + C] = _PLATE_G1 * v + delayed
            Wmod[br:br + 1, DMOD + s:DMOD + s + C] = v

    inh_out_ref[...] = Win[:, B:B + DIN]
    modh_out_ref[...] = Wmod[:, B:B + DMOD]


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "sample_rate", "interpret"),
)
def plate_block(delayed_in, fb_a_t, fb_b_t, damping_t, d1a_read, d1b_read,
                mod_off, wbase, in_hist, mod_hist, seeds, *,
                chunk, sample_rate, interpret=None):
    """Fused plate sub-block recurrences.

    delayed_in/fb_a_t/fb_b_t/damping_t/d1a_read/d1b_read: [B]; mod_off:
    [2, B] modulated-AP offsets; wbase: [2, n_chunks] int32 window bases
    (min lerp-endpoint work-column per chunk); seeds: [3] = (bandwidth,
    damp_a, damp_b).  Returns (a1, b1, da, db, new_in_hist, new_mod_hist,
    seeds_out[3]).
    """
    from libgooey_tpu.core.smoother import smoothing_coeff
    from libgooey_tpu.effects import reverb_plate as _plate

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = delayed_in.shape[-1]
    C = int(chunk)
    DIN = in_hist.shape[-1]
    DMOD = mod_hist.shape[-1]
    srs = sample_rate / _plate.DATTORRO_SR
    coeff = smoothing_coeff(sample_rate)
    # Per-chunk size-scale travel bound: the smoothed size KNOB moves at most
    # (1 - (1-coeff)^C) of its range per chunk, and size_to_scale has
    # Lipschitz constant max|d(scale)/d(knob)| = 2*ln(4)*scale for knob<=0.5
    # (scale<=1) and 2*ln(2)*scale above (scale<=2) — both peak at 2*ln(4).
    # (The round-1 bound used the scale RANGE 1.75 instead of the slope and
    # under-covered a full-range size jump by ~70 columns.)
    travel = 2.0 * np.log(4.0) * (1.0 - (1.0 - coeff) ** C)
    bound = (max(_plate.TANK_AP1_A, _plate.TANK_AP1_B) * srs * travel
             + 2.0 * _plate.EXCURSION * srs + 8.0)
    WD = int(np.ceil((C + bound) / 128.0)) * 128
    in_lags = tuple(max(d * srs, 1.0) for d in _plate.INPUT_AP_DELAYS)

    kernel = functools.partial(
        _plate_kernel, B=B, C=C, DIN=DIN, DMOD=DMOD, WD=WD,
        in_lags=in_lags, bandwidth=float(_plate.INPUT_BANDWIDTH),
    )
    row = lambda v: v.astype(jnp.float32).reshape(1, B)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    a1b1, dadb, nin, nmod, seeds_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct((2, B), jnp.float32),
            jax.ShapeDtypeStruct(in_hist.shape, jnp.float32),
            jax.ShapeDtypeStruct(mod_hist.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ),
        in_specs=[_vmem()] * 10 + [smem],
        out_specs=(_vmem(),) * 5,
        scratch_shapes=[
            pltpu.VMEM((4, DIN + B), jnp.float32),
            # lane width padded to 128 for tpu.dynamic_rotate; the pad tail
            # is never one-hot-selected (indices stay < DMOD+B - wbase)
            pltpu.VMEM((2, ((DMOD + B + 127) // 128) * 128), jnp.float32),
        ],
        interpret=interpret,
    )(row(delayed_in), row(fb_a_t), row(fb_b_t), row(damping_t),
      row(d1a_read), row(d1b_read), mod_off.astype(jnp.float32),
      in_hist.astype(jnp.float32), mod_hist.astype(jnp.float32),
      jnp.concatenate([jnp.asarray(seeds, jnp.float32).reshape(3),
                       jnp.zeros(1, jnp.float32)]).reshape(1, 4),
      jnp.asarray(wbase, jnp.int32))
    return (a1b1[0], a1b1[1], dadb[0], dadb[1], nin, nmod,
            seeds_out.reshape(4)[:3])


# ---------------------------------------------------------------------------
# Voice-bank envelope follower: the one genuinely nonlinear recurrence in the
# drum voices' block (attack/release switching), over [V, B] banks
# ---------------------------------------------------------------------------
#
# The XLA path runs it as a 512-step lax.scan of [V] vector ops — ~0.87 ms
# of the 4,096-voice kick bank's block (tools/bench_kick_parts.py).  Here
# the bank is laid out [B, G, 128] (voices on lanes and sublane groups), so
# each sample step updates a full [G, 128] vreg slab with the env carried
# in registers; the only dynamic indexing is the sample index on the
# leading (sublane-major) axis, which Mosaic lowers natively (dynamic LANE
# slices were the round-2 bank-kernel failure).

#: sublane groups per grid step: [B, 8, 128] x f32 x 3 buffers ≈ 6 MB VMEM
_ENV_BANK_GROUPS = 8


def _bank_pad(V, groups_per_step):
    """Padded voice count / group count for a [B, G, 128] bank layout."""
    lanes = 128 * groups_per_step
    Vp = ((V + lanes - 1) // lanes) * lanes
    return Vp, Vp // 128


def _bank_tilt(a, fill, V, Vp, B):
    """[V, B] → [B, G, 128] with lane padding (voices on lanes+sublanes)."""
    a = jnp.asarray(a, jnp.float32)
    if Vp != V:
        a = jnp.concatenate(
            [a, jnp.full((Vp - V, B), fill, jnp.float32)], axis=0)
    return a.T.reshape(B, Vp // 128, 128)


def _env_bank_kernel(x_ref, frz_ref, env0_ref, out_ref, envl_ref,
                     *, att, rel, B):
    """att/rel-switching follower over a [B, G, 128] voice tile.

    env += (1-c)(rect - env), c = att if rect > env else rel, denormal
    flush at 1e-15, frozen (state held) where ``frz > 0.5`` — exactly
    effects/feedback_waveshaper.py:_env_follow_scan.  att/rel are static
    (they derive from the engine's static sample rate)."""
    env = env0_ref[...]

    def step(s, env):
        r = x_ref[s]
        frz = frz_ref[s]
        c = jnp.where(r > env, att, rel)
        new = env + (1.0 - c) * (r - env)
        new = jnp.where(jnp.abs(new) < 1e-15, 0.0, new)
        new = jnp.where(frz > 0.5, env, new)
        out_ref[s] = new
        return new

    env = jax.lax.fori_loop(0, B, step, env, unroll=1)
    envl_ref[...] = env


@functools.partial(jax.jit, static_argnames=("att", "rel", "interpret"))
def env_follow_bank(rect, freeze, env0, *, att, rel, interpret=None):
    """Voice-bank attack/release envelope follower.

    ``rect``: [V, B] rectified input; ``freeze``: [V, B] bool/f32 bypass
    mask (state held, output still written); ``env0``: [V] carried state;
    ``att``/``rel``: static scalar retention factors.  Returns
    ``(env [V, B], env_last [V])``, matching the sequential scan path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, B = rect.shape
    # small banks (the product-shaped kit: V <= 16 per family) pad to one
    # 128-lane group instead of a full 8-group slab
    GT = _ENV_BANK_GROUPS if V > 128 else max(1, (V + 127) // 128)
    Vp, G = _bank_pad(V, GT)

    xT = _bank_tilt(rect, 0.0, V, Vp, B)
    fT = _bank_tilt(freeze, 1.0, V, Vp, B)  # pad lanes frozen
    e0 = jnp.zeros((Vp,), jnp.float32).at[:V].set(env0).reshape(G, 128)
    env, envl = pl.pallas_call(
        functools.partial(_env_bank_kernel, att=att, rel=rel, B=B),
        grid=(G // GT,),
        out_shape=(
            jax.ShapeDtypeStruct((B, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 128), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((B, GT, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((B, GT, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((GT, 128), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((B, GT, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((GT, 128), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(xT, fT, e0)
    env_vb = env.reshape(B, Vp).T[:V]
    return env_vb, envl.reshape(Vp)[:V]


# ---------------------------------------------------------------------------
# Voice-bank TPT SVF: the per-voice resonant low-pass / TPT filter recurrence
# over [V, B] banks (resonant_lowpass.rs:48-61, state_variable_tpt.rs:42-68)
# ---------------------------------------------------------------------------
#
# The XLA path solves the 2-state recurrence with a log-depth associative
# scan (ops/scan.py linrec2) whose 6 coefficient arrays round-trip [V, B]
# through HBM ~9 times — ~0.66 ms of the 4,096-voice kick block.  Here the
# recurrence runs sample-sequential over [B, G, 128] voice slabs with the
# integrator state carried in vregs, like env_follow_bank.  Per-sample op
# order matches svf_tpt_block exactly (it IS the reference's order), so the
# kernel agrees with the per-sample oracle to f32 rounding.

#: sublane groups per grid step (Mosaic requires sublane blocks divisible
#: by 8) and samples per grid chunk: Pallas double-buffers every block, so
#: full-block [512, 8, 128] buffers x 5 overflow the ~16 MB VMEM budget —
#: the sample axis is chunked and the integrator state carried in a VMEM
#: scratch across the (sequentially iterated) chunk grid dimension.
_SVF_BANK_GROUPS = 8
_SVF_BANK_CHUNK = 128


def _svf_bank_kernel(x_ref, g_ref, hs_ref, ic0_ref, v1_ref, v2_ref, icl_ref,
                     carry_ref, *, BC):
    """TPT SVF over a [BC, GT, 128] voice tile (one sample chunk).

    ``hs`` carries h with the reset mask folded into its sign (h > 0
    always): negative h => zero the incoming integrator state at that
    sample (trigger reset, filters.py svf_tpt_block reset semantics).
    Grid is (voice groups, sample chunks) with chunks innermost; the
    integrators persist across chunks in ``carry_ref``.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry_ref[...] = ic0_ref[...]

    ic = carry_ref[...]

    def step(s, carry):
        ic1, ic2 = carry
        x = x_ref[s]
        g = g_ref[s]
        hs = hs_ref[s]
        h = jnp.abs(hs)
        rst = hs < 0.0
        ic1 = jnp.where(rst, 0.0, ic1)
        ic2 = jnp.where(rst, 0.0, ic2)
        v1 = (g * (x - ic2) + ic1) * h
        v2 = ic2 + g * v1
        v1_ref[s] = v1
        v2_ref[s] = v2
        return 2.0 * v1 - ic1, 2.0 * v2 - ic2

    ic1, ic2 = jax.lax.fori_loop(0, BC, step, (ic[0], ic[1]), unroll=1)
    out = jnp.stack([ic1, ic2], axis=0)
    carry_ref[...] = out
    icl_ref[...] = out  # every chunk; the (sequential) last write wins


@functools.partial(jax.jit, static_argnames=("interpret",))
def svf_bank(x, g, h, reset, ic1, ic2, *, interpret=None):
    """Voice-bank TPT SVF block.

    ``x``/``g``/``h``: [V, B] input and per-sample coefficients (from
    filters.svf_coeffs); ``reset``: [V, B] bool/f32 trigger-reset mask or
    None; ``ic1``/``ic2``: [V] carried integrator state.  Returns
    ``(v1 [V, B], v2 [V, B], ic1' [V], ic2' [V])`` — the pre-update
    band/low taps and the carried state, matching filters.svf_tpt_block.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, B = x.shape
    Vp, G = _bank_pad(V, _SVF_BANK_GROUPS)
    BC = _SVF_BANK_CHUNK if B % _SVF_BANK_CHUNK == 0 else B

    h = jnp.broadcast_to(jnp.asarray(h, jnp.float32), (V, B))
    if reset is not None:
        h = jnp.where(jnp.asarray(reset, jnp.bool_), -h, h)
    xT = _bank_tilt(x, 0.0, V, Vp, B)
    gT = _bank_tilt(jnp.broadcast_to(jnp.asarray(g, jnp.float32), (V, B)),
                    0.0, V, Vp, B)
    hT = _bank_tilt(h, 0.0, V, Vp, B)
    ic0 = jnp.zeros((2, Vp), jnp.float32)
    ic0 = ic0.at[0, :V].set(ic1).at[1, :V].set(ic2).reshape(2, G, 128)

    GT = _SVF_BANK_GROUPS
    big = pl.BlockSpec((BC, GT, 128), lambda i, j: (j, i, 0))
    small = pl.BlockSpec((2, GT, 128), lambda i, j: (0, i, 0))
    v1, v2, icl = pl.pallas_call(
        functools.partial(_svf_bank_kernel, BC=BC),
        grid=(G // GT, B // BC),
        out_shape=(
            jax.ShapeDtypeStruct((B, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, G, 128), jnp.float32),
        ),
        in_specs=[big, big, big, small],
        out_specs=(big, big, small),
        scratch_shapes=[pltpu.VMEM((2, GT, 128), jnp.float32)],
        interpret=interpret,
    )(xT, gT, hT, ic0)
    flat = lambda v: v.reshape(B, Vp).T[:V]
    icl = icl.reshape(2, Vp)
    return flat(v1), flat(v2), icl[0, :V], icl[1, :V]


# ---------------------------------------------------------------------------
# Voice-bank fused feedback-waveshaper fast path: the ENTIRE zero-feedback
# chain — 4x polyphase oversampling, tanh, envelope-referenced makeup gain,
# bypass-gated DC blocker and feedback filter — as one sample-sequential
# kernel over [B, G, 128] voice slabs (feedback_waveshaper.rs:118-170,
# utils/oversampler.rs; effects/feedback_waveshaper.py fast path)
# ---------------------------------------------------------------------------
#
# The XLA fast path costs ~1.9 ms of the 4,096-voice kick block: the 4x
# half-band chains run as Toeplitz MXU matmuls whose [V, 4B] intermediates
# round-trip HBM, plus three more log-depth scans for the DC blocker and
# feedback filter.  Here every 2x/4x intermediate lives in vregs: per base
# sample the kernel runs all 32 first-order allpass sections, 4 tanh
# evaluations, the gain multiply, and the three gated recurrences on a
# [GT, 128] voice slab.  Division of labor: the envelope follower
# (env_follow_bank) and the transcendental makeup-gain curve run OUTSIDE
# (vectorized XLA), entering as a per-sample `comp` trajectory with the
# bypass mask folded into its sign (comp > 0 always on the real path).

#: sublane groups per grid step (Mosaic requires sublane blocks divisible
#: by 8): 4 x [B, 8, 128] f32 buffers = 8 MB VMEM
_FBWS_BANK_GROUPS = 8

#: (name, plane-count) rows of the packed [S, V] state, kernel I/O order.
#: u/d = up/down, 1/2 = half-band stage, y/x = section output/input
#: memories, trailing 0/1 = polyphase branch; *x1d = the down-samplers'
#: odd-phase input delay; dc/ft = DC blocker + feedback-filter state.
_FBWS_CORE_LAYOUT = (
    ("u1y0", 4), ("u1x0", 4), ("u1y1", 4), ("u1x1", 4),
    ("u2y0", 2), ("u2x0", 2), ("u2y1", 2), ("u2x1", 2),
    ("d2y0", 2), ("d2x0", 2), ("d2y1", 2), ("d2x1", 2), ("d2x1d", 1),
    ("d1y0", 4), ("d1x0", 4), ("d1y1", 4), ("d1x1", 4), ("d1x1d", 1),
    ("dcx", 1), ("dcy", 1),
)
#: second-to-last section outputs/inputs (HalfbandState.*y2/*x2), captured
#: for state parity with the scan path; appended to the OUTPUT state only.
_FBWS_Y2_LAYOUT = (
    ("u1y2_0", 4), ("u1x2_0", 4), ("u1y2_1", 4), ("u1x2_1", 4),
    ("u2y2_0", 2), ("u2x2_0", 2), ("u2y2_1", 2), ("u2x2_1", 2),
    ("d2y2_0", 2), ("d2x2_0", 2), ("d2y2_1", 2), ("d2x2_1", 2),
    ("d1y2_0", 4), ("d1x2_0", 4), ("d1y2_1", 4), ("d1x2_1", 4),
)


def _fbws_layout_index(layout):
    idx, k = {}, 0
    for name, n in layout:
        idx[name] = (k, n)
        k += n
    return idx, k


_FBWS_IN_IDX, _FBWS_S_IN = _fbws_layout_index(_FBWS_CORE_LAYOUT)
_FBWS_OUT_IDX, _FBWS_S_OUT = _fbws_layout_index(
    _FBWS_CORE_LAYOUT + _FBWS_Y2_LAYOUT)


def _fbws_stage_coefs():
    """Static python-float half-band coefficients, phase-split."""
    from libgooey_tpu.ops import oversample as ovs

    c1_0, c1_1 = ovs._split([float(c) for c in ovs.STAGE1])
    c2_0, c2_1 = ovs._split([float(c) for c in ovs.STAGE2])
    return tuple(c1_0), tuple(c1_1), tuple(c2_0), tuple(c2_1)


def _ap_chain_seq(u, ys, xs, coefs):
    """One sample through a chain of first-order allpasses.

    ``y = a*(x - y1) + x1`` per section (utils/oversampler.rs; hiir
    form).  Returns (output, new ys, new xs)."""
    ys, xs = list(ys), list(xs)
    for j, a in enumerate(coefs):
        y = a * (u - ys[j]) + xs[j]
        xs[j] = u
        ys[j] = y
        u = y
    return u, tuple(ys), tuple(xs)


def _fbws_bank_kernel(u_ref, cs_ref, st_ref, dc_ref, nst_ref, *, B):
    """Fused zero-feedback feedback-waveshaper over a [B, GT, 128] tile.

    ``u``: drive*x; ``cs``: makeup-gain trajectory with the bypass mask
    folded into its sign (cs < 0 => bypass: DC state frozen, dc output
    forced 0 — the caller blends ``out = bypass ? x : x*(1-mix) +
    dc*mix`` outside).  The feedback-filter recurrence (pure carried
    state on this path — feedback is 0) runs OUTSIDE as a linrec1 over
    the dc output; its trajectory buffer would tip the kernel past the
    ~16 MB VMEM budget (Pallas double-buffers every block).
    """
    C1_0, C1_1, C2_0, C2_1 = _fbws_stage_coefs()

    def ld(name):
        k, n = _FBWS_IN_IDX[name]
        if n == 1:
            return st_ref[k]
        return tuple(st_ref[k + j] for j in range(n))

    c0 = {name: ld(name) for name, _ in _FBWS_CORE_LAYOUT}

    def phase_a(c, u):
        """Stage-1 update + first 2x subsample through stage 2."""
        c = dict(c)
        e1, c["u1y0"], c["u1x0"] = _ap_chain_seq(u, c["u1y0"], c["u1x0"], C1_0)
        o1, c["u1y1"], c["u1x1"] = _ap_chain_seq(u, c["u1y1"], c["u1x1"], C1_1)
        s0, c["u2y0"], c["u2x0"] = _ap_chain_seq(e1, c["u2y0"], c["u2x0"], C2_0)
        s1, c["u2y1"], c["u2x1"] = _ap_chain_seq(e1, c["u2y1"], c["u2x1"], C2_1)
        t0 = jnp.tanh(s0)
        t1 = jnp.tanh(s1)
        a0, c["d2y0"], c["d2x0"] = _ap_chain_seq(t0, c["d2y0"], c["d2x0"], C2_0)
        a1, c["d2y1"], c["d2x1"] = _ap_chain_seq(
            c["d2x1d"], c["d2y1"], c["d2x1"], C2_1)
        d0 = 0.5 * (a0 + a1)
        c["d2x1d"] = t1
        return c, o1, d0

    def phase_b(c, o1, d0, cs):
        """Second 2x subsample, stage-1 downsample, gated DC/filter."""
        c = dict(c)
        s2, c["u2y0"], c["u2x0"] = _ap_chain_seq(o1, c["u2y0"], c["u2x0"], C2_0)
        s3, c["u2y1"], c["u2x1"] = _ap_chain_seq(o1, c["u2y1"], c["u2x1"], C2_1)
        t2 = jnp.tanh(s2)
        t3 = jnp.tanh(s3)
        b0, c["d2y0"], c["d2x0"] = _ap_chain_seq(t2, c["d2y0"], c["d2x0"], C2_0)
        b1, c["d2y1"], c["d2x1"] = _ap_chain_seq(
            c["d2x1d"], c["d2y1"], c["d2x1"], C2_1)
        d1 = 0.5 * (b0 + b1)
        c["d2x1d"] = t3
        e0, c["d1y0"], c["d1x0"] = _ap_chain_seq(d0, c["d1y0"], c["d1x0"], C1_0)
        e1, c["d1y1"], c["d1x1"] = _ap_chain_seq(
            c["d1x1d"], c["d1y1"], c["d1x1"], C1_1)
        y = 0.5 * (e0 + e1)
        c["d1x1d"] = d1

        byp = cs < 0.0
        compensated = y * jnp.maximum(cs, 0.0)
        x1_prev = c["dcx"]
        c["dcx"] = jnp.where(byp, x1_prev, compensated)
        y1_new = np.float32(_FBWS_DC) * c["dcy"] + (compensated - x1_prev)
        c["dcy"] = jnp.where(byp, c["dcy"], y1_new)
        dc = jnp.where(byp, 0.0, c["dcy"])
        return c, dc

    def body(s, c):
        c, o1, d0 = phase_a(c, u_ref[s])
        c, dc = phase_b(c, o1, d0, cs_ref[s])
        dc_ref[s] = dc
        return c

    c = jax.lax.fori_loop(0, B - 1, body, c0, unroll=1)

    # final step with second-to-last captures: stage-1 memories hold the
    # step-(B-2) section IO now; stage-2 memories hold per-phase index
    # 2B-2 after the first subsample of this step (scan path's [..., -2])
    caps = {}
    for st_name, y2_name in (("u1y0", "u1y2_0"), ("u1x0", "u1x2_0"),
                             ("u1y1", "u1y2_1"), ("u1x1", "u1x2_1"),
                             ("d1y0", "d1y2_0"), ("d1x0", "d1x2_0"),
                             ("d1y1", "d1y2_1"), ("d1x1", "d1x2_1")):
        caps[y2_name] = c[st_name]
    c, o1, d0 = phase_a(c, u_ref[B - 1])
    for st_name, y2_name in (("u2y0", "u2y2_0"), ("u2x0", "u2x2_0"),
                             ("u2y1", "u2y2_1"), ("u2x1", "u2x2_1"),
                             ("d2y0", "d2y2_0"), ("d2x0", "d2x2_0"),
                             ("d2y1", "d2y2_1"), ("d2x1", "d2x2_1")):
        caps[y2_name] = c[st_name]
    c, dc = phase_b(c, o1, d0, cs_ref[B - 1])
    dc_ref[B - 1] = dc

    out_vals = dict(c)
    out_vals.update(caps)
    for name, _ in _FBWS_CORE_LAYOUT + _FBWS_Y2_LAYOUT:
        k, n = _FBWS_OUT_IDX[name]
        v = out_vals[name]
        if n == 1:
            nst_ref[k] = v
        else:
            for j in range(n):
                nst_ref[k + j] = v[j]


def pack_fbws_bank(state):
    """FBShaperState (voice-bank, [V]-shaped slices) -> packed [S_in, V]."""
    o = state.ovs
    rows = []
    for hb in (o.up1, o.up2):
        rows += [hb.ap0.T, hb.ap0x.T, hb.ap1.T, hb.ap1x.T]
    for hb in (o.down2, o.down1):
        rows += [hb.ap0.T, hb.ap0x.T, hb.ap1.T, hb.ap1x.T, hb.x1[None]]
    rows += [state.dc_x1[None], state.dc_y1[None]]
    return jnp.concatenate(rows, axis=0)


def unpack_fbws_bank(nst, state):
    """Packed [S_out, V] -> ``(new OversamplerState, dc_x1, dc_y1)``.

    ``state`` provides the template (up-sampler x1 fields are untouched
    by the chain, exactly as in oversample.upsample2).  The feedback
    filter state is computed by the caller from the dc output."""
    from libgooey_tpu.ops.oversample import HalfbandState

    def g(name):
        k, n = _FBWS_OUT_IDX[name]
        return nst[k] if n == 1 else nst[k:k + n].T

    def hb(tag, x1, old):
        return HalfbandState(
            ap0=g(f"{tag}y0"), ap0x=g(f"{tag}x0"),
            ap1=g(f"{tag}y1"), ap1x=g(f"{tag}x1"), x1=x1,
            ap0y2=g(f"{tag}y2_0"), ap0x2=g(f"{tag}x2_0"),
            ap1y2=g(f"{tag}y2_1"), ap1x2=g(f"{tag}x2_1"))

    o = state.ovs
    ovs_new = type(o)(
        up1=hb("u1", o.up1.x1, o.up1),
        up2=hb("u2", o.up2.x1, o.up2),
        down2=hb("d2", g("d2x1d"), o.down2),
        down1=hb("d1", g("d1x1d"), o.down1),
    )
    return ovs_new, g("dcx"), g("dcy")


@functools.partial(jax.jit, static_argnames=("interpret",))
def fbws_bank(u, comp_signed, packed, *, interpret=None):
    """Fused voice-bank feedback-waveshaper fast path.

    ``u``: [V, B] pre-driven input (drive*x); ``comp_signed``: [V, B]
    makeup gain with bypass as sign (< 0 => bypassed sample);
    ``packed``: [S_in, V] from :func:`pack_fbws_bank`.  Returns
    ``(dc [V, B], new_packed [S_out, V])`` for :func:`unpack_fbws_bank`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, B = u.shape
    Vp, G = _bank_pad(V, _FBWS_BANK_GROUPS)

    uT = _bank_tilt(u, 0.0, V, Vp, B)
    cT = _bank_tilt(comp_signed, -1.0, V, Vp, B)  # pad lanes bypassed
    sp = jnp.pad(jnp.asarray(packed, jnp.float32),
                 ((0, 0), (0, Vp - V))).reshape(_FBWS_S_IN, G, 128)

    GT = _FBWS_BANK_GROUPS
    big = pl.BlockSpec((B, GT, 128), lambda i: (0, i, 0))
    dc, nst = pl.pallas_call(
        functools.partial(_fbws_bank_kernel, B=B),
        grid=(G // GT,),
        out_shape=(
            jax.ShapeDtypeStruct((B, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((_FBWS_S_OUT, G, 128), jnp.float32),
        ),
        in_specs=[big, big,
                  pl.BlockSpec((_FBWS_S_IN, GT, 128), lambda i: (0, i, 0))],
        out_specs=(big,
                   pl.BlockSpec((_FBWS_S_OUT, GT, 128), lambda i: (0, i, 0))),
        interpret=interpret,
    )(uT, cT, sp)
    return dc.reshape(B, Vp).T[:V], nst.reshape(_FBWS_S_OUT, Vp)[:, :V]


def _ws4_bank_kernel(x_ref, d_ref, cp_ref, st_ref, y_ref, nst_ref, *, B):
    """Fused plain-waveshaper-at-4x over a [B, GT, 128] voice tile.

    ``effects/waveshaper.py process`` semantics with mix == 1: the
    nonlinearity is ``tanh(v * d) * cp`` evaluated per 4x subsample with
    the enclosing ENGINE sample's drive/compensation (repeat_to_rate), so
    ``d``/``cp`` ride as engine-rate trajectories and the four subsamples
    of sample ``s`` share ``d[s]``/``cp[s]``.  Same polyphase chains and
    packed-state layout as `_fbws_bank_kernel` (the dc rows pass through
    untouched — the waveshaper has no DC blocker, waveshaper.rs); bypass
    (drive <= 1) is a whole-sample output select done by the CALLER, the
    oversampler history advances unconditionally exactly like the XLA
    ws.process path (block-granular freeze stays outside).
    """
    C1_0, C1_1, C2_0, C2_1 = _fbws_stage_coefs()

    def ld(name):
        k, n = _FBWS_IN_IDX[name]
        if n == 1:
            return st_ref[k]
        return tuple(st_ref[k + j] for j in range(n))

    c0 = {name: ld(name) for name, _ in _FBWS_CORE_LAYOUT}

    def phase_a(c, u, d, cp):
        c = dict(c)
        e1, c["u1y0"], c["u1x0"] = _ap_chain_seq(u, c["u1y0"], c["u1x0"], C1_0)
        o1, c["u1y1"], c["u1x1"] = _ap_chain_seq(u, c["u1y1"], c["u1x1"], C1_1)
        s0, c["u2y0"], c["u2x0"] = _ap_chain_seq(e1, c["u2y0"], c["u2x0"], C2_0)
        s1, c["u2y1"], c["u2x1"] = _ap_chain_seq(e1, c["u2y1"], c["u2x1"], C2_1)
        t0 = jnp.tanh(s0 * d) * cp
        t1 = jnp.tanh(s1 * d) * cp
        a0, c["d2y0"], c["d2x0"] = _ap_chain_seq(t0, c["d2y0"], c["d2x0"], C2_0)
        a1, c["d2y1"], c["d2x1"] = _ap_chain_seq(
            c["d2x1d"], c["d2y1"], c["d2x1"], C2_1)
        d0 = 0.5 * (a0 + a1)
        c["d2x1d"] = t1
        return c, o1, d0

    def phase_b(c, o1, d0, d, cp):
        c = dict(c)
        s2, c["u2y0"], c["u2x0"] = _ap_chain_seq(o1, c["u2y0"], c["u2x0"], C2_0)
        s3, c["u2y1"], c["u2x1"] = _ap_chain_seq(o1, c["u2y1"], c["u2x1"], C2_1)
        t2 = jnp.tanh(s2 * d) * cp
        t3 = jnp.tanh(s3 * d) * cp
        b0, c["d2y0"], c["d2x0"] = _ap_chain_seq(t2, c["d2y0"], c["d2x0"], C2_0)
        b1, c["d2y1"], c["d2x1"] = _ap_chain_seq(
            c["d2x1d"], c["d2y1"], c["d2x1"], C2_1)
        d1 = 0.5 * (b0 + b1)
        c["d2x1d"] = t3
        e0, c["d1y0"], c["d1x0"] = _ap_chain_seq(d0, c["d1y0"], c["d1x0"], C1_0)
        e1, c["d1y1"], c["d1x1"] = _ap_chain_seq(
            c["d1x1d"], c["d1y1"], c["d1x1"], C1_1)
        y = 0.5 * (e0 + e1)
        c["d1x1d"] = d1
        return c, y

    def body(s, c):
        d = d_ref[s]
        cp = cp_ref[s]
        c, o1, d0 = phase_a(c, x_ref[s], d, cp)
        c, y = phase_b(c, o1, d0, d, cp)
        y_ref[s] = y
        return c

    c = jax.lax.fori_loop(0, B - 1, body, c0, unroll=1)

    caps = {}
    for st_name, y2_name in (("u1y0", "u1y2_0"), ("u1x0", "u1x2_0"),
                             ("u1y1", "u1y2_1"), ("u1x1", "u1x2_1"),
                             ("d1y0", "d1y2_0"), ("d1x0", "d1x2_0"),
                             ("d1y1", "d1y2_1"), ("d1x1", "d1x2_1")):
        caps[y2_name] = c[st_name]
    d = d_ref[B - 1]
    cp = cp_ref[B - 1]
    c, o1, d0 = phase_a(c, x_ref[B - 1], d, cp)
    for st_name, y2_name in (("u2y0", "u2y2_0"), ("u2x0", "u2x2_0"),
                             ("u2y1", "u2y2_1"), ("u2x1", "u2x2_1"),
                             ("d2y0", "d2y2_0"), ("d2x0", "d2x2_0"),
                             ("d2y1", "d2y2_1"), ("d2x1", "d2x2_1")):
        caps[y2_name] = c[st_name]
    c, y = phase_b(c, o1, d0, d, cp)
    y_ref[B - 1] = y

    out_vals = dict(c)
    out_vals.update(caps)
    for name, _ in _FBWS_CORE_LAYOUT + _FBWS_Y2_LAYOUT:
        k, n = _FBWS_OUT_IDX[name]
        v = out_vals[name]
        if n == 1:
            nst_ref[k] = v
        else:
            for j in range(n):
                nst_ref[k + j] = v[j]


def pack_ws4_bank(ovs):
    """[V]-batched OversamplerState -> packed [S_in, V] for ws4_bank
    (the fbws layout with zero DC rows — the waveshaper has none)."""
    import types

    V = ovs.up1.ap0.shape[0]
    z = jnp.zeros((V,), jnp.float32)
    return pack_fbws_bank(types.SimpleNamespace(ovs=ovs, dc_x1=z, dc_y1=z))


def unpack_ws4_bank(nst, ovs):
    """Packed [S_out, V] -> new OversamplerState (DC rows discarded)."""
    import types

    new_ovs, _dcx, _dcy = unpack_fbws_bank(
        nst, types.SimpleNamespace(ovs=ovs))
    return new_ovs


@functools.partial(jax.jit, static_argnames=("interpret",))
def ws4_bank(x, drive, packed, *, interpret=None):
    """Fused voice-bank plain waveshaper at 4x (waveshaper.rs semantics,
    mix == 1): the whole polyphase chain + tanh(v*d)*comp runs
    sample-sequential in vregs — the XLA formulation's per-section
    [V, 2B/4B] intermediates cost ~275 us/block at 1,024 voices, this
    kernel ~45 us (same class as fbws_bank).  ``x``: [V, B] UNdriven
    input; ``drive``: [V, B] raw drive trajectory.  Returns
    ``(sat [V, B], new_packed [S_out, V])``; caller applies the bypass
    select and block-granular freeze (instruments/snare.py, bass.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, B = x.shape
    Vp, G = _bank_pad(V, _FBWS_BANK_GROUPS)

    d = jnp.maximum(jnp.asarray(drive, jnp.float32), 1.0 + 1e-6)
    comp = jnp.tanh(jnp.float32(0.5)) / jnp.tanh(0.5 * d)
    xT = _bank_tilt(x, 0.0, V, Vp, B)
    dT = _bank_tilt(d, 1.0, V, Vp, B)
    cT = _bank_tilt(comp, 1.0, V, Vp, B)
    sp = jnp.pad(jnp.asarray(packed, jnp.float32),
                 ((0, 0), (0, Vp - V))).reshape(_FBWS_S_IN, G, 128)

    GT = _FBWS_BANK_GROUPS
    big = pl.BlockSpec((B, GT, 128), lambda i: (0, i, 0))
    y, nst = pl.pallas_call(
        functools.partial(_ws4_bank_kernel, B=B),
        grid=(G // GT,),
        out_shape=(
            jax.ShapeDtypeStruct((B, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((_FBWS_S_OUT, G, 128), jnp.float32),
        ),
        in_specs=[big, big, big,
                  pl.BlockSpec((_FBWS_S_IN, GT, 128), lambda i: (0, i, 0))],
        out_specs=(big,
                   pl.BlockSpec((_FBWS_S_OUT, GT, 128), lambda i: (0, i, 0))),
        interpret=interpret,
    )(xT, dT, cT, sp)
    return y.reshape(B, Vp).T[:V], nst.reshape(_FBWS_S_OUT, Vp)[:, :V]


# ---------------------------------------------------------------------------
# Voice-bank Kellet pink-noise filter (gen/pink_noise.rs:26-66): three
# parallel one-poles + direct term over [V, B] banks
# ---------------------------------------------------------------------------

def _pink_bank_kernel(w_ref, rst_ref, st0_ref, out_ref, stl_ref, carry_ref,
                      *, poles, gains, direct, outg, BC):
    """Three one-pole recurrences + weighted sum over a [BC, GT, 128] tile.

    ``y_i = rst ? g_i*w : p_i*y_i + g_i*w`` (trigger resets zero the
    incoming state, ops/noise.py pink_block); output ``(y0+y1+y2 +
    direct*w) * outg``.  Grid (voice groups, sample chunks); state
    persists across chunks in ``carry_ref``.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry_ref[...] = st0_ref[...]

    st = carry_ref[...]

    def step(s, carry):
        y0, y1, y2 = carry
        w = w_ref[s]
        rst = rst_ref[s] > 0.5
        y0 = jnp.where(rst, 0.0, poles[0] * y0) + gains[0] * w
        y1 = jnp.where(rst, 0.0, poles[1] * y1) + gains[1] * w
        y2 = jnp.where(rst, 0.0, poles[2] * y2) + gains[2] * w
        out_ref[s] = (y0 + y1 + y2 + direct * w) * outg
        return y0, y1, y2

    y0, y1, y2 = jax.lax.fori_loop(
        0, BC, step, (st[0], st[1], st[2]), unroll=1)
    out = jnp.stack([y0, y1, y2], axis=0)
    carry_ref[...] = out
    stl_ref[...] = out


@functools.partial(jax.jit, static_argnames=(
    "poles", "gains", "direct", "outg", "interpret"))
def pink_bank(w, reset, fstate, *, poles, gains, direct, outg,
              interpret=None):
    """Voice-bank pink-noise filter block.

    ``w``: [V, B] white input; ``reset``: [V, B] bool/f32 trigger mask or
    None; ``fstate``: [V, 3] carried one-pole states; ``poles``/``gains``:
    static 3-tuples (sample-rate-adjusted, ops/noise.py coefficients).
    Returns ``(pink [V, B], fstate' [V, 3])``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, B = w.shape
    Vp, G = _bank_pad(V, _SVF_BANK_GROUPS)
    BC = _SVF_BANK_CHUNK if B % _SVF_BANK_CHUNK == 0 else B

    wT = _bank_tilt(w, 0.0, V, Vp, B)
    if reset is None:
        reset = jnp.zeros((V, B), jnp.float32)
    rT = _bank_tilt(jnp.asarray(reset, jnp.float32), 0.0, V, Vp, B)
    st0 = jnp.zeros((3, Vp), jnp.float32).at[:, :V].set(fstate.T)
    st0 = st0.reshape(3, G, 128)

    GT = _SVF_BANK_GROUPS
    big = pl.BlockSpec((BC, GT, 128), lambda i, j: (j, i, 0))
    small = pl.BlockSpec((3, GT, 128), lambda i, j: (0, i, 0))
    pink, stl = pl.pallas_call(
        functools.partial(
            _pink_bank_kernel, poles=poles, gains=gains,
            direct=direct, outg=outg, BC=BC),
        grid=(G // GT, B // BC),
        out_shape=(
            jax.ShapeDtypeStruct((B, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, G, 128), jnp.float32),
        ),
        in_specs=[big, big, small],
        out_specs=(big, small),
        scratch_shapes=[pltpu.VMEM((3, GT, 128), jnp.float32)],
        interpret=interpret,
    )(wT, rT, st0)
    return pink.reshape(B, Vp).T[:V], stl.reshape(3, Vp)[:, :V].T


# ---------------------------------------------------------------------------
# Voice-bank mix stage: pan/gain smoothing + equal-power pan + the three
# voice-axis reductions (L / R / mono) in ONE kernel
# ---------------------------------------------------------------------------
#
# The engine's mix stage (engine/engine.py: smooth_block x2, pan_gains,
# shaped = voices * gain, three sums over V) is pure elementwise math plus
# reductions — no recurrence.  NOTE (measured): XLA already fuses the whole
# stage into the voice banks' elementwise epilogue, so this kernel is AT
# PARITY with the XLA path (1.395 vs 1.380 ms on the 4,096-voice block),
# not faster — it is kept as an OPT-IN (engine.MIX_IMPL = "pallas") and as
# the worked example of the bank-kernel layout rule below.  A stub-
# differential profile attributed ~0.47 ms to this stage; that was a
# fusion artifact of the stubbing itself (see verify skill, perf rules).
#
# Layout is TRANSPOSED [B, V] (voices on lanes, like _bank_tilt): the
# smoothing closed form y[k] = tgt + (cur - tgt) * q^(k+1) broadcasts a
# [1, VC] per-voice row against a [B, 1] power column, and the reductions
# collapse the lane axis.  Grid steps walk voice tiles; the [B, 1]
# outputs accumulate in VMEM across steps (constant out index map).
# Semantics mirror core/smoother.py:smooth_block (settle snap at 1e-4,
# smoother.rs:120-137) and core/dsp.py:pan_gains (frame.rs:31-37).

_MIX_BANK_VC = 256  # voice rows per grid step ([VC, B] f32 tile = 512 KB)


def _mix_bank_kernel(x_ref, pc_ref, pt_ref, gc_ref, gt_ref, pw_ref,
                     outl_ref, outr_ref, outm_ref, *, eps):
    i = pl.program_id(0)
    x = x_ref[...]                                   # [B, VC] (voices on lanes)
    pw = pw_ref[...]                                 # [B, 1] = q^(k+1)
    pt = pt_ref[...]                                 # [1, VC]
    pdec = (pc_ref[...] - pt) * pw                   # [B, VC]
    pan = pt + jnp.where(jnp.abs(pdec) < eps, 0.0, pdec)
    gt = gt_ref[...]
    gdec = (gc_ref[...] - gt) * pw
    gain = gt + jnp.where(jnp.abs(gdec) < eps, 0.0, gdec)
    ang = jnp.clip(pan, 0.0, 1.0) * np.float32(np.pi / 2.0)
    shaped = x * gain
    suml = jnp.sum(shaped * jnp.cos(ang), axis=1, keepdims=True)
    sumr = jnp.sum(shaped * jnp.sin(ang), axis=1, keepdims=True)
    summ = jnp.sum(shaped, axis=1, keepdims=True)

    @pl.when(i == 0)
    def _init():
        outl_ref[...] = suml
        outr_ref[...] = sumr
        outm_ref[...] = summ

    @pl.when(i > 0)
    def _acc():
        outl_ref[...] += suml
        outr_ref[...] += sumr
        outm_ref[...] += summ


@functools.partial(jax.jit, static_argnames=("coeff", "interpret"))
def mix_bank(voices, pan_cur, pan_tgt, gain_cur, gain_tgt, *, coeff,
             interpret=None):
    """Fused engine mix stage over a [V, B] voice bank.

    ``voices``: [V, B] per-voice mono; ``pan_*``/``gain_*``: [V] smoother
    current/target.  ``coeff``: static smoothing coefficient.  Returns
    ``(sum_l [B], sum_r [B], sum_mono [B])`` — the equal-power-panned L/R
    mixes and the unpanned mono mix, each summed over voices, identical
    (up to tile-order f32 reassociation) to the XLA mix stage in
    engine/engine.py.

    Layout note (hard-won): the kernel consumes ``voices.T`` ([B, V],
    voices on LANES) like every other bank kernel's ``_bank_tilt``.  The
    engine's logical [V, B] intermediates are physically B-major (layout
    propagates from the bank kernels), so the transpose is free — whereas
    a V-major [V, B] input block forces XLA to physically relayout the
    whole producing epilogue before the custom call (~9 ms/block at
    V=4096, a 7x engine regression, vs ~30 us for this formulation).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from libgooey_tpu.core.constants import SMOOTHER_SETTLE_EPS

    V, B = voices.shape
    xT = voices.T                                    # [B, V] — layout no-op
    VC = min(_MIX_BANK_VC, max(128, V))
    Vp = ((V + VC - 1) // VC) * VC
    if Vp != V:
        pad = Vp - V
        xT = jnp.concatenate([xT, jnp.zeros((B, pad), jnp.float32)], axis=1)
        zpad = jnp.zeros((pad,), jnp.float32)
        pan_cur = jnp.concatenate([pan_cur, zpad])
        pan_tgt = jnp.concatenate([pan_tgt, zpad])
        gain_cur = jnp.concatenate([gain_cur, zpad])
        gain_tgt = jnp.concatenate([gain_tgt, zpad])
    q = np.float32(1.0 - coeff)
    powers = jnp.power(q, jnp.arange(1, B + 1, dtype=jnp.float32))[:, None]

    lane = pl.BlockSpec((1, VC), lambda i: (0, i))
    col = pl.BlockSpec((B, 1), lambda i: (0, 0))
    outl, outr, outm = pl.pallas_call(
        functools.partial(_mix_bank_kernel, eps=SMOOTHER_SETTLE_EPS),
        grid=(Vp // VC,),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((B, VC), lambda i: (0, i)),
            lane, lane, lane, lane, col,
        ],
        out_specs=(col, col, col),
        interpret=interpret,
    )(xT, pan_cur[None, :], pan_tgt[None, :],
      gain_cur[None, :], gain_tgt[None, :], powers)
    return outl[:, 0], outr[:, 0], outm[:, 0]


# ---------------------------------------------------------------------------
# Generic voice-bank 2-state linear recurrence: s[n] = A[n] s[n-1] + b[n]
# ---------------------------------------------------------------------------
#
# The sample-sequential twin of ops/scan.py linrec2 (associative scan).
# Biquads (RBJ DF-I), the Chamberlin SVF and the membrane resonator bands
# all reduce to this recurrence; on TPU the associative scan lowers to
# O(log B) full passes over SIX coefficient arrays (~10 kernels per
# recurrence), which dominates the small-V product/kit configs' graph
# floor (snare/hihat2/tom2 run several biquads each).  This kernel runs
# the recurrence in one pass over [B, G, 128] voice slabs with the state
# in vregs, like svf_bank.  Returns POST-update state trajectories,
# matching linrec2 exactly (same per-sample op order as the reference's
# sample loop, so it also agrees with the per-sample oracles).

def _linrec2_bank_kernel(a11_ref, a12_ref, a21_ref, a22_ref, b1_ref, b2_ref,
                         s0_ref, s1_ref, s2_ref, sl_ref, carry_ref, *, BC):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry_ref[...] = s0_ref[...]

    s = carry_ref[...]

    def step(n, carry):
        s1, s2 = carry
        n1 = a11_ref[n] * s1 + a12_ref[n] * s2 + b1_ref[n]
        n2 = a21_ref[n] * s1 + a22_ref[n] * s2 + b2_ref[n]
        s1_ref[n] = n1
        s2_ref[n] = n2
        return n1, n2

    s1, s2 = jax.lax.fori_loop(0, BC, step, (s[0], s[1]), unroll=1)
    out = jnp.stack([s1, s2], axis=0)
    carry_ref[...] = out
    sl_ref[...] = out  # sequential chunk grid: the last write wins


@functools.partial(jax.jit, static_argnames=("interpret",))
def linrec2_bank(a11, a12, a21, a22, b1, b2, s1_0, s2_0, *, interpret=None):
    """Voice-bank 2-state recurrence over [V, B] blocks.

    Coefficients are [V, B] (already broadcast); ``s1_0``/``s2_0`` are [V]
    carried state.  Returns ``(s1 [V, B], s2 [V, B], s1' [V], s2' [V])``
    with s1/s2 the post-update state trajectories (ops/scan.py linrec2
    semantics).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, B = a11.shape
    Vp, G = _bank_pad(V, _SVF_BANK_GROUPS)
    BC = _SVF_BANK_CHUNK if B % _SVF_BANK_CHUNK == 0 else B

    tilt = lambda a: _bank_tilt(a, 0.0, V, Vp, B)
    s0 = jnp.zeros((2, Vp), jnp.float32)
    s0 = s0.at[0, :V].set(s1_0).at[1, :V].set(s2_0).reshape(2, G, 128)

    GT = _SVF_BANK_GROUPS
    big = pl.BlockSpec((BC, GT, 128), lambda i, j: (j, i, 0))
    small = pl.BlockSpec((2, GT, 128), lambda i, j: (0, i, 0))
    s1, s2, sl = pl.pallas_call(
        functools.partial(_linrec2_bank_kernel, BC=BC),
        grid=(G // GT, B // BC),
        out_shape=(
            jax.ShapeDtypeStruct((B, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, G, 128), jnp.float32),
        ),
        in_specs=[big] * 6 + [small],
        out_specs=(big, big, small),
        scratch_shapes=[pltpu.VMEM((2, GT, 128), jnp.float32)],
        interpret=interpret,
    )(tilt(a11), tilt(a12), tilt(a21), tilt(a22), tilt(b1), tilt(b2), s0)
    flat = lambda v: v.reshape(B, Vp).T[:V]
    sl = sl.reshape(2, Vp)
    return flat(s1), flat(s2), sl[0, :V], sl[1, :V]


# ---------------------------------------------------------------------------
# Generic voice-bank first-order max-affine recurrence:
#     y[n] = max(a[n], b[n] * y[n-1] + c[n])
# ---------------------------------------------------------------------------
#
# With a = -inf this is the plain first-order recurrence under every
# one-pole LP, DC blocker and ring follower (ops/scan.py linrec1); with a
# live it is the "instant up, smoothed down" tracker (ops/scan.py maxlin,
# hihat2.rs:290-320).  Routed for SMALL banks only (V <= 512): there the
# associative scan's ~6 log-depth kernels dominate the graph floor, while
# at headline V the scan's operand fusion wins (the earlier chunked
# linrec1 kernel measured a ~2x headline regression — ops/scan.py
# USE_PALLAS note).

def _affine1_bank_kernel(a_ref, b_ref, c_ref, y0_ref, y_ref, yl_ref,
                         carry_ref, *, BC):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry_ref[...] = y0_ref[...]

    y = carry_ref[...]

    def step(n, y):
        yn = jnp.maximum(a_ref[n], b_ref[n] * y[0] + c_ref[n])
        y_ref[n] = yn
        return (yn,)

    (y,) = jax.lax.fori_loop(0, BC, step, (y[0],), unroll=1)
    carry_ref[...] = y[None]
    yl_ref[...] = y[None]  # sequential chunk grid: the last write wins


@functools.partial(jax.jit, static_argnames=("interpret",))
def affine1_bank(a, b, c, y0, *, interpret=None):
    """Voice-bank ``y[n] = max(a[n], b[n]*y[n-1] + c[n])`` over [V, B].

    Returns ``(y [V, B], y_last [V])``.  Pass ``a = -inf`` (or any value
    always below the affine branch) for a plain first-order recurrence.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V, B = b.shape
    Vp, G = _bank_pad(V, _SVF_BANK_GROUPS)
    BC = _SVF_BANK_CHUNK if B % _SVF_BANK_CHUNK == 0 else B

    aT = _bank_tilt(a, -3.0e38, V, Vp, B)
    bT = _bank_tilt(b, 0.0, V, Vp, B)
    cT = _bank_tilt(c, 0.0, V, Vp, B)
    y0p = jnp.zeros((1, Vp), jnp.float32).at[0, :V].set(y0).reshape(1, G, 128)

    GT = _SVF_BANK_GROUPS
    big = pl.BlockSpec((BC, GT, 128), lambda i, j: (j, i, 0))
    small = pl.BlockSpec((1, GT, 128), lambda i, j: (0, i, 0))
    y, yl = pl.pallas_call(
        functools.partial(_affine1_bank_kernel, BC=BC),
        grid=(G // GT, B // BC),
        out_shape=(
            jax.ShapeDtypeStruct((B, G, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, G, 128), jnp.float32),
        ),
        in_specs=[big, big, big, small],
        out_specs=(big, small),
        scratch_shapes=[pltpu.VMEM((1, GT, 128), jnp.float32)],
        interpret=interpret,
    )(aT, bT, cT, y0p)
    return y.reshape(B, Vp).T[:V], yl.reshape(Vp)[:V]
