"""Blocked linear-recurrence solvers: the reference's per-sample loops, rotated.

Every recursive one-pole / two-pole structure in the reference (parameter
smoothers, one-pole LPs, DC blockers, Chamberlin/TPT SVFs, biquads, pink-noise
poles, envelope followers with fixed coefficients) is a *linear* recurrence

    y[n] = a[n] * y[n-1] + b[n]          (first order)
    s[n] = A[n] @ s[n-1] + b[n]          (second order, 2-vector state)

which is associative under composition, so a whole block of B samples is
solved in O(log B) parallel steps with `jax.lax.associative_scan` over the
trailing (sample) axis — fully parallel across the leading voice axes.

State is carried *between* blocks by the caller: pass the previous block's
final value as ``y0`` / ``s0`` and keep the returned last sample.

Nonlinear recurrences (tanh feedback, attack/release-switching envelope
followers) are NOT expressible this way; see :func:`nonlinear_scan` for the
sequential fallback used by those (once per bus, or Pallas-fused later).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


#: Opt-in: route large 2D-reshapeable linrec1 calls to the Pallas
#: chunked-scan kernel (ops.pallas_scan).  Standalone the kernel beats the
#: associative scan (one HBM round trip vs log-depth passes), but inside
#: the full render graph a pallas_call is a fusion barrier — the a/b
#: operands XLA would otherwise fuse into neighboring elementwise work
#: must materialize to HBM, which measured ~45M → 24M aggregate RTF on
#: the kick bench.  Off by default; kept for standalone/large-B callers.
USE_PALLAS = False


def _pallas_enabled() -> bool:
    return USE_PALLAS


#: linrec2 -> voice-bank kernel routing (pallas_fx.linrec2_bank).  Unlike
#: linrec1 (see USE_PALLAS above), this is ON by default for 2-D [V, B]
#: banks on TPU: every linrec2 caller on the TPU path is an instrument-bank
#: recurrence (biquads, Chamberlin, membrane bands) whose cost is the
#: O(log B) multi-kernel scan, not operand fusion — the 4,096-voice kick's
#: hot recurrences were already diverted to dedicated kernels upstream.
#:
#: On CPU (the hermetic test backend) "auto" runs a sample-sequential
#: ``lax.scan`` instead of the associative scan: the tree scan REASSOCIATES
#: the 2x2 matrix products, and for high-Q resonators (membrane bands,
#: pitch-tracking bandpasses, Chamberlin at low damping) that reassociation
#: noise is amplified by the resonant ring-up — measured 2.6e-4..2.7e-3 vs
#: the per-sample oracles on tom2's ring/void/brush presets, vs <3e-5
#: sequential.  Sequential also matches the op order of the TPU bank kernel
#: (one sample at a time), so CPU tests pin the same numerics class the
#: device runs.  "xla" forces the associative scan everywhere (scan-math
#: unit tests); "seq" forces the sequential path everywhere.
LINREC2_IMPL = "auto"


def _bank2_enabled(a, axis) -> bool:
    if LINREC2_IMPL != "auto":
        return False
    if axis not in (-1, a.ndim - 1) or a.ndim < 2 or a.shape[-1] < 8:
        return False
    return jax.default_backend() == "tpu"


def _seq2_enabled(a, axis) -> bool:
    if LINREC2_IMPL == "seq":
        return True
    if LINREC2_IMPL != "auto":
        return False
    if axis not in (-1, a.ndim - 1):
        return False
    # TPU fallback shapes (1-D, B<8) keep the associative scan: a 512-step
    # serialized loop on device would stall the pipeline for shapes the
    # bank kernel rejects; on CPU sequential is both closer to the oracles
    # and (for the small voice counts tests use) no slower.
    return jax.default_backend() != "tpu"


def _rows(shape) -> int:
    n = 1
    for d in shape[:-1]:
        n *= d
    return n


#: First-order recurrences route to the bank kernel for banks up to
#: 4,096 rows.  The chunked linrec1 kernel above (pallas_scan) measured a
#: ~2x headline regression from operand-fusion loss, but the flat
#: affine1_bank kernel is a different trade: one HBM round trip per call
#: (~4 us at [1024, 512]) vs the associative scan's ~9 slice/pad stages
#: (~8 us each at that shape, ~114 us/block total across the composed
#: kit's surviving scans — device trace, round 5).  Composed with
#: render_many's unroll=2 the rerouting measured 2290 -> 2110 us/block on
#: the 4,096-voice kit; alone (unroll=1) it is parity within window noise,
#: so the cap is sized to the headline bank.  "xla" disables the kernel.
LINREC1_BANK_IMPL = "auto"
_BANK1_MAX_V = 4096


def _bank1_enabled(a, axis) -> bool:
    if LINREC1_BANK_IMPL != "auto":
        return False
    if axis not in (-1, a.ndim - 1) or a.ndim < 2 or a.shape[-1] < 8:
        return False
    if _rows(a.shape) > _BANK1_MAX_V:
        return False
    return jax.default_backend() == "tpu"


def linrec1(a, b, y0, axis: int = -1):
    """Solve ``y[n] = a[n] * y[n-1] + b[n]`` along ``axis`` with ``y[-1]=y0``.

    ``a`` and ``b`` broadcast against each other; ``y0`` has the shape of a
    slice (the array without ``axis``).  Returns y with the shape of
    ``broadcast(a, b)``.
    """
    a, b = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(b))

    if axis in (-1, a.ndim - 1) and _pallas_enabled():
        from libgooey_tpu.ops import pallas_scan

        y0a = jnp.broadcast_to(jnp.asarray(y0), a.shape[:-1])
        rows = 1
        for d in a.shape[:-1]:
            rows *= d
        a2 = a.reshape(rows, a.shape[-1]) if a.ndim != 2 else a
        y2 = y0a.reshape(rows) if y0a.ndim != 1 else y0a
        if pallas_scan.supported(a2, y2):
            b2 = b.reshape(rows, b.shape[-1]) if b.ndim != 2 else b
            return pallas_scan.linrec1_pallas(a2, b2, y2).reshape(a.shape)

    if _bank1_enabled(a, axis):
        from libgooey_tpu.ops import pallas_fx

        lead, B = a.shape[:-1], a.shape[-1]
        R = _rows(a.shape)
        y0f = jnp.broadcast_to(jnp.asarray(y0, jnp.float32), lead).reshape(R)
        y, _ = pallas_fx.affine1_bank(
            jnp.full((R, B), -3.0e38, jnp.float32),
            a.reshape(R, B), b.reshape(R, B), y0f,
        )
        return y.reshape(a.shape)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_r * a_l, a_r * b_l + b_r

    a_c, b_c = jax.lax.associative_scan(combine, (a, b), axis=axis)
    return a_c * jnp.expand_dims(y0, axis) + b_c


def onepole(coeff, x, y0, axis: int = -1):
    """One-pole lowpass toward ``x``: ``y[n] = y[n-1] + coeff*(x[n]-y[n-1])``.

    This is the reference's universal smoothing/filtering primitive
    (src/utils/smoother.rs:120-137, one-pole LPs everywhere).
    ``coeff`` may be scalar or per-sample (time-varying cutoff).
    """
    coeff = jnp.asarray(coeff)
    return linrec1(1.0 - coeff, coeff * x, y0, axis=axis)


def onepole_const(coeff, x_const, y0, n: int, axis: int = -1):
    """Closed form of :func:`onepole` when the input is constant over a block.

    ``y[k] = x + (y0 - x) * (1-coeff)^(k+1)`` for k = 0..n-1.  O(1) memory
    traffic per sample instead of a scan — used for un-modulated parameter
    smoothing, which is the overwhelmingly common case.

    ``x_const`` and ``y0`` are slice-shaped; result gains a trailing ``n``
    axis (then moved to ``axis``).
    """
    q = 1.0 - jnp.asarray(coeff, jnp.float32)
    powers = jnp.power(q, jnp.arange(1, n + 1, dtype=jnp.float32))
    y = jnp.expand_dims(x_const, -1) + jnp.expand_dims(y0 - x_const, -1) * powers
    if axis != -1:
        y = jnp.moveaxis(y, -1, axis)
    return y


def linrec2(a11, a12, a21, a22, b1, b2, s0, axis: int = -1):
    """Solve a 2-state linear recurrence ``s[n] = A[n] s[n-1] + b[n]``.

    All coefficient arrays broadcast together and include the sample axis
    (possibly length-1 for time-invariant filters).  ``s0`` is a pair
    ``(s1_0, s2_0)`` of slice-shaped arrays.  Returns ``(s1, s2)`` full
    trajectories.

    This is how Chamberlin/TPT SVFs and biquads run on TPU: per-sample
    coefficient trajectories (from smoothed parameters) are computed
    vectorized, then the state recursion collapses via associative scan
    — 8 multiplies per combine, O(log B) depth.
    """
    arrs = jnp.broadcast_arrays(
        *(jnp.asarray(v) for v in (a11, a12, a21, a22, b1, b2))
    )
    a11, a12, a21, a22, b1, b2 = arrs

    if _bank2_enabled(a11, axis):
        # sample-sequential voice-bank kernel: one pass over the six
        # coefficient arrays instead of O(log B) scan passes (~10 kernels)
        # — the graph-floor fix for the biquad/Chamberlin-heavy families
        # (snare, hihat2, tom2, membrane) at product voice counts.
        # Leading dims (e.g. membrane's [V, 5] bands) flatten into rows.
        from libgooey_tpu.ops import pallas_fx

        lead, B = a11.shape[:-1], a11.shape[-1]
        R = _rows(a11.shape)
        flat = lambda v: v.reshape(R, B)
        s10 = jnp.broadcast_to(jnp.asarray(s0[0], jnp.float32), lead).reshape(R)
        s20 = jnp.broadcast_to(jnp.asarray(s0[1], jnp.float32), lead).reshape(R)
        s1, s2, _, _ = pallas_fx.linrec2_bank(
            flat(a11), flat(a12), flat(a21), flat(a22), flat(b1), flat(b2),
            s10, s20,
        )
        return s1.reshape(a11.shape), s2.reshape(a11.shape)

    if _seq2_enabled(a11, axis):
        lead = a11.shape[:-1]
        s10 = jnp.broadcast_to(jnp.asarray(s0[0], a11.dtype), lead)
        s20 = jnp.broadcast_to(jnp.asarray(s0[1], a11.dtype), lead)
        xs = tuple(jnp.moveaxis(v, -1, 0) for v in arrs)

        def step(carry, x):
            s1p, s2p = carry
            c11, c12, c21, c22, d1, d2 = x
            s1 = (c11 * s1p + c12 * s2p) + d1
            s2 = (c21 * s1p + c22 * s2p) + d2
            return (s1, s2), (s1, s2)

        _, (s1, s2) = jax.lax.scan(step, (s10, s20), xs)
        return jnp.moveaxis(s1, 0, -1), jnp.moveaxis(s2, 0, -1)

    def combine(l, r):
        la11, la12, la21, la22, lb1, lb2 = l
        ra11, ra12, ra21, ra22, rb1, rb2 = r
        # A = A_r @ A_l
        c11 = ra11 * la11 + ra12 * la21
        c12 = ra11 * la12 + ra12 * la22
        c21 = ra21 * la11 + ra22 * la21
        c22 = ra21 * la12 + ra22 * la22
        # b = A_r @ b_l + b_r
        c1 = ra11 * lb1 + ra12 * lb2 + rb1
        c2 = ra21 * lb1 + ra22 * lb2 + rb2
        return c11, c12, c21, c22, c1, c2

    c11, c12, c21, c22, c1, c2 = jax.lax.associative_scan(
        combine, (a11, a12, a21, a22, b1, b2), axis=axis
    )
    s1_0 = jnp.expand_dims(s0[0], axis)
    s2_0 = jnp.expand_dims(s0[1], axis)
    s1 = c11 * s1_0 + c12 * s2_0 + c1
    s2 = c21 * s1_0 + c22 * s2_0 + c2
    return s1, s2


def cumsum_bank(x, axis: int = -1):
    """``jnp.cumsum`` that routes small banks through the sequential bank
    kernel on TPU (cumsum is ``linrec1`` with a = 1; XLA's tree cumsum is
    another ~log B kernels of graph floor).  Sequential summation rounds
    no worse than the tree; the CPU path stays ``jnp.cumsum`` bit-exactly.
    """
    x = jnp.asarray(x)
    if _bank1_enabled(x, axis):
        from libgooey_tpu.ops import pallas_fx

        lead, B = x.shape[:-1], x.shape[-1]
        R = _rows(x.shape)
        y, _ = pallas_fx.affine1_bank(
            jnp.full((R, B), -3.0e38, jnp.float32),
            jnp.ones((R, B), jnp.float32),
            x.reshape(R, B).astype(jnp.float32),
            jnp.zeros((R,), jnp.float32),
        )
        return y.reshape(x.shape)
    return jnp.cumsum(x, axis=axis)


def cumsum_reset(x, reset, reset_base, y0, axis: int = -1):
    """Cumulative sum along ``axis`` that restarts at reset points.

    ``y[n] = x[n] + (reset[n] ? reset_base[n] : y[n-1])``, ``y[-1] = y0``.

    Used for oscillator-phase accumulation with phase reset at trigger
    offsets, and for elapsed-time counters.  Implemented as a first-order
    recurrence with a ∈ {0, 1} (exact in float).
    """
    reset_f = jnp.asarray(reset, x.dtype)
    a = 1.0 - reset_f
    b = x + reset_f * reset_base
    return linrec1(a, b, y0, axis=axis)


def phase_cumsum_reset(inc, reset, carry, axis: int = -1):
    """Mod-1 oscillator phase with trigger resets, accurate to ~1e-7 cycles.

    Same recurrence as ``cumsum_reset`` with a zero reset base —
    ``y[n] = inc[n] + (reset[n] ? 0 : y[n-1])`` — but returned already
    reduced mod 1 and computed so every intermediate stays O(1) cycle.  A
    raw tree cumsum grows to ``inc*B`` cycles per block and rounds at
    ``eps(inc*B)`` per combine level (7.6e-6 cycles per rounding for a
    10 kHz oscillator over a 512 block) — phase-modulation chains amplify
    that ~30x into the output.  Here the block-start increment is split
    ``inc0 = hi + lo`` with ``hi`` on a 2^-11 grid, so ``hi*(n+1)`` and its
    mod-1 reduction are EXACT in f32 for n < 8192; ``lo*(n+1)`` (< 1 cycle)
    and the residual cumsum of ``inc - inc0`` (tiny for smoothed frequency
    trajectories) carry one rounding each.

    ``carry`` is the previous block's last mod-1 phase.  Returns the [..,
    B] mod-1 phase trajectory; carry forward ``out[..., -1]``.
    """
    inc = jnp.asarray(inc, jnp.float32)
    reset_f = jnp.asarray(reset, jnp.float32)
    B = inc.shape[axis]
    assert axis in (-1, inc.ndim - 1), "sample axis must be last"
    n1 = jnp.arange(1, B + 1, dtype=jnp.float32)
    inc0 = jax.lax.slice_in_dim(inc, 0, 1, axis=-1)
    hi = jnp.floor(inc0 * 2048.0) * jnp.float32(1.0 / 2048.0)
    lo = inc0 - hi                        # exact (Sterbenz)
    ramp_hi = hi * n1                     # exact: <= 2^24 grid steps
    ramp_hi = ramp_hi - jnp.floor(ramp_hi)  # exact mod-1 (2^-11 grid)
    ramp = ramp_hi + lo * n1
    resid = cumsum_bank(inc - inc0, axis=-1)
    p = jnp.mod(ramp + resid, 1.0)        # mod-1 prefix sums, P~[n]
    # base latch: the mod-1 prefix just BEFORE the governing reset
    # (base[n] = reset[n] ? P~[n-1] : base[n-1]; init -carry so the no-reset
    # phase is carry + P~[n])
    p_prev = jnp.concatenate(
        [jnp.zeros_like(inc0), p[..., :-1]], axis=-1
    )
    carry = jnp.asarray(carry, jnp.float32)
    base = linrec1(1.0 - reset_f, reset_f * p_prev, -carry, axis=axis)
    return jnp.mod(p - base, 1.0)


def maxlin(a, b, c, y0, axis: int = -1):
    """Solve ``y[n] = max(a[n], b[n]*y[n-1] + c[n])`` by associative scan.

    Max-affine maps with one linear piece are closed under composition:
    ``f2∘f1 = (max(a2, b2*a1 + c2), b2*b1, b2*c1 + c2)`` — so "instant up,
    smoothed down" trackers (the HiHat2 envelope smoother,
    src/instruments/hihat2.rs:290-320: ``y = target if target >= y else
    y + k*(target - y)`` ≡ ``max(target, (1-k)y + k*target)`` for b ≥ 0)
    run in O(log B) like any linear recurrence.
    """
    a, b, c = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))

    if _bank1_enabled(a, axis):
        from libgooey_tpu.ops import pallas_fx

        lead, B = a.shape[:-1], a.shape[-1]
        R = _rows(a.shape)
        y0f = jnp.broadcast_to(jnp.asarray(y0, jnp.float32), lead).reshape(R)
        y, _ = pallas_fx.affine1_bank(
            a.reshape(R, B), b.reshape(R, B), c.reshape(R, B), y0f)
        return y.reshape(a.shape)

    def combine(l, r):
        a_l, b_l, c_l = l
        a_r, b_r, c_r = r
        return jnp.maximum(a_r, b_r * a_l + c_r), b_r * b_l, b_r * c_l + c_r

    a_c, b_c, c_c = jax.lax.associative_scan(combine, (a, b, c), axis=axis)
    return jnp.maximum(a_c, b_c * jnp.expand_dims(y0, axis) + c_c)


def asym_smooth(target, down_coeff, y0, reset=None, axis: int = -1):
    """Asymmetric smoother: instant up, one-pole down (hihat2.rs:290-320).

    ``reset`` forces the state to 0 at masked samples *before* processing
    (the trigger resets the smoother to 0, hihat2.rs:443)."""
    k = jnp.asarray(down_coeff, jnp.float32)
    a = target
    b = jnp.broadcast_to(1.0 - k, jnp.shape(target)).astype(jnp.float32)
    c = k * target
    if reset is not None:
        # at a reset sample: y = max(t, (1-k)*0 + k*t) = t... the reference
        # resets then processes, giving y = max(t, k*t) = t for t >= 0.
        b = jnp.where(reset, 0.0, b)
    return maxlin(a, b, c, y0, axis=axis)


def nonlinear_scan(step_fn, state, xs, axis: int = -1):
    """Sequential per-sample fallback for genuinely nonlinear recurrences.

    ``step_fn(state, x_slice) -> (state, y_slice)`` where slices are the
    arrays without the sample axis (i.e. ``[V]``-shaped).  ``xs`` is a pytree
    of arrays with the sample axis at ``axis``.  Runs as ``lax.scan`` over the
    block: B sequential steps, each fully parallel over voices.

    Reference counterparts: the feedback waveshaper's tanh loop
    (src/effects/feedback_waveshaper.rs:118-170), compressor envelope
    follower with attack/release switching (src/effects/compressor.rs:96-99).
    """
    xs_t = jax.tree_util.tree_map(lambda v: jnp.moveaxis(v, axis, 0), xs)
    state, ys_t = jax.lax.scan(step_fn, state, xs_t)
    ys = jax.tree_util.tree_map(lambda v: jnp.moveaxis(v, 0, axis), ys_t)
    return state, ys
