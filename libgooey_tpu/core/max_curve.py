"""Max/MSP `curve~` exponential interpolation, vectorized.

Behavioral reference: src/max_curve.rs:21-48 (the ej.function-derived formula)
and the multi-segment `MaxCurveEnvelope` (src/max_curve.rs:76-180), used by the
Max-ported instruments (HiHat2, Tom2).

The segment walker in the reference is a stateful loop; here a multi-segment
envelope is a pure function of elapsed-time because segment boundaries are
known from the (static) segment durations: segment k spans
``[sum(dur[:k]), sum(dur[:k+1]))``.  Per-voice duration overrides (attack /
decay knobs) arrive as arrays, so boundaries are computed per voice.
"""

from __future__ import annotations

import jax.numpy as jnp


def max_curve(progress, curve):
    """Exact Max/MSP curve~ interpolation of ``progress`` in [0,1].

    curve in [-1, 1]: 0 → linear, positive → slow start / fast end,
    negative → mirrored.  src/max_curve.rs:21-48.
    """
    p = jnp.clip(progress, 0.0, 1.0)
    c = jnp.asarray(curve, jnp.float32)

    def one_sided(p, cabs):
        hp = jnp.power((cabs + 1e-20) * 1.2, 0.41) * 0.91
        fp = hp / (1.0 - hp)
        gp = jnp.expm1(fp * p) / jnp.expm1(fp)
        # fall back to linear for vanishing fp (reference guards fp < 1e-6)
        return jnp.where(jnp.abs(fp) < 1e-6, p, gp)

    cabs = jnp.abs(c)
    pos = one_sided(p, cabs)
    neg = 1.0 - one_sided(1.0 - p, cabs)
    out = jnp.where(c < 0.0, neg, pos)
    return jnp.where(cabs < 1e-6, p, out)


def segments_value(elapsed, start_value, targets, durations, curves):
    """Evaluate a multi-segment curve~ envelope at ``elapsed`` seconds.

    Args:
      elapsed:     seconds since trigger, any shape E (e.g. ``[V, B]``).
      start_value: initial value before segment 0 (broadcast against E).
      targets:     tuple of K per-segment target values (each broadcastable).
      durations:   tuple of K per-segment durations in seconds.
      curves:      tuple of K static curve parameters (floats).

    Returns the envelope value; past the last segment it holds the final
    target (reference keeps `current_value` after completion,
    src/max_curve.rs:141-147).  Negative elapsed returns ``start_value``.
    """
    value = jnp.zeros_like(elapsed) + start_value
    seg_start_t = jnp.zeros_like(elapsed)
    seg_start_v = value
    for target, dur, curve in zip(targets, durations, curves):
        dur = jnp.maximum(jnp.asarray(dur, jnp.float32), 0.0)
        target = jnp.zeros_like(elapsed) + target
        local = elapsed - seg_start_t
        prog = jnp.where(dur > 0.0, local / jnp.maximum(dur, 1e-30), 1.0)
        curved = max_curve(prog, curve)
        seg_val = seg_start_v + (target - seg_start_v) * curved
        # inside this segment → curved value; past it → its target;
        # before it (elapsed sits in an earlier segment) → keep prior value.
        value = jnp.where(
            local < dur, jnp.where(local >= 0.0, seg_val, value), target
        )
        seg_start_t = seg_start_t + dur
        seg_start_v = target  # next segment starts from this segment's target
    return jnp.where(elapsed < 0.0, jnp.zeros_like(elapsed) + start_value, value)
