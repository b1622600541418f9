"""Limiters: the always-available master safety.

Behavioral reference: src/effects/limiter.rs — `BrickWallLimiter` (hard clamp)
and `SoftLimiter` (``tanh(x/t)*t``), both stateless and per-channel
independent.  The SoftLimiter is the native engine's default global effect
(src/engine/mod.rs:111-112) and is pinned last in the FFI chain
(src/ffi.rs:1371-1376).
"""

from __future__ import annotations

import jax.numpy as jnp


def brick_wall(x, threshold: float = 1.0):
    """Hard clamp to ±threshold (limiter.rs:15-33)."""
    return jnp.clip(x, -threshold, threshold)


def soft_limit(x, threshold: float = 1.0):
    """``tanh(x/t) * t`` soft saturation limit (limiter.rs:66-77).

    Threshold is clamped to [0.001, 1.0] like the reference setter.
    """
    t = jnp.clip(jnp.asarray(threshold, jnp.float32), 0.001, 1.0)
    return jnp.tanh(x * (1.0 / t)) * t
