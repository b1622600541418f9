"""Waveshaper: tanh soft-clip with drive compensation (Max overdrive~ style).

Behavioral reference: src/effects/waveshaper.rs — per sample:

    compensation = tanh(0.5) / tanh(0.5 * drive)
    out = x*(1-mix) + tanh(x*drive)*compensation * mix

Bypass (identity) when drive <= 1 or mix <= 1e-4.  Memoryless, so it
vectorizes trivially; the caller may supply an ``oversample`` callable to
evaluate the nonlinearity at 2x/4x (the reference defaults to 4x).
"""

from __future__ import annotations

import jax.numpy as jnp


def process(x, drive, mix=1.0, oversample=None):
    """Apply the waveshaper over arbitrary-shape blocks (broadcasting)."""
    drive = jnp.asarray(drive, jnp.float32)
    mix = jnp.asarray(mix, jnp.float32)
    compensation = jnp.tanh(0.5) / jnp.tanh(0.5 * jnp.maximum(drive, 1.0 + 1e-6))

    def fn(v):
        return jnp.tanh(v * drive) * compensation

    saturated = fn(x) if oversample is None else oversample(fn, x)
    wet = x * (1.0 - mix) + saturated * mix
    bypass = (mix <= 1e-4) | (drive <= 1.0)
    out = jnp.where(bypass, x, wet)
    return jnp.where(jnp.isfinite(x), out, 0.0)
