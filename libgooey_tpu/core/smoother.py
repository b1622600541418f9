"""Parameter smoothing over blocks: the reference's `SmoothedParam`, batched.

The reference smooths every externally controllable parameter with a one-pole
toward a clamped target, settling (snapping exactly to the target) once the
distance falls below 1e-4 (src/utils/smoother.rs:14-169).  Control-thread
writes change targets; the audio thread ticks per sample.

Here a *bank* of smoothed parameters is a pair of arrays ``(current, target)``
of identical shape (typically ``[V, P]`` — voices × params, or just ``[P]``
for bus effects).  Targets are staged host-side between blocks (the analog of
the reference's atomics); the per-block trajectory is the closed form

    y[k] = target + (current - target) * (1 - coeff)^(k+1),   k = 0..B-1

snapped to the target exactly once within 1e-4, matching the reference's
settle behavior.  LFO-modulated parameters (time-varying targets) instead use
the associative-scan path (:func:`smooth_block_traj`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from libgooey_tpu.core.constants import DEFAULT_SMOOTH_TIME_MS, SMOOTHER_SETTLE_EPS
from libgooey_tpu.ops import scan as gscan


def smoothing_coeff(sample_rate: float, smooth_time_ms: float = DEFAULT_SMOOTH_TIME_MS) -> float:
    """One-pole coefficient ``1 - e^(-1/(ms*sr/1000))`` (smoother.rs:69-77)."""
    if smooth_time_ms <= 0.0:
        return 1.0
    smooth_time_samples = (smooth_time_ms / 1000.0) * sample_rate
    return float(1.0 - np.exp(-1.0 / smooth_time_samples))


class SmootherBank(NamedTuple):
    """Device-side smoother state: current values and staged targets."""

    current: jnp.ndarray
    target: jnp.ndarray

    @staticmethod
    def init(values) -> "SmootherBank":
        v = jnp.asarray(values, jnp.float32)
        return SmootherBank(current=v, target=v)

    def with_targets(self, targets) -> "SmootherBank":
        """Stage new targets (host→device param update, between blocks)."""
        return SmootherBank(current=self.current, target=jnp.asarray(targets, jnp.float32))

    def snapped(self) -> "SmootherBank":
        """`SmoothedParam::snap` — jump current to target (smoother.rs:99-104)."""
        return SmootherBank(current=self.target, target=self.target)


def smooth_block(bank: SmootherBank, coeff, block: int):
    """Advance a smoother bank by ``block`` samples.

    Returns ``(new_bank, traj)`` where ``traj`` has a trailing sample axis:
    shape ``bank.current.shape + (block,)``.  The trajectory matches the
    reference's tick-then-return ordering (the first returned value is one
    step toward the target) and its exact settle-snap at 1e-4.
    """
    cur, tgt = bank.current, bank.target
    delta = cur - tgt
    q = 1.0 - jnp.asarray(coeff, jnp.float32)
    powers = jnp.power(q, jnp.arange(1, block + 1, dtype=jnp.float32))
    decayed = delta[..., None] * powers
    # settle exactly like the reference: once |y - target| < 1e-4, y == target
    traj = tgt[..., None] + jnp.where(
        jnp.abs(decayed) < SMOOTHER_SETTLE_EPS, 0.0, decayed
    )
    new_cur = traj[..., -1]
    return SmootherBank(current=new_cur, target=tgt), traj


def smooth_block_lazy(bank: SmootherBank, coeff, block: int):
    """:func:`smooth_block` without materializing the ``[..., block]``
    trajectory.

    Returns ``(new_bank, traj_slice)`` where ``traj_slice(lo, hi)``
    rebuilds ``traj[lo:hi]`` from the per-lane scalars and the shared
    ``powers`` vector — the same expressions in the same order as
    :func:`smooth_block`, so values are identical.  Callers that consume
    disjoint lane slices (the engine's per-family mix) let XLA fuse the
    rebuild into each consumer's epilogue instead of writing and
    re-reading a full-bank trajectory from HBM (4 x [4096, 512] f32 =
    ~34 MB/block at headline voice counts, ~60 us at the roofline)."""
    cur, tgt = bank.current, bank.target
    delta = cur - tgt
    q = 1.0 - jnp.asarray(coeff, jnp.float32)
    powers = jnp.power(q, jnp.arange(1, block + 1, dtype=jnp.float32))

    def traj_slice(lo=None, hi=None):
        sl = slice(lo, hi)
        decayed = delta[sl][..., None] * powers
        return tgt[sl][..., None] + jnp.where(
            jnp.abs(decayed) < SMOOTHER_SETTLE_EPS, 0.0, decayed
        )

    last = delta * powers[-1]
    new_cur = tgt + jnp.where(jnp.abs(last) < SMOOTHER_SETTLE_EPS, 0.0, last)
    return SmootherBank(current=new_cur, target=tgt), traj_slice


def smooth_advance(bank: SmootherBank, coeff, block: int) -> SmootherBank:
    """Advance a smoother bank by ``block`` samples WITHOUT materializing the
    trajectory (for fused kernels that compute it internally).  Bit-identical
    to ``smooth_block(...)[0]``: the closed form at k = block-1 with the same
    settle snap."""
    cur, tgt = bank.current, bank.target
    q = 1.0 - jnp.asarray(coeff, jnp.float32)
    decayed = (cur - tgt) * jnp.power(q, jnp.float32(block))
    new_cur = tgt + jnp.where(jnp.abs(decayed) < SMOOTHER_SETTLE_EPS, 0.0, decayed)
    return SmootherBank(current=new_cur, target=tgt)


def smooth_block_traj(current, targets, coeff, axis: int = -1):
    """Smooth toward a per-sample target trajectory (LFO-modulated params).

    ``targets`` carries the sample axis at ``axis``.  Returns the smoothed
    trajectory (same shape); the caller keeps ``traj[..., -1]`` as new state.
    No settle-snap here — with a moving target the reference never settles
    either.
    """
    return gscan.onepole(coeff, targets, current, axis=axis)
