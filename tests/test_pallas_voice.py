"""Twin tests for the fused voice-bank instrument kernels.

The fused kernels (ops/pallas_voice.py) must agree with the stage-by-stage
XLA render_block — the path every per-sample oracle test pins — to scan-
reassociation rounding.  Every in-kernel formula is written op-for-op like
the XLA twin, so in interpret mode the only differences are the lane scans
(Hillis-Steele vs linrec) and f32 reassociation in the oversampler; measured
worst cases are ~6e-6 on the output and ~1e-4 on the (drive-scaled, up to
~30x full-scale) internal shaper states.

On a real TPU the same twin pair matched to 1.4e-6 out / 4.3e-6 state at
V=16, B=512 (recorded 2026-08-19; the suite runs CPU-only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libgooey_tpu.core.smoother import SmootherBank, smoothing_coeff
from libgooey_tpu.instruments import kick
from libgooey_tpu.ops import pallas_voice as pv

SR = 44100.0
B = 128
COEFF = smoothing_coeff(SR)


def _max_state_err(sa, sb):
    worst = 0.0
    for la, lb in zip(jax.tree_util.tree_leaves(sa), jax.tree_util.tree_leaves(sb)):
        if la.size:
            worst = max(worst, float(jnp.max(jnp.abs(
                jnp.asarray(la, jnp.float32) - jnp.asarray(lb, jnp.float32)))))
    return worst


def _mk_kick(V, rng):
    targets = np.clip(rng.uniform(0, 1, (V, kick.NUM_PARAMS)), 0, 1).astype(np.float32)
    cur = np.clip(targets + rng.normal(0, 0.2, targets.shape), 0, 1).astype(np.float32)
    st = kick.init_state(V, targets=targets)
    return st._replace(params=SmootherBank(current=jnp.asarray(cur),
                                           target=jnp.asarray(targets)))


def test_kick_fused_matches_xla_twin():
    V = 5
    rng = np.random.default_rng(7)
    state_x = _mk_kick(V, rng)
    state_f = state_x
    offs = [np.array([0, 40, B, 3, 100], np.int32),
            np.array([B, B, 17, B, B], np.int32),
            np.array([5, B, B, B, 0], np.int32)]
    vels = np.array([1.0, 0.8, 0.5, 0.3, 0.9], np.float32)
    prev = pv.IMPL
    try:
        for blk, off in enumerate(offs):
            pv.IMPL = "xla"
            state_x, out_x = kick.render_block(
                state_x, off, vels, np.int32(blk * B), sample_rate=SR,
                block_size=B, smooth_coeff=COEFF, max_harmonics=32,
                feedback_path=False)
            state_f, out_f = pv.kick_render_fused(
                state_f, off, vels, np.int32(blk * B), sample_rate=SR,
                block_size=B, smooth_coeff=COEFF, max_harmonics=32,
                interpret=True)
            assert float(jnp.max(jnp.abs(out_x - out_f))) < 3e-5, blk
            assert _max_state_err(state_x, state_f) < 4e-4, blk
    finally:
        pv.IMPL = prev


def test_kick_fused_dispatch_gate():
    """The fused path only engages on TPU (or forced); CPU tests stay XLA."""
    V = 3
    rng = np.random.default_rng(3)
    state = _mk_kick(V, rng)
    off = np.zeros(V, np.int32)
    vel = np.ones(V, np.float32)
    # multi-trigger [V, K] offsets and overrides must fall back to XLA
    off_k = np.full((V, 2), B, np.int32)
    st2, out2 = kick.render_block(
        state, off_k, np.zeros((V, 2), np.float32), np.int32(0),
        sample_rate=SR, block_size=B, smooth_coeff=COEFF, max_harmonics=16,
        feedback_path=False)
    assert out2.shape == (V, B)
    # forced pallas on CPU runs interpret mode and matches
    prev = pv.IMPL
    try:
        pv.IMPL = "pallas"
        if jax.default_backend() != "tpu":
            st_f, out_f = kick.render_block(
                state, off, vel, np.int32(0), sample_rate=SR, block_size=B,
                smooth_coeff=COEFF, max_harmonics=16, feedback_path=False)
        pv.IMPL = "xla"
        st_x, out_x = kick.render_block(
            state, off, vel, np.int32(0), sample_rate=SR, block_size=B,
            smooth_coeff=COEFF, max_harmonics=16, feedback_path=False)
        if jax.default_backend() != "tpu":
            assert float(jnp.max(jnp.abs(out_x - out_f))) < 3e-5
    finally:
        pv.IMPL = prev
