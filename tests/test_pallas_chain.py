"""Merged-chain pallas call (ops/pallas_chain.py) vs the per-effect path.

The merged kernel reuses every effect's standalone kernel body and glue;
these tests pin the merged run against per-effect `process_entry` over
several state-carrying blocks (interpret mode on CPU).  Tolerance 2e-5:
the only intended deviation is the lowpass's output tanh (in-kernel
vector tanh vs XLA libm, documented ~1e-5)."""

import numpy as np
import pytest

from libgooey_tpu.mixer import chain as chain_mod
from libgooey_tpu.ops import pallas_chain as pc

SR = 44100.0
B = 512

ALL_MERGEABLE = [0, 1, 2, 3, 4, 6, 7, 8]


def _chain(ids, sr=SR):
    ch = chain_mod.EffectChain(sr, 120.0)
    for eid in ids:
        assert ch.add(eid)
    return ch


def _set_nontrivial(ch):
    for k, e in enumerate(ch.entries):
        eid = e.effect_id
        if eid == chain_mod.EFFECT_WAVESHAPER:
            ch.set_param(k, 0, 2.5)   # drive
            ch.set_param(k, 1, 0.7)   # mix
        if eid == chain_mod.EFFECT_FEEDBACK_WAVESHAPER:
            ch.set_param(k, 0, 3.0)   # drive (feedback stays 0: fast path)
            ch.set_param(k, 3, 0.6)   # mix
        if eid == chain_mod.EFFECT_LOWPASS_FILTER:
            ch.set_param(k, 0, 3000.0)
            ch.set_param(k, 1, 0.4)
        if eid == chain_mod.EFFECT_TILT_FILTER:
            ch.set_param(k, 0, 0.8)
            ch.set_param(k, 1, 0.3)
        if eid == chain_mod.EFFECT_COMPRESSOR:
            ch.set_param(k, 0, -20.0)


def _run(ids, n_blocks=4, fused=True, seed=0, pingpong=False):
    ch = _chain(ids)
    _set_nontrivial(ch)
    if pingpong:
        for k, e in enumerate(ch.entries):
            if e.effect_id == chain_mod.EFFECT_DELAY:
                ch.set_param(k, 4, 1.0)
    rng = np.random.RandomState(seed)
    states = list(ch.states)
    outs = []
    key = ch.static_key()
    targets = ch.targets_list()
    for _ in range(n_blocks):
        x = (rng.randn(2, B) * 0.4).astype(np.float32)
        if fused:
            states, y = pc.process_run(
                key, states, x, targets, sample_rate=SR, interpret=True)
        else:
            new_states = []
            xb = x
            for (eid, flag), st, tg in zip(key, states, targets):
                st, xb = chain_mod.process_entry(
                    eid, st, xb, tg, sample_rate=SR, pingpong=flag)
                new_states.append(st)
            states, y = new_states, xb
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1), states


@pytest.mark.parametrize("ids", [
    [2, 4],                      # saturation -> tilt (pure VMEM phases)
    [0, 1, 2],                   # lowpass (SMEM loop) -> delay -> sat
    [3, 4],                      # compressor (env barrier in-kernel) -> tilt
    [6, 7],                      # spring (scratch) -> waveshaper
    [7, 8],                      # waveshaper -> fbws fast (env in-kernel)
])
def test_merged_matches_per_effect(ids):
    ref, _ = _run(ids, fused=False)
    got, _ = _run(ids, fused=True)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


@pytest.mark.slow
def test_merged_full_product_chain():
    """All eight mergeable effects in the product order, 6 blocks."""
    ids = ALL_MERGEABLE
    ref, sr_states = _run(ids, n_blocks=6, fused=False, seed=3)
    got, fu_states = _run(ids, n_blocks=6, fused=True, seed=3)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=0)
    # carried states agree too (ring positions, smoothers, histories)
    import jax

    for a, b in zip(fu_states, sr_states):
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(
                np.asarray(la, np.float32), np.asarray(lb, np.float32),
                atol=3e-5, rtol=0)


def test_merged_pingpong_delay():
    ref, _ = _run([1, 2], fused=False, pingpong=True)
    got, _ = _run([1, 2], fused=True, pingpong=True)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_process_chain_splits_at_plate():
    """process_chain on TPU would split [sat, plate, tilt] into
    [sat] plate [tilt]; on CPU it takes the per-effect path — here we
    just pin that mergeable() excludes the plate and the general-feedback
    waveshaper."""
    assert pc.mergeable(2, False)
    assert not pc.mergeable(9, False)
    assert pc.mergeable(8, True)
    assert not pc.mergeable(8, False)
    assert not pc.mergeable(5, False)
