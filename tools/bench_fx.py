#!/usr/bin/env python
"""Per-effect net cost on the real chip (floor-probe methodology).

For each reorderable effect (plus the plate), scan N_BLOCKS single-effect
chain blocks in one jitted dispatch, interleave timing rounds across all
candidates (so shared-chip load bursts hit every candidate equally), keep
the per-candidate minimum, and subtract an empty-chain floor probe (same
scan skeleton, zero effects) that cancels dispatch + tunnel cost.

Prints one JSON line per effect: {"effect", "us_per_block", "floor_us"}.
With --parts, also decomposes the plate into kernel-only vs full
process_block to attribute prep (gathers) vs kernel time.

Usage: python tools/bench_fx.py [--parts] [--rounds R] [--blocks N]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from libgooey_tpu.mixer import chain as chain_mod

SR = 44100.0
B = 512

NAMES = {
    chain_mod.EFFECT_LOWPASS_FILTER: "lowpass",
    chain_mod.EFFECT_DELAY: "delay",
    chain_mod.EFFECT_SATURATION: "saturation",
    chain_mod.EFFECT_COMPRESSOR: "compressor",
    chain_mod.EFFECT_TILT_FILTER: "tilt",
    chain_mod.EFFECT_LIMITER: "limiter",
    chain_mod.EFFECT_REVERB: "spring",
    chain_mod.EFFECT_WAVESHAPER: "waveshaper",
    chain_mod.EFFECT_FEEDBACK_WAVESHAPER: "fb_waveshaper",
    chain_mod.EFFECT_PLATE_REVERB: "plate",
}


def make_runner(effect_ids, n_blocks):
    chain = chain_mod.EffectChain(SR, 120.0)
    for eid in effect_ids:
        chain.add(eid)
    x = jnp.asarray(
        np.random.RandomState(0).randn(n_blocks, 2, B).astype(np.float32) * 0.3
    )
    targets = tuple(chain.targets_list())
    key = chain.static_key()

    @jax.jit
    def run(states, xs):
        def step(st, xb):
            st2, y = chain_mod.process_chain(st, xb, targets, key,
                                             sample_rate=SR)
            return tuple(st2), y

        return jax.lax.scan(step, states, xs)

    states = tuple(chain.states)
    return lambda: jax.block_until_ready(run(states, x))


def make_plate_kernel_runner(n_blocks):
    """plate_block kernel alone (no XLA prep), same scan skeleton."""
    from libgooey_tpu.effects import reverb_plate as plate
    from libgooey_tpu.ops import pallas_fx

    st = plate.init_state(SR)
    C = plate.chunk_size(SR, B)
    if plate.KERNEL_CHUNK is not None:
        C = min(C, max(1, plate.KERNEL_CHUNK))
    DMOD = st.mod_hist.shape[-1]
    rng = np.random.RandomState(1)
    r = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
    args = dict(
        delayed_in=r(B), fb_a_t=r(B), fb_b_t=r(B),
        damping_t=jnp.full((B,), 0.5, jnp.float32),
        d1a_read=r(B), d1b_read=r(B),
        mod_off=jnp.full((2, B), 300.0, jnp.float32),
        wbase=jnp.full((2, B // C), DMOD - 400, jnp.int32),
        in_hist=r(4, st.in_hist.shape[-1]), mod_hist=r(2, DMOD),
        seeds=jnp.zeros(3, jnp.float32),
    )

    @jax.jit
    def run(a):
        def step(carry, _):
            out = pallas_fx.plate_block(
                a["delayed_in"] + carry, a["fb_a_t"], a["fb_b_t"],
                a["damping_t"], a["d1a_read"], a["d1b_read"],
                a["mod_off"], a["wbase"], a["in_hist"], a["mod_hist"],
                a["seeds"], chunk=C, sample_rate=SR,
            )
            return out[0][-1], out[0]

        return jax.lax.scan(step, jnp.float32(0.0), None, length=n_blocks)

    return lambda: jax.block_until_ready(run(args))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--parts", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated effect names to measure")
    ap.add_argument("--plate-chunk", type=int, default=None,
                    help="override reverb_plate.KERNEL_CHUNK for tuning")
    args = ap.parse_args()
    n = args.blocks
    if args.plate_chunk is not None:
        from libgooey_tpu.effects import reverb_plate
        reverb_plate.KERNEL_CHUNK = args.plate_chunk

    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)
    cands = {"floor": make_runner((), n)}
    only = set(args.only.split(",")) if args.only else None
    for eid, name in NAMES.items():
        if only is None or name in only:
            cands[name] = make_runner((eid,), n)
    if only is None or "all9" in only:
        # the full bus rack: every reorderable effect + the pinned limiter
        cands["all9"] = make_runner(tuple(NAMES), n)
    if args.parts:
        cands["plate_kernel"] = make_plate_kernel_runner(n)

    for fn in cands.values():  # compile + warm
        fn()
        fn()

    best = {k: float("inf") for k in cands}
    for _ in range(args.rounds):
        for k, fn in cands.items():  # interleaved
            t0 = time.perf_counter()
            fn()
            best[k] = min(best[k], time.perf_counter() - t0)

    floor_us = best["floor"] / n * 1e6
    for k in cands:
        if k == "floor":
            continue
        net = best[k] / n * 1e6 - floor_us
        print(json.dumps({
            "effect": k,
            "us_per_block": round(net, 1),
            "floor_us": round(floor_us, 1),
        }))


if __name__ == "__main__":
    main()
