#!/usr/bin/env python
"""Per-stage profile of the on-chip product block (floor-probe methodology).

Decomposes bench_configs.bench_onchip_product_block's composed step into its
stages — each family bank alone (entry()'s 64-voice layout), the mix/master
epilogue, the all-10 bus chain — and times each as an N-block lax.scan net of
an empty-scan floor probe.  Rounds are interleaved across candidates so
shared-chip load bursts hit everyone equally; per-candidate minimum wins.

Usage: python tools/bench_kit_parts.py [--rounds R] [--blocks N] [--only a,b]
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

from libgooey_tpu.core.smoother import SmootherBank, smoothing_coeff
from libgooey_tpu.engine import engine as eng
from libgooey_tpu.mixer import chain as chain_mod

SR = 44100.0
B = 512
COEFF = smoothing_coeff(SR)
PER_FAMILY = {"kick": 16, "snare": 16, "hihat2": 16, "tom2": 8, "bass": 8}
FAMILY_STATIC = {
    "kick": dict(feedback_path=False, max_harmonics=64),
    "snare": dict(max_harmonics=64),
}


def make_family_runner(kind, n_blocks):
    mod = eng.FAMILIES[kind]
    V = PER_FAMILY[kind]
    state = mod.init_state(V)
    off = jnp.zeros(V, jnp.int32)
    vel = jnp.full(V, 0.8, jnp.float32)
    static = FAMILY_STATIC.get(kind, {})

    @jax.jit
    def run(st):
        def step(carry, i):
            st = carry
            st2, out = mod.render_block(
                st, off, vel, jnp.int32(i) * B,
                sample_rate=SR, block_size=B, smooth_coeff=COEFF, **static)
            return st2, out[:, -1]

        return jax.lax.scan(step, st, jnp.arange(n_blocks))

    return lambda: jax.block_until_ready(run(state))


def make_floor_runner(n_blocks):
    @jax.jit
    def run(x):
        def step(c, i):
            return c + 1e-9 * jnp.float32(i), c
        return jax.lax.scan(step, x, jnp.arange(n_blocks))
    return lambda: jax.block_until_ready(run(jnp.float32(0.0)))


def make_families_runner(n_blocks):
    """All five family banks back-to-back in ONE jitted scan, no mix/master:
    isolates family compute + inter-family sequencing from the engine
    epilogue (pan/gain smoothing, einsum mix, master, limiter)."""
    mods = {k: eng.FAMILIES[k] for k in PER_FAMILY}
    states = {k: mods[k].init_state(V) for k, V in PER_FAMILY.items()}
    offs = {k: jnp.zeros(V, jnp.int32) for k, V in PER_FAMILY.items()}
    vels = {k: jnp.full(V, 0.8, jnp.float32) for k, V in PER_FAMILY.items()}

    @jax.jit
    def run(sts):
        def step(carry, i):
            sts = dict(carry)
            acc = jnp.float32(0.0)
            for kind, mod in mods.items():
                sts[kind], out = mod.render_block(
                    sts[kind], offs[kind], vels[kind], jnp.int32(i) * B,
                    sample_rate=SR, block_size=B, smooth_coeff=COEFF,
                    **FAMILY_STATIC.get(kind, {}))
                acc = acc + jnp.sum(out[:, -1])
            return sts, acc

        return jax.lax.scan(step, sts, jnp.arange(n_blocks))

    return lambda: jax.block_until_ready(run(states))


def make_full_runner(n_blocks, fx=True):
    """The exact composed product step (entry() kit [+ all-10 chain])."""
    import __graft_entry__ as ge

    fn, (kstate, kevents) = ge.entry()
    kev = {k: jnp.asarray(v) for k, v in kevents.items()}
    chain = chain_mod.EffectChain(SR, 120.0)
    for eid in range(chain_mod.REORDERABLE_EFFECT_COUNT):
        chain.add(eid)
    chain.add(chain_mod.EFFECT_PLATE_REVERB)
    targets = tuple(chain.targets_list())
    key = chain.static_key()

    @jax.jit
    def run(ks, cs):
        def step(carry, i):
            ks, cs = carry
            ev = dict(kev, block_start=jnp.int32(i) * B)
            ks2, out = fn(ks, ev)
            if fx:
                cs2, out = chain_mod.process_chain(cs, out, targets, key,
                                                   sample_rate=SR)
                cs = tuple(cs2)
            return (ks2, cs), out[:, -1]

        return jax.lax.scan(step, (ks, cs), jnp.arange(n_blocks))

    states = tuple(chain.states)
    return lambda: jax.block_until_ready(run(kstate, states))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    n = args.blocks

    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)
    cands = {"floor": make_floor_runner(n)}
    only = set(args.only.split(",")) if args.only else None
    for kind in PER_FAMILY:
        if only is None or kind in only:
            cands[kind] = make_family_runner(kind, n)
    if only is None or "families" in only:
        cands["families_seq"] = make_families_runner(n)
    if only is None or "kit" in only:
        cands["kit_nofx"] = make_full_runner(n, fx=False)
    if only is None or "full" in only:
        cands["full_product"] = make_full_runner(n, fx=True)

    for name, fn in cands.items():  # compile + warm
        t0 = time.perf_counter()
        fn()
        print(f"# compiled {name} in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        fn()

    best = {k: float("inf") for k in cands}
    for _ in range(args.rounds):
        for name, fn in cands.items():
            t0 = time.perf_counter()
            fn()
            best[name] = min(best[name], time.perf_counter() - t0)

    floor = best.pop("floor")
    for name, wall in best.items():
        print(json.dumps({
            "stage": name,
            "us_per_block": round((wall - floor) / n * 1e6, 1),
            "floor_us": round(floor / n * 1e6, 1),
        }))


if __name__ == "__main__":
    main()
