#!/usr/bin/env python
"""Per-family cost at the HEADLINE scale (bench.py's 4,096-voice kit).

Times each family bank ALONE at its headline voice count (kick/snare/
hihat2 1,024; tom2/bass 512) as one scanned render_many program, plus the
7-effect bus alone, interleaved round-robin across candidates so shared-
chip load bursts hit everyone equally (per-candidate min wins).  The sum
of parts vs the composed headline shows what composition costs; the
per-family µs/block ranks the optimization targets (VERDICT r4 #4).

Usage: python tools/bench_kit_families_4096.py [--rounds R] [--blocks N]
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

SR = 44100.0
B = 512
COEFF = smoothing_coeff(SR)
PER_FAMILY = {"kick": 1024, "snare": 1024, "hihat2": 1024,
              "tom2": 512, "bass": 512}
#: bench.py's build_full_kit family_static
FAMILY_STATIC = {
    "kick": dict(feedback_path=False, max_harmonics=0),
    "snare": dict(max_harmonics=64),
}


def family_runner(kind, n_blocks):
    vk = PER_FAMILY[kind]
    state = {
        kind: eng.FAMILIES[kind].init_state(vk),
        "pan": SmootherBank.init(np.full(vk, 0.5, np.float32)),
        "gain": SmootherBank.init(np.full(vk, 1.0 / vk, np.float32)),
        "master": SmootherBank.init(np.float32(0.25)),
    }
    offs = np.full((n_blocks, vk), B, np.int32)
    offs[0] = 0
    vels = np.zeros((n_blocks, vk), np.float32)
    vels[0] = 0.9
    events = {
        kind + "_off": jnp.asarray(offs),
        kind + "_vel": jnp.asarray(vels),
        "block_start": jnp.asarray((np.arange(n_blocks) * B).astype(np.int32)),
    }
    static = dict(
        kinds=(kind,), sample_rate=SR, block_size=B, smooth_coeff=COEFF,
        limiter_threshold=1.0,
        family_static=((kind, tuple(sorted(
            FAMILY_STATIC.get(kind, {}).items()))),),
    )
    run = jax.jit(lambda s: eng.render_many(s, events, **static))
    return lambda: jax.block_until_ready(run(state))


def bus_runner(n_blocks):
    fx_order = ("saturation", "lowpass", "tilt", "delay", "compressor",
                "spring", "plate")
    vk = 8
    state = {
        "kick": eng.FAMILIES["kick"].init_state(vk),
        "pan": SmootherBank.init(np.full(vk, 0.5, np.float32)),
        "gain": SmootherBank.init(np.full(vk, 1.0 / vk, np.float32)),
        "master": SmootherBank.init(np.float32(0.25)),
    }
    for name in fx_order:
        state["fx_" + name] = eng.FX_MODULES[name].init_state(SR)
    offs = np.full((n_blocks, vk), B, np.int32)
    offs[0] = 0
    events = {
        "kick_off": jnp.asarray(offs),
        "kick_vel": jnp.asarray(np.full((n_blocks, vk), 0.9, np.float32)),
        "block_start": jnp.asarray((np.arange(n_blocks) * B).astype(np.int32)),
    }
    for name in fx_order:
        events["fx_" + name] = jnp.broadcast_to(
            jnp.asarray(eng.FX_DEFAULT_TARGETS[name], jnp.float32),
            (n_blocks, len(eng.FX_DEFAULT_TARGETS[name])))
    static = dict(
        kinds=("kick",), sample_rate=SR, block_size=B, smooth_coeff=COEFF,
        limiter_threshold=1.0,
        family_static=(("kick", (("feedback_path", False),
                                 ("max_harmonics", 0))),),
        fx_order=fx_order,
    )
    run = jax.jit(lambda s: eng.render_many(s, events, **static))
    return lambda: jax.block_until_ready(run(state))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    n = args.blocks

    names = list(PER_FAMILY) + ["bus7_only"]
    if args.only:
        names = [x for x in names if x in args.only.split(",")]
    runners = {}
    for name in names:
        runners[name] = (bus_runner(n) if name == "bus7_only"
                         else family_runner(name, n))
        runners[name]()  # compile
    best = {k: float("inf") for k in names}
    for _r in range(args.rounds):
        for name in names:
            t0 = time.perf_counter()
            runners[name]()
            best[name] = min(best[name], (time.perf_counter() - t0) / n)
        time.sleep(1.0)

    out = {}
    for name in names:
        us = best[name] * 1e6
        vk = PER_FAMILY.get(name, 0)
        rtf = (vk * B / SR) / best[name] if vk else 0.0
        out[name] = {"us_per_block": round(us, 1),
                     "aggregate_rtf": round(rtf, 1)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
