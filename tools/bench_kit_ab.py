#!/usr/bin/env python
"""Marginal-cost A/B of the composed 4,096-voice headline kit.

Times the composed build_full_kit program and variants (drop one family,
drop the bus, snare harmonics 64->0, ...) with bench.py's pipelined
methodology, interleaved round-robin; the DELTA vs the composed baseline
is each part's true marginal cost (stub-differential caveats in
.claude/skills/verify: fusion changes globally — treat deltas as a
ranking, confirm wins on the composed headline).

Usage: python tools/bench_kit_ab.py [--rounds R] [--pipe P]
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

from libgooey_tpu.engine import engine as eng

SR, B, N_BLOCKS = 44100.0, 512, 64


def composed_runner(pipe, drop_kind=None, fx=True, snare_h=64):
    from bench_configs import build_full_kit

    state, events, static, V = build_full_kit(N_BLOCKS)
    static = dict(static)
    if drop_kind is not None:
        state = {k: v for k, v in state.items() if k != drop_kind}
        kinds = tuple(k for k in static["kinds"] if k != drop_kind)
        static["kinds"] = kinds
        events = {k: v for k, v in events.items()
                  if not k.startswith(drop_kind + "_")}
        vk = {"kick": 1024, "snare": 1024, "hihat2": 1024,
              "tom2": 512, "bass": 512}[drop_kind]
        # mix banks keep full V rows; drop the family's rows
        ofs = 0
        order = ("kick", "snare", "hihat2", "tom2", "bass")
        sizes = {"kick": 1024, "snare": 1024, "hihat2": 1024,
                 "tom2": 512, "bass": 512}
        for k in order:
            if k == drop_kind:
                break
            ofs += sizes[k]
        keep = np.r_[0:ofs, ofs + vk:V]
        for key in ("pan", "gain"):
            bank = state[key]
            state[key] = type(bank)(current=bank.current[keep],
                                    target=bank.target[keep])
    if not fx:
        static["fx_order"] = ()
        state = {k: v for k, v in state.items() if not k.startswith("fx_")}
        events = {k: v for k, v in events.items() if not k.startswith("fx_")}
    if snare_h != 64 and drop_kind != "snare":
        static["family_static"] = (
            ("kick", (("feedback_path", False), ("max_harmonics", 0))),
            ("snare", (("max_harmonics", snare_h),)),
        )
    run = jax.jit(lambda s: eng.render_many(s, events, **static))

    def timed_once():
        s = state
        t0 = time.perf_counter()
        for _ in range(pipe):
            s, blocks = run(s)
        np.asarray(blocks[-1, :, -8:])
        return (time.perf_counter() - t0) / pipe

    # compile
    s = state
    s, blocks = run(s)
    np.asarray(blocks[-1, :, -8:])
    return timed_once


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--pipe", type=int, default=4)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    cands = {
        "composed": dict(),
        "no_bus": dict(fx=False),
        "no_snare": dict(drop_kind="snare"),
        "no_tom2": dict(drop_kind="tom2"),
        "no_bass": dict(drop_kind="bass"),
        "no_hihat2": dict(drop_kind="hihat2"),
        "no_kick": dict(drop_kind="kick"),
        "snare_h0": dict(snare_h=0),
    }
    if args.only:
        keep = set(args.only.split(",")) | {"composed"}
        cands = {k: v for k, v in cands.items() if k in keep}
    runners = {}
    for name, kw in cands.items():
        runners[name] = composed_runner(args.pipe, **kw)
    best = {k: float("inf") for k in cands}
    for _r in range(args.rounds):
        for name in cands:
            best[name] = min(best[name], runners[name]())
        time.sleep(1.0)

    base = best["composed"] / N_BLOCKS * 1e6
    out = {}
    for name in cands:
        us = best[name] / N_BLOCKS * 1e6
        out[name] = {"us_per_block": round(us, 1),
                     "delta_vs_composed_us": round(us - base, 1)}
    out["composed"]["aggregate_rtf"] = round(
        (4096 * B / SR) / (best["composed"] / N_BLOCKS), 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
