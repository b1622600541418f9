#!/usr/bin/env python
"""Component-differential profile of the headline kick-bank block.

Measures bench.py's exact render with individual components stubbed out
(monkeypatched to free passthroughs); the delta to the full render is that
component's marginal block cost.  Methodology matches bench.py: jitted
scan over N_BLOCKS, min over iterations, sync via small host read.

Usage: python tools/bench_kick_parts.py [--blocks 128] [--iters 5]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from libgooey_tpu.core.smoother import SmootherBank, smoothing_coeff
from libgooey_tpu.core import dsp as dsp_mod
from libgooey_tpu.effects import feedback_waveshaper as fbws
from libgooey_tpu.engine import engine as eng
from libgooey_tpu.instruments import common as common_mod
from libgooey_tpu.instruments import kick as kick_mod
from libgooey_tpu.ops import noise as noise_mod
from libgooey_tpu.ops import osc as osc_mod
from libgooey_tpu.ops import oversample as ovs_mod
from libgooey_tpu.ops import filters as filt_mod
from libgooey_tpu.core import rng as rng_mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    bench.N_BLOCKS = args.blocks
    V, B, SR = bench.VOICES, bench.BLOCK, bench.SR

    state = {
        "kick": kick_mod.init_state(V, kick_mod.KickConfig.tight()),
        "pan": SmootherBank.init(np.linspace(0.2, 0.8, V).astype(np.float32)),
        "gain": SmootherBank.init(np.full(V, 1.0 / V, np.float32)),
        "master": SmootherBank.init(np.float32(0.25)),
    }
    offs, vels, starts = bench.build_events()
    events = {
        "kick_off": jnp.asarray(offs),
        "kick_vel": jnp.asarray(vels),
        "block_start": jnp.asarray(starts),
    }
    static = dict(
        kinds=("kick",), sample_rate=SR, block_size=B,
        smooth_coeff=smoothing_coeff(SR), limiter_threshold=1.0,
        family_static=(("kick", (("feedback_path", False), ("max_harmonics", 0))),),
    )

    def measure():
        # NOTE: eng.render_many is module-level jitted — its cache would
        # ignore the monkeypatched stubs.  Scan the raw _render_all instead
        # so every variant retraces.
        def run_raw(s):
            def step(st, ev):
                st2, out, _mono = eng._render_all(st, ev, **static)
                return st2, out
            return jax.lax.scan(step, s, events)

        run = jax.jit(run_raw)
        out = run(state)
        np.asarray(out[1][-1, :, -8:])
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = run(state)
            np.asarray(out[1][-1, :, -8:])
            times.append(time.perf_counter() - t0)
        return min(times) / args.blocks * 1e3  # ms per block

    # --- stubs ---------------------------------------------------------------
    real = dict(
        ovs_process=ovs_mod.process,
        env_scan=fbws._env_follow_scan,
        pink=noise_mod.pink_block,
        rlp=filt_mod.resonant_lowpass_block,
        amp=kick_mod.amplitude,
        fbws_block=fbws.process_block,
        white=rng_mod.white,
        white_idx=rng_mod.white_from_sample_index,
        sine=osc_mod.sine,
        rhp=filt_mod.resonant_highpass_block,
        kick_render=kick_mod.render_block,
        ptraj=common_mod.VoiceBlock.ptraj,
        pan_gains=dsp_mod.pan_gains,
    )

    def no_ovs(state, fn, x, mode=4):
        return state, fn(x)

    def no_env(env0, rect, att, rel, freeze):
        return env0, rect

    def no_pink(state, elapsed_i, sr, reset=None):
        return state, jnp.zeros(jnp.broadcast_shapes(
            jnp.shape(elapsed_i)), jnp.float32)

    def no_rlp(state, x, cutoff, res, sr, reset=None):
        return state, x

    def no_amp(adsr, elapsed):
        return jnp.ones(jnp.broadcast_shapes(jnp.shape(elapsed)), jnp.float32)

    def no_fbws(state, x, drive, feedback, fbc, mix, sr,
                feedback_path=True, os_mode=4):
        return state, x

    def no_white(counter, seed=0):
        return jnp.ones(jnp.shape(counter), jnp.float32)

    def no_sine(sample_index, freq, sample_rate):
        return jnp.ones(jnp.broadcast_shapes(
            jnp.shape(sample_index), jnp.shape(freq)), jnp.float32)

    def no_rhp(state, x, cutoff, res, sr, reset=None):
        return state, x

    def no_kick(state, trig_offset, trig_velocity, block_start, **kw):
        V = state.trig_sample.shape[0]
        return state, jnp.zeros((V, B), jnp.float32)

    def no_ptraj(self, name):
        if name in self.overrides:
            return self.overrides[name]
        idx = self.param_index[name]
        return jnp.broadcast_to(self.bank.target[:, idx, None],
                                (self.bank.target.shape[0], self.B))

    def no_pan(pan):
        one = jnp.full(jnp.shape(pan), 0.70710678, jnp.float32)
        return one, one

    variants = [
        ("full", {}),
        ("-oversampler", {"ovs": no_ovs}),
        ("-env_follower", {"env": no_env}),
        ("-fbws_entirely", {"fbws": no_fbws}),
        ("-pink_noise", {"pink": no_pink}),
        ("-resonant_lp", {"rlp": no_rlp}),
        ("-adsr_pow", {"amp": no_amp}),
        ("-white_hash", {"white": no_white, "white_idx": no_white}),
        ("-sine_osc", {"sine": no_sine}),
        ("-click_hp", {"rhp": no_rhp}),
        ("-kick_entirely", {"kick_render": no_kick}),
        ("-ptraj_decay", {"ptraj": no_ptraj}),
        ("-pan_gains", {"pan_gains": no_pan}),
    ]

    results = {}
    for name, mods in variants:
        ovs_mod.process = mods.get("ovs", real["ovs_process"])
        fbws._env_follow_scan = mods.get("env", real["env_scan"])
        fbws.process_block = mods.get("fbws", real["fbws_block"])
        noise_mod.pink_block = mods.get("pink", real["pink"])
        filt_mod.resonant_lowpass_block = mods.get("rlp", real["rlp"])
        kick_mod.amplitude = mods.get("amp", real["amp"])
        rng_mod.white = mods.get("white", real["white"])
        rng_mod.white_from_sample_index = mods.get("white_idx", real["white_idx"])
        osc_mod.sine = mods.get("sine", real["sine"])
        filt_mod.resonant_highpass_block = mods.get("rhp", real["rhp"])
        eng.FAMILIES["kick"] = kick_mod
        if "kick_render" in mods:
            import types

            stub_mod = types.SimpleNamespace(
                render_block=mods["kick_render"],
                init_state=kick_mod.init_state,
                PARAM_INDEX=kick_mod.PARAM_INDEX,
            )
            eng.FAMILIES["kick"] = stub_mod
        common_mod.VoiceBlock.ptraj = mods.get("ptraj", real["ptraj"])
        dsp_mod.pan_gains = mods.get("pan_gains", real["pan_gains"])
        eng.dsp.pan_gains = mods.get("pan_gains", real["pan_gains"])
        # kick imports these at module load by name in some cases — it uses
        # module-level lookups for fbws.process_block / filters.* / noise.*,
        # but `amplitude` is imported into kick's namespace:
        kick_mod.fbws.process_block = mods.get("fbws", real["fbws_block"])
        ms = measure()
        results[name] = ms
        base = results.get("full", ms)
        delta = base - ms
        print(f"{name:16s} {ms:7.3f} ms/block"
              + (f"   component ≈ {delta:6.3f} ms" if name != "full" else ""),
              flush=True)


if __name__ == "__main__":
    main()
