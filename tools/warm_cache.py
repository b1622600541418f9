#!/usr/bin/env python
"""Warm the machine-keyed XLA:CPU compile cache for the test suite.

Runs every example main() in a FRESH subprocess with the exact config the
test conftest uses (cpu platform, 8 virtual devices, machine-keyed cache
dir).  Rationale: the suite itself skips persistent-cache WRITES during
test_examples (XLA:CPU executable.serialize() SIGABRTs mid-suite once
~90 tests of process state have accumulated — see tests/test_examples.py
_no_persistent_cache_writes), but a fresh process serializes the same
executables fine.  Warming here makes suite runs hit the cache instead
of recompiling the heaviest graphs every time.

Usage: python tools/warm_cache.py [module ...]   (default: all examples)
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cache_dirs import cpu_cache_dir, pin_cpu_isa  # noqa: E402

ALL = [
    "drums", "bass_sequencer", "chords", "effects_lab", "granular",
    "loops_and_clips", "sampler_rack", "performance_record", "dsl_demo",
    "kick", "snare", "hihat", "hihat2", "tom", "tom2", "bass",
    "delay", "reverb", "reverb_lab", "tilt_filter", "lfo_test",
    "sequencer", "membrane", "multi_channel_submix",
]

PREAMBLE = """
import sys
sys.path.insert(0, {repo!r}); sys.path.insert(0, {repo!r} + '/examples')
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', {cache!r})
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
import inspect
import {mod} as m
kw = dict(quick=True) if 'quick' in inspect.signature(m.main).parameters \\
    else dict(seconds=0.5)
if 'out_path' in inspect.signature(m.main).parameters:
    kw['out_path'] = '/tmp/warm_{mod}.wav'
m.main(**kw)
print('warmed: {mod}')
"""


def main():
    mods = sys.argv[1:] or ALL
    cache = cpu_cache_dir()
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    pin_cpu_isa(env)  # match the conftest's portable-ISA codegen
    failed = []
    for mod in mods:
        code = PREAMBLE.format(repo=REPO, cache=cache, mod=mod)
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=3600)
        line = (r.stdout.strip().splitlines() or ["(no output)"])[-1]
        print(f"{mod}: rc={r.returncode} {line}")
        if r.returncode != 0:
            failed.append(mod)
            sys.stderr.write(r.stderr[-1500:] + "\n")
    if failed:
        sys.exit(f"failed: {failed}")


if __name__ == "__main__":
    main()
