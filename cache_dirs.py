"""Machine-keyed JAX compile-cache directories (stdlib only — importable
before jax initializes).

XLA:CPU persistent-cache entries are AOT host binaries whose cache key does
NOT include the compiling machine's CPU features.  When a session resumes on
a different host (this harness migrates between machine types), loading a
foreign entry executes machine code compiled for different CPU features —
the loader warns "Target machine feature ... is not supported on the host
machine ... could lead to execution errors such as SIGILL".  Keying every
CPU-backend cache dir by a host fingerprint (cpu model + feature flags)
makes a machine swap start a clean cache instead of poisoning the run.

Caveat learned the hard way: the loader's warning also fires SPURIOUSLY for
same-machine entries, because XLA bakes tuning attributes (+prefer-no-
scatter/+prefer-no-gather) into the compile feature list and then compares
against cpuid, which never reports tuning attrs.  Treat the warning as real
only when actual ISA bits (avx512*, amx-*) differ.  TPU-backend caches
(.jax_cache) hold TPU binaries and don't need any of this.
"""

import hashlib
import os
import platform
import re


def host_tag() -> str:
    """Short fingerprint of the host CPU (model name + feature flags)."""
    txt = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            info = f.read()
        m = re.search(r"model name\s*:\s*(.*)", info)
        fl = re.search(r"flags\s*:\s*(.*)", info)
        txt += "|" + (m.group(1) if m else "")
        txt += "|" + " ".join(sorted((fl.group(1) if fl else "").split()))
    except OSError:
        txt += "|" + platform.processor()
    return hashlib.sha1(txt.encode()).hexdigest()[:10]


def host_cache_dir(base: str) -> str:
    """``base`` dir suffixed with the host fingerprint, e.g.
    ``/root/repo/.jax_cache_cpu-1a2b3c4d5e``."""
    return f"{base.rstrip('/')}-{host_tag()}"


def cpu_cache_dir() -> str:
    """The machine-keyed XLA:CPU test/compile cache for this checkout."""
    repo = os.path.dirname(os.path.abspath(__file__))
    return host_cache_dir(os.path.join(repo, ".jax_cache_cpu"))
