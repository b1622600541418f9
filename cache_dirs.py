"""Machine-keyed JAX compile-cache directories (stdlib only — importable
before jax initializes).

XLA:CPU persistent-cache entries are AOT host binaries whose cache key does
NOT include the compiling machine's CPU features.  When a session resumes on
a different host (this harness migrates between machine types), loading a
foreign entry executes mismatched machine code: the loader warns
("Target machine feature +prefer-no-gather is not supported on the host
machine ... could lead to execution errors such as SIGILL") and in practice
we observed SIGABRT crashes mid-suite and small numeric drift vs natively
compiled code.  Keying every CPU-backend cache dir by a host fingerprint
(cpu model + feature flags) makes a machine swap start a clean cache instead
of poisoning the run.  TPU-backend caches (.jax_cache) hold TPU binaries and
don't need this.
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
