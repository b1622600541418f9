"""Test configuration: force CPU with a virtual 8-device mesh.

Tests run on CPU so they're hermetic and fast; the multi-chip sharding tests
use 8 virtual host devices.  Real-TPU execution is exercised by bench.py and
the driver's compile checks.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
