"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (SURVEY §4: "multi-host tests via portable
fallback"). The env vars must be set before JAX initializes its backends,
hence module scope here.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Deep ASTs (e.g. 98-way catch-all alternations nested under +/?) recurse in
# the compiler front-end.
sys.setrecursionlimit(100_000)
