"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (SURVEY §4: "multi-host tests via portable
fallback"). Note: in TPU-attached environments a sitecustomize hook may
force ``jax_platforms`` to the hardware backend at interpreter start; the
env var alone is then ignored, so we override the config explicitly after
importing jax.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Deep ASTs (e.g. 98-way catch-all alternations nested under +/?) recurse in
# the compiler front-end.
sys.setrecursionlimit(100_000)
