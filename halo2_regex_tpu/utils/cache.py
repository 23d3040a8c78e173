"""Opt-out persistent JAX compilation cache.

First jit per process on the relayed TPU costs 4-25 minutes; the
persistent cache lets a later process (another probe, a bench re-run, a
retry after the relay drops) reuse the serialized executable when the
PJRT plugin supports it.  If the plugin can't serialize executables JAX
logs a warning and compiles normally, so enabling is always safe.

Disable with H2R_NO_COMPILE_CACHE=1; relocate with H2R_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> str | None:
    """Point JAX at an on-disk compilation cache. Returns the dir or None."""
    if os.environ.get("H2R_NO_COMPILE_CACHE") == "1":
        return None
    path = os.environ.get("H2R_COMPILE_CACHE_DIR", "/tmp/h2r_jax_cache")
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Relay compiles are minutes; anything over 10 s is worth keeping.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
        return path
    except Exception:
        return None
