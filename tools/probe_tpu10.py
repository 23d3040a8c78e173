"""TPU probe round 10: TRUE device throughput via dependency chaining.

probe_tpu9 showed a ~31 ms relay round-trip floor under every fetch-timed
measurement. Here K data-dependent iterations run inside one jit; the
slope between K=1 and K=8 is the per-iteration device time."""

import json
import sys
import time

sys.setrecursionlimit(100_000)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np


def report(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def fail(name, e):
    report(name, error=f"{type(e).__name__}: {str(e)[:200]}")


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def main():
    report("device", kind=jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)

    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
    from halo2_regex_tpu.ops.scan_jax import _match_core, _model_arrays

    B, L = 4096, 1024
    model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
    arrays = _model_arrays(model)
    chars = jnp.asarray(rng.integers(32, 127, size=(B, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full((B,), L, np.int32))

    def measure(run_one, name):
        """run_one(chars)->mask [B, L]. Chain K iterations with a data dep."""
        def make(K):
            @jax.jit
            def f(c):
                m = None
                for _ in range(K):
                    m = run_one(c)
                    dep = (m[0, 0] & 1).astype(jnp.uint8)
                    c = c ^ dep  # data dependency; same distribution
                return m

            return f

        try:
            f1, f8 = make(1), make(8)
            for f in (f1, f8):
                fetch(f(chars))
            def t(f, n=4):
                t0 = time.perf_counter()
                for _ in range(n):
                    fetch(f(chars))
                return (time.perf_counter() - t0) / n
            t1, t8 = t(f1), t(f8)
            per = (t8 - t1) / 7
            report(name, t1=t1, t8=t8, per_iter_sec=per,
                   mbytes_per_sec=B * L / per / 1e6 if per > 0 else None)
        except Exception as e:
            fail(name, e)

    # Pallas fused kernel (flat mode)
    try:
        matcher = PallasMatcher(model, batch_tile=256)

        def run_pallas(c):
            return matcher._run(c, lengths)["mask"]

        measure(run_pallas, "pallas_chained_tb256")
    except Exception as e:
        fail("pallas_chained_tb256", e)

    try:
        matcher5 = PallasMatcher(model, batch_tile=512)

        def run_pallas5(c):
            return matcher5._run(c, lengths)["mask"]

        measure(run_pallas5, "pallas_chained_tb512")
    except Exception as e:
        fail("pallas_chained_tb512", e)

    # XLA path
    try:
        def run_xla(c):
            return _match_core(arrays, model.n_defs, c, lengths)["mask"]

        measure(run_xla, "xla_chained")
    except Exception as e:
        fail("xla_chained", e)


if __name__ == "__main__":
    main()
