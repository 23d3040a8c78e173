"""TPU probe round 4: the production PallasMatcher on hardware
(correctness vs oracle + throughput at bench shapes), MXU scaling law, and
the select-extraction scan variant."""

import json
import sys
import time

sys.setrecursionlimit(100_000)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, n=10):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def report(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def fail(name, e):
    report(name, error=f"{type(e).__name__}: {str(e)[:300]}")


def main():
    report("device", kind=jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)

    # ---- 1. MXU scaling: k independent 2048-matmuls in one jit ----
    try:
        N = 2048
        xs = [
            jnp.asarray(rng.standard_normal((N, N)).astype(np.float32)).astype(
                jnp.bfloat16
            )
            for _ in range(8)
        ]

        def make(k):
            @jax.jit
            def f(*args):
                return sum(
                    jnp.dot(a, a, preferred_element_type=jnp.float32) for a in args
                )

            return f

        times = {}
        for k in (1, 2, 4, 8):
            f = make(k)
            dt = timeit(f, *xs[:k], n=10)
            times[k] = dt
        slope = (times[8] - times[1]) / 7
        report(
            "mxu_scaling", times={str(k): v for k, v in times.items()},
            per_matmul_sec=slope,
            true_tflops=2 * N**3 / slope / 1e12 if slope > 0 else None,
        )
    except Exception as e:
        fail("mxu_scaling", e)

    # ---- 2. PallasMatcher on TPU: correctness vs oracle ----
    try:
        from fixtures import CONFIGS
        from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
        from halo2_regex_tpu.models.compiled import CompiledRegexModel
        from halo2_regex_tpu.ops import reference as ref_ops
        from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
        from halo2_regex_tpu.ops.scan_jax import pack_batch

        model = CompiledRegexModel.from_decomposed(
            DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=64
        )
        matcher = PallasMatcher(model, batch_tile=256)
        strings = [
            b"from:alice@gmail.com\r\n",
            b"dummy\r\nfrom:alice<alice@gmail.com>\r\n",
            b"from:alice<alicegmail.com>\r\n",
            b"",
            b"x" * 64,
        ] * 52  # 260 -> pads to 512
        chars, lengths = pack_batch(strings, 64)
        res = matcher(chars, lengths)
        ok = True
        first_bad = None
        for i in (0, 1, 2, 3, 4):
            oracle = ref_ops.match_substrs(model.regex_defs, strings[i], 64)
            row = res.map(lambda a: np.asarray(a)[i])
            for name in row.field_names():
                if not (
                    np.asarray(getattr(row, name)).astype(np.int64)
                    == np.asarray(getattr(oracle, name)).astype(np.int64)
                ).all():
                    ok = False
                    first_bad = (i, name)
                    break
            if not ok:
                break
        report("pallas_matcher_correct_tpu", ok=ok, first_bad=first_bad)
    except Exception as e:
        fail("pallas_matcher_correct_tpu", e)

    # ---- 3. PallasMatcher throughput at bench shape ----
    try:
        from halo2_regex_tpu.models import zoo

        model = zoo.email_headers_model(max_chars_size=1024, headers=("from",))
        for TB in (256, 512, 1024):
            try:
                matcher = PallasMatcher(model, batch_tile=TB)
                B, L = 4096, 1024
                chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
                lengths = np.full((B,), L, np.int32)
                cj, lj = jnp.asarray(chars), jnp.asarray(lengths)

                def run(c, l):
                    return matcher(c, l).mask

                dt = timeit(run, cj, lj, n=3)
                report(
                    f"pallas_matcher_tput_tb{TB}", sec=dt,
                    mbytes_per_sec=B * L / dt / 1e6,
                )
            except Exception as e:
                fail(f"pallas_matcher_tput_tb{TB}", e)
    except Exception as e:
        fail("pallas_matcher_tput", e)


if __name__ == "__main__":
    main()
