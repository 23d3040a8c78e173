"""TPU probe 17 (final round-1 batch): L=1024 full-field correctness on
hardware, benchmarks configs on TPU, int8-matmul feasibility."""

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


def main():
    report("device", kind=jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)

    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.ops import reference as ref_ops
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
    from halo2_regex_tpu.ops.scan_jax import pack_batch

    # ---- 1. L=1024 full-field correctness on hardware ----
    try:
        L = 1024
        model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
        matcher = PallasMatcher(model)  # defaults TB=512 slab=8
        filler = bytes(rng.choice(np.frombuffer(
            b"abcdefghijklmnopqrstuvwxyz ", np.uint8), size=700).tobytes())
        strings = [
            b"from:alice@gmail.com\r\n",
            filler + b"\r\nfrom:bob.smith@sub.domain-x.org\r\n",
            b"not an email at all " * 40,
            b"",
            b"x" * L,  # full length
        ]
        strings += [strings[1]] * (512 - len(strings))
        chars, lengths = pack_batch(strings, L)
        res = matcher(chars, lengths)
        ok = True
        bad = None
        for i in range(5):
            oracle = ref_ops.match_substrs(model.regex_defs, strings[i], L)
            row = res.map(lambda a: np.asarray(a)[i])
            for n in row.field_names():
                if not (
                    np.asarray(getattr(row, n)).astype(np.int64)
                    == np.asarray(getattr(oracle, n)).astype(np.int64)
                ).all():
                    ok, bad = False, (i, n)
                    break
            if not ok:
                break
        report("L1024_full_correct", ok=ok, bad=bad)
    except Exception as e:
        fail("L1024_full_correct", e)

    # ---- 2. int8 matmul feasibility in-kernel ----
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        a = jnp.asarray(rng.integers(0, 2, size=(128, 128)).astype(np.int8))
        b = jnp.asarray(rng.integers(0, 100, size=(128, 128)).astype(np.int8))
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        exp = np.asarray(a).astype(np.int32) @ np.asarray(b).astype(np.int32)
        report("int8_matmul", ok=bool((np.asarray(out) == exp).all()))
    except Exception as e:
        fail("int8_matmul", e)


def extra_fused3():
    import numpy as np, jax, jax.numpy as jnp, time
    rng = np.random.default_rng(0)
    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
    B, L = 4096, 1024
    chars = jnp.asarray(rng.integers(32, 127, size=(B, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full((B,), L, np.int32))
    try:
        model3 = zoo.email_headers_model(max_chars_size=L, headers=("from", "to", "subject"))
        m = PallasMatcher(model3)  # auto TB=384
        def make(K):
            @jax.jit
            def f(c):
                out = None
                for _ in range(K):
                    out = m._run(c, lengths)["mask"]
                    dep = (out[0, 0] & 1).astype(jnp.uint8)
                    c = c ^ dep
                return out
            return f
        def fetch(x): return np.asarray(x.ravel()[:1])
        f1, f5 = make(1), make(5)
        for f in (f1, f5): fetch(f(chars))
        def t(f, n=4):
            t0 = time.perf_counter()
            for _ in range(n): fetch(f(chars))
            return (time.perf_counter() - t0) / n
        per = (t(f5) - t(f1)) / 4
        report("fused3_autoTB", tb=m.batch_tile, per_iter_sec=per,
               mbytes_per_sec=B * L / per / 1e6)
    except Exception as e:
        fail("fused3_autoTB", e)


if __name__ == "__main__":
    main()
    extra_fused3()
