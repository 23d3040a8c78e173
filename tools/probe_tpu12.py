"""TPU probe 12: slab kernel compile/perf sweep (SLAB=8/16) with chained
timing, plus correctness on hardware."""

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

    from fixtures import CONFIGS
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.ops import reference as ref_ops
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
    from halo2_regex_tpu.ops.scan_jax import pack_batch

    # ---- correctness at SLAB=8 on a small model ----
    try:
        m3 = CompiledRegexModel.from_decomposed(
            DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=64
        )
        matcher = PallasMatcher(m3, batch_tile=128, slab=8)
        strings = [
            b"from:alice@gmail.com\r\n",
            b"dummy\r\nfrom:alice<alice@gmail.com>\r\n",
            b"",
            b"x" * 64,
        ] * 32
        chars, lengths = pack_batch(strings, 64)
        res = matcher(chars, lengths)
        ok = True
        bad = None
        for i in range(4):
            oracle = ref_ops.match_substrs(m3.regex_defs, strings[i], 64)
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
        report("slab8_correct_tpu", ok=ok, bad=bad)
    except Exception as e:
        fail("slab8_correct_tpu", e)

    # ---- throughput: email model, chained ----
    B, L = 4096, 1024
    model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
    chars = jnp.asarray(rng.integers(32, 127, size=(B, L)).astype(np.uint8))
    lengths = jnp.asarray(np.full((B,), L, np.int32))

    for SLAB, TB in [(8, 256), (16, 256)]:
        try:
            matcher = PallasMatcher(model, batch_tile=TB, slab=SLAB)

            def make(K, m=matcher):
                @jax.jit
                def f(c):
                    out = None
                    for _ in range(K):
                        out = m._run(c, lengths)["mask"]
                        dep = (out[0, 0] & 1).astype(jnp.uint8)
                        c = c ^ dep
                    return out

                return f

            f1, f5 = make(1), make(5)
            for f in (f1, f5):
                fetch(f(chars))
            def t(f, n=4):
                t0 = time.perf_counter()
                for _ in range(n):
                    fetch(f(chars))
                return (time.perf_counter() - t0) / n
            per = (t(f5) - t(f1)) / 4
            report(
                f"slab{SLAB}_tb{TB}_chained", per_iter_sec=per,
                mbytes_per_sec=B * L / per / 1e6 if per > 0 else None,
            )
        except Exception as e:
            fail(f"slab{SLAB}_tb{TB}_chained", e)


if __name__ == "__main__":
    main()
