"""TPU probe round 5: PallasMatcher correctness + fetch-synchronized
throughput with varied inputs (the relay's block_until_ready is
unreliable — every timing iteration transfers a scalar and inputs differ
per call)."""

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
    report(name, error=f"{type(e).__name__}: {str(e)[:300]}")


def timed(fn, variants, iters):
    """fn(v) for cycling input variants; per-iter scalar fetch."""
    out = fn(variants[0])
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(variants[i % len(variants)])
        np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main():
    report("device", kind=jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)

    from fixtures import CONFIGS
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.ops import reference as ref_ops
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
    from halo2_regex_tpu.ops.scan_jax import BatchMatcher, pack_batch

    # ---- 1. correctness on TPU ----
    try:
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
        ] * 52
        chars, lengths = pack_batch(strings, 64)
        res = matcher(chars, lengths)
        ok = True
        first_bad = None
        for i in range(5):
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
        report("pallas_correct_tpu", ok=ok, first_bad=first_bad)
    except Exception as e:
        fail("pallas_correct_tpu", e)

    # ---- 2. throughput, fetch-synced, varied inputs ----
    try:
        from halo2_regex_tpu.models import zoo

        model = zoo.email_headers_model(max_chars_size=1024, headers=("from",))
        B, L = 4096, 1024
        variants = [
            jnp.asarray(rng.integers(32, 127, size=(B, L)).astype(np.uint8))
            for _ in range(3)
        ]
        lengths = jnp.asarray(np.full((B,), L, np.int32))
        for TB in (256, 1024):
            try:
                matcher = PallasMatcher(model, batch_tile=TB)

                def run(c):
                    return matcher(c, lengths).mask

                dt = timed(run, variants, iters=6)
                report(
                    f"pallas_tput_tb{TB}", sec=dt, mbytes_per_sec=B * L / dt / 1e6
                )
            except Exception as e:
                fail(f"pallas_tput_tb{TB}", e)

        # XLA comparison, same protocol
        bm = BatchMatcher(model)

        def run_x(c):
            return bm(c, lengths).mask

        dt = timed(run_x, variants, iters=3)
        report("xla_tput", sec=dt, mbytes_per_sec=B * L / dt / 1e6)
    except Exception as e:
        fail("tput", e)


if __name__ == "__main__":
    main()
