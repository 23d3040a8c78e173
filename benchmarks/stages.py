"""Per-stage throughput profile of the bitplane witness pipeline.

    python benchmarks/stages.py [--batch 32768] [--len 1024] [--rounds 3]

Times each pipeline stage in isolation with the relay-safe chained
K-slope (utils.profiling.benchmark_chained), round-robin across rounds
with the best reading kept per stage — the same methodology as bench.py
(see docs/PERF.md for why naive timing is wrong on relayed devices).
Prints one JSON line per stage:

    raw_quads   XLA transpose+bitcast of [B, L] input to quad rows
    pack        byte-bit extraction + class-plane circuit (Pallas)
    scan        fused multi-def serial step circuit (Pallas)
    post        tag + id-sum + both mask FSMs + byte assembly (Pallas)
    full        the whole witness pipeline (compact columns)

The stage rows isolate the PLAIN-SIGNATURE kernels (an en_pack=False,
qpack=False matcher), so they are comparable across rounds but are NOT
components of the shipped default pipeline (which fuses raw_quads and
the enable plane into the pack kernel via qpack+en_pack); `full` times
the shipped default.  The gap between `full` and the kernel stages is
the XLA decode/tail (field transpose, masked chars, states assembly)
plus per-pass overheads.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in sys.path:
    sys.path.append("/root/.axon_site")
sys.setrecursionlimit(100_000)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--len", type=int, default=1024, dest="length")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.ops.bitplane import BitplaneMatcher, raw_quads
    from halo2_regex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from halo2_regex_tpu.utils.profiling import benchmark_chained

    B, L = args.batch, args.length
    model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
    # stage isolation drives the plain single-input pack signature —
    # en_pack/qpack (default ON since round 4) change the kernel
    # signatures, so they are disabled HERE ONLY; the `full` row below
    # uses a default-constructed matcher (the shipped configuration).
    m = BitplaneMatcher(model, columns="witness", en_pack=False, qpack=False)
    m_full = BitplaneMatcher(model, columns="witness")
    NWS = B // 32 // 128
    if NWS < 1:
        raise SystemExit("--batch must be >= 4096 (one packed word group)")

    rng = np.random.default_rng(0)
    chars_j = jnp.asarray(rng.integers(32, 127, size=(B, L)).astype(np.uint8))
    lengths_j = jnp.asarray(np.full((B,), L - 8, np.int32))

    quads = jax.jit(lambda c: raw_quads(c, m.L_pad).reshape(m.L_pad, 8, NWS, 128))
    R = quads(chars_j)
    bits = m._make_pack(NWS)(R)
    logs = m._make_scan_fused(NWS)(bits)
    en = jnp.ones((NWS, 1, m.L_pad, 128), jnp.int32)

    def chain(fn):
        def mk(K):
            @jax.jit
            def f(x):
                y = None
                for _ in range(K):
                    y = fn(x)
                    y0 = y[0] if isinstance(y, (tuple, list)) else y
                    x = x ^ (y0.ravel()[0] & 1).astype(x.dtype)
                return y

            return f

        return mk

    def mk_full(K):
        # DCE-proof (round 3): every iteration's witness columns are jit
        # outputs, so the slope prices the FULL emission (the old mask-only
        # chain let XLA dead-code-eliminate the other columns).
        keys = ("states", "all_substr_ids", "masked_characters", "flags",
                "match_ok")

        @jax.jit
        def f(c):
            outs = []
            for i in range(K):
                out = m_full.core(c ^ np.uint8(i), lengths_j ^ i)
                outs.append(tuple(out[k] for k in keys))
            return outs

        return f

    post_fn = m._make_post(NWS)
    stages = [
        ("raw_quads", chain(quads), (chars_j,)),
        ("pack", chain(m._make_pack(NWS)), (R,)),
        ("scan", chain(m._make_scan_fused(NWS)), (bits,)),
        ("post", chain(lambda lg: post_fn(lg, en)), (logs,)),
    ]
    # round-3 kernels, present per emission mode
    if m._emit == "kdecode":
        post_out = post_fn(logs, en)
        g4 = (post_out[0] if isinstance(post_out, (tuple, list)) else post_out)
        G = len(m._wgroups)
        g4r = g4.reshape(NWS, G, 8, m.L_pad, 128)
        ch_l4 = jax.lax.bitcast_convert_type(
            chars_j.reshape(B, m.L_pad // 4, 4), jnp.int32
        )
        dec_fn = m._make_decode(NWS)
        stages.append(
            ("decode", chain(lambda g: dec_fn(g, ch_l4)), (g4r,))
        )
    stages.append(
        ("fb_only", chain(lambda lg: m._make_fb_only(NWS)(lg, en)), (logs,))
    )
    stages.append(("full", mk_full, (chars_j,)))
    best = {}
    for rnd in range(args.rounds):
        for name, mk, a in stages:
            s = benchmark_chained(mk, a, ks=(1, 4))
            if s > 1e-7:
                best[name] = min(best.get(name, float("inf")), s)
            print(
                f"# r{rnd} {name}: {s*1e3:.3f} ms", file=sys.stderr, flush=True
            )
    for name, *_ in stages:
        s = best.get(name)
        print(
            json.dumps(
                {
                    "stage": name,
                    "best_ms": round(s * 1e3, 4) if s else None,
                    "input_gbps": round(B * L / s / 1e9, 2) if s else None,
                    "batch": B,
                    "max_chars": L,
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
