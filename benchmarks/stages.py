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
    ap.add_argument("--cuts", action="store_true",
                    help="measure incremental cuts of the SHIPPED "
                         "pipeline (qpack -> +scan -> +post -> +tail -> "
                         "full) instead of isolated plain-signature "
                         "kernels; deltas are the in-context stage "
                         "costs incl. XLA scheduling (probe_tpu65 "
                         "methodology)")
    args = ap.parse_args(argv)
    if args.cuts:
        return main_cuts(args)

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


def main_cuts(args) -> int:
    """Incremental cuts of the shipped (qpack+en_pack, emit=bytes)
    witness pipeline: each cut is one jitted chained fn of
    (chars, lengths); successive medians' deltas give the in-context
    stage costs including XLA scheduling.  The kernels' share of
    wall-clock = (cut3_post) / (cut5_full)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.ops.bitplane import LANE, BitplaneMatcher
    from halo2_regex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from halo2_regex_tpu.utils.profiling import benchmark_chained

    B, L = args.batch, args.length
    model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
    m = BitplaneMatcher(model, columns="witness")
    NWS = B // 32 // LANE
    NW = B // 32
    G = len(m._wgroups)
    L_pad = m.L_pad
    wgroups = m._wgroups
    qp = m._make_qpack(NWS)
    scan = m._make_scan_fused(NWS)
    post = m._make_post(NWS)

    rng = np.random.default_rng(0)
    chars_j = jnp.asarray(rng.integers(32, 127, size=(B, L)).astype(np.uint8))
    lengths_j = jnp.asarray(np.full((B,), L - 8, np.int32))

    def cut_qpack(c, ln):
        len_wb = ln.reshape(8, NW, 4).transpose(1, 2, 0).reshape(
            NWS, LANE, 32)
        return qp(c.reshape(8, NW, 4, L), len_wb)

    def cut_scan(c, ln):
        bits, en = cut_qpack(c, ln)
        return scan(bits), en

    def cut_post(c, ln):
        logs, en = cut_scan(c, ln)
        return post(logs, en[:, None])

    def cut_tail(c, ln):
        g4, fb = cut_post(c, ln)
        u8 = jax.lax.bitcast_convert_type(
            g4.reshape(NWS, G, 8, L_pad, LANE)[:, :, :, :L], jnp.uint8)
        outs = []
        flags = None
        for gi, grp in enumerate(wgroups):
            arr = u8[:, gi]
            for nm, off_b, nb in grp:
                col = ((arr >> off_b) & ((1 << nb) - 1)
                       ).transpose(1, 0, 3, 4, 2).reshape(B, L)
                outs.append(col)
                if nm == "flags":
                    flags = col
        outs.append((flags & 1) * c.astype(jnp.uint8))
        return outs, fb

    keys = ("states", "all_substr_ids", "masked_characters", "flags",
            "match_ok")

    def cut_full(c, ln):
        out = m.core(c, ln)
        return tuple(out[k] for k in keys)

    def chain_cl(fn):
        # kout-honest: EVERY iteration's full output pytree is a jit
        # output, so XLA cannot dead-code-eliminate any column in
        # intermediate iterations (the single-bit chained harness lets
        # it, and under-measures XLA-side stages — probe_tpu67).
        def mk(K):
            @jax.jit
            def f(c, ln):
                return [fn(c ^ np.uint8(i), ln ^ i) for i in range(K)]
            return f
        return mk

    cuts = [
        ("cut1_qpack", cut_qpack),
        ("cut2_scan", cut_scan),
        ("cut3_post", cut_post),
        ("cut4_tail", cut_tail),
        ("cut5_full", cut_full),
    ]
    samples = {name: [] for name, _ in cuts}
    for rnd in range(args.rounds):
        for name, fn in cuts:
            s = benchmark_chained(chain_cl(fn), (chars_j, lengths_j),
                                  ks=(2, 8))
            if s > 1e-7:
                samples[name].append(s)
            print(f"# r{rnd} {name}: {s*1e3:.3f} ms", file=sys.stderr,
                  flush=True)
    meds = {}
    for name, _ in cuts:
        v = samples[name]
        meds[name] = float(np.median(v)) if v else None
        print(json.dumps({
            "stage": name,
            "median_ms": round(meds[name] * 1e3, 4) if v else None,
            "n": len(v),
            "input_gbps": round(B * L / meds[name] / 1e9, 2) if v else None,
            "batch": B, "max_chars": L,
        }))
    if meds.get("cut3_post") and meds.get("cut5_full"):
        print(json.dumps({
            "stage": "kernels_share_of_pipeline",
            "value": round(meds["cut3_post"] / meds["cut5_full"], 3),
            "note": "qpack+scan+post wall-clock over the full witness "
                    "pipeline (VERDICT r4 #1 done-criterion)",
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
