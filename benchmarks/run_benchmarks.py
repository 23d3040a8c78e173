"""Benchmark suite — the five BASELINE.json configs as runnable benchmarks.

    python benchmarks/run_benchmarks.py [--configs 0 1 2 ...] [--quick]

Config 0: regex1 single-def match, CPU-friendly (interpret/jit) — byte-exact
          state sequence check.
Config 1: regex1-3 + substr1-3 combined extraction over padded 1KB strings.
Config 2: email-header corpus, batch=4096x1KB, fused scan on one chip.
Config 3: large-DFA stress: 1K-state table, 64KB inputs.
Config 4: multi-device scaling: data-parallel corpus shards, psum-reduced
          counts, efficiency vs single device (virtual CPU mesh or real
          multi-chip when available).

Each benchmark prints one JSON line with bytes/sec and witness rows/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in sys.path:
    sys.path.append("/root/.axon_site")
sys.setrecursionlimit(100_000)

import numpy as np


_OUT = None  # set by --out: tee every result line to a jsonl artifact


def _report(name, **kw):
    line = json.dumps({"benchmark": name, **kw})
    print(line, flush=True)
    if _OUT is not None:
        _OUT.write(line + "\n")
        _OUT.flush()


def _best_matcher(model, batch=0):
    """Bit-sliced bitplane pipeline on TPU (the fast path for synthesizable
    DFAs), then the fused split Pallas kernels, then the XLA scan."""
    from halo2_regex_tpu.ops import best_matcher

    backend = "auto"
    if os.environ.get("H2R_BENCH_NO_BITPLANE"):
        backend = "pallas"
    return best_matcher(model, backend=backend)


def _throughput(matcher, chars, lengths, iters, with_estimator=False):
    """Per-batch device time via the K-outputs slope (relay-safe: inputs
    uploaded once, results fetched as a scalar; see
    utils.profiling.benchmark_chained and docs/PERF.md on why naive loops
    mis-measure here).

    DCE-proof (round 3): every iteration's FULL output pytree is returned
    from the jit, so XLA materializes all witness columns each iteration
    (the old mask-only chain let XLA dead-code-eliminate the rest), and
    lengths are perturbed per iteration so length-derived work is not
    loop-hoisted.  ``with_estimator`` additionally returns which estimator
    produced the number: "k_slope" (the real measurement) or "k_avg"
    (fetch-dominated fallback after three non-positive slopes — a much
    worse, upper-bound estimator)."""
    import jax
    import jax.numpy as jnp

    chars_j = jnp.asarray(chars)  # keeps dtype: u8 chars or i32 tiled words
    lengths_j = jnp.asarray(lengths, jnp.int32)

    def make(K):
        @jax.jit
        def f(c, ln):
            outs = []
            for i in range(K):
                outs.append(matcher._run(c ^ np.uint8(i), ln ^ i))
            return outs

        return f

    K = max(2, min(iters, 5))
    f1, fk = make(1), make(K)
    for f in (f1, fk):
        np.asarray(jax.tree.leaves(f(chars_j, lengths_j))[0].ravel()[:1])

    def t(f, n=4):
        t0 = time.perf_counter()
        for _ in range(n):
            np.asarray(jax.tree.leaves(f(chars_j, lengths_j))[0].ravel()[:1])
        return (time.perf_counter() - t0) / n

    # Relay noise can make the K-slope non-positive (the K=1 window ran
    # contended, the K window didn't); retry a few times and fall back to
    # the raw K-run average rather than reporting a nonsense slope.
    # NOTE: do NOT bound the slope against t(fk)/K — the average is
    # dominated by the fixed ~30 ms relay fetch, so genuine slopes sit
    # far below it (that asymmetry is the whole point of the K-slope).
    for _ in range(3):
        slope = (t(fk) - t(f1)) / (K - 1)
        if slope > 1e-7:
            return (slope, "k_slope") if with_estimator else slope
    dt = t(fk) / K
    return (dt, "k_avg") if with_estimator else dt


def bench0(quick):
    """regex1 over an example input: byte-exact state sequence."""
    from fixtures_bench import regex1_model

    from halo2_regex_tpu.ops import reference as ref_ops
    from halo2_regex_tpu.ops.scan_jax import BatchMatcher, pack_batch

    model = regex1_model(max_chars_size=128)
    matcher = BatchMatcher(model)
    s = b"email was meant for @vitalik. Also for pooja."
    res = matcher.match_one(s)
    oracle = ref_ops.match_substrs(model.regex_defs, s, 128)
    exact = bool(
        (np.asarray(res.states) == oracle.states).all()
        and (np.asarray(res.all_substr_ids) == oracle.all_substr_ids).all()
    )
    _report("config0_regex1_exactness", byte_exact=exact, match_ok=bool(res.match_ok))


def bench1(quick):
    """Three defs at once (regex1+2+3), 1KB padded strings."""
    from fixtures_bench import combined_model

    model = combined_model(max_chars_size=1024)
    matcher, backend = _best_matcher(model)
    B = 64 if quick else 512
    rng = np.random.default_rng(0)
    chars = np.zeros((B, 1024), np.uint8)
    base = b"email was meant for @abc. Also for xyz."
    for i in range(B):
        chars[i, : len(base)] = bytearray(base)
    lengths = np.full((B,), len(base), np.int32)
    dt, est = _throughput(
        matcher, chars, lengths, iters=3 if quick else 10, with_estimator=True
    )
    from halo2_regex_tpu.utils.profiling import result_nbytes

    nbytes = result_nbytes(matcher(chars, lengths))
    _report(
        "config1_combined_extraction", backend=backend, batch=B,
        bytes_per_sec=B * 1024 / dt, estimator=est,
        witness_rows_per_sec=B * 1024 / dt,
        witness_bytes_per_sec=nbytes / dt,
        witness_bytes_per_input_byte=nbytes / (B * 1024),
        sec_per_batch=dt,
    )


def bench2(quick):
    """Email corpus: 4096 x 1KB fused scan."""
    from halo2_regex_tpu.models import zoo

    model = zoo.email_headers_model(max_chars_size=1024, headers=("from",))
    matcher, backend = _best_matcher(model)
    # the bitplane backend packs 32 strings/lane and wants >=32k strings to
    # fill the VPU; the older kernels are insensitive to batch beyond 4096
    B = 256 if quick else (32768 if backend == "bitplane" else 4096)
    rng = np.random.default_rng(0)
    chars = rng.integers(32, 127, size=(B, 1024)).astype(np.uint8)
    lengths = np.full((B,), 1024, np.int32)
    # Same sampling discipline as the headline bench.py: several K-slope
    # samples across spread-out windows, median reported (with best and
    # the sample list), so the two artifacts are directly comparable.
    n_reps = 2 if quick else int(os.environ.get("H2R_SUITE_REPEATS", 6))
    gap = 0 if quick else float(os.environ.get("H2R_SUITE_GAP_SEC", 10))
    samples = []
    est = "k_slope"
    for rep in range(n_reps):
        dt, e = _throughput(
            matcher, chars, lengths, iters=3 if quick else 5,
            with_estimator=True,
        )
        if e == "k_slope":
            samples.append(dt)
        if gap and rep < n_reps - 1:
            time.sleep(gap)
    if not samples:
        est = "k_avg"
        samples = [dt]
    dt = float(np.median(samples))
    from halo2_regex_tpu.utils.profiling import result_nbytes

    nbytes = result_nbytes(matcher(chars, lengths))
    _report(
        "config2_email_corpus", backend=backend, batch=B,
        bytes_per_sec=B * 1024 / dt, estimator=est,
        noise_band_ms=[
            round(float(np.percentile(samples, 25)) * 1e3, 3),
            round(float(np.percentile(samples, 75)) * 1e3, 3),
        ],
        n_samples=len(samples),
        samples_ms=[round(x * 1e3, 3) for x in samples],
        witness_rows_per_sec=B * 1024 / dt,
        witness_bytes_per_sec=nbytes / dt,
        witness_bytes_per_input_byte=nbytes / (B * 1024),
        sec_per_batch=dt,
    )

    # Match-only serving throughput (round 3): the corpus-filtering
    # pipeline — no witness decode, ~2.8 B/byte HBM traffic.
    if backend == "bitplane":
        try:
            from halo2_regex_tpu.ops.bitplane import BitplaneMatcher

            mm = BitplaneMatcher(model, columns="match")
            dtm, estm = _throughput(
                mm, chars, lengths, iters=3 if quick else 5,
                with_estimator=True,
            )
            _report(
                "config2_match_only", backend="bitplane", batch=B,
                bytes_per_sec=B * 1024 / dtm, estimator=estm,
                sec_per_batch=dtm,
            )
        except Exception as e:
            _report(
                "config2_match_only",
                error=f"{type(e).__name__}: {str(e)[:160]}",
            )

    # Extraction serving (round 3): scan + device-side compact run
    # extraction (the examples/corpus_scan.py configuration) — only the
    # (offset, len, id, bytes, match_ok) records leave the chip, so the
    # unused witness columns are legitimately DCE'd.
    if backend == "bitplane":
        try:
            from halo2_regex_tpu.ops.bitplane import BitplaneMatcher
            from halo2_regex_tpu.ops.extract import extract_runs

            dte, este = _throughput(
                _extract_serving(
                    BitplaneMatcher(model, columns="full"), extract_runs
                ),
                chars, lengths, iters=3 if quick else 5,
                with_estimator=True,
            )
            _report(
                "config2_extract_serving", backend="bitplane", batch=B,
                bytes_per_sec=B * 1024 / dte, estimator=este,
                sec_per_batch=dte, max_runs=4, max_len=32,
            )
        except Exception as e:
            _report(
                "config2_extract_serving",
                error=f"{type(e).__name__}: {str(e)[:160]}",
            )

    # Tiled input contract (round 5, docs/ROADMAP.md item 2): identical
    # witness/match emission from the host-pretiled corpus buffer
    # (corpus-controlled callers: ScanJob/CLI pack during collation).
    # The pack kernel reads fully contiguous blocks and masked chars are
    # assembled in the post kernel, so the [B, L] u8 strided read and
    # the XLA mask*chars pass both disappear.
    if backend == "bitplane":
        try:
            from halo2_regex_tpu.ops.bitplane import (
                BitplaneMatcher,
                tile_corpus,
            )

            mtw = BitplaneMatcher(
                model, columns="witness", input_layout="tiled"
            )
            tiled = tile_corpus(chars, mtw.L_pad)
            for name, mkm in (
                ("config2_tiled_witness", mtw),
                (
                    "config2_tiled_match_only",
                    BitplaneMatcher(
                        model, columns="match", input_layout="tiled"
                    ),
                ),
            ):
                dtt, estt = _throughput(
                    mkm, tiled, lengths, iters=3 if quick else 5,
                    with_estimator=True,
                )
                _report(
                    name, backend="bitplane", batch=B,
                    bytes_per_sec=B * 1024 / dtt, estimator=estt,
                    sec_per_batch=dtt, input_layout="tiled",
                )
        except Exception as e:
            _report(
                "config2_tiled", error=f"{type(e).__name__}: {str(e)[:160]}"
            )

    # Latency regime (round 5, VERDICT r4 #8): the B=4096 serving shapes.
    # Marker streams won 3x here but cannot emit witness columns; the
    # documented low-latency modes are match-only filtering and the
    # extract-serving path (witness scan + on-device compact runs).
    if backend == "bitplane" and not quick and B != 4096:
        from halo2_regex_tpu.ops.bitplane import BitplaneMatcher
        from halo2_regex_tpu.ops.extract import extract_runs

        c4, l4 = chars[:4096], lengths[:4096]
        for name, mk_matcher in (
            (
                "config2_latency_b4096_match_only",
                lambda: BitplaneMatcher(model, columns="match"),
            ),
            (
                "config2_latency_b4096_extract_serving",
                lambda: _extract_serving(
                    BitplaneMatcher(model, columns="full"), extract_runs
                ),
            ),
        ):
            try:
                m4 = mk_matcher()
                dt4, est4 = _throughput(
                    m4, c4, l4, iters=5, with_estimator=True
                )
                _report(
                    name, backend="bitplane", batch=4096,
                    latency_ms=round(dt4 * 1e3, 4),
                    bytes_per_sec=4096 * 1024 / dt4, estimator=est4,
                )
            except Exception as e:
                _report(name, error=f"{type(e).__name__}: {str(e)[:160]}")


def _extract_serving(mf, extract_runs, max_runs=4, max_len=32):
    """Scan + device-side compact run extraction: only the
    (offset, len, id, bytes, match_ok) records leave the chip."""

    class _ExtractServing:
        @staticmethod
        def _run(c, ln):
            out = mf.core(c, ln)
            rec = extract_runs(
                out["all_substr_ids"],
                out["masked_characters"],
                max_runs=max_runs,
                max_len=max_len,
            )
            rec["match_ok"] = out["match_ok"]
            return rec

    return _ExtractServing


def bench3(quick):
    """Large-DFA stress: ~1K-state synthetic table, long inputs."""
    import jax.numpy as jnp

    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.models.defs import AllstrRegexDef, RegexDefs
    from halo2_regex_tpu.ops.scan_jax import BatchMatcher

    rng = np.random.default_rng(0)
    S = 1000
    L = 8192 if quick else 65536
    # synthetic dense DFA over the printable alphabet
    allstr = AllstrRegexDef(first_state_val=0, accepted_state_val=1,
                            largest_state_val=S - 1)
    line = 3
    for c in range(32, 127):
        for s in range(S):
            allstr.state_lookup[(c, s)] = (line, int(rng.integers(0, S)))
            line += 1
    model = CompiledRegexModel.from_defs(
        [RegexDefs(allstr=allstr, substrs=[])], max_chars_size=L
    )
    import jax

    matcher, backend = None, "xla"
    if jax.devices()[0].platform == "tpu":
        try:
            from halo2_regex_tpu.ops.pallas_scan import PallasMatcher

            matcher, backend = PallasMatcher(model, max_pairs=4096), "pallas"
        except Exception:
            matcher = None
    if matcher is None:
        matcher = BatchMatcher(model)
    # B=16 x 64KB = 1 MB/batch drowns in the relay's ~30 ms fetch noise
    # (a noisy slope once read 28 GB/s here); 4 MB batches + K=4 keep the
    # chained slope meaningful.
    B = 4 if quick else 64
    chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
    lengths = np.full((B,), L, np.int32)
    dt, est = _throughput(matcher, chars, lengths, iters=4, with_estimator=True)
    _report(
        "config3_large_dfa_stress", backend=backend, n_states=S, input_len=L,
        bytes_per_sec=B * L / dt, sec_per_batch=dt, estimator=est,
    )

    # Structured ~1K-state stress: a 200-word dictionary alternation whose
    # DFA has ~930 live states synthesizes under the bitplane budget
    # (~3.3k step ops) and runs the bit-sliced path — the realistic
    # large-model shape, vs the adversarially random table above which
    # only the segmented split kernels can scan.
    import jax

    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig

    rng = np.random.default_rng(1)
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = sorted(
        {
            "".join(letters[i] for i in rng.integers(0, 26, int(rng.integers(5, 9))))
            for _ in range(200)
        }
    )
    cfg = DecomposedRegexConfig.from_json(
        {
            "max_byte_size": 1024,
            "parts": [
                {"is_public": False, "regex_def": "tag:", "max_size": 4},
                {"is_public": False, "regex_def": "(" + "|".join(words) + ")",
                 "max_size": 16},
                {"is_public": False, "regex_def": "\r\n", "max_size": 2},
            ],
        }
    )
    smodel = CompiledRegexModel.from_decomposed([cfg], max_chars_size=1024)
    Bs = 4096 if quick else 32768
    schars = rng.integers(32, 127, size=(Bs, 1024)).astype(np.uint8)
    slengths = np.full((Bs,), 1024, np.int32)
    sm, sbackend = None, None
    if jax.devices()[0].platform == "tpu":
        try:
            from halo2_regex_tpu.ops.bitplane import BitplaneMatcher

            # unroll=4 is the accepted per-construction setting for
            # big circuits (probe62 E: isolated scan kernel 2.04 ->
            # 1.40 ms on this model; no effect on small circuits, so
            # the global default stays 1)
            sm, sbackend = (
                BitplaneMatcher(smodel, columns="witness", unroll=4),
                "bitplane",
            )
        except Exception:
            pass
    if sm is None:
        sm, sbackend = BatchMatcher(smodel), "xla"
    sdt, sest = _throughput(sm, schars, slengths, iters=3, with_estimator=True)
    n_live = (
        len(sm.circuits[0].live_states) if sbackend == "bitplane" else S
    )
    _report(
        "config3_structured_stress", backend=sbackend, n_live_states=n_live,
        input_len=1024, batch=Bs, bytes_per_sec=Bs * 1024 / sdt,
        sec_per_batch=sdt, estimator=sest,
        unroll=4 if sbackend == "bitplane" else None,
    )


def bench4(quick):
    """Data-parallel scaling efficiency across the device mesh.

    On a single real device (the driver's one-chip relay), the honest
    proxy is NOT a devices=1 tautology: this re-executes itself in a
    clean subprocess on a virtual 8-device CPU mesh and reports that
    sweep (real multi-chip scaling remains unmeasurable here — BASELINE's
    2-host target needs hardware; SCALING.md documents the gap)."""
    import jax

    n = len(jax.devices())
    if n == 1:
        if os.environ.get("H2R_CONFIG4_CHILD"):
            # the virtual-mesh child still saw one device (e.g. a
            # conflicting XLA_FLAGS device count): report rather than
            # self-spawn forever
            _report(
                "config4_scaling",
                error="virtual-mesh child saw a single device; check "
                "XLA_FLAGS for a conflicting "
                "xla_force_host_platform_device_count",
            )
            return
        import re as _re
        import subprocess

        env = dict(os.environ)
        env["H2R_CONFIG4_CHILD"] = "1"
        # the axon sitecustomize must NOT leak into the child: it overrides
        # JAX_PLATFORMS and grabs the (single) TPU tunnel, hanging both
        env["PYTHONPATH"] = os.pathsep.join(
            p
            for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p
        )
        env["JAX_PLATFORMS"] = "cpu"
        # force 8 virtual devices, REPLACING any existing count
        xla = _re.sub(
            r"--xla_force_host_platform_device_count=\d+",
            "",
            env.get("XLA_FLAGS", ""),
        ).strip()
        env["XLA_FLAGS"] = (
            xla + " --xla_force_host_platform_device_count=8"
        ).strip()
        cmd = [sys.executable, os.path.abspath(__file__), "--configs", "4"]
        if quick:
            cmd.append("--quick")
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=3600
        )
        passed = False
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
                passed = True
        if not passed:
            _report(
                "config4_scaling",
                error=f"virtual-mesh subprocess failed: {out.stderr[-200:]}",
            )
        return

    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.ops.scan_jax import BatchMatcher
    from halo2_regex_tpu.parallel.data_parallel import DistributedMatcher
    from halo2_regex_tpu.parallel.mesh import make_mesh

    model = zoo.email_headers_model(max_chars_size=256, headers=("from",))
    bm = BatchMatcher(model)
    mesh = make_mesh()
    dm = DistributedMatcher(model, mesh)
    virtual = jax.devices()[0].platform == "cpu"
    rng = np.random.default_rng(0)

    # Sweep per-shard batch shapes: shard_map overhead amortizes with
    # shard size, so the efficiency CURVE is the honest artifact
    # (VERDICT r2: one tiny shape said only overhead_efficiency=0.24).
    shard_shapes = [16, 64, 256] if quick else [64, 256, 1024]
    sweep = []
    for b_shard in shard_shapes:
        B = b_shard * n
        chars = rng.integers(32, 127, size=(B, 256)).astype(np.uint8)
        lengths = np.full((B,), 256, np.int32)
        # single device, one shard's worth (the real-hardware scaling
        # metric: n chips should do n shards in the time one does one)
        single_shard = _throughput(
            bm, chars[: B // n], lengths[: B // n], iters=5
        )
        # single device, the FULL batch (the virtual-mesh metric: on
        # host-CPU virtual devices all "chips" share the same cores, so
        # the only honest figure is parallelization overhead — same total
        # work, mesh vs not)
        single_full = _throughput(bm, chars, lengths, iters=5)

        def run(c, l):
            r, _ = dm(c, l)
            return r

        out = run(chars, lengths)
        jax.block_until_ready(out.mask)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = run(chars, lengths)
        jax.block_until_ready(out.mask)
        multi = (time.perf_counter() - t0) / iters
        sweep.append(
            dict(
                batch_per_shard=b_shard,
                single_shard_sec=single_shard,
                single_full_sec=single_full,
                full_mesh_sec=multi,
                efficiency_vs_single_shard=single_shard / multi,
                overhead_efficiency=single_full / multi,
                bytes_per_sec=B * 256 / multi,
            )
        )
    _report(
        "config4_scaling",
        devices=n,
        virtual_mesh=virtual,
        sweep=sweep,
        # headline row: the largest shard shape (closest to production)
        **{
            k: sweep[-1][k]
            for k in (
                "efficiency_vs_single_shard",
                "overhead_efficiency",
                "bytes_per_sec",
            )
        },
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, nargs="*", default=[0, 1, 2, 3, 4])
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", type=str, default=None,
                    help="tee result JSON lines to this .jsonl artifact "
                         "(benchmarks/RESULTS_r{N}.jsonl each round)")
    args = ap.parse_args()
    if args.out:
        global _OUT
        _OUT = open(args.out, "a")
        _OUT.write(json.dumps({
            "benchmark": "_meta",
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "configs": args.configs,
            "quick": bool(args.quick),
        }) + "\n")
    # Honor an explicit cpu request before the backend initializes —
    # TPU-attached sitecustomize hooks otherwise force their platform.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from halo2_regex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    benches = [bench0, bench1, bench2, bench3, bench4]
    for i in args.configs:
        try:
            benches[i](args.quick)
        except Exception as e:
            _report(f"config{i}", error=f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
