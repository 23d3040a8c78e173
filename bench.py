#!/usr/bin/env python
"""Headline benchmark — run by the driver on real TPU hardware.

Measures the fused DFA-scan + witness throughput on the email-header corpus
config (BASELINE configs[2]: 4096 padded strings x 1KB, the zk-email
`from:` model) on one chip, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is measured throughput divided by the BASELINE.md target
(80% of the single-chip HBM-bandwidth roofline for the fused witness scan —
the reference publishes no numbers, so the roofline target IS the baseline,
see BASELINE.md).
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


def main() -> int:
    t_start = time.time()
    import jax  # noqa: E402

    from halo2_regex_tpu.models import zoo  # noqa: E402
    from halo2_regex_tpu.utils.profiling import (  # noqa: E402
        benchmark,
        scan_roofline_bytes_per_sec,
    )

    B = int(os.environ.get("H2R_BENCH_BATCH", 4096))
    L = int(os.environ.get("H2R_BENCH_LEN", 1024))
    iters = int(os.environ.get("H2R_BENCH_ITERS", 20))

    model = zoo.email_headers_model(max_chars_size=L, headers=("from",))

    # Synthetic corpus: realistic email-header lines padded to L.
    rng = np.random.default_rng(0)
    chars = np.zeros((B, L), np.uint8)
    lengths = np.zeros((B,), np.int32)
    domains = [b"gmail.com", b"x.yz", b"sub.domain-x.org"]
    for i in range(B):
        name = bytes(rng.choice(list(b"abcdefghijklmnopqrstuvwxyz"), size=8))
        filler_len = int(rng.integers(0, L - 96))
        filler = bytes(rng.choice(list(b"abcdefghijklmnopqrstuvwxyz "), size=filler_len))
        s = filler + b"\r\nfrom:" + name + b"@" + domains[i % 3] + b"\r\n"
        chars[i, : len(s)] = bytearray(s)
        lengths[i] = len(s)

    # Pick the fastest available backend for the fused scan; a Pallas
    # compile failure (e.g. a Mosaic crash on an exotic config) falls back
    # to the XLA path rather than killing the bench.
    chars_j = jax.numpy.asarray(chars)
    lengths_j = jax.numpy.asarray(lengths)
    matcher = None
    backend_name = "xla"
    if jax.devices()[0].platform == "tpu" and not os.environ.get("H2R_BENCH_NO_PALLAS"):
        try:
            from halo2_regex_tpu.ops.pallas_scan import PallasMatcher  # noqa: E402

            matcher = PallasMatcher(model)
            matcher(chars_j[:matcher.batch_tile], lengths_j[:matcher.batch_tile])
            backend_name = "pallas"
        except Exception as e:
            print(f"# pallas backend unavailable ({type(e).__name__}); xla fallback",
                  file=sys.stderr)
            matcher = None
    if matcher is None:
        from halo2_regex_tpu.ops.scan_jax import BatchMatcher  # noqa: E402

        matcher = BatchMatcher(model)

    sec = benchmark(matcher, chars_j, lengths_j, iters=iters, warmup=2)
    value = B * L / sec

    target = 0.8 * scan_roofline_bytes_per_sec()
    result = {
        "metric": "dfa_scan_bytes_per_sec_chip",
        "value": value,
        "unit": "bytes/s",
        "vs_baseline": value / target,
        "backend": backend_name,
        "device": str(jax.devices()[0].device_kind),
        "batch": B,
        "max_chars": L,
        "sec_per_batch": sec,
        "total_runtime_sec": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
