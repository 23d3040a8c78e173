"""Timing, roofline accounting and device specs.

The reference has no profiling (SURVEY §5.1: a silent `log` facade and one
CircuitCost print); here throughput measurement and roofline targets are
first-class — BASELINE.md sets the single-chip target as a fraction of the
HBM-bandwidth roofline.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax


# Peak specs per chip. HBM BW in bytes/s, compute in FLOP/s (bf16).
_DEVICE_SPECS: Dict[str, Dict[str, float]] = {
    "TPU v5 lite": {"hbm_gbps": 819e9, "bf16_flops": 197e12, "int8_ops": 394e12},
    "TPU v5e": {"hbm_gbps": 819e9, "bf16_flops": 197e12, "int8_ops": 394e12},
    "TPU v5p": {"hbm_gbps": 2765e9, "bf16_flops": 459e12, "int8_ops": 918e12},
    "TPU v4": {"hbm_gbps": 1228e9, "bf16_flops": 275e12, "int8_ops": 275e12},
    "TPU v6e": {"hbm_gbps": 1640e9, "bf16_flops": 918e12, "int8_ops": 1836e12},
    "cpu": {"hbm_gbps": 50e9, "bf16_flops": 1e12, "int8_ops": 2e12},
}


def device_specs(device=None) -> Dict[str, float]:
    d = device if device is not None else jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu")
    for key, spec in _DEVICE_SPECS.items():
        if key.lower() in str(kind).lower():
            return dict(spec, kind=str(kind))
    return dict(_DEVICE_SPECS["cpu"], kind=str(kind))


@dataclass
class ScanTraffic:
    """Minimum HBM traffic per input byte for the fused witness scan.

    A speed-of-light fused kernel reads each input byte once and writes the
    compact witness row for it: masked char (1B) + substr id (1B) + state
    (2B) + packed flags (1B) ≈ 5B out, 1B in. The transition tables are
    VMEM-resident (read once per kernel, amortized to ~0)."""

    bytes_in_per_byte: float = 1.0
    bytes_out_per_byte: float = 5.0

    @property
    def total(self) -> float:
        return self.bytes_in_per_byte + self.bytes_out_per_byte


def scan_roofline_bytes_per_sec(device=None, traffic: Optional[ScanTraffic] = None) -> float:
    """Input-bytes/sec at the HBM roofline for the fused witness scan."""
    spec = device_specs(device)
    t = traffic or ScanTraffic()
    return spec["hbm_gbps"] / t.total


def result_nbytes(result) -> int:
    """Total bytes of every materialized array in a witness result (the
    emitted witness traffic — BASELINE's witness-rows metric measures this
    against the ScanTraffic model rather than assuming it)."""
    total = 0
    if hasattr(result, "astuple"):
        result = list(result.astuple())
    for leaf in jax.tree.leaves(result):
        n = getattr(leaf, "nbytes", None)
        if n is None:
            import numpy as np

            n = np.asarray(leaf).nbytes
        total += int(n)
    return total


def _fetch(out):
    """Force a real host fetch. On tunneled/relayed devices
    ``block_until_ready`` may resolve before remote execution completes, so
    timing must transfer (a small piece of) the result to the host."""
    import numpy as np

    leaves = jax.tree.leaves(out)
    return np.asarray(leaves[0].ravel()[:1]) if leaves else None


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Seconds per call, synchronized by fetching a result element each
    iteration (see _fetch). NOTE: on relayed devices each fetch costs a
    fixed round trip (~30 ms here) — use :func:`benchmark_chained` for
    per-call device time."""
    for _ in range(warmup):
        out = fn(*args)
        _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _fetch(out)
    return (time.perf_counter() - t0) / iters


def benchmark_chained(
    make_chained: Callable[[int], Callable], args, ks=(1, 8), warmup: int = 1
) -> float:
    """Per-iteration device time via dependency chaining.

    ``make_chained(K)`` must return a jitted fn running K data-dependent
    iterations of the workload in ONE call. Timing t(K_hi) - t(K_lo)
    divided by (K_hi - K_lo) cancels both the host round-trip latency and
    the per-call dispatch cost (neither can be measured away on a relayed
    device whose block_until_ready does not block)."""
    k_lo, k_hi = ks
    f_lo, f_hi = make_chained(k_lo), make_chained(k_hi)
    for f in (f_lo, f_hi):
        for _ in range(warmup):
            _fetch(f(*args))
    def t(f, n=5):
        t0 = time.perf_counter()
        for _ in range(n):
            _fetch(f(*args))
        return (time.perf_counter() - t0) / n
    return max((t(f_hi) - t(f_lo)) / (k_hi - k_lo), 1e-9)
