"""Batch-scaling probe: witness pipeline at B = 32k / 64k / 128k.

At B=32k the scan kernel's ops are exactly one (8, 128) vreg (NWS=8 =
nws_tile), so the 240-op dependent step chain runs at whatever ILP the
circuit's subtrees give — the profile (probe_tpu50) shows ~1.7 vreg-ops/
ns vs the VPU's ~3-4/ns issue rate.  Larger batches make every op 2-4
vregs (independent work that hides dependency latency) and amortize
fixed per-pass overheads.  Reports GB/s per batch size.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in sys.path:
    sys.path.append("/root/.axon_site")
sys.setrecursionlimit(100_000)

import jax
import jax.numpy as jnp
import numpy as np

from halo2_regex_tpu.models import zoo
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher
from halo2_regex_tpu.utils.profiling import benchmark_chained

L = 1024
model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
m = BitplaneMatcher(model, columns="witness")

rng = np.random.default_rng(0)


def mk_of(m, lengths_j):
    def mk(K):
        @jax.jit
        def f(c):
            out = None
            for _ in range(K):
                out = m.core(c, lengths_j)
                c = c ^ (out["mask"].ravel()[0] & 1).astype(jnp.uint8)
            return out

        return f

    return mk


cases = []
for B in (32768, 65536, 131072):
    chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
    lengths_j = jnp.asarray(np.full((B,), L - 8, np.int32))
    cases.append((B, jnp.asarray(chars), mk_of(m, lengths_j)))

best = {B: float("inf") for B, *_ in cases}
for rnd in range(3):
    for B, chars_j, mk in cases:
        s = benchmark_chained(mk, (chars_j,), ks=(1, 4))
        if s > 1e-7:
            best[B] = min(best[B], s)
        print(f"r{rnd} B={B:6d}: {s*1e3:8.3f} ms", flush=True)
for B, *_ in cases:
    s = best[B]
    print(f"BEST B={B:6d}: {s*1e3:.3f} ms  {B*L/s/1e9:.1f} GB/s(in)")
