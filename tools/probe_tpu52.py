"""Follow-up to probe_tpu51: does widening the scan ops (nws_tile) fix
the superlinear large-batch slowdown?

probe_tpu51 showed B=64k at 2.9x the time of B=32k and B=128k at 6.4x —
but NT = min(nws_tile=8, NWS) never widened the per-op shape, so larger
batches only added sequential grid steps.  This probes B=128k with
nws_tile 8 vs 16 (nt=32 OOMs the 100 MB scoped-vmem limit in the pack
kernel), B=32k control.
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
for B, nt in ((32768, 8), (131072, 8), (131072, 16)):
    m = BitplaneMatcher(model, columns="witness", nws_tile=nt)
    chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
    lengths_j = jnp.asarray(np.full((B,), L - 8, np.int32))
    cases.append((f"B={B} nt={nt}", B, jnp.asarray(chars), mk_of(m, lengths_j)))

best = {name: float("inf") for name, *_ in cases}
for rnd in range(3):
    for name, B, chars_j, mk in cases:
        s = benchmark_chained(mk, (chars_j,), ks=(1, 4))
        if s > 1e-7:
            best[name] = min(best[name], s)
        print(f"r{rnd} {name}: {s*1e3:8.3f} ms", flush=True)
for name, B, *_ in cases:
    s = best[name]
    print(f"BEST {name}: {s*1e3:.3f} ms  {B*L/s/1e9:.1f} GB/s(in)")
