"""A/B witness-emission variants under relay noise (round-robin timing).

Variants, measured interleaved in ONE process (3 rounds, best kept):
  A bytes-mode witness  (post kernel emits value bytes; fused decode)
  B planes witness      (pruned planes + XLA unpack_groups expansion)
  C full columns        (RegexResult set, planes + unpack)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in sys.path:
    sys.path.append("/root/.axon_site")
sys.setrecursionlimit(100_000)

import jax
import jax.numpy as jnp
import numpy as np

from halo2_regex_tpu.models import zoo
from halo2_regex_tpu.utils.profiling import benchmark_chained

B, L = 32768, 1024
model = zoo.email_headers_model(max_chars_size=L, headers=("from",))

from halo2_regex_tpu.ops.bitplane import BitplaneMatcher

mA = BitplaneMatcher(model, columns="witness")
assert mA._bytes_mode
os.environ["H2R_WITNESS_BYTES"] = "0"
mB = BitplaneMatcher(model, columns="witness")
assert not mB._bytes_mode
del os.environ["H2R_WITNESS_BYTES"]
mC = BitplaneMatcher(model)

rng = np.random.default_rng(0)
chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
lengths = np.full((B,), L - 8, np.int32)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)


def mk_of(m):
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


variants = [("A bytes-witness", mk_of(mA)), ("B planes-witness", mk_of(mB)),
            ("C full-columns", mk_of(mC))]
best = {name: float("inf") for name, _ in variants}
t0 = time.time()
for rnd in range(3):
    for name, mk in variants:
        s = benchmark_chained(mk, (chars_j,), ks=(1, 4))
        if s > 1e-7:
            best[name] = min(best[name], s)
        print(f"r{rnd} {name}: {s*1e3:8.3f} ms", flush=True)
for name, _ in variants:
    s = best[name]
    print(f"BEST {name}: {s*1e3:.3f} ms  {B*L/s/1e9:.1f} GB/s(in)")
print("total", round(time.time() - t0, 1), "s")
