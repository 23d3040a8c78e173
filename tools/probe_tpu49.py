"""A/B: direct [B, L]-major witness emission vs SWAR bytes + XLA decode.

The direct post kernel writes one l4-packed int32 array per witness field
whose [B, L] uint8 view is a zero-copy bitcast+reshape — the XLA decode
pass over the whole witness set disappears (probe_tpu48 measured the
transform standalone at 0.223 vs 0.562 ms per 34 MB field column).
Round-robin, best kept.  B=32k x 1KB email model, witness columns.
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
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher
from halo2_regex_tpu.utils.profiling import benchmark_chained

B, L = 32768, 1024
model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
os.environ["H2R_EMIT"] = "direct"
mD = BitplaneMatcher(model, columns="witness")
os.environ["H2R_EMIT"] = "bytes"
mB = BitplaneMatcher(model, columns="witness")
del os.environ["H2R_EMIT"]
assert mD._emit == "direct" and mB._emit == "bytes"

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


# correctness cross-check on hardware first
a = mD._run(chars_j, lengths_j)
b = mB._run(chars_j, lengths_j)
for k in ("states", "all_substr_ids", "masked_characters", "flags", "match_ok"):
    assert (np.asarray(a[k]) == np.asarray(b[k])).all(), k
print("direct == bytes on hardware", flush=True)

variants = [("A direct   ", mk_of(mD)), ("B swar+xla ", mk_of(mB))]
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
