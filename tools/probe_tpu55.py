"""LC sweep: scan-kernel L-chunk size at B=32k x 1KB (email model).

Default lc=128 runs the scan as grid (1, 8) — eight sequential grid
steps threading carries through scratch.  Larger chunks mean fewer
grid-step overheads but bigger VMEM blocks (plane stack slice is
LC x KP x NT x LANE).  Full-pipeline round-robin, best kept.
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

B, L = 32768, 1024
model = zoo.email_headers_model(max_chars_size=L, headers=("from",))

rng = np.random.default_rng(0)
chars_j = jnp.asarray(rng.integers(32, 127, size=(B, L)).astype(np.uint8))
lengths_j = jnp.asarray(np.full((B,), L - 8, np.int32))


def mk_of(m):
    def mk(K):
        @jax.jit
        def f(c):
            o = None
            for _ in range(K):
                o = m.core(c, lengths_j)
                c = c ^ (o["mask"].ravel()[0] & 1).astype(jnp.uint8)
            return o

        return f

    return mk


cases = []
for lc in (128, 256, 512, 1024):
    m = BitplaneMatcher(model, columns="witness", lc=lc)
    cases.append((lc, mk_of(m), m))

# exactness across lc on hardware
base = cases[0][2]._run(chars_j, lengths_j)
for lc, _, m in cases[1:]:
    o = m._run(chars_j, lengths_j)
    for k in ("states", "all_substr_ids", "flags"):
        assert (np.asarray(o[k]) == np.asarray(base[k])).all(), (lc, k)
print("all lc variants bit-identical", flush=True)

best = {lc: float("inf") for lc, *_ in cases}
for rnd in range(3):
    for lc, mk, _ in cases:
        s = benchmark_chained(mk, (chars_j,), ks=(1, 4))
        if s > 1e-7:
            best[lc] = min(best[lc], s)
        print(f"r{rnd} lc={lc:5d}: {s*1e3:8.3f} ms", flush=True)
for lc, *_ in cases:
    print(f"BEST lc={lc:5d}: {best[lc]*1e3:.3f} ms  {B*L/best[lc]/1e9:.1f} GB/s(in)")
