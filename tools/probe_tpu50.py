"""Stage-by-stage profile of the witness pipeline at B=32k x 1KB.

Times each stage in isolation (chained K-slope, same process):
  1. raw_quads (XLA transpose+bitcast of the input)
  2. pack kernel (byte-bit extraction + binary class planes)
  3. scan kernel (240-op serial step circuit)
  4. post kernel + XLA decode (tag/FSM + SWAR bytes + fused transpose)
  5. full pipeline (sum check + overheads)

Guides where the next optimization dollar goes.
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
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher, raw_quads
from halo2_regex_tpu.utils.profiling import benchmark_chained

B, L = 32768, 1024
model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
m = BitplaneMatcher(model, columns="witness", en_pack=False, qpack=False)
L_pad = m.L_pad
NWS = B // 32 // 128

rng = np.random.default_rng(0)
chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
lengths = np.full((B,), L - 8, np.int32)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)

quads = jax.jit(lambda c: raw_quads(c, L_pad).reshape(L_pad, 8, NWS, 128))
R = quads(chars_j)
bits_stack = m._make_pack(NWS)(R)


def chain_int(fn, x0):
    def mk(K):
        @jax.jit
        def f(x):
            y = None
            for _ in range(K):
                y = fn(x)
                x = x ^ (y.ravel()[0] & 1).astype(x.dtype)
            return y

        return f

    return mk


def mk_full(K):
    @jax.jit
    def f(c):
        out = None
        for _ in range(K):
            out = m.core(c, lengths_j)
            c = c ^ (out["mask"].ravel()[0] & 1).astype(jnp.uint8)
        return out

    return f


pack_fn = m._make_pack(NWS)
scan_fn = lambda bs: m._make_scan(m.circuits[0], NWS, cls_off=0)(bs)

variants = [
    ("raw_quads ", chain_int(quads, None), (chars_j,)),
    ("pack      ", chain_int(pack_fn, None), (R,)),
    ("scan      ", chain_int(scan_fn, None), (bits_stack,)),
    ("full      ", mk_full, (chars_j,)),
]
best = {name: float("inf") for name, *_ in variants}
for rnd in range(3):
    for name, mk, args in variants:
        s = benchmark_chained(mk, args, ks=(1, 4))
        if s > 1e-7:
            best[name] = min(best[name], s)
        print(f"r{rnd} {name}: {s*1e3:8.3f} ms", flush=True)
for name, *_ in variants:
    s = best[name]
    print(f"BEST {name}: {s*1e3:.3f} ms  {B*L/s/1e9:.1f} GB/s(in-equiv)")
