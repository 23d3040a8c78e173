"""Stage breakdown of the bitplane WITNESS pipeline at B=32k (round 2+).

Chained timings of cumulative pipeline prefixes on hardware:
  pack | +scan | +post | +unpack | full witness run
Differences localize the cost. Run: python tools/probe_tpu40.py
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
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher, raw_quads, unpack_groups
from halo2_regex_tpu.utils.profiling import benchmark_chained

B, L = 32768, 1024
model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
m = BitplaneMatcher(model, columns="witness", en_pack=False, qpack=False)

rng = np.random.default_rng(0)
chars = rng.integers(32, 127, size=(B, L), dtype=np.uint8)
lengths = np.full((B,), L - 8, np.int32)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)

NW = B // 32
NWS = NW // 128
L_pad = m.L_pad
circ = m.circuits[0]


def dep_of(x):
    return (x.ravel()[0] & 1).astype(jnp.uint8)


def stage_pack(c):
    R = raw_quads(c, L_pad).reshape(L_pad, 8, NWS, 128)
    return m._make_pack(NWS)(R)


def stage_scan(c):
    bits = stage_pack(c)
    return m._make_scan(circ, NWS)(bits)


def make_en(lengths):
    len_wb = lengths.reshape(8, NW, 4).transpose(1, 2, 0).reshape(NWS, 128, 32)
    beta = jnp.arange(32, dtype=jnp.int32)
    en_bits = (
        jnp.arange(L_pad, dtype=jnp.int32)[None, :, None, None] < len_wb[:, None]
    ).astype(jnp.int32) << beta
    return en_bits.sum(-1, dtype=jnp.int32)


def stage_post(c):
    # in bytes mode the post kernel emits byte-packed value words directly
    logs = stage_scan(c)
    en = make_en(lengths_j)
    return m._make_post(NWS)(logs, en[:, None])


def stage_unpack(c):
    # bytes-mode finalize: bitcast + transpose + field split
    g4 = stage_post(c)
    G = len(m._wgroups)
    u8 = jax.lax.bitcast_convert_type(
        g4.reshape(NWS, G, 8, L_pad, 128)[:, :, :, :L], jnp.uint8
    )
    gv = u8.transpose(1, 2, 0, 4, 5, 3).reshape(G, B, L)
    vals = {}
    for gi, grp in enumerate(m._wgroups):
        for name, off_b, nb in grp:
            vals[name] = (gv[gi] >> off_b) & ((1 << nb) - 1)
    return vals["flags"], vals["masked_idsum"], vals["states0"]


def timeit(name, fn, pick):
    def mk(K):
        @jax.jit
        def f(c):
            out = None
            for _ in range(K):
                out = fn(c)
                c = c ^ dep_of(pick(out))
            return out

        return f

    secs = []
    for _ in range(3):
        s = benchmark_chained(mk, (chars_j,), ks=(1, 4))
        if s > 1e-7:
            secs.append(s)
    best = min(secs) if secs else float("nan")
    print(f"{name:24s} {best*1e3:8.3f} ms  {B*L/best/1e9:8.2f} GB/s(in)",
          flush=True)
    return best


t0 = time.time()
timeit("pack", stage_pack, lambda o: o)
timeit("pack+scan", stage_scan, lambda o: o)
timeit("pack+scan+post", stage_post, lambda o: o)
timeit("pack+scan+post+unpack", stage_unpack, lambda o: o[0])
timeit("full witness run", lambda c: m.core(c, lengths_j), lambda o: o["mask"])
m2 = BitplaneMatcher(model)
timeit("full-columns run", lambda c: m2.core(c, lengths_j), lambda o: o["mask"])
print("total", round(time.time() - t0, 1), "s")
