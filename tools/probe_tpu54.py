"""Hardware check + timing: fused 3-def scan at full batch.

The fused multi-def scan kernel (one kernel, all defs' step circuits)
was measured at config1's small batch (B=512); this validates the
3-header email model (from/to/subject — 3 defs in one RegexDefs vec,
the reference TestCircuit1 pattern) at the full B=32k x 1KB shape:
bit-exact witness columns vs the CPU oracle on sampled rows, then
round-robin timing.
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
from halo2_regex_tpu.ops import reference as refmod
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher
from halo2_regex_tpu.utils.profiling import benchmark_chained

B, L = 32768, 1024
model = zoo.email_headers_model(
    max_chars_size=L, headers=("from", "to", "subject")
)
m = BitplaneMatcher(model, columns="witness")

rng = np.random.default_rng(0)
chars = np.zeros((B, L), np.uint8)
lengths = np.zeros((B,), np.int32)
lines = [
    b"from:alice@gmail.com\r\n",
    b"to:bob@x.yz\r\n",
    b"subject:hello world\r\n",
    b"x-unrelated: nothing\r\n",
]
for i in range(B):
    ln = lines[i % len(lines)]
    chars[i, : len(ln)] = bytearray(ln)
    lengths[i] = len(ln)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)

out = m._run(chars_j, lengths_j)
for i in (0, 1, 2, 3, 17):
    line = bytes(chars[i][: lengths[i]])
    rres = refmod.match_substrs(model.regex_defs, line, L)
    a = np.asarray(out["masked_characters"][i])
    b = np.asarray(rres.masked_characters)
    assert (a == b).all(), (i, line)
    sa = np.asarray(out["states"][i])
    sb = np.asarray(rres.states)
    assert (sa == sb).all(), (i, line)
print("3-def fused witness bit-exact vs oracle on sampled rows", flush=True)


def mk(K):
    @jax.jit
    def f(c):
        o = None
        for _ in range(K):
            o = m.core(c, lengths_j)
            c = c ^ (o["mask"].ravel()[0] & 1).astype(jnp.uint8)
        return o

    return f


best = float("inf")
for rnd in range(3):
    s = benchmark_chained(mk, (chars_j,), ks=(1, 4))
    if s > 1e-7:
        best = min(best, s)
    print(f"r{rnd}: {s*1e3:.3f} ms", flush=True)
print(f"BEST 3-def witness: {best*1e3:.3f} ms  {B*L/best/1e9:.1f} GB/s(in)")
