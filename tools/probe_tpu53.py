"""XLA-tail micro-probe: the witness pipeline's non-kernel half.

benchmarks/stages.py shows kernels at ~0.91 ms vs 1.85 ms full — the
XLA decode/tail costs as much as all Pallas kernels together.  This
times the suspect tail ops standalone at B=32k, L=1024:

  final-state read:  take_along_axis gather  vs  masked-sum reduction
  states assembly:   concat + where (current form)
  masked chars:      flags&1 * chars
  decode:            the two field-column transposes

to find where the ~0.9 ms actually goes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in sys.path:
    sys.path.append("/root/.axon_site")

import jax
import jax.numpy as jnp
import numpy as np

from halo2_regex_tpu.utils.profiling import benchmark_chained

B, L = 32768, 1024
rng = np.random.default_rng(0)
raw = jnp.asarray(rng.integers(0, 24, size=(B, 1, L + 1), dtype=np.int64).astype(np.uint8))
lengths = jnp.asarray(np.full((B,), L - 8, np.int32))
flags = jnp.asarray(rng.integers(0, 64, size=(B, L), dtype=np.int64).astype(np.uint8))
chars = jnp.asarray(rng.integers(32, 127, size=(B, L), dtype=np.int64).astype(np.uint8))
# packed byte-lane words as the decode input (one field group)
NWS = B // 32 // 128
g4 = jnp.asarray(
    rng.integers(-(2**31), 2**31 - 1, size=(NWS, 8, L, 128), dtype=np.int64).astype(np.int32)
)


def t_gather(x):
    idx = lengths[:, None, None].astype(jnp.int32)
    return jnp.take_along_axis(x, idx, axis=2)[:, :, 0].astype(jnp.int32)


def t_masked_sum(x):
    posL1 = jnp.arange(L + 1, dtype=jnp.int32)
    onehot = (posL1[None, None, :] == lengths[:, None, None]).astype(jnp.uint8)
    return (x * onehot).sum(axis=2, dtype=jnp.int32)


def t_states(x):
    posL1 = jnp.arange(L + 1, dtype=jnp.int32)
    in_range = posL1[None, None, :] <= lengths[:, None, None]
    return jnp.where(in_range, x, jnp.uint8(23))


def t_masked_chars(f):
    return (f & 1) * chars


def t_decode(g):
    u8 = jax.lax.bitcast_convert_type(g, jnp.uint8)  # [NWS, 8, L, 128, 4]
    return u8.transpose(1, 0, 3, 4, 2).reshape(B, L)


# correctness: gather == masked-sum
a = np.asarray(jax.jit(t_gather)(raw))
b = np.asarray(jax.jit(t_masked_sum)(raw))
assert (a == b).all()
print("gather == masked-sum", flush=True)


def chain(fn, xdtype=None):
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


cases = [
    ("final gather    ", chain(t_gather), (raw,)),
    ("final masked-sum", chain(t_masked_sum), (raw,)),
    ("states where    ", chain(t_states), (raw,)),
    ("masked chars    ", chain(t_masked_chars), (flags,)),
    ("decode transpose", chain(t_decode), (g4,)),
]
best = {n: float("inf") for n, *_ in cases}
for rnd in range(3):
    for n, mk, a in cases:
        s = benchmark_chained(mk, a, ks=(1, 4))
        if s > 1e-7:
            best[n] = min(best[n], s)
        print(f"r{rnd} {n}: {s*1e3:8.3f} ms", flush=True)
for n, *_ in cases:
    print(f"BEST {n}: {best[n]*1e3:.3f} ms")
