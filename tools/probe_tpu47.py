"""Probe: in-kernel (LC, LANE) tile transpose vs XLA transpose.

Motivation: the witness pipeline's last stage is an XLA
transpose+shift+mask of the post kernel's packed byte-lane output into
final [B, L] columns — a full read+write pass over the ~160 MB witness
set (~320 MB of HBM traffic at B=32k).  If the post kernel can write
[B, L]-major directly (transposing (positions, lanes) tiles in VMEM),
that pass disappears.  This measures whether Mosaic's in-kernel
transpose is fast enough to be worth it, on one witness-column-sized
array.

Shapes: X [NWS=8, M=8, L=1024, LANE=128] int32 (33.5 MB — one packed
witness column; 4 string-bytes per word) -> Y [NWS, M, LANE, L].
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in sys.path:
    sys.path.append("/root/.axon_site")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_regex_tpu.utils.profiling import benchmark_chained

NWS, M, L, LANE = 8, 8, 1024, 128
LC = 256

rng = np.random.default_rng(0)
X = jnp.asarray(rng.integers(-(2**31), 2**31 - 1, size=(NWS, M, L, LANE), dtype=np.int64).astype(np.int32))


def kern_t(x_ref, y_ref):
    # x block (1, 1, LC, LANE) -> y block (1, 1, LANE, LC)
    y_ref[0, 0] = jnp.swapaxes(x_ref[0, 0], 0, 1)


transpose_pallas = pl.pallas_call(
    kern_t,
    grid=(NWS, M, L // LC),
    in_specs=[
        pl.BlockSpec((1, 1, LC, LANE), lambda a, b, c: (a, b, c, 0), memory_space=pltpu.VMEM)
    ],
    out_specs=pl.BlockSpec((1, 1, LANE, LC), lambda a, b, c: (a, b, 0, c), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NWS, M, LANE, L), jnp.int32),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
)


def kern_c(x_ref, y_ref):
    y_ref[0, 0] = x_ref[0, 0]


copy_pallas = pl.pallas_call(
    kern_c,
    grid=(NWS, M, L // LC),
    in_specs=[
        pl.BlockSpec((1, 1, LC, LANE), lambda a, b, c: (a, b, c, 0), memory_space=pltpu.VMEM)
    ],
    out_specs=pl.BlockSpec((1, 1, LC, LANE), lambda a, b, c: (a, b, c, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NWS, M, L, LANE), jnp.int32),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
)


def mk_variant(fn):
    def mk(K):
        @jax.jit
        def f(x):
            for _ in range(K):
                y = fn(x)
                x = x ^ (y.ravel()[0] & 1)
            return y

        return f

    return mk


variants = [
    ("pallas tile-T ", mk_variant(transpose_pallas)),
    ("pallas copy   ", mk_variant(copy_pallas)),
    ("xla transpose ", mk_variant(jax.jit(lambda x: jnp.swapaxes(x, 2, 3)))),
]

# correctness
yt = np.asarray(transpose_pallas(X))
expect = np.asarray(jnp.swapaxes(X, 2, 3))
assert (yt == expect).all(), "pallas transpose mismatch"
print("pallas tile transpose correct", flush=True)

nbytes = X.size * 4
best = {name: float("inf") for name, _ in variants}
for rnd in range(3):
    for name, mk in variants:
        s = benchmark_chained(mk, (X,), ks=(1, 4))
        if s > 1e-7:
            best[name] = min(best[name], s)
        print(f"r{rnd} {name}: {s*1e3:8.3f} ms", flush=True)
for name, _ in variants:
    s = best[name]
    print(f"BEST {name}: {s*1e3:.3f} ms  {2*nbytes/s/1e9:.0f} GB/s r+w")
