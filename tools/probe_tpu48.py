"""Probe: direct [B, L]-major witness emission from the packed domain.

The post kernel's bytes_mode output is byte-lane words (m-plane, l, lane)
whose 4 byte lanes are 4 strings; XLA then pays a full read+write
transpose pass to produce [B, L] field columns.  This probe implements
the in-kernel alternative on one synthetic field:

  words [8m, L, LANE] int32  ->  out [8m, LANE*4, L/4] int32

where out(m, lane*4+s, l4) packs bytes of positions 4*l4..4*l4+3 of
string (m, nws, lane, s) — i.e. the final [B, L] uint8 column is a pure
bitcast+reshape of out (zero-copy on device).  Transform per m: slice
words into 4 sublane-strided row groups, extract byte s, shift-or into
l4-packed planes (sublane domain), tile-transpose (L/4, LANE) ->
(LANE, L/4), interleave s via stack+reshape.

Timed against the status-quo shape: writing the word planes + XLA
transpose decode.
"""

import os
import sys

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
L4 = L // 4

rng = np.random.default_rng(0)
W = jnp.asarray(
    rng.integers(-(2**31), 2**31 - 1, size=(NWS, M, L, LANE), dtype=np.int64).astype(
        np.int32
    )
)


def kern_direct(w_ref, out_ref):
    for m in range(M):
        w = w_ref[0, m]  # (L, LANE)
        rows = w.reshape(L4, 4, LANE)
        qs_t = []
        for s in range(4):
            acc = None
            for j in range(4):
                v = (rows[:, j] >> (8 * s)) & 0xFF
                v = v << (8 * j)
                acc = v if acc is None else acc | v
            qs_t.append(jnp.swapaxes(acc, 0, 1))  # (LANE, L4)
        blk = jnp.stack(qs_t, axis=1).reshape(LANE * 4, L4)
        out_ref[m, 0] = blk


# out is (M, NWS, ...) so flat order == string order (m, nws, lane, s):
# the final [B, L] uint8 column is bitcast+reshape only, zero relayout.
direct = pl.pallas_call(
    kern_direct,
    grid=(NWS,),
    in_specs=[
        pl.BlockSpec((1, M, L, LANE), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    ],
    out_specs=pl.BlockSpec(
        (M, 1, LANE * 4, L4), lambda b: (0, b, 0, 0), memory_space=pltpu.VMEM
    ),
    out_shape=jax.ShapeDtypeStruct((M, NWS, LANE * 4, L4), jnp.int32),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
)


def kern_id(w_ref, out_ref):
    for m in range(M):
        out_ref[0, m] = w_ref[0, m]


ident = pl.pallas_call(
    kern_id,
    grid=(NWS,),
    in_specs=[
        pl.BlockSpec((1, M, L, LANE), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    ],
    out_specs=pl.BlockSpec(
        (1, M, L, LANE), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    ),
    out_shape=jax.ShapeDtypeStruct((NWS, M, L, LANE), jnp.int32),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
)


@jax.jit
def status_quo(w):
    # word planes written by a kernel (ident models the store), then the
    # XLA decode: bitcast to bytes and transpose to [B, L]
    g = ident(w)
    u8 = jax.lax.bitcast_convert_type(g, jnp.uint8)  # [NWS, M, L, LANE, 4]
    return u8.transpose(1, 0, 3, 4, 2).reshape(NWS * M * LANE * 4, L)


@jax.jit
def direct_full(w):
    o = direct(w)  # [M, NWS, LANE*4, L4] int32, flat order == string order
    u8 = jax.lax.bitcast_convert_type(o, jnp.uint8)  # [..., L4, 4]
    return u8.reshape(NWS * M * LANE * 4, L)


# correctness
a = np.asarray(direct_full(W))
b = np.asarray(status_quo(W))
assert a.shape == b.shape
assert (a == b).all(), "direct emission mismatch"
print("direct [B, L] emission bit-exact vs XLA decode", flush=True)


def mk_of(fn):
    def mk(K):
        @jax.jit
        def f(x):
            for _ in range(K):
                y = fn(x)
                x = x ^ (y[0, 0].astype(jnp.int32) & 1)
            return y

        return f

    return mk


variants = [("A direct    ", mk_of(direct_full)), ("B swar+xla  ", mk_of(status_quo))]
best = {name: float("inf") for name, _ in variants}
nbytes = W.size * 4
for rnd in range(3):
    for name, mk in variants:
        s = benchmark_chained(mk, (W,), ks=(1, 4))
        if s > 1e-7:
            best[name] = min(best[name], s)
        print(f"r{rnd} {name}: {s*1e3:8.3f} ms", flush=True)
for name, _ in variants:
    s = best[name]
    print(f"BEST {name}: {s*1e3:.3f} ms  ({nbytes/1e6:.0f} MB field)")
