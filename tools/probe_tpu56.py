"""Round-3 probe 1: honest measurement + VPU issue width + scan unroll.

Questions (in one TPU process, compile-ordered cheap-first):

  A. VPU issue width for int32 bitops: a Pallas kernel running C
     independent xor/shift chains (C = 1, 2, 4) of N steps on full
     (8,128)-int32 vregs.  If time is flat in C, the VPU dual/quad-issues
     and the serial scan (measured ~0.8 ops/cycle) has ILP headroom.
  B. Scan-kernel unroll sweep (H2R_SCAN_UNROLL 1/2/4/8): does exposing
     adjacent byte steps to the Mosaic scheduler overlap the class decode
     + log writes with the state recurrence?
  C. DCE audit: the bench chain feeds back only `mask`, so XLA dead-code
     eliminates the other witness columns in intermediate iterations
     (confirmed in CPU HLO: the final-state gather vanishes), and ANY
     scalar-slice dependency is sliceable the same way.  The DCE-proof
     harness returns EVERY iteration's witness columns as jit outputs
     (forced materialization).  Variants: mask-only chain (the old
     number), K-outputs unchained (pipelined throughput), K-outputs +
     serializing dependency.
  D. Tail breakdown: the full current XLA tail (field decodes + masked
     chars + states assembly + final gather) with K-outputs
     materialization, plus en_plane standalone — the budget the round-3
     decode kernel must beat.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halo2_regex_tpu.models import zoo
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher, raw_quads
from halo2_regex_tpu.utils.cache import enable_compilation_cache
from halo2_regex_tpu.utils.profiling import benchmark_chained

# shapes overridable for CPU smoke-testing (H2R_PROBE_B must stay a
# multiple of 4096 so the packed planes keep whole word groups)
B = int(os.environ.get("H2R_PROBE_B", "32768"))
L = int(os.environ.get("H2R_PROBE_L", "1024"))
NWS = B // 32 // 128
rng = np.random.default_rng(0)

enable_compilation_cache()
print(f"device: {jax.devices()[0]}", flush=True)
t0 = time.time()

# ---------------------------------------------------------------- A: issue width
N_STEPS = 4096


def make_chains_kernel(C):
    def kern(x_ref, o_ref):
        def body(i, xs):
            return tuple((x ^ (x << 1)) & (x >> 1) for x in xs)

        xs0 = tuple(x_ref[j] for j in range(C))
        xs = jax.lax.fori_loop(0, N_STEPS, body, xs0, unroll=4)
        for j in range(C):
            o_ref[j] = xs[j]

    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec((C, 8, 128), lambda: (0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (C, 8, 128), lambda: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, 8, 128), jnp.int32),
    )


def chain(fn, getdep=None):
    if getdep is None:
        getdep = lambda y: y.ravel()[0] & 1

    def mk(K):
        @jax.jit
        def f(x):
            y = None
            for _ in range(K):
                y = fn(x)
                x = x ^ getdep(y).astype(x.dtype)
            return y

        return f

    return mk


for C in (1, 2, 4):
    x = jnp.asarray(
        rng.integers(-(2**31), 2**31 - 1, size=(C, 8, 128), dtype=np.int64).astype(
            np.int32
        )
    )
    k = make_chains_kernel(C)
    s = benchmark_chained(chain(k), (x,), ks=(1, 9))
    # 4 ops per step per chain (2 shifts + xor + and)
    opsec = 4 * N_STEPS * C / s
    print(
        f"A: C={C} chains x {N_STEPS} steps: {s*1e6:8.1f} us  "
        f"{opsec/1e9:6.2f} G vreg-ops/s",
        flush=True,
    )

# ---------------------------------------------------------------- B: scan unroll
model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
chars = np.zeros((B, L), np.uint8)
lengths = np.zeros((B,), np.int32)
domains = [b"gmail.com", b"x.yz", b"sub.domain-x.org"]
alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
alpha_sp = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", np.uint8)
for i in range(B):
    name = rng.choice(alpha, size=8).tobytes()
    filler_len = int(rng.integers(0, max(1, L - 96)))
    filler = rng.choice(alpha_sp, size=filler_len).tobytes()
    s = filler + b"\r\nfrom:" + name + b"@" + domains[i % 3] + b"\r\n"
    chars[i, : len(s)] = bytearray(s)
    lengths[i] = len(s)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)

matchers = {
    U: BitplaneMatcher(model, columns="witness", unroll=U, en_pack=False,
       qpack=False) for U in (1, 2, 4, 8)
}
m1 = matchers[1]
quads = jax.jit(lambda c: raw_quads(c, m1.L_pad).reshape(m1.L_pad, 8, NWS, 128))
R = quads(chars_j)
bits = m1._make_pack(NWS)(R)

scan_best = {}
for rnd in range(3):
    for U, m in matchers.items():
        s = benchmark_chained(chain(m._make_scan_fused(NWS)), (bits,), ks=(1, 4))
        if s > 1e-7:
            scan_best[U] = min(scan_best.get(U, float("inf")), s)
        print(f"B r{rnd}: scan unroll={U}: {s*1e3:7.3f} ms", flush=True)
for U, s in sorted(scan_best.items()):
    print(f"B BEST scan unroll={U}: {s*1e3:.3f} ms", flush=True)

# ------------------------------------------------------- C: DCE / honest chains
best_u = min(scan_best, key=scan_best.get)
print(f"C: using unroll={best_u}", flush=True)
m = matchers[best_u]

WITNESS_KEYS = (
    "states",
    "all_substr_ids",
    "masked_characters",
    "flags",
    "match_ok",
)


def mk_mask_only(K):
    @jax.jit
    def f(c):
        out = None
        for _ in range(K):
            out = m.core(c, lengths_j)
            c = c ^ (out["mask"][0, 0] & 1).astype(jnp.uint8)
        return out["mask"]

    return f


def mk_kout(K):
    # DCE-proof: every iteration's witness columns are jit outputs.
    # Batches are independent (c ^ i) — pipelined serving throughput.
    @jax.jit
    def f(c, ln):
        outs = []
        for i in range(K):
            out = m.core(c ^ np.uint8(i), ln ^ i)
            outs.append(tuple(out[k] for k in WITNESS_KEYS))
        return outs

    return f


def mk_kout_chained(K):
    # DCE-proof AND serialized: iteration i+1's input depends on a scalar
    # of iteration i's mask (outputs still all materialized).
    @jax.jit
    def f(c, ln):
        outs = []
        for i in range(K):
            out = m.core(c, ln)
            outs.append(tuple(out[k] for k in WITNESS_KEYS))
            dep = (out["mask"][0, 0] & 1).astype(jnp.uint8)
            c = c ^ dep ^ np.uint8(i)
            ln = ln ^ dep.astype(jnp.int32)
        return outs

    return f


cbest = {}
for rnd in range(3):
    s1 = benchmark_chained(mk_mask_only, (chars_j,), ks=(1, 4))
    s2 = benchmark_chained(mk_kout, (chars_j, lengths_j), ks=(1, 4))
    s3 = benchmark_chained(mk_kout_chained, (chars_j, lengths_j), ks=(1, 4))
    for nm, s in (("mask_only", s1), ("k_outputs", s2), ("k_out_chained", s3)):
        if s > 1e-7:
            cbest[nm] = min(cbest.get(nm, float("inf")), s)
    print(
        f"C r{rnd}: mask-only {s1*1e3:7.3f}  k-out {s2*1e3:7.3f}  "
        f"k-out-chained {s3*1e3:7.3f} ms",
        flush=True,
    )
for nm, s in cbest.items():
    print(f"C BEST {nm}: {s*1e3:.3f} ms = {B*L/s/1e9:.1f} GB/s input", flush=True)

# ---------------------------------------------------------------- D: tail pieces
NW = B // 32


def en_fn(ln):
    len_wb = ln.reshape(8, NW, 4).transpose(1, 2, 0).reshape(NWS, 128, 32)
    beta = jnp.arange(32, dtype=jnp.int32)
    en_bits = (
        jnp.arange(m.L_pad, dtype=jnp.int32)[None, :, None, None]
        < len_wb[:, None]
    ).astype(jnp.int32) << beta
    return en_bits.sum(-1, dtype=jnp.int32)


s = benchmark_chained(
    chain(en_fn, getdep=lambda y: y[0, 0, 0] & 1), (lengths_j,), ks=(1, 4)
)
print(f"D: en_plane standalone (chained-scalar): {s*1e3:.3f} ms", flush=True)

# full current tail from fixed post output, K-outputs materialization
g4, _fb = m._make_post(NWS)(m._make_scan_fused(NWS)(bits), en_fn(lengths_j)[:, None])
wgroups = m._wgroups
G = len(wgroups)
n_defs = model.n_defs


def tail_fn(g):
    u8 = jax.lax.bitcast_convert_type(
        g.reshape(NWS, G, 8, m.L_pad, 128)[:, :, :, :L], jnp.uint8
    )
    vals = {}
    for gi, grp in enumerate(wgroups):
        arr = u8[:, gi]
        for name, off_b, nb in grp:
            v = (arr >> off_b) & ((1 << nb) - 1)
            vals[name] = v.transpose(1, 0, 3, 4, 2).reshape(B, L)
    flags = vals["flags"]
    mask = flags & 1
    masked_chars = mask * chars_j
    after = vals["states0"][:, None]
    first = jnp.full((B, n_defs, 1), 0, jnp.uint8)
    raw = jnp.concatenate([first, after], axis=2)
    posL1 = jnp.arange(L + 1, dtype=jnp.int32)
    in_range = posL1[None, None, :] <= lengths_j[:, None, None]
    states = jnp.where(in_range, raw, jnp.uint8(23))
    final = jnp.take_along_axis(
        raw,
        lengths_j[:, None, None].repeat(n_defs, 1).astype(jnp.int32),
        axis=2,
    )[:, :, 0]
    return (states, masked_chars, vals["masked_idsum"], flags, final)


def mk_tail(K):
    @jax.jit
    def f(g):
        outs = []
        for i in range(K):
            outs.append(tail_fn(g ^ i))
        return outs

    return f


tbest = float("inf")
for rnd in range(3):
    s = benchmark_chained(mk_tail, (g4,), ks=(1, 4))
    if s > 1e-7:
        tbest = min(tbest, s)
    print(f"D r{rnd}: full tail (k-out): {s*1e3:7.3f} ms", flush=True)
print(f"D BEST full tail: {tbest*1e3:.3f} ms", flush=True)
print(f"total probe time: {time.time()-t0:.0f} s", flush=True)
