"""Round-5 probe A: kill the XLA decode/assembly tail (VERDICT r4 #1).

probe61/63 established: the Pallas kernels are near-roofline and the
witness pipeline's remaining ~1.2-1.4 ms is the XLA decode tail (per-
field u8 transposes of the post kernel's byte-group words) — and the
kdecode KERNEL that tried to replace it is itself 2.5x too slow.

Hypothesis: kdecode's cost is the in-kernel `jnp.swapaxes` sublane<->
lane transpose ([l4, LANE] int32 per field per byte-lane), which Mosaic
lowers to long shuffle chains.  The MXU does the same transpose as a
bf16 matmul against a constant PACKING matrix (byte values 0-255 are
bf16-exact; lo/hi halfword columns keep the f32 accumulation exact and
fold the 4-positions-per-int32 l4 packing into the contraction).

Sections:
  A  primitive shootout, isolated kernels at the decode's block shapes:
     copy / swapaxes / MXU transpose+pack / sublane interleave
  B  decode candidates on the real flagship g4:
     b0 XLA per-field tail (shipped default)   b1 kdecode kernel
     b2 NEW mxdecode kernel                    b3 one-big-XLA-transpose
     + hardware exactness of b1/b2/b3 against b0
  C  qpack kernel isolated (its gap to the bandwidth floor)
"""

import json
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
from halo2_regex_tpu.ops.bitplane import (
    LANE,
    BitplaneMatcher,
    raw_quads,
)
from halo2_regex_tpu.utils.cache import enable_compilation_cache
from halo2_regex_tpu.utils.profiling import benchmark_chained, device_specs

B = int(os.environ.get("H2R_PROBE_B", "32768"))
L = int(os.environ.get("H2R_PROBE_L", "1024"))
ROUNDS = int(os.environ.get("H2R_PROBE_ROUNDS", "5"))
SECTIONS = os.environ.get("H2R_PROBE_SECTIONS", "ABC")
rng = np.random.default_rng(0)
enable_compilation_cache()
print(f"device: {jax.devices()[0]}", flush=True)
t0 = time.time()
HBM = device_specs()["hbm_gbps"]
BL = B * L


def measure(name, mk, args, traffic_bytes, ks, rounds=ROUNDS):
    floor = traffic_bytes / HBM
    vals = []
    for rnd in range(rounds):
        try:
            s = benchmark_chained(mk, args, ks=ks)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return None
        tag = "" if s > floor else "  (< physical floor, discarded)"
        print(f"  r{rnd} {name}: {s*1e3:8.4f} ms{tag}", flush=True)
        if s > floor:
            vals.append(s)
    if not vals:
        print(f"{name}: no credible samples", flush=True)
        return None
    med = float(np.median(vals))
    print(json.dumps({
        "kernel": name, "median_ms": round(med * 1e3, 4),
        "best_ms": round(min(vals) * 1e3, 4), "n": len(vals),
        "floor_ms": round(floor * 1e3, 4),
        "hbm_util": round(floor / med, 3),
    }), flush=True)
    return med


def chain(fn):
    """Data-dependent K-iteration chaining on the first arg (int32)."""
    def mk(K):
        @jax.jit
        def f(x, *rest):
            y = None
            for _ in range(K):
                y = fn(x, *rest)
                y0 = y[0] if isinstance(y, (tuple, list)) else y
                x = x ^ (y0.ravel()[0] & 1).astype(x.dtype)
            return y
        return f
    return mk


def packing_matrix():
    """[128, 64] bf16: dot(tile[128k, 128lane]^T, P) -> [lane, 64] where
    cols 0-31 = lo halfword (p0 + 256*p1), cols 32-63 = hi halfword
    (p2 + 256*p3) of the 4 consecutive positions 4c..4c+3."""
    P = np.zeros((128, 64), np.float32)
    for k in range(128):
        c, r = k // 4, k % 4
        if r < 2:
            P[k, c] = 256.0 ** r
        else:
            P[k, 32 + c] = 256.0 ** (r - 2)
    return jnp.asarray(P, jnp.bfloat16)


# --------------------------------------------------------------- section A
if "A" in SECTIONS:
    print("== A: primitives at decode block shapes", flush=True)
    NBLK = 64
    X = jnp.asarray(
        rng.integers(0, 2**31, size=(NBLK, 1024, LANE), dtype=np.int64)
        .astype(np.int32)
    )
    P_bf = packing_matrix()

    def kern_copy(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def kern_swap(x_ref, o_ref):
        o_ref[0] = jnp.swapaxes(x_ref[0], 0, 1)

    def kern_mxu(x_ref, p_ref, o_ref):
        v = x_ref[0]
        pmat = p_ref[...]
        outs = []
        for s in range(4):
            vs = ((v >> (8 * s)) & 0xFF).astype(jnp.bfloat16)
            cols = []
            for t in range(1024 // 128):
                tile = vs[t * 128:(t + 1) * 128]
                d = jax.lax.dot_general(
                    tile, pmat, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                lo = d[:, :32].astype(jnp.int32)
                hi = d[:, 32:].astype(jnp.int32) << 16
                cols.append(lo | hi)
            outs.append(jnp.concatenate(cols, axis=1))  # [128, 256]
        o_ref[0] = jnp.stack(outs, axis=1).reshape(4 * LANE, 256)

    def mkk(kern, out_shape, extra=()):
        in_specs = [pl.BlockSpec((1, 1024, LANE), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)]
        args = [X]
        for e in extra:
            in_specs.append(pl.BlockSpec(e.shape, lambda b: (0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(e)
        f = pl.pallas_call(
            kern, grid=(NBLK,), in_specs=in_specs,
            out_specs=pl.BlockSpec((1,) + out_shape[1:],
                                   lambda b: (b,) + (0,) * (len(out_shape) - 1),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )
        return f, args

    f_copy, a_copy = mkk(kern_copy, (NBLK, 1024, LANE))
    f_swap, a_swap = mkk(kern_swap, (NBLK, LANE, 1024))
    f_mxu, a_mxu = mkk(kern_mxu, (NBLK, 4 * LANE, 256), extra=(P_bf,))

    # correctness of the MXU transpose+pack before timing it
    try:
        got = np.asarray(jax.jit(lambda x, p: f_mxu(x, p))(X, P_bf))
        xs = np.asarray(X)
        blk = 0
        exp = np.zeros((4 * LANE, 256), np.uint32)
        for s in range(4):
            vs = (xs[blk] >> (8 * s)) & 0xFF  # [1024, 128]
            for lane in range(LANE):
                row = vs[:, lane].astype(np.uint32)
                packed = (row[0::4] | (row[1::4] << 8) | (row[2::4] << 16)
                          | (row[3::4] << 24))
                exp[4 * lane + s] = packed
        np.testing.assert_array_equal(got[blk].astype(np.uint32), exp)
        print("A: mxu transpose+pack BIT-EXACT", flush=True)
    except Exception as e:
        print(f"A: mxu exactness FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    tb = NBLK * 1024 * LANE * 4
    measure("a_copy", chain(lambda x: f_copy(x)), (X,), 2 * tb, (8, 64))
    measure("a_swap", chain(lambda x: f_swap(x)), (X,), 2 * tb, (8, 64))
    measure("a_mxu", chain(lambda x: f_mxu(x, P_bf)), (X,), 2 * tb, (8, 64))

# ------------------------------------------------- shared pipeline setup
model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
chars = np.zeros((B, L), np.uint8)
lengths = np.zeros((B,), np.int32)
alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
alpha_sp = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz @.-:", np.uint8)
for i in range(B):
    name = rng.choice(alpha, size=8).tobytes()
    filler = rng.choice(alpha_sp, size=int(rng.integers(0, L - 96))).tobytes()
    s = (filler + b"\r\nfrom:" + name + b"@gmail.com\r\n")[:L] if i % 2 == 0 \
        else filler[:L]
    chars[i, : len(s)] = bytearray(s)
    lengths[i] = len(s)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)

# --------------------------------------------------------------- section B
if "B" in SECTIONS:
    print("== B: decode candidates on real flagship g4", flush=True)
    m = BitplaneMatcher(model, columns="witness", emit="bytes",
                        en_pack=False, qpack=False)
    NWS = B // 32 // LANE
    G = len(m._wgroups)
    l4 = m._l4
    L_pad = m.L_pad
    R = jax.jit(lambda c: raw_quads(c, L_pad).reshape(L_pad, 8, NWS, LANE))(
        chars_j)
    bits = m._make_pack(NWS)(R)
    logs = m._make_scan_fused(NWS)(bits)
    # true enable plane (pos < length) so masked chars are realistic
    NW = B // 32
    len_wb = (lengths_j.reshape(8, NW, 4).transpose(1, 2, 0)
              .reshape(NWS, LANE, 32))
    beta = jnp.arange(32, dtype=jnp.int32)
    en_bits = (jnp.arange(L_pad, dtype=jnp.int32)[None, :, None, None]
               < len_wb[:, None]).astype(jnp.int32) << beta
    en = en_bits.sum(-1, dtype=jnp.int32)[:, None]  # [NWS, 1, L_pad, LANE]
    g4, fb = m._make_post(NWS)(logs, en)
    g4r = jax.jit(lambda g: g.reshape(NWS, G, 8, L_pad, LANE))(g4)
    g4r.block_until_ready()
    ch_l4 = jax.lax.bitcast_convert_type(
        chars_j.reshape(B, l4, 4), jnp.int32)
    wgroups = m._wgroups
    fields_flat = [(nm, gi, off, nb) for gi, grp in enumerate(wgroups)
                   for (nm, off, nb) in grp]
    n_fields = len(fields_flat)

    # ---- b0: the shipped XLA per-field tail
    def xla_tail(g, ch):
        u8 = jax.lax.bitcast_convert_type(g[:, :, :, :L], jnp.uint8)
        outs = []
        flags = None
        for gi, grp in enumerate(wgroups):
            arr = u8[:, gi]
            for nm, off_b, nb in grp:
                v = (arr >> off_b) & ((1 << nb) - 1)
                col = v.transpose(1, 0, 3, 4, 2).reshape(B, L)
                outs.append(col)
                if nm == "flags":
                    flags = col
        mc = (flags & 1) * ch.astype(jnp.uint8)
        outs.append(mc)
        return outs

    # ---- b3: one big u8 transpose, field extraction string-major
    def xla_tail2(g, ch):
        u8 = jax.lax.bitcast_convert_type(g[:, :, :, :L], jnp.uint8)
        allb = u8.transpose(2, 0, 4, 5, 3, 1).reshape(B, L, G)
        outs = []
        flags = None
        for gi, grp in enumerate(wgroups):
            for nm, off_b, nb in grp:
                col = (allb[..., gi] >> off_b) & ((1 << nb) - 1)
                outs.append(col)
                if nm == "flags":
                    flags = col
        mc = (flags & 1) * ch.astype(jnp.uint8)
        outs.append(mc)
        return outs

    # ---- b2: MXU decode kernel
    P_bf = packing_matrix()

    def make_mxdecode():
        def kern(g_ref, ch_ref, p_ref, *out_refs):
            pmat = p_ref[...]

            def transpose_pack(v):
                outs = []
                for s in range(4):
                    vs = ((v >> (8 * s)) & 0xFF).astype(jnp.bfloat16)
                    cols = []
                    for t in range(L_pad // 128):
                        tile = vs[t * 128:(t + 1) * 128]
                        d = jax.lax.dot_general(
                            tile, pmat, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        lo = d[:, :32].astype(jnp.int32)
                        hi = d[:, 32:].astype(jnp.int32) << 16
                        cols.append(lo | hi)
                    outs.append(jnp.concatenate(cols, axis=1))
                return jnp.stack(outs, axis=1).reshape(4 * LANE, l4)

            rows_g = [transpose_pack(g_ref[0, gi, 0]) for gi in range(G)]
            flags_rows = None
            for fi, (nm, gi, off_b, nb) in enumerate(fields_flat):
                maskrep = jnp.int32(((1 << nb) - 1) * 0x01010101)
                r = (rows_g[gi] >> off_b) & maskrep
                out_refs[fi][...] = r
                if nm == "flags":
                    flags_rows = r
            mask4 = flags_rows & jnp.int32(0x01010101)
            out_refs[n_fields][...] = ch_ref[...] & (mask4 * 255)

        row_map = lambda nws, b: (b * NWS + nws, 0)
        return pl.pallas_call(
            kern, grid=(NWS, 8),
            in_specs=[
                pl.BlockSpec((1, G, 1, L_pad, LANE),
                             lambda nws, b: (nws, 0, b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LANE * 4, l4), row_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 64), lambda nws, b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((LANE * 4, l4), row_map,
                                    memory_space=pltpu.VMEM)]
            * (n_fields + 1),
            out_shape=[jax.ShapeDtypeStruct((B, l4), jnp.int32)]
            * (n_fields + 1),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )

    tail_traffic = BL * G + BL + (n_fields + 1) * BL  # g4 + chars + cols
    b0 = jax.jit(xla_tail)
    ref_outs = None
    try:
        ref_outs = [np.asarray(v) for v in b0(g4r, chars_j)]
        print("B: b0 reference computed", flush=True)
    except Exception as e:
        print(f"B: b0 FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    def check(name, outs_u8):
        if ref_outs is None:
            return
        try:
            for i, (r, o) in enumerate(zip(ref_outs, outs_u8)):
                np.testing.assert_array_equal(r, o, err_msg=f"{name} out{i}")
            print(f"B: {name} BIT-EXACT vs b0", flush=True)
        except Exception as e:
            print(f"B: {name} exactness FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    def l4_to_u8(a):
        return np.asarray(jax.lax.bitcast_convert_type(a, jnp.uint8)
                          .reshape(B, L_pad))[:, :L]

    # mxdecode
    mx_fn = None
    try:
        mx_fn = make_mxdecode()
        outs = mx_fn(g4r, ch_l4, P_bf)
        check("b2_mxdecode", [l4_to_u8(o) for o in outs])
    except Exception as e:
        print(f"B: b2 build FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # kdecode (existing)
    kd_fn = None
    try:
        mk_dec = BitplaneMatcher(model, columns="witness", emit="kdecode",
                                 en_pack=False, qpack=False)
        kd_fn = mk_dec._make_decode(NWS)
        outs = kd_fn(g4r, ch_l4)
        check("b1_kdecode", [l4_to_u8(o) for o in outs])
    except Exception as e:
        print(f"B: b1 build FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    try:
        outs = jax.jit(xla_tail2)(g4r, chars_j)
        check("b3_xla_onetrans", [np.asarray(o) for o in outs])
    except Exception as e:
        print(f"B: b3 FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    measure("b0_xla_tail", chain(lambda g: xla_tail(g, chars_j)), (g4r,),
            tail_traffic, (2, 10))
    measure("b3_xla_onetrans", chain(lambda g: xla_tail2(g, chars_j)),
            (g4r,), tail_traffic, (2, 10))
    if kd_fn is not None:
        measure("b1_kdecode", chain(lambda g: kd_fn(g, ch_l4)), (g4r,),
                tail_traffic, (2, 10))
    if mx_fn is not None:
        measure("b2_mxdecode", chain(lambda g: mx_fn(g, ch_l4, P_bf)),
                (g4r,), tail_traffic, (4, 20))

# --------------------------------------------------------------- section C
if "C" in SECTIONS:
    print("== C: qpack kernel isolated", flush=True)
    mq = BitplaneMatcher(model, columns="witness", emit="bytes",
                         en_pack=True, qpack=True)
    NWS = B // 32 // LANE
    NW = B // 32
    len_wb = (lengths_j.reshape(8, NW, 4).transpose(1, 2, 0)
              .reshape(NWS, LANE, 32))
    ch_v = chars_j.reshape(8, NW, 4, L)
    qp = mq._make_qpack(NWS)
    KOUT = mq._kp if mq.class_stage else 8
    qtraffic = BL + KOUT / 8 * BL / 4 * 4 + NWS * mq.L_pad * LANE * 4
    measure("c_qpack", chain(lambda c: qp(c, len_wb)), (ch_v,),
            qtraffic, (4, 20))

print(f"total probe time: {time.time()-t0:.0f} s", flush=True)
