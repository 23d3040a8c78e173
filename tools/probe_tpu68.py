"""Round-5 probe E: exact-selector MXU decode + kdecode integration bisect.

probe67 (honest kout harness): shipped bytes pipeline 2.41 ms median;
match-only 0.75 ms — the witness emission tail (post + XLA field
transposes + finish) is ~1.6 ms at <10% HBM util.  The kernel
replacements measured honestly: kdecode kernel 1.0 ms, MXU
matmul-transpose 0.63 ms — both beat the honest tail ISOLATED, but the
kdecode PIPELINE is 7.3 ms (vs its parts ~1.2), so something about
integration is broken.  Also the probe64 MXU decode miscompiled 0.03%
of elements: the packing matrix (weights 1 and 256) makes outputs
two-term sums, and this toolchain's MXU accumulates those at bf16
precision.

This probe:
  A  exact-selector MXU decode (P4 permutation matrix, single nonzero
     per output => no accumulation => bf16-exact) and a pure-VPU
     swapaxes+lane-pack variant; correctness on random int32 + honest
     isolated timing
  B  integration bisect: post->decode composed; decode+finish; full
     pipeline — for kdecode and for the mx/sw variants (manual pipeline
     replicas), all honest kout, round-robin vs the shipped bytes
     pipeline in the same window
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
from halo2_regex_tpu.ops.bitplane import LANE, BitplaneMatcher
from halo2_regex_tpu.utils.cache import enable_compilation_cache
from halo2_regex_tpu.utils.profiling import benchmark_chained, device_specs

B = int(os.environ.get("H2R_PROBE_B", "32768"))
L = int(os.environ.get("H2R_PROBE_L", "1024"))
ROUNDS = int(os.environ.get("H2R_PROBE_ROUNDS", "4"))
rng = np.random.default_rng(0)
enable_compilation_cache()
print(f"device: {jax.devices()[0]}", flush=True)
t0 = time.time()
HBM = device_specs()["hbm_gbps"]
BL = B * L

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

WITNESS_KEYS = ("states", "all_substr_ids", "masked_characters", "flags",
                "match_ok")

m = BitplaneMatcher(model, columns="witness", emit="bytes")
NWS = B // 32 // LANE
NW = B // 32
G = len(m._wgroups)
l4 = m._l4
L_pad = m.L_pad
wgroups = m._wgroups
fields_flat = [(nm, gi, off, nb) for gi, grp in enumerate(wgroups)
               for (nm, off, nb) in grp]
n_fields = len(fields_flat)

qp = m._make_qpack(NWS)
scan = m._make_scan_fused(NWS)
post = m._make_post(NWS)


def selector_matrix():
    """[128, 128] bf16 permutation: col 32*(k%4) + k//4 selects row k.
    dot(tile^T, P4) puts position 4c+r at column 32r+c — single nonzero
    per output, so the MXU result is exact at any accumulator
    precision (byte values 0-255 are bf16-exact)."""
    P = np.zeros((128, 128), np.float32)
    for k in range(128):
        P[k, 32 * (k % 4) + k // 4] = 1.0
    return jnp.asarray(P, jnp.bfloat16)


P4 = selector_matrix()


def make_decode(kind):
    """Decode kernel: byte-group words -> l4-packed string-major int32
    field columns + masked chars.  kind: "mx" (selector-matrix MXU
    transpose) | "sw" (swapaxes + lane-strided pack)."""

    def transpose_pack_mx(v, pmat):
        outs = []
        for s in range(4):
            vs = ((v >> (8 * s)) & 0xFF).astype(jnp.bfloat16)
            cols = []
            for t in range(L_pad // 128):
                tile = vs[t * 128:(t + 1) * 128]
                d = jax.lax.dot_general(
                    tile, pmat, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                g = [d[:, 32 * r:32 * r + 32].astype(jnp.int32)
                     for r in range(4)]
                cols.append(g[0] | (g[1] << 8) | (g[2] << 16)
                            | (g[3] << 24))
            outs.append(jnp.concatenate(cols, axis=1))
        return jnp.stack(outs, axis=1).reshape(4 * LANE, l4)

    def transpose_pack_sw(v, _pmat):
        outs = []
        for s in range(4):
            vs = (v >> (8 * s)) & 0xFF
            T = jnp.swapaxes(vs, 0, 1)  # [LANE, L_pad]
            q = (T[:, 0::4] | (T[:, 1::4] << 8) | (T[:, 2::4] << 16)
                 | (T[:, 3::4] << 24))
            outs.append(q)  # [LANE, l4]
        return jnp.stack(outs, axis=1).reshape(4 * LANE, l4)

    tp = transpose_pack_mx if kind == "mx" else transpose_pack_sw

    def kern(g_ref, ch_ref, p_ref, *out_refs):
        pmat = p_ref[...]
        rows_g = [tp(g_ref[0, gi, 0], pmat) for gi in range(G)]
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
            pl.BlockSpec((LANE * 4, l4), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda nws, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((LANE * 4, l4), row_map,
                                memory_space=pltpu.VMEM)] * (n_fields + 1),
        out_shape=[jax.ShapeDtypeStruct((B, l4), jnp.int32)]
        * (n_fields + 1),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )


# shared pipeline pieces
def front(c, ln):
    len_wb = ln.reshape(8, NW, 4).transpose(1, 2, 0).reshape(NWS, LANE, 32)
    bits, en = qp(c.reshape(8, NW, 4, L), len_wb)
    logs = scan(bits)
    return post(logs, en[:, None])


def finish_from_vals(c, ln, vals, fb):
    flags = vals["flags"]
    after = vals["states0"][:, None, :]
    first = m._model_arrays["first_states"][None, :, None].astype(jnp.uint8)
    raw = jnp.concatenate(
        [jnp.broadcast_to(first, (B, m.n_defs, 1)), after], axis=2)
    final = m._final_from_fb(fb, B)
    accepted = m._model_arrays["accept_mask"][
        jnp.arange(m.n_defs)[None, :], final]
    has_dead = final == m._model_arrays["dead_states"][None, :]
    return dict(
        states=raw,  # predummy semantics: dummy spliced in-kernel
        all_substr_ids=vals["masked_idsum"],
        masked_characters=vals["mc"],
        flags=flags,
        accepted=accepted,
        has_dead=has_dead,
        match_ok=accepted.all(axis=1) & (~has_dead.any(axis=1)),
    )


def pipeline_k(kind):
    dec = make_decode(kind)
    ch_l4_of = lambda c: jax.lax.bitcast_convert_type(
        c.reshape(B, l4, 4), jnp.int32)

    def run(c, ln):
        g4, fb = front(c, ln)
        outs = dec(g4.reshape(NWS, G, 8, L_pad, LANE), ch_l4_of(c), P4)
        vals = {}
        for (nm, _gi, _off, _nb), arr in zip(fields_flat, outs):
            vals[nm] = jax.lax.bitcast_convert_type(
                arr, jnp.uint8).reshape(B, L_pad)[:, :L]
        vals["mc"] = jax.lax.bitcast_convert_type(
            outs[n_fields], jnp.uint8).reshape(B, L_pad)[:, :L]
        return finish_from_vals(c, ln, vals, fb)

    return run


def kout_of(core, keys=WITNESS_KEYS):
    def make(K):
        @jax.jit
        def f(c, ln):
            return [
                tuple(core(c ^ np.uint8(i), ln ^ i)[k] for k in keys)
                for i in range(K)
            ]
        return f
    return make


def chain1(fn):
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


# ------------------------------------------------------------- section A
print("== A: exact-selector decode correctness + isolated timing",
      flush=True)
g4, fb = jax.jit(front)(chars_j, lengths_j)
g4r = jnp.asarray(np.asarray(g4.reshape(NWS, G, 8, L_pad, LANE)))
ch_l4 = jax.lax.bitcast_convert_type(chars_j.reshape(B, l4, 4), jnp.int32)

# reference decode on host
g4_np = np.asarray(g4r).astype(np.uint32)


def host_decode():
    # string g = 4*(nws*LANE+lane) + 4*NW*b + s; out rows 512*(b*NWS+nws)
    # + 4*lane + s; value byte for group gi = byte lane s of word
    # [nws, gi, b, l, lane]
    outs = []
    u8 = g4_np.view(np.uint8).reshape(NWS, G, 8, L_pad, LANE, 4)
    for nm, gi, off, nb in fields_flat:
        v = (u8[:, gi] >> off) & ((1 << nb) - 1)
        col = v.transpose(1, 0, 3, 4, 2).reshape(B, L_pad)
        outs.append(col)
    return outs


ref_fields = host_decode()
for kind in ("mx", "sw"):
    try:
        dec = make_decode(kind)
        outs = dec(g4r, ch_l4, P4)
        okk = True
        for fi in range(n_fields):
            got = np.asarray(jax.lax.bitcast_convert_type(
                outs[fi], jnp.uint8).reshape(B, L_pad))
            if not np.array_equal(got, ref_fields[fi]):
                okk = False
                print(f"A: {kind} field {fi} MISMATCH "
                      f"({(got != ref_fields[fi]).sum()} els)", flush=True)
        mc_got = np.asarray(jax.lax.bitcast_convert_type(
            outs[n_fields], jnp.uint8).reshape(B, L_pad))
        mc_ref = (ref_fields[0] & 1).astype(np.uint8) * np.asarray(
            jnp.pad(chars_j, ((0, 0), (0, L_pad - L))) if L_pad != L
            else chars_j)
        if not np.array_equal(mc_got, mc_ref):
            okk = False
            print(f"A: {kind} masked-chars MISMATCH "
                  f"({(mc_got != mc_ref).sum()} els)", flush=True)
        if okk:
            print(f"A: {kind} decode BIT-EXACT", flush=True)
        vals = []
        for r in range(3):
            s = benchmark_chained(chain1(lambda g: dec(g, ch_l4, P4)),
                                  (g4r,), ks=(2, 10))
            vals.append(s)
            print(f"  A {kind} r{r}: {s*1e3:.4f} ms", flush=True)
        print(json.dumps({"kernel": f"a_{kind}decode_isolated",
                          "median_ms": round(float(np.median(vals)) * 1e3,
                                             4)}), flush=True)
    except Exception as e:
        print(f"A: {kind} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

# ------------------------------------------------------------- section B
print("== B: integrated pipelines, honest kout round-robin", flush=True)
pipes = [("b_bytes_shipped", m.core)]
for kind in ("mx", "sw"):
    try:
        run = pipeline_k(kind)
        out = {k: np.asarray(v) for k, v in run(chars_j, lengths_j).items()}
        ref = {k: np.asarray(v)
               for k, v in m.core(chars_j, lengths_j).items()}
        for k in WITNESS_KEYS:
            np.testing.assert_array_equal(ref[k], out[k],
                                          err_msg=f"{kind} {k}")
        print(f"B: {kind} pipeline BIT-EXACT vs shipped", flush=True)
        pipes.append((f"b_{kind}_pipeline", run))
    except Exception as e:
        print(f"B: {kind} pipeline FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

samples = {nm: [] for nm, _ in pipes}
for rnd in range(ROUNDS):
    for nm, run in pipes:
        try:
            s = benchmark_chained(kout_of(run), (chars_j, lengths_j),
                                  ks=(1, 5))
        except Exception as e:
            print(f"{nm} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        print(f"  r{rnd} {nm}: {s*1e3:8.4f} ms", flush=True)
        if s > 0.676e-3:
            samples[nm].append(s)
for nm, _ in pipes:
    v = samples[nm]
    if v:
        med = float(np.median(v))
        print(json.dumps({
            "kernel": nm, "median_ms": round(med * 1e3, 4), "n": len(v),
            "input_gbps_median": round(BL / med / 1e9, 2),
        }), flush=True)

print(f"total probe time: {time.time()-t0:.0f} s", flush=True)
