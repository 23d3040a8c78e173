"""Round-5 probe D: HONEST pipeline A/Bs + launch-overhead + batch scaling.

probe65/64's XLA-side numbers were DCE-polluted: the single-bit chained
harness lets XLA dead-code-eliminate unused XLA-op outputs in
intermediate iterations (pallas_call outputs cannot be split, so kernel
rows were honest).  The honest harness is bench.py's kout (every
iteration's full witness column set is a jit output).  Re-measured
honestly, the shipped pipeline is ~2.4 ms while its kernels sum to
~0.6 ms — and a trivial copy kernel's K-slope is ~0.20 ms against a
0.08 ms floor, i.e. ~0.12 ms of fixed per-launch overhead through the
relay.  PASS COUNT and BATCH AMORTIZATION are the levers.

Sections (all kout-honest, round-robin within a window):
  A  launch overhead: copy-kernel K-slope at 64 MB vs 4 MB traffic
  B  emission-mode pipeline A/B: bytes / bytes+fuse_pack / direct /
     kdecode (+ match-only reference)
  C  batch scaling: shipped pipeline at B = 32k / 64k / 128k
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
SECTIONS = os.environ.get("H2R_PROBE_SECTIONS", "ABC")
rng = np.random.default_rng(0)
enable_compilation_cache()
print(f"device: {jax.devices()[0]}", flush=True)
t0 = time.time()
HBM = device_specs()["hbm_gbps"]

WITNESS_KEYS = ("states", "all_substr_ids", "masked_characters", "flags",
                "match_ok")
MATCH_KEYS = ("final_states", "accepted", "has_dead", "match_ok")


def corpus(BB):
    chars = np.zeros((BB, L), np.uint8)
    lengths = np.zeros((BB,), np.int32)
    alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
    alpha_sp = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz @.-:", np.uint8)
    r = np.random.default_rng(1)
    for i in range(BB):
        name = r.choice(alpha, size=8).tobytes()
        filler = r.choice(alpha_sp, size=int(r.integers(0, L - 96))).tobytes()
        s = (filler + b"\r\nfrom:" + name + b"@gmail.com\r\n")[:L] \
            if i % 2 == 0 else filler[:L]
        chars[i, : len(s)] = bytearray(s)
        lengths[i] = len(s)
    return jnp.asarray(chars), jnp.asarray(lengths)


model = zoo.email_headers_model(max_chars_size=L, headers=("from",))


def kout_of(core, keys):
    def make(K):
        @jax.jit
        def f(c, ln):
            return [
                tuple(core(c ^ np.uint8(i), ln ^ i)[k] for k in keys)
                for i in range(K)
            ]
        return f
    return make


def measure_rr(rows, args_of, rounds=ROUNDS, ks=(1, 5)):
    """Round-robin measurement: one sample of each row per round, so
    window drift hits all rows equally.  rows: [(name, make_chained,
    traffic_bytes, B_of_row)]."""
    samples = {name: [] for name, *_ in rows}
    for rnd in range(rounds):
        for name, mk, traffic, BB in rows:
            floor = traffic / HBM
            try:
                s = benchmark_chained(mk, args_of[name], ks=ks)
            except Exception as e:
                print(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}",
                      flush=True)
                samples.pop(name, None)
                continue
            tag = "" if s > floor else "  (< floor, discarded)"
            print(f"  r{rnd} {name}: {s*1e3:8.4f} ms{tag}", flush=True)
            if s > floor:
                samples[name].append(s)
    for name, mk, traffic, BB in rows:
        v = samples.get(name)
        if not v:
            continue
        med = float(np.median(v))
        print(json.dumps({
            "kernel": name, "median_ms": round(med * 1e3, 4),
            "iqr_ms": [round(float(np.percentile(v, 25)) * 1e3, 4),
                       round(float(np.percentile(v, 75)) * 1e3, 4)],
            "n": len(v), "floor_ms": round(traffic / HBM * 1e3, 4),
            "input_gbps_median": round(BB * L / med / 1e9, 2),
        }), flush=True)


# ------------------------------------------------------------- section A
if "A" in SECTIONS:
    print("== A: launch-overhead quantification", flush=True)
    for nblk, tagn in ((64, "a_copy_32mb"), (4, "a_copy_2mb")):
        X = jnp.asarray(rng.integers(0, 2**31, size=(nblk, 1024, LANE),
                                     dtype=np.int64).astype(np.int32))
        f = pl.pallas_call(
            lambda x_ref, o_ref: o_ref.__setitem__((...,), x_ref[...]),
            grid=(nblk,),
            in_specs=[pl.BlockSpec((1, 1024, LANE), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1024, LANE), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblk, 1024, LANE), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )

        def mk(K, f=f):
            @jax.jit
            def g(x):
                y = None
                for _ in range(K):
                    y = f(x)
                    x = x ^ (y.ravel()[0] & 1).astype(x.dtype)
                return y
            return g

        traffic = 2 * nblk * 1024 * LANE * 4
        vals = []
        for r in range(3):
            s = benchmark_chained(mk, (X,), ks=(8, 64))
            vals.append(s)
            print(f"  {tagn} r{r}: {s*1e3:.4f} ms "
                  f"(floor {traffic/HBM*1e3:.4f})", flush=True)
        med = float(np.median(vals))
        print(json.dumps({"kernel": tagn, "median_ms": round(med * 1e3, 4),
                          "floor_ms": round(traffic / HBM * 1e3, 4)}),
              flush=True)

# ------------------------------------------------------------- section B
if "B" in SECTIONS:
    print("== B: emission-mode pipeline A/B (honest kout)", flush=True)
    chars_j, lengths_j = corpus(B)
    variants = [
        ("p_bytes", dict(emit="bytes"), WITNESS_KEYS, "witness", 16.5),
        ("p_bytes_fusepack", dict(emit="bytes", fuse_pack=True, qpack=False),
         WITNESS_KEYS, "witness", 14.5),
        ("p_direct", dict(emit="direct"), WITNESS_KEYS, "witness", 12.5),
        ("p_kdecode", dict(emit="kdecode"), WITNESS_KEYS, "witness", 16.5),
        ("p_match", dict(emit="bytes"), MATCH_KEYS, "match", 2.8),
        ("p_match_fusepack", dict(emit="bytes", fuse_pack=True, qpack=False),
         MATCH_KEYS, "match", 2.2),
    ]
    rows = []
    args_of = {}
    ref_out = None
    for name, kw, keys, cols, tpb in variants:
        try:
            m = BitplaneMatcher(model, columns=cols, **kw)
            mk = kout_of(m.core, keys)
            out = {k: np.asarray(v)
                   for k, v in m.core(chars_j, lengths_j).items()
                   if k in keys}
            if cols == "witness":
                if ref_out is None:
                    ref_out = out
                    print(f"B: {name} is the exactness reference", flush=True)
                else:
                    for k in WITNESS_KEYS:
                        np.testing.assert_array_equal(
                            ref_out[k], out[k], err_msg=f"{name} {k}")
                    print(f"B: {name} BIT-EXACT", flush=True)
            rows.append((name, mk, tpb * B * L, B))
            args_of[name] = (chars_j, lengths_j)
        except Exception as e:
            print(f"B: {name} unavailable: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    measure_rr(rows, args_of)

# ------------------------------------------------------------- section C
if "C" in SECTIONS:
    print("== C: batch scaling of the shipped pipeline", flush=True)
    m = BitplaneMatcher(model, columns="witness")
    rows = []
    args_of = {}
    for BB in (32768, 65536, 131072):
        try:
            cj, lj = corpus(BB)
            name = f"c_shipped_B{BB//1024}k"
            rows.append((name, kout_of(m.core, WITNESS_KEYS),
                         16.5 * BB * L, BB))
            args_of[name] = (cj, lj)
        except Exception as e:
            print(f"C: B={BB} unavailable: {type(e).__name__}", flush=True)
    measure_rr(rows, args_of, ks=(1, 4))

print(f"total probe time: {time.time()-t0:.0f} s", flush=True)
