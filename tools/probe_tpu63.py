"""Round-4 probe: attack the measured pipeline budget (probe_tpu61).

probe61's stage budget at B=32k x 1KB (medians, relay chip):
    raw_quads 0.833 ms (9.8% HBM util!)   pack 0.275   scan 0.073
    post 0.159   | match-only pipeline 1.521 | witness pipeline 2.635

raw_quads — the XLA [B,L]u8 -> quad-row transpose — is the single
biggest stage and runs at 10x off its bandwidth floor.  qpack replaces
it in-kernel but round 3 only ever swept qpack INSIDE kdecode configs
(which lose for their own reason); this probe finally measures the
winning `bytes` emission with qpack / en_pack / fuse_pack toggled.

Also isolates the kdecode decode kernel itself to explain its 2.5x
pipeline regression (kernel-slow vs scheduling-slow).
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

from halo2_regex_tpu.models import zoo
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher, raw_quads
from halo2_regex_tpu.utils.cache import enable_compilation_cache
from halo2_regex_tpu.utils.profiling import benchmark_chained, device_specs

B = int(os.environ.get("H2R_PROBE_B", "32768"))
L = int(os.environ.get("H2R_PROBE_L", "1024"))
ROUNDS = int(os.environ.get("H2R_PROBE_ROUNDS", "5"))
KMAX = int(os.environ.get("H2R_PROBE_KMAX", "9"))
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
MATCH_KEYS = ("final_states", "accepted", "has_dead", "match_ok")


def measure(name, mk, args, traffic_bytes, ks, rounds=ROUNDS):
    floor = traffic_bytes / HBM
    vals = []
    for rnd in range(rounds):
        try:
            s = benchmark_chained(mk, args, ks=ks)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return None
        tag = "" if s > floor else "  (< physical floor, discarded)"
        print(f"  r{rnd} {name}: {s*1e3:8.4f} ms{tag}", flush=True)
        if s > floor:
            vals.append(s)
    if not vals:
        print(f"{name}: no credible samples", flush=True)
        return None
    med, best = float(np.median(vals)), min(vals)
    print(json.dumps({
        "kernel": name,
        "median_ms": round(med * 1e3, 4),
        "best_ms": round(best * 1e3, 4),
        "n": len(vals),
        "input_gbps_median": round(BL / med / 1e9, 2),
    }), flush=True)
    return med


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


def chain(fn):
    def mk(K):
        @jax.jit
        def f(x):
            y = None
            for _ in range(K):
                y = fn(x)
                y0 = y[0] if isinstance(y, (tuple, list)) else y
                x = x ^ (y0.ravel()[0] & 1).astype(x.dtype)
            return y

        return f

    return mk


# ------------------------------------------- A: bytes-emission knob sweep
print("== A: bytes emission x {qpack, en_pack, fuse_pack} (witness)",
      flush=True)
CONFIGS = [
    ("bytes/u1", dict()),
    ("bytes/qpack/u1", dict(qpack=True)),
    ("bytes/enpack/u1", dict(en_pack=True)),
    ("bytes/qpack/enpack/u1", dict(qpack=True, en_pack=True)),
    ("bytes/fusepack/u1", dict(fuse_pack=True)),
]
matchers = {}
for name, kw in CONFIGS:
    try:
        matchers[name] = BitplaneMatcher(
            model, columns="witness", emit="bytes", **kw
        )
    except Exception as e:
        print(f"A: {name} construction FAILED: {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
meds = {}
for name, _kw in CONFIGS:
    if name in matchers:
        meds[name] = measure(
            name, kout_of(matchers[name].core, WITNESS_KEYS),
            (chars_j, lengths_j), 16.5 * BL, (1, KMAX),
        )
# hardware bit-exactness vs the baseline config
if "bytes/u1" in matchers:
    ob = {k: np.asarray(v)
          for k, v in matchers["bytes/u1"]._run(chars_j, lengths_j).items()}
    for name, _kw in CONFIGS[1:]:
        if name not in matchers:
            continue
        try:
            ok = {k: np.asarray(v)
                  for k, v in matchers[name]._run(chars_j, lengths_j).items()}
            for k in ob:
                np.testing.assert_array_equal(ob[k], ok[k],
                                              err_msg=f"{name} {k}")
            print(f"A: {name} bit-exact on hardware", flush=True)
        except Exception as e:
            print(f"A: {name} exactness FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

# ------------------------------------------- B: match-only serving sweep
print("== B: match-only x {qpack, en_pack}", flush=True)
for name, kw in [
    ("match/u1", dict()),
    ("match/qpack/enpack/u1", dict(qpack=True, en_pack=True)),
]:
    try:
        mm = BitplaneMatcher(model, columns="match", emit="bytes", **kw)
        measure(name, kout_of(mm.core, MATCH_KEYS),
                (chars_j, lengths_j), 2.8 * BL, (1, KMAX))
    except Exception as e:
        print(f"B: {name} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)

# ------------------------------------------- C: kdecode kernel isolation
print("== C: kdecode decode kernel isolated (diagnosis)", flush=True)
try:
    mk_dec = BitplaneMatcher(model, columns="witness", emit="kdecode", en_pack=False, qpack=False)
    NWS = B // 32 // 128
    quads = jax.jit(
        lambda c: raw_quads(c, mk_dec.L_pad).reshape(mk_dec.L_pad, 8, NWS, 128)
    )
    R = quads(chars_j)
    bits = mk_dec._make_pack(NWS)(R)
    logs = mk_dec._make_scan_fused(NWS)(bits)
    en = jnp.ones((NWS, 1, mk_dec.L_pad, 128), jnp.int32)
    post_out = mk_dec._make_post(NWS)(logs, en)
    g4 = post_out[0] if isinstance(post_out, (tuple, list)) else post_out
    G = len(mk_dec._wgroups)
    g4r = g4.reshape(NWS, G, 8, mk_dec.L_pad, 128)
    ch_l4 = jax.lax.bitcast_convert_type(
        chars_j.reshape(B, mk_dec.L_pad // 4, 4), jnp.int32
    )
    dec_fn = mk_dec._make_decode(NWS)
    # decode traffic: reads g4 (NWS*G*8*L*128*4 B) + chars, writes the
    # field columns (~5 B/byte string-major)
    dec_traffic = g4r.size * 4 + ch_l4.size * 4 + 5 * BL
    measure("kdecode_kernel", chain(lambda g: dec_fn(g, ch_l4)), (g4r,),
            dec_traffic, (min(4, max(1, KMAX // 2)), min(16, KMAX)))
except Exception as e:
    print(f"C: FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

print(f"total probe time: {time.time()-t0:.0f} s", flush=True)
