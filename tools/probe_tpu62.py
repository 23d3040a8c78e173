"""Round-4 probe: probe57's sections E (mid-tier structured model) and
F (match-only serving) re-run standalone with the high-K median
methodology of probe_tpu61 — probe57's section D (64KB monolithic
bitplane compile) starved them of relay time (its remote compile alone
exceeded 55 min; see docs/PERF.md round-4 notes).

E: config3_structured_stress-shaped model (~700 live states) — the
   depth-floor confirmation (VERDICT r2 #4 / r3 #5): does unroll lift
   the serial step chain toward 2 ops/cycle (17-20 GB/s projection)?
F: columns="match" serving pipeline at u1/u4.
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
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher
from halo2_regex_tpu.utils.cache import enable_compilation_cache
from halo2_regex_tpu.utils.profiling import benchmark_chained, device_specs

B = int(os.environ.get("H2R_PROBE_B", "32768"))
L = int(os.environ.get("H2R_PROBE_L", "1024"))
ROUNDS = int(os.environ.get("H2R_PROBE_ROUNDS", "4"))
KMAX = int(os.environ.get("H2R_PROBE_KMAX", "9"))
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


WITNESS_KEYS = ("states", "all_substr_ids", "masked_characters", "flags",
                "match_ok")
MATCH_KEYS = ("final_states", "accepted", "has_dead", "match_ok")

# ------------------------------------------------- E: mid-tier model
print("== E: mid-tier structured model (depth-floor confirmation)",
      flush=True)
from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models.compiled import CompiledRegexModel

rngs = np.random.default_rng(1)
letters = "abcdefghijklmnopqrstuvwxyz"
words = sorted({
    "".join(letters[i] for i in rngs.integers(0, 26, int(rngs.integers(5, 9))))
    for _ in range(int(os.environ.get("H2R_PROBE_WORDS", "200")))
})
scfg = DecomposedRegexConfig.from_json({
    "max_byte_size": L,
    "parts": [
        {"is_public": False, "regex_def": "tag:", "max_size": 4},
        {"is_public": False, "regex_def": "(" + "|".join(words) + ")",
         "max_size": 16},
        {"is_public": False, "regex_def": "\r\n", "max_size": 2},
    ],
})
smodel = CompiledRegexModel.from_decomposed([scfg], max_chars_size=L)
schars = rngs.integers(32, 127, size=(B, L)).astype(np.uint8)
sc = jnp.asarray(schars)
sl = jnp.asarray(np.full((B,), L, np.int32))
for uname, kw in (("u1", dict(unroll=1)), ("u2", dict(unroll=2)),
                  ("u4", dict(unroll=4))):
    try:
        ms = BitplaneMatcher(smodel, columns="witness", **kw)
        measure(f"struct_witness_{uname}", kout_of(ms.core, WITNESS_KEYS),
                (sc, sl), 16.5 * BL, (1, min(5, KMAX)), rounds=min(2, ROUNDS))
    except Exception as e:
        print(f"E {uname} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)

# the isolated scan kernel for the struct model: ops/cycle estimate
try:
    from halo2_regex_tpu.ops.bitplane import raw_quads

    NWS = B // 32 // 128
    m1 = BitplaneMatcher(smodel, columns="witness", unroll=1, en_pack=False, qpack=False)
    R = jax.jit(lambda c: raw_quads(c, m1.L_pad).reshape(m1.L_pad, 8, NWS, 128))(sc)
    bits = m1._make_pack(NWS)(R)

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

    for uname, kw in (("u1", dict(unroll=1)), ("u4", dict(unroll=4))):
        mu = BitplaneMatcher(smodel, columns="witness", **kw)
        measure(f"struct_scan_{uname}", chain(mu._make_scan_fused(NWS)),
                (bits,), (16.8 + 21.0) * 1e6 * 4,
                (min(4, max(1, KMAX // 2)), min(16, KMAX)), rounds=min(3, ROUNDS))
except Exception as e:
    print(f"E scan-iso FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

# ------------------------------------------------- F: match-only
print("== F: match-only serving pipeline", flush=True)
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
for uname, kw in (("u1", dict(unroll=1)), ("u4", dict(unroll=4))):
    try:
        mm = BitplaneMatcher(model, columns="match", **kw)
        measure(f"match_only_{uname}", kout_of(mm.core, MATCH_KEYS),
                (chars_j, lengths_j), 2.8 * BL, (1, KMAX))
    except Exception as e:
        print(f"F {uname} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)

# hardware correctness: match-only vs full witness verdicts
mm = BitplaneMatcher(model, columns="match")
mw = BitplaneMatcher(model, columns="witness")
np.testing.assert_array_equal(
    np.asarray(mm._run(chars_j, lengths_j)["match_ok"]),
    np.asarray(mw._run(chars_j, lengths_j)["match_ok"]),
)
print("F: match-only bit-exact vs witness pipeline on hardware", flush=True)
print(f"total probe time: {time.time()-t0:.0f} s", flush=True)
