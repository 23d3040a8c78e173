"""Round-3 probe 2: kdecode A/B + Parabix marker streams A/B (ROADMAP #6).

  A. Full witness pipeline, H2R_EMIT=bytes vs kdecode (the new standalone
     decode kernel), DCE-proof K-outputs harness at B=32k.
  B. Marker-stream matcher for the restricted from-header form
     (tools/probe_tpu57_lib.py, bit-exact vs Python re) vs the full DFA
     scan kernel at the same shape: regex->bitstream compilation's
     favorable case (match-only, two spans, no per-position states).
     Variants: XLA jit on packed planes (log-scan rounds hit HBM) and a
     whole-plane Pallas kernel (everything VMEM-resident).
  C. Small-batch latency: B=2048 marker kernel vs scan kernel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in sys.path:
    sys.path.append("/root/.axon_site")
sys.setrecursionlimit(100_000)

import re

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import probe_tpu57_lib as mk
from halo2_regex_tpu.models import zoo
from halo2_regex_tpu.ops.bitplane import (
    BitplaneMatcher,
    pack_bool,
    pack_bytes,
    raw_quads,
)
from halo2_regex_tpu.utils.cache import enable_compilation_cache
from halo2_regex_tpu.utils.profiling import benchmark_chained

# shapes overridable for CPU smoke-testing (B: multiple of 4096)
B = int(os.environ.get("H2R_PROBE_B", "32768"))
L = int(os.environ.get("H2R_PROBE_L", "1024"))
NWS = B // 32 // 128
LANE = 128
rng = np.random.default_rng(0)

enable_compilation_cache()
print(f"device: {jax.devices()[0]}", flush=True)
t0 = time.time()

# corpus: half junk, half valid restricted from-headers
chars = np.zeros((B, L), np.uint8)
lengths = np.zeros((B,), np.int32)
alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
alpha_sp = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz @.-:", np.uint8)
for i in range(B):
    name = rng.choice(alpha, size=8).tobytes()
    filler_len = int(rng.integers(0, max(1, L - 96)))
    filler = rng.choice(alpha_sp, size=filler_len).tobytes()
    if i % 2 == 0:
        s = filler + b"\r\nfrom:" + name + b"@gmail.com\r\n"
    else:
        s = filler
    s = s[:L]
    chars[i, : len(s)] = bytearray(s)
    lengths[i] = len(s)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)

WITNESS_KEYS = ("states", "all_substr_ids", "masked_characters", "flags",
                "match_ok")


def kout_of(core):
    def make(K):
        @jax.jit
        def f(c, ln):
            outs = []
            for i in range(K):
                out = core(c ^ np.uint8(i), ln ^ i)
                outs.append(tuple(out[k] for k in WITNESS_KEYS))
            return outs

        return f

    return make


# --------------------------------------------- A: pipeline config sweep
# emit mode x en-in-pack x scan unroll: the candidate production configs,
# honest K-outputs harness.
model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
CONFIGS_A = [
    ("bytes/en-xla/u1", dict(H2R_EMIT="bytes"), dict(unroll=1)),
    ("kdecode/en-xla/u1", dict(H2R_EMIT="kdecode"), dict(unroll=1)),
    ("kdecode/en-pack/u1", dict(H2R_EMIT="kdecode", H2R_EN_PACK="1"), dict(unroll=1)),
    ("bytes/en-xla/u4", dict(H2R_EMIT="bytes"), dict(unroll=4)),
    ("kdecode/en-pack/u4", dict(H2R_EMIT="kdecode", H2R_EN_PACK="1"), dict(unroll=4)),
    ("kdecode/en-pack/qpack/u4",
     dict(H2R_EMIT="kdecode", H2R_EN_PACK="1", H2R_QPACK="1"), dict(unroll=4)),
]
matchersA = {}
for name, env, kw in CONFIGS_A:
    for k in ("H2R_EMIT", "H2R_EN_PACK", "H2R_QPACK"):
        os.environ.pop(k, None)
    os.environ.update(env)
    try:
        matchersA[name] = BitplaneMatcher(model, columns="witness", **kw)
    except Exception as e:
        print(f"A: {name} construction FAILED: {type(e).__name__}", flush=True)
for k in ("H2R_EMIT", "H2R_EN_PACK", "H2R_QPACK"):
    os.environ.pop(k, None)
best = {}
dead = set()
for rnd in range(3):
    for name, _env, _kw in CONFIGS_A:
        if name not in matchersA or name in dead:
            continue
        m = matchersA[name]
        try:
            s = benchmark_chained(
                kout_of(m.core), (chars_j, lengths_j), ks=(1, 4)
            )
        except Exception as e:
            print(f"A: {name} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            dead.add(name)
            continue
        if s > 1e-7:
            best[name] = min(best.get(name, float("inf")), s)
        print(f"A r{rnd}: {name}: {s*1e3:7.3f} ms", flush=True)
for name, s in best.items():
    print(f"A BEST {name}: {s*1e3:.3f} ms = {B*L/s/1e9:.1f} GB/s", flush=True)

# hardware bit-exactness: every surviving config vs the bytes/u1 baseline
ob = {k: np.asarray(v)
      for k, v in matchersA["bytes/en-xla/u1"]._run(chars_j, lengths_j).items()}
for name, _env, _kw in CONFIGS_A[1:]:
    if name not in matchersA or name in dead:
        continue
    try:
        ok = {k: np.asarray(v)
              for k, v in matchersA[name]._run(chars_j, lengths_j).items()}
        for k in ob:
            np.testing.assert_array_equal(ob[k], ok[k], err_msg=f"{name} {k}")
        print(f"A: {name} bit-exact on hardware", flush=True)
    except AssertionError as e:
        print(f"A: {name} BIT-MISMATCH: {str(e)[:200]}", flush=True)
    except Exception as e:
        print(f"A: {name} exactness check failed: {type(e).__name__}",
              flush=True)

# --------------------------------------------------------------- B: marker A/B
expect = np.array(
    [
        re.search(mk.PY_PATTERN, bytes(chars[i, : lengths[i]]), re.DOTALL)
        is not None
        for i in range(B)
    ]
)
exp_plane = np.asarray(pack_bool(jnp.asarray(expect[:, None].astype(np.uint8)), 1))[0]

planes8 = pack_bytes(chars_j, L)
pos = np.arange(L)
en_bl = pos[None, :] < lengths[:, None]
en_plane = pack_bool(jnp.asarray(en_bl.astype(np.uint8)), L)
en_next = np.concatenate([en_bl[:, 1:], np.zeros((B, 1), bool)], axis=1)
end_plane = pack_bool(jnp.asarray((en_bl & ~en_next).astype(np.uint8)), L)

stack = jnp.stack(list(planes8) + [en_plane, end_plane])  # [10, L, NW]


def marker_xla(st):
    return mk.marker_match_reduced(
        [st[j] for j in range(8)], st[8], st[9], jnp
    )


out_x = np.asarray(jax.jit(marker_xla)(stack))
np.testing.assert_array_equal(out_x, exp_plane)
print("B: marker XLA bit-exact vs python re on hardware", flush=True)

# Pallas whole-plane kernel: [10, L, NT*LANE] blocks, everything in VMEM.
NW = B // 32


def make_marker_kernel(NWS_k, NT=2):
    NT = min(NT, NWS_k)  # small smoke shapes: grid must stay >= 1
    def kern(st_ref, out_ref):
        planes = [st_ref[j] for j in range(8)]
        enp = st_ref[8]
        endp = st_ref[9]
        out_ref[0] = mk.marker_match_reduced(planes, enp, endp, jnp)[None]

    return pl.pallas_call(
        kern,
        grid=(NWS_k // NT,),
        in_specs=[
            pl.BlockSpec(
                (10, L, NT * LANE),
                lambda b: (0, 0, b),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, NT * LANE), lambda b: (0, 0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1, NWS_k * LANE), jnp.int32),
        interpret=False,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                os.environ.get("H2R_VMEM_LIMIT", 100 * 1024 * 1024)
            )
        ),
    )


stack3 = stack.reshape(10, L, NW)
try:
    mkk = make_marker_kernel(NWS)
    out_p = np.asarray(mkk(stack3)).reshape(NW)
    np.testing.assert_array_equal(out_p, exp_plane)
    print("B: marker PALLAS kernel bit-exact", flush=True)
    marker_pallas_ok = True
except Exception as e:
    print(f"B: marker pallas FAILED: {type(e).__name__}: {str(e)[:200]}",
          flush=True)
    marker_pallas_ok = False


def chain(fn, getdep):
    def mkc(K):
        @jax.jit
        def f(x):
            y = None
            for _ in range(K):
                y = fn(x)
                x = x ^ getdep(y).astype(x.dtype)
            return y

        return f

    return mkc


# the DFA scan kernel at the same shape (the thing marker streams would
# replace): fused scan on the packed class planes
mscan = BitplaneMatcher(model, columns="witness", en_pack=False, qpack=False)
R = jax.jit(lambda c: raw_quads(c, mscan.L_pad).reshape(mscan.L_pad, 8, NWS, 128))(chars_j)
bits = mscan._make_pack(NWS)(R)
bestB = {}
for rnd in range(3):
    s_scan = benchmark_chained(
        chain(mscan._make_scan_fused(NWS), lambda y: y.ravel()[0] & 1),
        (bits,), ks=(1, 4),
    )
    s_mx = benchmark_chained(
        chain(marker_xla, lambda y: y.ravel()[0] & 1), (stack,), ks=(1, 4)
    )
    rowB = {"scan_kernel": s_scan, "marker_xla": s_mx}
    if marker_pallas_ok:
        s_mp = benchmark_chained(
            chain(lambda st: mkk(st), lambda y: y.ravel()[0] & 1),
            (stack3,), ks=(1, 4),
        )
        rowB["marker_pallas"] = s_mp
    for nm, s in rowB.items():
        if s > 1e-7:
            bestB[nm] = min(bestB.get(nm, float("inf")), s)
    print(
        "B r%d: " % rnd
        + "  ".join(f"{nm} {s*1e3:7.3f} ms" for nm, s in rowB.items()),
        flush=True,
    )
for nm, s in bestB.items():
    print(f"B BEST {nm}: {s*1e3:.3f} ms = {B*L/s/1e9:.1f} GB/s", flush=True)

# ------------------------------------------------- C: small-batch latency
Bs = min(4096, B)  # one packed word group (the minimum plane width)
NWS_s = 1
chars_s = chars[:Bs]
lengths_s = lengths[:Bs]
planes_s = pack_bytes(jnp.asarray(chars_s), L)
enb = pos[None, :] < lengths_s[:, None]
en_s = pack_bool(jnp.asarray(enb.astype(np.uint8)), L)
enn = np.concatenate([enb[:, 1:], np.zeros((Bs, 1), bool)], axis=1)
end_s = pack_bool(jnp.asarray((enb & ~enn).astype(np.uint8)), L)
stack_s = jnp.stack(list(planes_s) + [en_s, end_s])
stack3_s = stack_s.reshape(10, L, Bs // 32)
ms = BitplaneMatcher(model, columns="witness", nws_tile=1, en_pack=False, qpack=False)
Rs = jax.jit(lambda c: raw_quads(c, ms.L_pad).reshape(ms.L_pad, 8, NWS_s, 128))(jnp.asarray(chars_s))
bits_s = ms._make_pack(NWS_s)(Rs)
mkk_s = make_marker_kernel(NWS_s, NT=1) if marker_pallas_ok else None
for rnd in range(2):
    row = {"marker_xla": benchmark_chained(
        chain(marker_xla, lambda y: y.ravel()[0] & 1), (stack_s,), ks=(1, 8))}
    if mkk_s is not None:
        row["marker_pallas"] = benchmark_chained(
            chain(lambda st: mkk_s(st), lambda y: y.ravel()[0] & 1),
            (stack3_s,), ks=(1, 8))
    row["scan_kernel"] = benchmark_chained(
        chain(ms._make_scan_fused(NWS_s), lambda y: y.ravel()[0] & 1),
        (bits_s,), ks=(1, 8))
    print("C r%d (B=%d): " % (rnd, Bs)
          + "  ".join(f"{nm} {v*1e6:8.1f} us" for nm, v in row.items()),
          flush=True)

# ---------------------------------------------- D: 64KB-input bitplane
# VERDICT r2 weakness #8: the long-input bitplane tier was analyzed (VPU
# underfill at the B that fits HBM) but never measured. Anchor the
# analysis: B=4096 x 64KB email model (NT=1, 8x lane underfill) vs the
# segmented split-Pallas path at the same shape.
try:
    L64 = int(os.environ.get("H2R_PROBE_L64", "65536"))
    B64 = int(os.environ.get("H2R_PROBE_B64", "4096"))
    model64 = zoo.email_headers_model(max_chars_size=L64, headers=("from",))
    chars64 = np.zeros((B64, L64), np.uint8)
    lengths64 = np.zeros((B64,), np.int32)
    for i in range(B64):
        filler_len = int(rng.integers(0, L64 - 96))
        s64 = (bytes(rng.choice(alpha_sp, size=filler_len))
               + b"\r\nfrom:" + bytes(rng.choice(alpha, size=8))
               + b"@gmail.com\r\n")[:L64]
        chars64[i, : len(s64)] = bytearray(s64)
        lengths64[i] = len(s64)
    c64 = jnp.asarray(chars64)
    l64 = jnp.asarray(lengths64)
    m64 = BitplaneMatcher(model64, columns="witness")
    s_bp = benchmark_chained(kout_of(m64.core), (c64, l64), ks=(1, 3))
    print(f"D: bitplane 64KB (NT=1): {s_bp*1e3:8.3f} ms = "
          f"{B64*L64/s_bp/1e9:.1f} GB/s", flush=True)
except Exception as e:
    print(f"D: bitplane 64KB FAILED: {type(e).__name__}: {str(e)[:200]}",
          flush=True)
try:
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher

    p64 = PallasMatcher(model64)

    def seg_one(c, ln):
        out = p64._run(c, ln)
        return {k: out[k] for k in
                ("states", "all_substr_ids", "masked_characters", "mask",
                 "match_ok")}

    KEYS_SAVE = WITNESS_KEYS
    def mk_seg(K):
        @jax.jit
        def f(c, ln):
            outs = []
            for i in range(K):
                out = seg_one(c ^ np.uint8(i), ln ^ i)
                outs.append(tuple(out.values()))
            return outs
        return f
    s_seg = benchmark_chained(mk_seg, (c64, l64), ks=(1, 3))
    print(f"D: segmented 64KB:      {s_seg*1e3:8.3f} ms = "
          f"{B64*L64/s_seg/1e9:.1f} GB/s", flush=True)
except Exception as e:
    print(f"D: segmented 64KB FAILED: {type(e).__name__}: {str(e)[:200]}",
          flush=True)

# ------------------------------------- E: mid-tier structured model
# VERDICT r2 #4: config3_structured_stress (693 live states, 2530 step
# ops) at 9.6 GB/s. Measure with the round-3 stages + unroll to see if
# the general levers reach the 20 GB/s bar, else the depth-floor note
# stands (the serial chain is ~2.6 M vops at B=32k; ops/cycle from
# probe56 A bounds it).
try:
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel

    rngs = np.random.default_rng(1)
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = sorted({
        "".join(letters[i] for i in rngs.integers(0, 26, int(rngs.integers(5, 9))))
        for _ in range(200)
    })
    scfg = DecomposedRegexConfig.from_json({
        "max_byte_size": 1024,
        "parts": [
            {"is_public": False, "regex_def": "tag:", "max_size": 4},
            {"is_public": False, "regex_def": "(" + "|".join(words) + ")",
             "max_size": 16},
            {"is_public": False, "regex_def": "\r\n", "max_size": 2},
        ],
    })
    smodel = CompiledRegexModel.from_decomposed([scfg], max_chars_size=1024)
    schars = rngs.integers(32, 127, size=(B, 1024)).astype(np.uint8)
    slengths = np.full((B,), 1024, np.int32)
    sc = jnp.asarray(schars)
    sl = jnp.asarray(slengths)
    for name, env, kw in (
        ("struct bytes/u1", {}, dict(unroll=1)),
        ("struct kdecode/enpack/u4",
         dict(H2R_EMIT="kdecode", H2R_EN_PACK="1"), dict(unroll=4)),
    ):
        for k in ("H2R_EMIT", "H2R_EN_PACK", "H2R_QPACK"):
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            ms = BitplaneMatcher(smodel, columns="witness", **kw)
            bestE = float("inf")
            for rnd in range(2):
                sE = benchmark_chained(kout_of(ms.core), (sc, sl), ks=(1, 3))
                if sE > 1e-7:
                    bestE = min(bestE, sE)
            print(f"E: {name}: {bestE*1e3:8.3f} ms = "
                  f"{B*1024/bestE/1e9:.1f} GB/s", flush=True)
        except Exception as e:
            print(f"E: {name} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    for k in ("H2R_EMIT", "H2R_EN_PACK", "H2R_QPACK"):
        os.environ.pop(k, None)
except Exception as e:
    print(f"E: structured setup FAILED: {type(e).__name__}", flush=True)

# --------------------------------- F: match-only serving pipeline
# columns="match": pack -> scan -> boundary-reduce, ~2.8 B/byte traffic.
# The corpus-filtering headline: with the decode gone the serial scan is
# the only meaningful cost.
try:
    MATCH_KEYS = ("final_states", "accepted", "has_dead", "match_ok")

    def kout_match(core):
        def make(K):
            @jax.jit
            def f(c, ln):
                outs = []
                for i in range(K):
                    out = core(c ^ np.uint8(i), ln ^ i)
                    outs.append(tuple(out[k] for k in MATCH_KEYS))
                return outs
            return f
        return make

    for uname, kw in (("u1", dict(unroll=1)), ("u4", dict(unroll=4))):
        mm = BitplaneMatcher(model, columns="match", **kw)
        bestF = float("inf")
        for rnd in range(3):
            sF = benchmark_chained(
                kout_match(mm.core), (chars_j, lengths_j), ks=(1, 4)
            )
            if sF > 1e-7:
                bestF = min(bestF, sF)
        print(f"F: match-only {uname}: {bestF*1e3:8.3f} ms = "
              f"{B*L/bestF/1e9:.1f} GB/s", flush=True)
    # correctness vs the full pipeline on hardware
    mm = BitplaneMatcher(model, columns="match")
    om = mm._run(chars_j, lengths_j)
    np.testing.assert_array_equal(
        np.asarray(om["match_ok"]), ob["match_ok"])
    print("F: match-only bit-exact on hardware", flush=True)
except Exception as e:
    print(f"F: match-only FAILED: {type(e).__name__}: {str(e)[:200]}",
          flush=True)

print(f"total probe time: {time.time()-t0:.0f} s", flush=True)
