"""Round-4 probe: resolve the sub-millisecond kernels the ks=(1,4)
K-slope cannot (probe57 B/C printed physically impossible numbers —
marker_xla "1795 GB/s" > 2x HBM speed-of-light — because a 0.02-0.6 ms
kernel sits below the relay's noise floor on a 3-iteration slope).

Fixes here:
  - large K spans: ks=(8,64) for isolated kernels (56 iterations of
    signal per slope), ks=(1,9) for full pipelines;
  - physicality floor per kernel from its known HBM traffic — any
    reading faster than traffic/819GB/s is noise and discarded;
  - MEDIAN of surviving rounds reported (best-of alongside).

Sections:
  A. per-stage kernel budget (raw_quads/pack/scan/post/fb) at high K
  B. pipeline compositions: match-only vs witness core (the delta is
     the post+decode tail as actually scheduled by XLA)
  C. Parabix marker streams vs the scan kernel (ROADMAP #6 verdict),
     B=32k and B=4096, high-K
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in sys.path:
    sys.path.append("/root/.axon_site")
sys.setrecursionlimit(100_000)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import probe_tpu57_lib as mklib
from halo2_regex_tpu.models import zoo
from halo2_regex_tpu.ops.bitplane import (
    BitplaneMatcher,
    pack_bool,
    pack_bytes,
    raw_quads,
)
from halo2_regex_tpu.utils.cache import enable_compilation_cache
from halo2_regex_tpu.utils.profiling import benchmark_chained, device_specs

B = int(os.environ.get("H2R_PROBE_B", "32768"))
L = int(os.environ.get("H2R_PROBE_L", "1024"))
ROUNDS = int(os.environ.get("H2R_PROBE_ROUNDS", "5"))
# smoke mode: interpret-mode Pallas is ~1000x slower — shrink the spans
KMAX = int(os.environ.get("H2R_PROBE_KMAX", "64"))
LANE = 128
NWS = B // 32 // 128
rng = np.random.default_rng(0)
enable_compilation_cache()
print(f"device: {jax.devices()[0]}", flush=True)
t0 = time.time()
HBM = device_specs()["hbm_gbps"]

model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
chars = np.zeros((B, L), np.uint8)
lengths = np.zeros((B,), np.int32)
alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
alpha_sp = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz @.-:", np.uint8)
for i in range(B):
    name = rng.choice(alpha, size=8).tobytes()
    filler = rng.choice(alpha_sp, size=int(rng.integers(0, L - 96))).tobytes()
    if i % 2 == 0:
        s = filler + b"\r\nfrom:" + name + b"@gmail.com\r\n"
    else:
        s = filler
    s = s[:L]
    chars[i, : len(s)] = bytearray(s)
    lengths[i] = len(s)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)


def chain(fn):
    """K data-dependent repeats of fn inside one jit (scalar feedback)."""

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


def measure(name, mk, args, traffic_bytes, ks, rounds=ROUNDS):
    """Median/best of surviving rounds with a physicality floor."""
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
    print(
        json.dumps(
            {
                "kernel": name,
                "median_ms": round(med * 1e3, 4),
                "best_ms": round(best * 1e3, 4),
                "n": len(vals),
                "input_gbps_median": round(B * L / med / 1e9, 2),
                "traffic_gbps_median": round(traffic_bytes / med / 1e9, 1),
                "hbm_util_median": round(traffic_bytes / med / HBM, 3),
            }
        ),
        flush=True,
    )
    return med


# ---------------------------------------------------------- A: stages
print("== A: per-stage kernel budget (high-K slopes)", flush=True)
m = BitplaneMatcher(model, columns="witness", en_pack=False, qpack=False)
quads = jax.jit(lambda c: raw_quads(c, m.L_pad).reshape(m.L_pad, 8, NWS, 128))
R = quads(chars_j)
bits = m._make_pack(NWS)(R)
logs = m._make_scan_fused(NWS)(bits)
en = jnp.ones((NWS, 1, m.L_pad, 128), jnp.int32)
post_fn = m._make_post(NWS)

BL = B * L
KS_KERN = (min(8, KMAX // 2), KMAX)
stage_meds = {}
for name, fn, a, traffic in [
    # traffic model: tools/traffic_model.py (B=32k x 1KB, MB)
    ("raw_quads", quads, (chars_j,), (33.6 + 33.6) * 1e6),
    ("pack", m._make_pack(NWS), (R,), (33.6 + 21.0) * 1e6),
    ("scan", m._make_scan_fused(NWS), (bits,), (16.8 + 21.0) * 1e6),
    ("post", lambda lg: post_fn(lg, en), (logs,), (25.2 + 67.1) * 1e6),
    ("fb_only", lambda lg: m._make_fb_only(NWS)(lg, en), (logs,),
     (16.8 + 0.7) * 1e6),
]:
    stage_meds[name] = measure(name, chain(fn), a, traffic, KS_KERN)

# ------------------------------------------------- B: compositions
print("== B: pipeline compositions (DCE-proof K-outputs)", flush=True)
WITNESS_KEYS = ("states", "all_substr_ids", "masked_characters", "flags",
                "match_ok")
MATCH_KEYS = ("final_states", "accepted", "has_dead", "match_ok")


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


m_match = BitplaneMatcher(model, columns="match")
med_match = measure(
    "pipeline_match_only", kout_of(m_match.core, MATCH_KEYS),
    (chars_j, lengths_j), 2.8 * BL, (1, min(9, KMAX)),
)
med_wit = measure(
    "pipeline_witness", kout_of(m.core, WITNESS_KEYS),
    (chars_j, lengths_j), 16.5 * BL, (1, min(9, KMAX)),
)
if med_match and med_wit:
    print(f"B: post+decode tail as scheduled: {(med_wit-med_match)*1e3:.3f} ms",
          flush=True)

# ------------------------------------------------- C: Parabix verdict
print("== C: marker streams vs scan kernel (high-K)", flush=True)
import re

expect = np.array(
    [
        re.search(mklib.PY_PATTERN, bytes(chars[i, : lengths[i]]), re.DOTALL)
        is not None
        for i in range(B)
    ]
)
exp_plane = np.asarray(
    pack_bool(jnp.asarray(expect[:, None].astype(np.uint8)), 1)
)[0]
planes8 = pack_bytes(chars_j, L)
pos = np.arange(L)
en_bl = pos[None, :] < lengths[:, None]
en_plane = pack_bool(jnp.asarray(en_bl.astype(np.uint8)), L)
en_next = np.concatenate([en_bl[:, 1:], np.zeros((B, 1), bool)], axis=1)
end_plane = pack_bool(jnp.asarray((en_bl & ~en_next).astype(np.uint8)), L)
stack = jnp.stack(list(planes8) + [en_plane, end_plane])  # [10, L, NW]
NW = B // 32


def marker_xla(st):
    return mklib.marker_match_reduced(
        [st[j] for j in range(8)], st[8], st[9], jnp
    )


out_x = np.asarray(jax.jit(marker_xla)(stack))
np.testing.assert_array_equal(out_x, exp_plane)
print("C: marker XLA bit-exact on hardware", flush=True)


def make_marker_kernel(NWS_k, NT=2):
    NT = min(NT, NWS_k)

    def kern(st_ref, out_ref):
        planes = [st_ref[j] for j in range(8)]
        out_ref[0] = mklib.marker_match_reduced(
            planes, st_ref[8], st_ref[9], jnp
        )[None]

    return pl.pallas_call(
        kern,
        grid=(NWS_k // NT,),
        in_specs=[
            pl.BlockSpec((10, L, NT * LANE), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, 1, NT * LANE), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1, NWS_k * LANE), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )


stack3 = stack.reshape(10, L, NW)
mkk = make_marker_kernel(NWS)
np.testing.assert_array_equal(np.asarray(mkk(stack3)).reshape(NW), exp_plane)
print("C: marker PALLAS bit-exact on hardware", flush=True)

# traffic: markers read 10 int32 planes [L, NW] and write [NW] — ~41.9 MB
marker_traffic = 10 * L * NW * 4 + NW * 4
scan_traffic = (16.8 + 21.0) * 1e6
med_scan = measure("scan_kernel_32k", chain(m._make_scan_fused(NWS)), (bits,),
                   scan_traffic, KS_KERN)
med_mx = measure("marker_xla_32k", chain(marker_xla), (stack,),
                 marker_traffic, KS_KERN)
med_mp = measure("marker_pallas_32k", chain(lambda st: mkk(st)), (stack3,),
                 marker_traffic, KS_KERN)

# small batch (latency regime): B=4096, one packed word group
Bs = 4096
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
ms_small = BitplaneMatcher(model, columns="witness", nws_tile=1, en_pack=False, qpack=False)
Rs = jax.jit(
    lambda c: raw_quads(c, ms_small.L_pad).reshape(ms_small.L_pad, 8, NWS_s, 128)
)(jnp.asarray(chars_s))
bits_s = ms_small._make_pack(NWS_s)(Rs)
mkk_s = make_marker_kernel(NWS_s, NT=1)
sB = Bs * L
for name, mk, a, traffic in [
    ("scan_kernel_4k", chain(ms_small._make_scan_fused(NWS_s)), (bits_s,),
     scan_traffic / 8),
    ("marker_xla_4k", chain(marker_xla), (stack_s,), marker_traffic / 8),
    ("marker_pallas_4k", chain(lambda st: mkk_s(st)), (stack3_s,),
     marker_traffic / 8),
]:
    measure(name, mk, a, traffic, KS_KERN)

print(f"total probe time: {time.time()-t0:.0f} s", flush=True)
