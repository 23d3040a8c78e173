"""Round-4 probe 1: pipeline-config sweep with the FIXED kernels.

probe58_quick (r4, first hardware session) showed the round-3 levers never
lowered on real Mosaic (fori unroll!=1/full; >2D gather in en_pack/qpack).
After the fixes (manual unroll, slice+reshape enable plane — commit
f7f5f65, all configs pass tools/lower_smoke.py) this probe measures the
full knob matrix at the headline shape and checks hardware bit-exactness
of every config against the bytes/u1 baseline.

Decision output: the fastest bit-exact config becomes the shipped default.

Sample hygiene: K-slope samples below the physicality floor (full-HBM
roofline at the 6 B/byte fused-traffic model) are relay-noise degenerates
(probe58 r4 recorded an impossible 492 GB/s best) and are DISCARDED; the
per-config figure is the median of surviving samples across rounds.
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

from halo2_regex_tpu.models import zoo
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher
from halo2_regex_tpu.utils.cache import enable_compilation_cache
from halo2_regex_tpu.utils.profiling import (
    benchmark_chained,
    scan_roofline_bytes_per_sec,
)

B = int(os.environ.get("H2R_PROBE_B", "32768"))
L = int(os.environ.get("H2R_PROBE_L", "1024"))
ROUNDS = int(os.environ.get("H2R_PROBE_ROUNDS", "3"))
GAP = float(os.environ.get("H2R_PROBE_GAP_SEC", "15"))
rng = np.random.default_rng(0)
enable_compilation_cache()
print(f"device: {jax.devices()[0]}", flush=True)
t0 = time.time()

model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
chars = np.zeros((B, L), np.uint8)
lengths = np.zeros((B,), np.int32)
alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
alpha_sp = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", np.uint8)
for i in range(B):
    name = rng.choice(alpha, size=8).tobytes()
    filler = rng.choice(alpha_sp, size=int(rng.integers(0, L - 96))).tobytes()
    s = filler + b"\r\nfrom:" + name + b"@gmail.com\r\n"
    chars[i, : len(s)] = bytearray(s)
    lengths[i] = len(s)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)

KEYS = ("states", "all_substr_ids", "masked_characters", "flags", "match_ok")


def kout_of(core):
    def make(K):
        @jax.jit
        def f(c, ln):
            return [
                tuple(core(c ^ np.uint8(i), ln ^ i)[k] for k in KEYS)
                for i in range(K)
            ]

        return f

    return make


CONFIGS = [
    ("bytes/u1", {}, dict(unroll=1)),
    ("bytes/u4", {}, dict(unroll=4)),
    ("bytes/u8", {}, dict(unroll=8)),
    ("bytes/ufull", {}, dict(unroll=10**9)),
    ("bytes/en-pack/u1", dict(H2R_EN_PACK="1"), dict(unroll=1)),
    ("bytes/fuse-pack/u1", dict(H2R_FUSE_PACK="1"), dict(unroll=1)),
    ("kdecode/u1", dict(H2R_EMIT="kdecode"), dict(unroll=1)),
    ("kdecode/en-pack/u1",
     dict(H2R_EMIT="kdecode", H2R_EN_PACK="1"), dict(unroll=1)),
    ("kdecode/en-pack/qpack/u1",
     dict(H2R_EMIT="kdecode", H2R_EN_PACK="1", H2R_QPACK="1"),
     dict(unroll=1)),
    ("kdecode/en-pack/qpack/u4",
     dict(H2R_EMIT="kdecode", H2R_EN_PACK="1", H2R_QPACK="1"),
     dict(unroll=4)),
]
ENV_KEYS = ("H2R_EMIT", "H2R_EN_PACK", "H2R_QPACK", "H2R_FUSE_PACK")

matchers = {}
for name, env, kw in CONFIGS:
    for k in ENV_KEYS:
        os.environ.pop(k, None)
    os.environ.update(env)
    try:
        matchers[name] = BitplaneMatcher(model, columns="witness", **kw)
    except Exception as e:
        print(f"{name} construction FAILED: {type(e).__name__}", flush=True)
for k in ENV_KEYS:
    os.environ.pop(k, None)

floor = B * L / scan_roofline_bytes_per_sec()
samples = {name: [] for name, _, _ in CONFIGS}
dead = set()
for rnd in range(ROUNDS):
    for name, _e, _k in CONFIGS:
        if name not in matchers or name in dead:
            continue
        try:
            s = benchmark_chained(
                kout_of(matchers[name].core), (chars_j, lengths_j), ks=(1, 4)
            )
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            dead.add(name)
            continue
        tag = "" if s > floor else "  DISCARD(sub-roofline)"
        if s > floor:
            samples[name].append(s)
        print(f"r{rnd} {name}: {s*1e3:7.3f} ms{tag}", flush=True)
    if GAP and rnd < ROUNDS - 1:
        time.sleep(GAP)

print("---- medians ----", flush=True)
for name, ss in samples.items():
    if not ss:
        continue
    med = float(np.median(ss))
    print(
        f"MED {name}: {med*1e3:7.3f} ms = {B*L/med/1e9:5.1f} GB/s "
        f"(n={len(ss)}, best {min(ss)*1e3:.3f})",
        flush=True,
    )

# hardware bit-exactness of every config vs the u1 baseline
ob = {k: np.asarray(v)
      for k, v in matchers["bytes/u1"]._run(chars_j, lengths_j).items()}
for name, _e, _k in CONFIGS[1:]:
    if name not in matchers or name in dead:
        continue
    try:
        ok = {k: np.asarray(v)
              for k, v in matchers[name]._run(chars_j, lengths_j).items()}
        for k in ob:
            np.testing.assert_array_equal(ob[k], ok[k], err_msg=f"{name} {k}")
        print(f"{name} bit-exact on hardware", flush=True)
    except Exception as e:
        print(f"{name} exactness FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
print(f"total: {time.time()-t0:.0f} s", flush=True)
