"""Late-relay contingency: the minimum hardware session that makes the
round-3 default-flip decision — probe57's section A alone (pipeline
config sweep + hardware bit-exactness), 2 rounds, no extras.

Run when the relay returns with too little time left for probe56+57.
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
from halo2_regex_tpu.utils.profiling import benchmark_chained

# shapes overridable for CPU smoke-testing (B: multiple of 4096)
B = int(os.environ.get("H2R_PROBE_B", "32768"))
L = int(os.environ.get("H2R_PROBE_L", "1024"))
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


CONFIGS_A = [
    ("bytes/en-xla/u1", dict(H2R_EMIT="bytes"), dict(unroll=1)),
    ("bytes/en-xla/u4", dict(H2R_EMIT="bytes"), dict(unroll=4)),
    ("kdecode/en-pack/u4",
     dict(H2R_EMIT="kdecode", H2R_EN_PACK="1"), dict(unroll=4)),
    ("kdecode/en-pack/qpack/u4",
     dict(H2R_EMIT="kdecode", H2R_EN_PACK="1", H2R_QPACK="1"),
     dict(unroll=4)),
]
matchers = {}
for name, env, kw in CONFIGS_A:
    for k in ("H2R_EMIT", "H2R_EN_PACK", "H2R_QPACK"):
        os.environ.pop(k, None)
    os.environ.update(env)
    try:
        matchers[name] = BitplaneMatcher(model, columns="witness", **kw)
    except Exception as e:
        print(f"{name} construction FAILED: {type(e).__name__}", flush=True)
for k in ("H2R_EMIT", "H2R_EN_PACK", "H2R_QPACK"):
    os.environ.pop(k, None)

best = {}
dead = set()
for rnd in range(2):
    for name, _e, _k in CONFIGS_A:
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
        if s > 1e-7:
            best[name] = min(best.get(name, float("inf")), s)
        print(f"r{rnd} {name}: {s*1e3:7.3f} ms", flush=True)
for name, s in best.items():
    print(f"BEST {name}: {s*1e3:.3f} ms = {B*L/s/1e9:.1f} GB/s", flush=True)

ob = {k: np.asarray(v)
      for k, v in matchers["bytes/en-xla/u1"]._run(chars_j, lengths_j).items()}
for name, _e, _k in CONFIGS_A[1:]:
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
