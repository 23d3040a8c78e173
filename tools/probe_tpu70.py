"""Round-5 probe G: XLA tail reformulations (pure XLA, no new kernels).

probe69: shipped bytes pipeline 1.97 ms median (front 0.71 stable, so
the in-context XLA tail+finish is ~1.26 ms); kdecode/direct/MXU decode
kernels are all structurally dead (u8 bitcast = physical relayout copy;
MXU transpose miscompiles).  Remaining lever: make XLA's tail cheaper
by reformulating the transposes.

Variants (full pipelines, honest kout, bit-exactness checked, round-
robin in one window):
  v0 shipped       per-FIELD u8 transpose (current bytes mode)
  v1 group_once    ONE u8 transpose per byte GROUP, fields extracted
                   string-major afterwards
  v2 two_pass      i32 transpose (4-byte granularity) then a stride-4
                   u8 de-interleave pass, fields extracted after
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
from halo2_regex_tpu.ops.bitplane import LANE, BitplaneMatcher
from halo2_regex_tpu.utils.cache import enable_compilation_cache
from halo2_regex_tpu.utils.profiling import benchmark_chained

B = int(os.environ.get("H2R_PROBE_B", "32768"))
L = int(os.environ.get("H2R_PROBE_L", "1024"))
ROUNDS = int(os.environ.get("H2R_PROBE_ROUNDS", "5"))
rng = np.random.default_rng(0)
enable_compilation_cache()
print(f"device: {jax.devices()[0]}", flush=True)
t0 = time.time()
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
L_pad = m.L_pad
wgroups = m._wgroups
qp = m._make_qpack(NWS)
scan = m._make_scan_fused(NWS)
post = m._make_post(NWS)


def front(c, ln):
    len_wb = ln.reshape(8, NW, 4).transpose(1, 2, 0).reshape(NWS, LANE, 32)
    bits, en = qp(c.reshape(8, NW, 4, L), len_wb)
    return post(scan(bits), en[:, None])


def finish_from_vals(vals, fb):
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
        states=raw,
        all_substr_ids=vals["masked_idsum"],
        masked_characters=vals["mc"],
        flags=flags,
        accepted=accepted,
        has_dead=has_dead,
        match_ok=accepted.all(axis=1) & (~has_dead.any(axis=1)),
    )


def pipe_v0(c, ln):
    return m.core(c, ln)


def pipe_v1(c, ln):
    g4, fb = front(c, ln)
    u8 = jax.lax.bitcast_convert_type(
        g4.reshape(NWS, G, 8, L_pad, LANE), jnp.uint8)
    vals = {}
    for gi, grp in enumerate(wgroups):
        gbytes = u8[:, gi].transpose(1, 0, 3, 4, 2).reshape(B, L_pad)
        for nm, off_b, nb in grp:
            vals[nm] = (gbytes >> off_b) & ((1 << nb) - 1)
    vals["mc"] = (vals["flags"] & 1) * c.astype(jnp.uint8)
    return finish_from_vals(vals, fb)


def pipe_v2(c, ln):
    g4, fb = front(c, ln)
    w = g4.reshape(NWS, G * 8, L_pad, LANE)
    w2 = jnp.transpose(w, (1, 0, 3, 2))  # i32 pass [(gi,b), NWS, LANE, L]
    u8 = jax.lax.bitcast_convert_type(w2, jnp.uint8)
    gb = jnp.transpose(u8, (0, 1, 2, 4, 3))  # u8 de-interleave
    allb = gb.reshape(G, 8, NWS, LANE, 4, L_pad).reshape(G, B, L_pad)
    vals = {}
    for gi, grp in enumerate(wgroups):
        for nm, off_b, nb in grp:
            vals[nm] = (allb[gi] >> off_b) & ((1 << nb) - 1)
    vals["mc"] = (vals["flags"] & 1) * c.astype(jnp.uint8)
    return finish_from_vals(vals, fb)


pipes = [("v0_shipped", pipe_v0)]
ref = {k: np.asarray(v) for k, v in jax.jit(pipe_v0)(
    chars_j, lengths_j).items()}
for nm, fn in (("v1_group_once", pipe_v1), ("v2_two_pass", pipe_v2)):
    try:
        out = {k: np.asarray(v) for k, v in jax.jit(fn)(
            chars_j, lengths_j).items()}
        okk = True
        for k in WITNESS_KEYS:
            if not np.array_equal(ref[k], out[k]):
                okk = False
                print(f"{nm} MISMATCH {k}: {(ref[k] != out[k]).sum()} els",
                      flush=True)
        if okk:
            print(f"{nm} BIT-EXACT vs shipped", flush=True)
            pipes.append((nm, fn))
    except Exception as e:
        print(f"{nm} FAILED: {type(e).__name__}: {str(e)[:250]}", flush=True)


def kout(fn):
    def make(K):
        @jax.jit
        def f(c, ln):
            return [
                tuple(fn(c ^ np.uint8(i), ln ^ i)[k] for k in WITNESS_KEYS)
                for i in range(K)
            ]
        return f
    return make


samples = {nm: [] for nm, _ in pipes}
for rnd in range(ROUNDS):
    for nm, fn in pipes:
        try:
            s = benchmark_chained(kout(fn), (chars_j, lengths_j), ks=(1, 5))
        except Exception as e:
            print(f"{nm} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        print(f"  r{rnd} {nm}: {s*1e3:8.4f} ms", flush=True)
        if s > 0.5e-3:
            samples[nm].append(s)
for nm, _ in pipes:
    v = samples.get(nm)
    if v:
        med = float(np.median(v))
        print(json.dumps({
            "kernel": nm, "median_ms": round(med * 1e3, 4), "n": len(v),
            "iqr_ms": [round(float(np.percentile(v, 25)) * 1e3, 4),
                       round(float(np.percentile(v, 75)) * 1e3, 4)],
            "input_gbps_median": round(BL / med / 1e9, 2),
        }), flush=True)

print(f"total probe time: {time.time()-t0:.0f} s", flush=True)
