"""Round-5 probe F: kdecode integration bisect + honest XLA tail cost.

probe67/68: kdecode's decode KERNEL is 1.0 ms isolated (honest — pallas
outputs can't be DCE-split) yet the kdecode PIPELINE is 7.3 ms against
~1.7 ms of parts; and the MXU selector-transpose miscompiles (CPU-exact,
TPU-wrong), killing the faster mx kernel.  Hypothesis for the kdecode
integration penalty: XLA inserts layout-conversion copies around the
back-to-back custom calls (post -> decode), or schedules the composed
program pathologically.

Rows (all honest kout, round-robin in one window):
  f_front           (c,ln) -> (g4, fb)            the pipeline head
  f_tail_xla        (g4,c) -> witness dict        the SHIPPED tail+finish
  f_tail_kdecode    (g4,c) -> witness dict        decode kernel + finish
  f_full_bytes      shipped pipeline              reference
  f_full_kdecode    kdecode pipeline              the 7.3 ms mystery
  f_full_kdecode_ob same, optimization_barrier between front and decode
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
from halo2_regex_tpu.utils.profiling import benchmark_chained, device_specs

B = int(os.environ.get("H2R_PROBE_B", "32768"))
L = int(os.environ.get("H2R_PROBE_L", "1024"))
ROUNDS = int(os.environ.get("H2R_PROBE_ROUNDS", "4"))
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
mk_dec_m = BitplaneMatcher(model, columns="witness", emit="kdecode")
NWS = B // 32 // LANE
NW = B // 32
G = len(m._wgroups)
l4 = m._l4
L_pad = m.L_pad
wgroups = m._wgroups
fields_flat = mk_dec_m._fields_flat
n_fields = len(fields_flat)
qp = m._make_qpack(NWS)
scan = m._make_scan_fused(NWS)
post = m._make_post(NWS)
dec = mk_dec_m._make_decode(NWS)


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


def tail_xla(g4, fb, c):
    u8 = jax.lax.bitcast_convert_type(
        g4.reshape(NWS, G, 8, L_pad, LANE)[:, :, :, :L], jnp.uint8)
    vals = {}
    for gi, grp in enumerate(wgroups):
        arr = u8[:, gi]
        for nm, off_b, nb in grp:
            vals[nm] = ((arr >> off_b) & ((1 << nb) - 1)
                        ).transpose(1, 0, 3, 4, 2).reshape(B, L)
    vals["mc"] = (vals["flags"] & 1) * c.astype(jnp.uint8)
    return finish_from_vals(vals, fb)


def tail_kdecode(g4, fb, c):
    ch_l4 = jax.lax.bitcast_convert_type(c.reshape(B, l4, 4), jnp.int32)
    outs = dec(g4.reshape(NWS, G, 8, L_pad, LANE), ch_l4)
    vals = {}
    for (nm, _gi, _off, _nb), arr in zip(fields_flat, outs):
        vals[nm] = jax.lax.bitcast_convert_type(
            arr, jnp.uint8).reshape(B, L_pad)
    vals["mc"] = jax.lax.bitcast_convert_type(
        outs[n_fields], jnp.uint8).reshape(B, L_pad)
    return finish_from_vals(vals, fb)


def full_bytes(c, ln):
    return m.core(c, ln)


def full_kdecode(c, ln, barrier=False):
    g4, fb = front(c, ln)
    if barrier:
        g4, fb = jax.lax.optimization_barrier((g4, fb))
    return tail_kdecode(g4, fb, c)


# fixed front output for the tail rows
g4_0, fb_0 = jax.jit(front)(chars_j, lengths_j)
g4_0 = jnp.asarray(np.asarray(g4_0))
fb_0 = jnp.asarray(np.asarray(fb_0))

# exactness: kdecode tail vs xla tail vs shipped
ref = {k: np.asarray(v) for k, v in jax.jit(full_bytes)(
    chars_j, lengths_j).items()}
for nm, fn in (("tail_xla", lambda: tail_xla(g4_0, fb_0, chars_j)),
               ("tail_kdecode", lambda: tail_kdecode(g4_0, fb_0, chars_j)),
               ("full_kdecode", lambda: full_kdecode(chars_j, lengths_j))):
    out = {k: np.asarray(v) for k, v in jax.jit(fn)().items()}
    okk = True
    for k in WITNESS_KEYS:
        if not np.array_equal(ref[k], out[k]):
            okk = False
            print(f"{nm} MISMATCH {k}: {(ref[k] != out[k]).sum()} els",
                  flush=True)
    if okk:
        print(f"{nm} BIT-EXACT vs shipped", flush=True)


def kout_cl(fn):
    def make(K):
        @jax.jit
        def f(c, ln):
            return [
                tuple(fn(c ^ np.uint8(i), ln ^ i)[k] for k in WITNESS_KEYS)
                for i in range(K)
            ]
        return f
    return make


def kout_g4(fn):
    def make(K):
        @jax.jit
        def f(g, c):
            return [
                tuple(fn(g ^ i, fb_0, c)[k] for k in WITNESS_KEYS)
                for i in range(K)
            ]
        return f
    return make


def kout_front():
    def make(K):
        @jax.jit
        def f(c, ln):
            return [front(c ^ np.uint8(i), ln ^ i) for i in range(K)]
        return f
    return make


rows = [
    ("f_front", kout_front(), (chars_j, lengths_j)),
    ("f_tail_xla", kout_g4(tail_xla), (g4_0, chars_j)),
    ("f_tail_kdecode", kout_g4(tail_kdecode), (g4_0, chars_j)),
    ("f_full_bytes", kout_cl(full_bytes), (chars_j, lengths_j)),
    ("f_full_kdecode", kout_cl(full_kdecode), (chars_j, lengths_j)),
    ("f_full_kdecode_ob",
     kout_cl(lambda c, ln: full_kdecode(c, ln, barrier=True)),
     (chars_j, lengths_j)),
]
samples = {nm: [] for nm, *_ in rows}
for rnd in range(ROUNDS):
    for nm, mk, args in rows:
        try:
            s = benchmark_chained(mk, args, ks=(1, 5))
        except Exception as e:
            print(f"{nm} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        print(f"  r{rnd} {nm}: {s*1e3:8.4f} ms", flush=True)
        if s > 1e-5:
            samples[nm].append(s)
for nm, *_ in rows:
    v = samples.get(nm)
    if v:
        med = float(np.median(v))
        print(json.dumps({
            "kernel": nm, "median_ms": round(med * 1e3, 4), "n": len(v),
            "iqr_ms": [round(float(np.percentile(v, 25)) * 1e3, 4),
                       round(float(np.percentile(v, 75)) * 1e3, 4)],
        }), flush=True)

print(f"total probe time: {time.time()-t0:.0f} s", flush=True)
