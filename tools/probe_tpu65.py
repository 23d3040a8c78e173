"""Round-5 probe B: localize the witness pipeline's unaccounted ~1.1 ms.

probe64 overturned the round-4 story: the XLA per-field decode tail is
0.475 ms ISOLATED (60% util) — near its floor — while the composed
witness pipeline runs ~2.2 ms against ~1.07 ms of accounted stages
(qpack 0.36 + scan 0.073 + post 0.159 + tail 0.48).  This probe measures
the pipeline cut at successive stages, each as one jitted chained fn of
(chars, lengths), so the deltas give the IN-CONTEXT cost of each stage
including XLA scheduling:

  s1 qpack            s2 +scan            s3 +post
  s4 +field tail      s5 full witness     (deltas = stage costs)
  s5b full minus the redundant `mask` output (mask == flags & 1)
  s5c full with states built by concat only (no in_range where-pass)

All variants run the shipped default knobs (qpack+en_pack, emit=bytes).
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
ROUNDS = int(os.environ.get("H2R_PROBE_ROUNDS", "5"))
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

m = BitplaneMatcher(model, columns="witness", emit="bytes",
                    en_pack=True, qpack=True)
NWS = B // 32 // LANE
NW = B // 32
G = len(m._wgroups)
L_pad = m.L_pad
wgroups = m._wgroups
qp = m._make_qpack(NWS)
scan = m._make_scan_fused(NWS)
post = m._make_post(NWS)


def stage_qpack(c, ln):
    len_wb = ln.reshape(8, NW, 4).transpose(1, 2, 0).reshape(NWS, LANE, 32)
    ch_v = c.reshape(8, NW, 4, L)
    bits, en = qp(ch_v, len_wb)
    return bits, en


def stage_scan(c, ln):
    bits, en = stage_qpack(c, ln)
    return scan(bits), en


def stage_post(c, ln):
    logs, en = stage_scan(c, ln)
    g4, fb = post(logs, en[:, None])
    return g4, fb


def field_tail(g4, c):
    u8 = jax.lax.bitcast_convert_type(
        g4.reshape(NWS, G, 8, L_pad, LANE)[:, :, :, :L], jnp.uint8)
    vals = {}
    for gi, grp in enumerate(wgroups):
        arr = u8[:, gi]
        for nm, off_b, nb in grp:
            vals[nm] = ((arr >> off_b) & ((1 << nb) - 1)
                        ).transpose(1, 0, 3, 4, 2).reshape(B, L)
    vals["mc"] = (vals["flags"] & 1) * c.astype(jnp.uint8)
    return vals


def stage_tail(c, ln):
    g4, fb = stage_post(c, ln)
    vals = field_tail(g4, c)
    return vals["flags"], vals["masked_idsum"], vals["states0"], vals["mc"], fb


def full_witness(c, ln, drop_mask, where_states):
    g4, fb = stage_post(c, ln)
    vals = field_tail(g4, c)
    flags = vals["flags"]
    after = vals["states0"][:, None, :]  # [B, 1, L]
    first = m._model_arrays["first_states"][None, :, None].astype(jnp.uint8)
    raw = jnp.concatenate(
        [jnp.broadcast_to(first, (B, m.n_defs, 1)), after], axis=2)
    if where_states:
        posL1 = jnp.arange(L + 1, dtype=jnp.int32)
        in_range = posL1[None, None, :] <= ln[:, None, None]
        dummy = m._model_arrays["dummy_states"][None, :, None].astype(
            jnp.uint8)
        states = jnp.where(in_range, raw, dummy)
    else:
        states = raw
    final = m._final_from_fb(fb, B)
    accepted = m._model_arrays["accept_mask"][
        jnp.arange(m.n_defs)[None, :], final]
    has_dead = final == m._model_arrays["dead_states"][None, :]
    out = dict(
        states=states,
        all_substr_ids=vals["masked_idsum"],
        masked_characters=vals["mc"],
        flags=flags,
        accepted=accepted,
        has_dead=has_dead,
        match_ok=accepted.all(axis=1) & (~has_dead.any(axis=1)),
    )
    if not drop_mask:
        out["mask"] = flags & 1
    return out


WITNESS_KEYS = ("states", "all_substr_ids", "masked_characters", "flags",
                "match_ok")


def measure(name, mk, args, traffic_bytes, ks, rounds=ROUNDS):
    floor = traffic_bytes / HBM
    vals = []
    for rnd in range(rounds):
        try:
            s = benchmark_chained(mk, args, ks=ks)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return None
        tag = "" if s > floor else "  (< physical floor, discarded)"
        print(f"  r{rnd} {name}: {s*1e3:8.4f} ms{tag}", flush=True)
        if s > floor:
            vals.append(s)
    if not vals:
        print(f"{name}: no credible samples", flush=True)
        return None
    med = float(np.median(vals))
    print(json.dumps({
        "kernel": name, "median_ms": round(med * 1e3, 4),
        "best_ms": round(min(vals) * 1e3, 4), "n": len(vals),
        "floor_ms": round(floor * 1e3, 4),
        "input_gbps_median": round(BL / med / 1e9, 2),
    }), flush=True)
    return med


def chain_cl(fn, outsel=0):
    """Chain on (chars, lengths): xor a result bit into chars."""
    def mk(K):
        @jax.jit
        def f(c, ln):
            y = None
            for _ in range(K):
                y = fn(c, ln)
                y0 = y
                while isinstance(y0, dict):
                    y0 = y0[sorted(y0.keys())[0]]
                while isinstance(y0, (tuple, list)):
                    y0 = y0[0]
                c = c ^ (y0.ravel()[0] & 1).astype(c.dtype)
            return y
        return f
    return mk


# correctness first: variants agree with the shipped core
ref = {k: np.asarray(v) for k, v in m.core(chars_j, lengths_j).items()}
got = full_witness(chars_j, lengths_j, drop_mask=False, where_states=True)
for k in WITNESS_KEYS + ("mask",):
    np.testing.assert_array_equal(ref[k], np.asarray(got[k]),
                                  err_msg=f"full_witness {k}")
print("probe full_witness BIT-EXACT vs shipped core", flush=True)

KS = (2, 10)
measure("s1_qpack", chain_cl(stage_qpack), (chars_j, lengths_j),
        2.2 * BL, KS)
measure("s2_scan", chain_cl(stage_scan), (chars_j, lengths_j),
        3.0 * BL, KS)
measure("s3_post", chain_cl(stage_post), (chars_j, lengths_j),
        5.9 * BL, KS)
measure("s4_tail", chain_cl(stage_tail), (chars_j, lengths_j),
        10.0 * BL, KS)
measure("s5_full", chain_cl(
    lambda c, ln: full_witness(c, ln, False, True)),
    (chars_j, lengths_j), 16.5 * BL, KS)
measure("s5b_nomask", chain_cl(
    lambda c, ln: full_witness(c, ln, True, True)),
    (chars_j, lengths_j), 15.5 * BL, KS)
measure("s5c_nowhere", chain_cl(
    lambda c, ln: full_witness(c, ln, True, False)),
    (chars_j, lengths_j), 14.5 * BL, KS)
measure("s5_core_shipped", chain_cl(lambda c, ln: m.core(c, ln)),
        (chars_j, lengths_j), 16.5 * BL, KS)

print(f"total probe time: {time.time()-t0:.0f} s", flush=True)
