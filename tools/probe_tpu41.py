"""Bitplane scan-kernel throughput vs live-state count (round 2+).

One-hot synthesis scales with DFA *structure*, not state count:
live=118 -> 506 step ops (vs 353 at live=21). The open question is
register pressure: the scan kernel carries one one-hot plane per live
state in the fori_loop carry (live vregs at NT=8); past the register
file it spills to VMEM. This probe measures scan-only and full-pipeline
throughput at live = 21 / 47 / 92 / 118 on hardware, and checks
bit-exactness of the largest model against the oracle.
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

from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models import zoo
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher, raw_quads
from halo2_regex_tpu.utils.profiling import benchmark_chained

B, L = 32768, 1024


def subject_alt5():
    big = {
        "max_byte_size": L,
        "parts": [
            {"is_public": False, "regex_def": "subject:(re: |fwd: )?", "max_size": 16},
            {"is_public": True, "regex_def": "(" + "|".join(
                ["urgent", "invoice attached", "meeting tomorrow",
                 "password reset", "account verification required"]) + ")",
             "max_size": 40},
            {"is_public": False, "regex_def": "\r\n", "max_size": 2},
        ],
    }
    return CompiledRegexModel.from_decomposed(
        [DecomposedRegexConfig.from_json(big)], max_chars_size=L
    )


def spam10():
    words = ["confidential", "wire transfer", "bitcoin", "lottery winner",
             "prince", "inheritance", "click here now", "free gift card",
             "your parcel is waiting", "tax refund"]
    big = {
        "max_byte_size": L,
        "parts": [
            {"is_public": False, "regex_def": "x-spam:", "max_size": 8},
            {"is_public": True, "regex_def": "(" + "|".join(words) + ")",
             "max_size": 32},
            {"is_public": False, "regex_def": "\r\n", "max_size": 2},
        ],
    }
    return CompiledRegexModel.from_decomposed(
        [DecomposedRegexConfig.from_json(big)], max_chars_size=L
    )


MODELS = [
    ("from(21)", zoo.email_headers_model(max_chars_size=L, headers=("from",))),
    ("body_prefix(47)", CompiledRegexModel.from_decomposed(
        [zoo.get_config("body_prefix", L)], max_chars_size=L)),
    ("subject_alt5(92)", subject_alt5()),
    ("spam10(118)", spam10()),
]

rng = np.random.default_rng(0)
chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
# plant a few matching strings for the exactness check
plant = b"x-spam:wire transfer\r\n"
chars[7, : len(plant)] = bytearray(plant)
lengths = np.full((B,), L, np.int32)
lengths[7] = len(plant)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)

NWS = B // 32 // 128
t0 = time.time()
for name, model in MODELS:
    try:
        m = BitplaneMatcher(model, columns="witness", en_pack=False, qpack=False)
    except Exception as e:
        print(f"{name}: matcher FAIL {type(e).__name__}: {str(e)[:100]}")
        continue
    circ = m.circuits[0]

    def scan_only(c, m=m, circ=circ):
        R = raw_quads(c, m.L_pad).reshape(m.L_pad, 8, NWS, 128)
        bits = m._make_pack(NWS)(R)
        return m._make_scan(circ, NWS)(bits)

    def mk_scan(K, f=scan_only):
        @jax.jit
        def g(c):
            out = None
            for _ in range(K):
                out = f(c)
                c = c ^ (out.ravel()[0] & 1).astype(jnp.uint8)
            return out

        return g

    def mk_full(K, m=m):
        @jax.jit
        def g(c):
            out = None
            for _ in range(K):
                out = m.core(c, lengths_j)
                c = c ^ (out["mask"].ravel()[0] & 1).astype(jnp.uint8)
            return out

        return g

    ss = min(
        s for s in (benchmark_chained(mk_scan, (chars_j,), ks=(1, 4)) for _ in range(2))
        if s > 1e-7
    )
    fs = min(
        s for s in (benchmark_chained(mk_full, (chars_j,), ks=(1, 4)) for _ in range(2))
        if s > 1e-7
    )
    print(
        f"{name}: live={len(circ.live_states)} step_ops={circ.step_ops} "
        f"scan {ss*1e3:.3f} ms ({B*L/ss/1e9:.1f} GB/s) "
        f"full {fs*1e3:.3f} ms ({B*L/fs/1e9:.1f} GB/s)",
        flush=True,
    )

# exactness of the largest model on hardware (string 7 has a real match)
from halo2_regex_tpu.ops import reference as refmod

name, model = MODELS[-1]
m = BitplaneMatcher(model, columns="witness")
out = m._run(chars_j, lengths_j)
r = refmod.match_substrs(model.regex_defs, plant, L)
ok_ids = (np.asarray(out["all_substr_ids"][7]) == np.asarray(r.all_substr_ids[:L])).all()
ok_ch = (
    np.asarray(out["masked_characters"][7]) == np.asarray(r.masked_characters[:L])
).all()
got = bytes(np.asarray(out["masked_characters"][7])[np.asarray(out["mask"][7]) != 0])
print(f"{name} hardware exactness: ids={ok_ids} chars={ok_ch} extracted={got!r}")
print("total", round(time.time() - t0, 1), "s")
