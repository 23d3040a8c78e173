"""Large structured DFAs on the bitplane path: dictionary-match models.

Match-only (no public parts) multi-word alternation models — a realistic
multi-pattern scanning workload (spam/secret dictionaries). Synthesis
stays under budget to ~700 live states (50w: live=309/1164 ops; 200w:
live=689/2603 ops); this probe measures whether the scan kernel compiles
and what the carried-one-hot register spill costs at those sizes, plus
hardware exactness vs the oracle.
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
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher
from halo2_regex_tpu.utils.profiling import benchmark_chained

B, L = 32768, 1024
rng = np.random.default_rng(0)
letters = "abcdefghijklmnopqrstuvwxyz"


def rand_word(n):
    return "".join(letters[i] for i in rng.integers(0, 26, n))


def dict_model(n_words, wl=10):
    words = sorted({rand_word(int(rng.integers(5, wl + 1))) for _ in range(n_words)})
    cfg = DecomposedRegexConfig.from_json(
        {
            "max_byte_size": L,
            "parts": [
                {"is_public": False, "regex_def": "tag:", "max_size": 4},
                {"is_public": False, "regex_def": "(" + "|".join(words) + ")",
                 "max_size": 16},
                {"is_public": False, "regex_def": "\r\n", "max_size": 2},
            ],
        }
    )
    return words, CompiledRegexModel.from_decomposed([cfg], max_chars_size=L)


chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
lengths = np.full((B,), L - 8, np.int32)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)

for n_words in (50, 200):
    words, model = dict_model(n_words)
    plant = ("tag:" + words[3] + "\r\n").encode()
    ch = np.array(chars)
    ch[11, : len(plant)] = bytearray(plant)
    ln = np.array(lengths)
    ln[11] = len(plant)
    t0 = time.time()
    try:
        m = BitplaneMatcher(model, columns="witness")
    except Exception as e:
        print(f"{n_words}w: matcher FAIL {type(e).__name__}: {str(e)[:120]}")
        continue
    circ = m.circuits[0]
    chj = jnp.asarray(ch)
    lnj = jnp.asarray(ln)
    try:
        out = m._run(chj, lnj)
        ok11 = bool(out["match_ok"][11])
        okr = bool(out["match_ok"][12])
        tc = time.time() - t0
    except Exception as e:
        print(f"{n_words}w: RUN FAIL {type(e).__name__}: {str(e)[:160]}")
        continue

    def mk(K, m=m, lnj=lnj):
        @jax.jit
        def f(c):
            out = None
            for _ in range(K):
                out = m.core(c, lnj)
                c = c ^ (out["mask"].ravel()[0] & 1).astype(jnp.uint8)
            return out

        return f

    secs = [
        s for s in (benchmark_chained(mk, (chj,), ks=(1, 3)) for _ in range(3))
        if s > 1e-7
    ]
    s = min(secs) if secs else float("nan")
    print(
        f"{n_words}w: live={len(circ.live_states)} step_ops={circ.step_ops} "
        f"compile+first {tc:.0f}s  full {s*1e3:.3f} ms ({B*L/s/1e9:.1f} GB/s) "
        f"match_plant={ok11} match_rand={okr}",
        flush=True,
    )
print("done")
