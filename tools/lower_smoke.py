"""Local Mosaic LOWERING smoke for every pipeline config.

Round-4 lesson: the CPU interpret-mode smoke (tools/probe_smoke.py) runs
the kernels' *math* but skips Mosaic's lowering rules, so round-3 shipped
two configs (H2R_SCAN_UNROLL>1, H2R_EN_PACK=1) that raise
NotImplementedError the moment they are jitted for the TPU target —
discovered only on hardware (probe58_quick r4).  Mosaic lowering happens
IN-PROCESS (`jax.jit(f).lower(...)`): only the XLA compile is remote, so
lowering every config locally takes seconds per config and needs no
remote-compile session.

Run on the axon TPU backend (device must be visible so lowering targets
TPU, but nothing is compiled or executed):

    python tools/lower_smoke.py            # full matrix
    H2R_SMOKE_CONFIGS=kdecode python tools/lower_smoke.py   # filter

Exit code != 0 if any config fails to lower.  Run this BEFORE queueing any
hardware probe.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in sys.path:
    sys.path.append("/root/.axon_site")
sys.setrecursionlimit(100_000)

import jax
import jax.numpy as jnp

from halo2_regex_tpu.models import zoo

B = int(os.environ.get("H2R_SMOKE_B", "4096"))
L = int(os.environ.get("H2R_SMOKE_L", "256"))

# (name, env, kwargs) — the full knob matrix the benches/probes exercise.
CONFIGS = [
    ("bytes/u1", {}, dict(unroll=1)),
    ("bytes/u4", {}, dict(unroll=4)),
    ("bytes/u8", {}, dict(unroll=8)),
    ("bytes/ufull", {}, dict(unroll=10**9)),
    ("bytes/en-pack", dict(H2R_EN_PACK="1"), dict(unroll=1)),
    ("bytes/fuse-pack", dict(H2R_FUSE_PACK="1"), dict(unroll=1)),
    ("kdecode", dict(H2R_EMIT="kdecode"), dict(unroll=1)),
    ("kdecode/en-pack", dict(H2R_EMIT="kdecode", H2R_EN_PACK="1"),
     dict(unroll=1)),
    ("kdecode/en-pack/qpack",
     dict(H2R_EMIT="kdecode", H2R_EN_PACK="1", H2R_QPACK="1"),
     dict(unroll=1)),
    ("kdecode/en-pack/qpack/u4",
     dict(H2R_EMIT="kdecode", H2R_EN_PACK="1", H2R_QPACK="1"),
     dict(unroll=4)),
    ("bytes/class-binary", {}, dict(unroll=1, class_stage="binary")),
    ("bytes/full-columns-u4", {}, dict(unroll=4, columns="full")),
]

ENV_KEYS = ("H2R_EMIT", "H2R_EN_PACK", "H2R_QPACK", "H2R_FUSE_PACK")


def main() -> int:
    filt = os.environ.get("H2R_SMOKE_CONFIGS")
    model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
    chars = jnp.zeros((B, L), jnp.uint8)
    lengths = jnp.zeros((B,), jnp.int32)
    from halo2_regex_tpu.ops.bitplane import BitplaneMatcher

    failures = []
    for name, env, kw in CONFIGS:
        if filt and filt not in name:
            continue
        for k in ENV_KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)
        t0 = time.time()
        try:
            kw2 = dict(kw)
            cols = kw2.pop("columns", "witness")
            m = BitplaneMatcher(model, columns=cols, **kw2)
            jax.jit(m.core).lower(chars, lengths)
            print(f"OK   {name:28s} {time.time()-t0:6.1f}s", flush=True)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name:28s} {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            if os.environ.get("H2R_SMOKE_TB"):
                traceback.print_exc()
    for k in ENV_KEYS:
        os.environ.pop(k, None)
    if failures:
        print(f"FAILURES: {failures}", flush=True)
        return 1
    print("all configs lower", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
