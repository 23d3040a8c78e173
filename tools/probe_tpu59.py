"""Round-3 probe 3: extraction-serving throughput + Mosaic SIGABRT re-probe.

  A. Extraction serving mode (the examples/corpus_scan.py configuration):
     core scan + ops/extract.extract_runs fused under one jit, only the
     compact (offsets, lengths, ids, bytes, match_ok) records leave the
     device.  XLA legitimately DCEs the unused witness columns here —
     this measures the production corpus-scan path, not the witness
     contract (probe56/57 measure that).  Sweep max_runs/max_len.
  B. Once-per-round toolchain re-probe (docs/ROADMAP.md): run the Mosaic
     SIGABRT bisect (tools/probe_tpu28.py) in a SUBPROCESS — an abort
     must not kill this session.  rc -6 => still broken; "v2 ... OK" in
     its output => FIXED, re-integrate tools/archive_chunked_kernels.py.
"""

import os
import subprocess
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
from halo2_regex_tpu.ops.extract import extract_runs
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
alpha_sp = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz @.-:", np.uint8)
for i in range(B):
    name = rng.choice(alpha, size=8).tobytes()
    filler_len = int(rng.integers(0, max(1, L - 96)))
    filler = rng.choice(alpha_sp, size=filler_len).tobytes()
    if i % 2 == 0:
        s = (filler + b"\r\nfrom:" + name + b"@gmail.com\r\n")[:L]
    else:
        s = filler[:L]
    chars[i, : len(s)] = bytearray(s)
    lengths[i] = len(s)
chars_j = jnp.asarray(chars)
lengths_j = jnp.asarray(lengths)

# ------------------------------------------- A: extraction serving mode
m = BitplaneMatcher(model, columns="full")


def mk_extract(max_runs, max_len):
    def make(K):
        @jax.jit
        def f(c, ln):
            outs = []
            for i in range(K):
                out = m.core(c ^ np.uint8(i), ln ^ i)
                rec = extract_runs(
                    out["all_substr_ids"],
                    out["masked_characters"],
                    max_runs=max_runs,
                    max_len=max_len,
                )
                outs.append(
                    (rec["offsets"], rec["lengths"], rec["ids"],
                     rec.get("bytes"), out["match_ok"])
                )
            return outs

        return f

    return make


# correctness once: valid rows reveal name@gmail.com
probe_fn = mk_extract(4, 32)(1)
rec0 = probe_fn(chars_j, lengths_j)[0]
offs = np.asarray(rec0[0])
payload = np.asarray(rec0[3])
lens = np.asarray(rec0[1])
mok = np.asarray(rec0[4])
n_checked = 0
for i in range(0, min(B, 64), 2):
    if not mok[i]:
        continue
    got = bytes(payload[i, 0][: lens[i, 0]])
    assert got.endswith(b"@gmail.com"), (i, got)
    n_checked += 1
assert n_checked > 0
print(f"A: extraction payloads correct on {n_checked} matched rows",
      flush=True)

abest = {}
for rnd in range(3):
    for max_runs, max_len in ((4, 0), (4, 32), (8, 64)):
        nm = f"runs{max_runs}/len{max_len}"
        s = benchmark_chained(
            mk_extract(max_runs, max_len), (chars_j, lengths_j), ks=(1, 4)
        )
        if s > 1e-7:
            abest[nm] = min(abest.get(nm, float("inf")), s)
        print(f"A r{rnd}: {nm}: {s*1e3:7.3f} ms", flush=True)
for nm, s in abest.items():
    print(f"A BEST {nm}: {s*1e3:.3f} ms = {B*L/s/1e9:.1f} GB/s input",
          flush=True)

# --------------------------------------- B: Mosaic SIGABRT re-probe (subproc)
if os.environ.get("H2R_PROBE_SKIP_MOSAIC") != "1":
    print("B: launching probe_tpu28 bisect in a subprocess "
          "(fresh relay-compile session, several minutes)...", flush=True)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "probe_tpu28.py")],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    tail = (r.stdout + r.stderr)[-1200:]
    print(f"B: probe28 rc={r.returncode}\n{tail}", flush=True)
    if r.returncode == -6:
        print("B VERDICT: Mosaic SIGABRT still present this toolchain",
              flush=True)
    elif r.returncode == 0 and "v2" in r.stdout and "OK" in r.stdout:
        print("B VERDICT: SIGABRT FIXED — re-integrate "
              "tools/archive_chunked_kernels.py", flush=True)

print(f"total: {time.time()-t0:.0f} s", flush=True)
