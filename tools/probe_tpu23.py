"""Round-2 probe: optimized bitplane pipeline — hardware correctness and
per-stage timing.

The rewrite (bitcast pack / folded class circuit / register-carried scan /
grouped unpack) must be (a) bit-exact on hardware — the bitcast pack's
endianness assumption has only been checked on CPU — and (b) actually
faster stage-by-stage.  probe22 measured the rewrite SLOWER end-to-end
(5.97 ms vs 3.76 ms), so break it down:

  1. pack correctness on TPU (vs numpy bit packing with the PI order)
  2. pack timing (bitcast path vs the old matmul path)
  3. scan-kernel timing with the correct byte-plane input
  4. end-to-end + end-to-end correctness vs the CPU oracle on a sample
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100_000)
import numpy as np


def np_pack_reference(chars: np.ndarray, L_pad: int) -> np.ndarray:
    """[B, L] -> [8, L_pad, B//32] int32 planes with the strided-partner
    mapping: bit beta=8s+m of word w belongs to string 4*(w + NW*m) + s."""
    B, L = chars.shape
    NW = B // 32
    x = np.zeros((L_pad, B), np.uint8)
    x[:L] = chars.T
    planes = np.zeros((8, L_pad, NW), np.int32)
    for j in range(8):
        bits = (x >> j) & 1  # [L_pad, B]
        words = np.zeros((L_pad, NW), np.uint32)
        for beta in range(32):
            s, m = beta // 8, beta % 8
            g = 4 * (np.arange(NW) + NW * m) + s
            words |= bits[:, g].astype(np.uint32) << beta
        planes[j] = words.view(np.int32)
    return planes


def main():
    import jax
    import jax.numpy as jnp

    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.ops import reference as ref_ops
    from halo2_regex_tpu.ops.bitplane import BitplaneMatcher, pack_bytes
    from halo2_regex_tpu.utils.profiling import benchmark_chained

    print(jax.devices(), flush=True)
    B, L = 32768, 1024
    model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
    m = BitplaneMatcher(model)
    circ = m.circuits[0]
    print(f"folded step_ops={circ.step_ops} tag_ops={circ.tag_ops}", flush=True)

    rng = np.random.default_rng(0)
    chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
    lengths = np.full((B,), L, np.int32)
    chars_j = jnp.asarray(chars)
    lengths_j = jnp.asarray(lengths)

    # ---- 1. pack correctness on TPU ----
    small = chars[:4096, :64]
    got = np.stack(
        [np.asarray(p) for p in jax.jit(
            lambda c: pack_bytes(c, 64)
        )(jnp.asarray(small))]
    )
    expect = np_pack_reference(small, 64)
    if (got == expect).all():
        print("pack correctness on TPU: OK", flush=True)
    else:
        bad = np.argwhere(got != expect)
        print(f"pack correctness on TPU: FAIL ({bad.shape[0]} mismatches, "
              f"first {bad[0]})", flush=True)

    # ---- end-to-end correctness sample vs oracle ----
    sample = [
        b"from:alice@gmail.com\r\n",
        b"dummy\r\nfrom:bob<bob@x.yz>\r\n",
        b"not a header",
    ]
    chk = np.zeros((len(sample), L), np.uint8)
    lens = np.zeros((len(sample),), np.int32)
    for i, s in enumerate(sample):
        chk[i, : len(s)] = bytearray(s)
        lens[i] = len(s)
    res = m(chk, lens)
    ok = True
    for i, s in enumerate(sample):
        oracle = ref_ops.match_substrs(model.regex_defs, s, L)
        for name in oracle.field_names():
            a = np.asarray(getattr(res, name))[i].astype(np.int64)
            b = np.asarray(getattr(oracle, name)).astype(np.int64)
            if not (a == b).all():
                print(f"e2e mismatch: sample {i} field {name}", flush=True)
                ok = False
                break
    print("e2e correctness on TPU:", "OK" if ok else "FAIL", flush=True)

    # ---- timings ----
    def timed(name, run_one, fetch, arg, ks=(1, 4)):
        def mk(K):
            @jax.jit
            def f(x):
                out = None
                for _ in range(K):
                    out = run_one(x)
                    x = (x ^ fetch(out).astype(x.dtype))
                return out

            return f

        t0 = time.time()
        try:
            sec = benchmark_chained(mk, (arg,), ks=ks)
            print(
                f"{name}: {sec*1e3:.3f} ms -> {B*L/sec/1e9:.2f} GB/s "
                f"(wall {time.time()-t0:.0f}s)",
                flush=True,
            )
            return sec
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
            return None

    # pack alone
    def pack_stack(c):
        ps = pack_bytes(c, m.L_pad)
        NWS = ps[0].shape[-1] // 128
        return jnp.stack([p.reshape(m.L_pad, NWS, 128) for p in ps], axis=1)

    timed("pack(bitcast)", pack_stack, lambda o: o[0, 0, 0, 0] & 1, chars_j,
          ks=(1, 6))

    bits = jax.jit(pack_stack)(chars_j)
    _ = np.asarray(bits.ravel()[0])
    timed("scan kernel(fold)", m.scan_planes, lambda o: o[0, 0, 0, 0] & 1,
          bits, ks=(1, 6))

    timed("full pipeline", lambda c: m.core(c, lengths_j),
          lambda o: o["mask"][0, 0] & 1, chars_j)

    # post-stage cost = full - pack - scan (approx); also time a mask-only
    # fetch variant to see XLA DCE headroom
    timed(
        "pipeline(masked ids only)",
        lambda c: {"mask": m.core(c, lengths_j)["all_substr_ids"]},
        lambda o: o["mask"][0, 0] & 1,
        chars_j,
    )


if __name__ == "__main__":
    main()
