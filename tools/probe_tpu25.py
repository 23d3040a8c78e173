"""Round-2 probe: (a) BASELINE configs[3] — 1K-state / 64KB inputs on the
chunked split Pallas path: hardware correctness vs oracle + throughput;
(b) pack-stage variant timings (the 1.38 ms pack is the next bottleneck
after the fused post kernel); (c) split-kernel TB=1024 auto-tile check.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100_000)
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from halo2_regex_tpu.utils.profiling import benchmark_chained

    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # ---------------- (a) config3: 1K states, 64KB inputs ----------------
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.models.defs import AllstrRegexDef, RegexDefs
    from halo2_regex_tpu.ops import reference as ref_ops
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher

    S = 1000
    L3 = 65536
    allstr = AllstrRegexDef(
        first_state_val=0, accepted_state_val=1, largest_state_val=S - 1
    )
    line = 3
    for c in range(32, 127):
        for s in range(S):
            allstr.state_lookup[(c, s)] = (line, int(rng.integers(0, S)))
            line += 1
    model3 = CompiledRegexModel.from_defs(
        [RegexDefs(allstr=allstr, substrs=[])], max_chars_size=L3
    )
    B3 = 16
    chars3 = rng.integers(32, 127, size=(B3, L3)).astype(np.uint8)
    lengths3 = np.full((B3,), L3, np.int32)

    try:
        t0 = time.time()
        m3 = PallasMatcher(model3, max_pairs=4096)
        print(
            f"config3 matcher: mode={m3.mode} grid={m3.grid_mode} "
            f"TB={m3.batch_tile} LCC={getattr(m3, 'chunk_split', '-')} "
            f"hi_lo={m3.hi_lo}",
            flush=True,
        )
        res = m3(chars3[:8], lengths3[:8])
        states = np.asarray(res.states)
        # oracle check on 2 strings (sequential python over 64KB is slowish)
        ok = True
        for i in range(2):
            oracle = ref_ops.match_substrs(
                model3.regex_defs, chars3[i].tobytes(), L3
            )
            if not (states[i] == oracle.states).all():
                ok = False
        print(f"config3 chunked correctness: {'OK' if ok else 'FAIL'} "
              f"(wall {time.time()-t0:.0f}s)", flush=True)

        chars3_j = jnp.asarray(chars3)
        lengths3_j = jnp.asarray(lengths3)

        def mk(K):
            @jax.jit
            def f(c):
                out = None
                for _ in range(K):
                    out = m3._run(c, lengths3_j)["mask"]
                    c = c ^ (out[0, 0] & 1).astype(jnp.uint8)
                return out

            return f

        sec = benchmark_chained(mk, (chars3_j,), ks=(1, 3))
        print(
            f"config3 chunked: {sec*1e3:.1f} ms -> {B3*L3/sec/1e9:.3f} GB/s",
            flush=True,
        )
    except Exception as e:
        print(f"config3: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---------------- (b) pack variants ----------------
    from halo2_regex_tpu.ops.bitplane import _bytes_to_words, _combine8

    B, L = 32768, 1024
    chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
    chars_j = jnp.asarray(chars)

    def timed(name, fn, arg, fetch, ks=(1, 6)):
        def mk(K):
            @jax.jit
            def f(x):
                out = None
                for _ in range(K):
                    out = fn(x)
                    x = x ^ fetch(out).astype(x.dtype)
                return out

            return f

        try:
            sec = benchmark_chained(mk, (arg,), ks=ks)
            print(f"{name}: {sec*1e3:.3f} ms -> {B*L/sec/1e9:.2f} GB/s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    timed("transpose only", lambda c: c.T + jnp.uint8(0), chars_j,
          lambda o: o[0, 0] & 1)
    timed("transpose+bitcast", lambda c: _bytes_to_words(c.T), chars_j,
          lambda o: (o[0, 0] & 1).astype(jnp.uint8))

    def pack8(c):
        w = _bytes_to_words(c.T)
        mask = jnp.int32(0x01010101)
        planes = [_combine8((w >> j) & mask) for j in range(8)]
        return jnp.stack(planes)

    timed("pack8 (no 4d-stack)", pack8, chars_j,
          lambda o: (o[0, 0, 0] & 1).astype(jnp.uint8))

    # int32-transpose variant: widen first, transpose in int32, then pack
    def pack8_i32(c):
        x = c.astype(jnp.int32).T  # [L, B] int32
        # strings already minor; emulate bitcast grouping arithmetically
        x4 = x.reshape(L, B // 4, 4)
        sh = jnp.arange(4, dtype=jnp.int32) * 8
        w = (x4 << sh).sum(-1, dtype=jnp.int32)
        mask = jnp.int32(0x01010101)
        return jnp.stack([_combine8((w >> j) & mask) for j in range(8)])

    timed("pack8 (i32 widen)", pack8_i32, chars_j,
          lambda o: (o[0, 0, 0] & 1).astype(jnp.uint8))

    # ---------------- (c) split kernel at auto TB (1024) ----------------
    from halo2_regex_tpu.models import zoo

    email = zoo.email_headers_model(max_chars_size=1024, headers=("from",))
    try:
        pm = PallasMatcher(email)
        print(f"email split auto TB={pm.batch_tile} grid={pm.grid_mode}",
              flush=True)
        ej = jnp.asarray(rng.integers(32, 127, size=(4096, 1024)), jnp.uint8)
        elj = jnp.full((4096,), 1024, jnp.int32)

        def mk(K):
            @jax.jit
            def f(c):
                out = None
                for _ in range(K):
                    out = pm._run(c, elj)["mask"]
                    c = c ^ (out[0, 0] & 1).astype(jnp.uint8)
                return out

            return f

        sec = benchmark_chained(mk, (ej,), ks=(1, 3))
        print(f"split TB={pm.batch_tile}: {sec*1e3:.2f} ms -> "
              f"{4096*1024/sec/1e9:.3f} GB/s", flush=True)
    except Exception as e:
        print(f"split auto-TB: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()
