"""Round-2 probe: configs[3] SIGABRT workarounds.

probe_tpu28 bisect: matmul+fori+scratch in a 2D grid compiles (v1), but
adding the wide select-extract + slab dynamic-slice writes (v2) SIGABRTs
Mosaic, bf16 or int8.  Candidates:

  w1: v2 body on a 1D grid (chunk axis only, one batch tile) + scratch.
  w2: v2 body, 2D grid, no scratch (carry via input/output arrays) —
      the "segmented" design: entry states are a kernel INPUT, final
      states are read back from the states output, and the L-segment loop
      runs at the XLA level.
  w3: w2 chained over 2 segments for exactness of the threading.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100_000)
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    TB, S, K = 128, 1008, 96
    LCC, NL = 1024, 4
    L = LCC * NL
    SLAB = 8

    tbl_np = rng.integers(0, 256, size=(K, 2 * S)).astype(np.float32)
    chars_np = rng.integers(0, K, size=(L, TB)).astype(np.int32)

    def body_common(tbl, chars_ref, out_ref, s0, lcc, base0=0):
        def body(t, s):
            base = base0 + t * SLAB
            c_slab = chars_ref[pl.ds(base, SLAB), :]
            outs = []
            for j in range(SLAB):
                onehot = (
                    c_slab[j][:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
                ).astype(jnp.bfloat16)
                cols = jnp.dot(onehot, tbl, preferred_element_type=jnp.float32
                               ).astype(jnp.int32)
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1)
                    == s[:, None]
                ).astype(jnp.int32)
                lo = jnp.sum(cols[:, 0:S] * sel, axis=-1)
                hi = jnp.sum(cols[:, S : 2 * S] * sel, axis=-1)
                s = (lo + 256 * hi) % S
                outs.append(s)
            out_ref[pl.ds(base, SLAB), :] = jnp.stack(outs, 0)
            return s

        return jax.lax.fori_loop(0, lcc // SLAB, body, s0)

    # ---- w1: 1D grid over chunks + scratch ----
    def w1(tbl_ref, chars_ref, out_ref, st_scr):
        l = pl.program_id(0)

        @pl.when(l == 0)
        def _():
            st_scr[0, :] = jnp.zeros((TB,), jnp.int32)

        tbl = tbl_ref[:].astype(jnp.bfloat16)
        st_scr[0, :] = body_common(tbl, chars_ref, out_ref, st_scr[0, :], LCC)

    try:
        f = pl.pallas_call(
            w1,
            grid=(NL,),
            in_specs=[
                pl.BlockSpec((K, 2 * S), lambda l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LCC, TB), lambda l: (l, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LCC, TB), lambda l: (l, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, TB), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, TB), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        r = jax.jit(f)(jnp.asarray(tbl_np), jnp.asarray(chars_np))
        print("w1 1Dgrid+scratch: OK", int(np.asarray(r)[-1, 0]), flush=True)
    except Exception as e:
        print(f"w1 1Dgrid+scratch: FAIL {type(e).__name__}: {str(e)[:140]}",
              flush=True)

    # ---- w2: no scratch; init-state input, whole segment in one call ----
    def w2(tbl_ref, chars_ref, init_ref, out_ref):
        tbl = tbl_ref[:].astype(jnp.bfloat16)
        body_common(tbl, chars_ref, out_ref, init_ref[0, :], L)

    try:
        f2 = pl.pallas_call(
            w2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((K, 2 * S), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, TB), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TB), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, TB), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, TB), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        init = jnp.zeros((1, TB), jnp.int32)
        r2 = jax.jit(f2)(jnp.asarray(tbl_np), jnp.asarray(chars_np), init)
        print("w2 seg-kernel(no scratch): OK", int(np.asarray(r2)[-1, 0]),
              flush=True)

        # w3: chain 2 segments at the XLA level, verify exact vs numpy
        @jax.jit
        def chained(tbl, chars):
            half = L // 2
            s0 = jnp.zeros((1, TB), jnp.int32)
            out1 = f2(tbl, chars[:half].repeat(2, 0)[:L], s0)[:half]
            out1_last = out1[half - 1][None, :]
            out2 = f2(tbl, chars[half:].repeat(2, 0)[:L], out1_last)[:half]
            return jnp.concatenate([out1, out2], 0)

        # exact reference
        t_next = np.zeros((K, S), np.int64)
        t_next = (tbl_np[:, 0:S].astype(np.int64)
                  + 256 * tbl_np[:, S : 2 * S].astype(np.int64)) % S
        s = np.zeros((TB,), np.int64)
        exp = np.zeros((L, TB), np.int64)
        for i in range(L):
            s = t_next[chars_np[i], s]
            exp[i] = s
        # w2 full-call reference check
        ok_full = (np.asarray(r2) == exp).all()
        print("w2 exactness:", "OK" if ok_full else "FAIL", flush=True)
    except Exception as e:
        print(f"w2: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "____main__" or __name__ == "__main__":
    main()
