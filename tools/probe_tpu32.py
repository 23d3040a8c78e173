"""Round-2 probe: feature matrix for the configs[3] Mosaic SIGABRT.

probe_tpu31: every (K, S) padding combo of the probe kernel crashes, yet
the production batch split kernel (same structure, K=16/S=24) runs in
production. Sweep dimensions and features one at a time on a minimal
1-grid kernel with valid tables and no modulo, then the real matcher.
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
    TB, L, SLAB = 128, 2048, 8

    def build(K, S, hi_lo, modulo, grid2d_scratch):
        ts = rng.integers(0, S, size=(K, S)).astype(np.int64)
        if hi_lo:
            tbl_np = np.concatenate([ts & 0xFF, ts >> 8], 1).astype(np.float32)
        else:
            tbl_np = ts.astype(np.float32)
        chars_np = rng.integers(0, K, size=(L, TB)).astype(np.int32)
        W = tbl_np.shape[1]

        def step(s, c, tbl):
            onehot = (
                c[:, None]
                == jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
            ).astype(jnp.bfloat16)
            cols = jnp.dot(onehot, tbl, preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1)
                == s[:, None]
            ).astype(jnp.int32)
            if hi_lo:
                lo = jnp.sum(cols[:, 0:S] * sel, axis=-1)
                hi = jnp.sum(cols[:, S : 2 * S] * sel, axis=-1)
                s = lo + 256 * hi
            else:
                s = jnp.sum(cols * sel, axis=-1)
            if modulo:
                s = s % S
            return s

        if grid2d_scratch:
            LCC = L // 2

            def kern(tbl_ref, chars_ref, out_ref, st_scr):
                l = pl.program_id(1)

                @pl.when(l == 0)
                def _():
                    st_scr[0, :] = jnp.zeros((TB,), jnp.int32)

                tbl = tbl_ref[:].astype(jnp.bfloat16)

                def body(t, s):
                    base = t * SLAB
                    c_slab = chars_ref[pl.ds(base, SLAB), :]
                    outs = []
                    for j in range(SLAB):
                        s = step(s, c_slab[j], tbl)
                        outs.append(s)
                    out_ref[pl.ds(base, SLAB), :] = jnp.stack(outs, 0)
                    return s

                st_scr[0, :] = jax.lax.fori_loop(
                    0, LCC // SLAB, body, st_scr[0, :]
                )

            return pl.pallas_call(
                kern,
                grid=(1, 2),
                in_specs=[
                    pl.BlockSpec((K, W), lambda b, l: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((LCC, TB), lambda b, l: (l, b),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((LCC, TB), lambda b, l: (l, b),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((L, TB), jnp.int32),
                scratch_shapes=[pltpu.VMEM((1, TB), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            ), tbl_np, chars_np, ts

        def kern(tbl_ref, chars_ref, out_ref):
            tbl = tbl_ref[:].astype(jnp.bfloat16)

            def body(t, s):
                base = t * SLAB
                c_slab = chars_ref[pl.ds(base, SLAB), :]
                outs = []
                for j in range(SLAB):
                    s = step(s, c_slab[j], tbl)
                    outs.append(s)
                out_ref[pl.ds(base, SLAB), :] = jnp.stack(outs, 0)
                return s

            jax.lax.fori_loop(0, L // SLAB, body,
                              jnp.zeros((TB,), jnp.int32))

        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((K, W), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, TB), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, TB), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, TB), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        ), tbl_np, chars_np, ts

    cases = [
        ("a K=16 S=24", 16, 24, False, False, False),
        ("b K=96 S=128", 96, 128, False, False, False),
        ("c K=96 S=1008 single", 96, 1008, False, False, False),
        ("d K=96 S=1008 hi_lo", 96, 1008, True, False, False),
        ("e d+modulo", 96, 1008, True, True, False),
        ("f d+2dgrid+scratch", 96, 1008, True, False, True),
    ]
    for name, K, S, hi_lo, modulo, g2 in cases:
        try:
            f, tbl_np, chars_np, ts = build(K, S, hi_lo, modulo, g2)
            r = jax.jit(f)(jnp.asarray(tbl_np), jnp.asarray(chars_np))
            # exactness vs numpy
            s = np.zeros((TB,), np.int64)
            exp = np.zeros((L, TB), np.int64)
            for i in range(L):
                s = ts[chars_np[i], s]
                if modulo:
                    s = s % S
                exp[i] = s
            ok = (np.asarray(r) == exp).all()
            print(f"{name}: OK exact={bool(ok)}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:110]}", flush=True)


if __name__ == "__main__":
    main()
