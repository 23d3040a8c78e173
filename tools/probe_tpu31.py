"""Round-2 probe: is the configs[3] Mosaic SIGABRT a lane-alignment issue?

probe_tpu30: even the simplest 1-grid no-scratch kernel with the wide
select-extract crashes at (K=96, S=1008) — both non-multiples of 128.
Sweep the paddings to find the constraint.
"""

import sys

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    TB, L, SLAB = 128, 2048, 8

    def build(K, S):
        tbl_np = rng.integers(0, 256, size=(K, 2 * S)).astype(np.float32)
        chars_np = rng.integers(0, min(K, 95), size=(L, TB)).astype(np.int32)

        def kern(tbl_ref, chars_ref, init_ref, out_ref):
            tbl = tbl_ref[:].astype(jnp.bfloat16)

            def body(t, s):
                base = t * SLAB
                c_slab = chars_ref[pl.ds(base, SLAB), :]
                outs = []
                for j in range(SLAB):
                    onehot = (
                        c_slab[j][:, None]
                        == jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
                    ).astype(jnp.bfloat16)
                    cols = jnp.dot(
                        onehot, tbl, preferred_element_type=jnp.float32
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

            jax.lax.fori_loop(0, L // SLAB, body, init_ref[0, :])

        f = pl.pallas_call(
            kern,
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
        return f, tbl_np, chars_np

    for K, S in [(96, 1008), (128, 1008), (96, 1024), (128, 1024),
                 (96, 512), (96, 128)]:
        try:
            f, tbl_np, chars_np = build(K, S)
            r = jax.jit(f)(
                jnp.asarray(tbl_np), jnp.asarray(chars_np),
                jnp.zeros((1, TB), jnp.int32),
            )
            print(f"K={K} S={S}: OK {int(np.asarray(r)[-1, 0])}", flush=True)
        except Exception as e:
            print(f"K={K} S={S}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
