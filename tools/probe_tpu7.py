"""TPU probe round 7: pinpoint the SIGABRT — select-extraction vs small
lane dims vs 2D grid."""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def fail(name, e):
    report(name, error=f"{type(e).__name__}: {str(e)[:160]}")


TB, LC = 128, 64
rng = np.random.default_rng(0)


def scan_kernel(S, extract, grid2):
    T = rng.integers(0, S, size=(256, S)).astype(np.int32)

    def k(t_ref, x_ref, o_ref, *scr):
        t_bf = t_ref[:].astype(jnp.bfloat16)
        if grid2:
            l = pl.program_id(1)

            @pl.when(l == 0)
            def _():
                scr[0][0, :] = jnp.zeros((TB,), jnp.int32)
            init = scr[0][0, :]
        else:
            init = jnp.zeros((TB,), jnp.int32)

        def body(i, s):
            c = x_ref[i, :]
            onehot = (
                c[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TB, 256), 1)
            ).astype(jnp.bfloat16)
            cols = jnp.dot(onehot, t_bf, preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
            if extract == "select":
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1) == s[:, None]
                ).astype(jnp.int32)
                nxt = jnp.sum(cols * sel, axis=-1)
            else:
                idx = jnp.broadcast_to(s[:, None], (TB, S))
                nxt = jnp.take_along_axis(cols, idx, axis=-1)[:, 0]
            o_ref[i, :] = nxt
            return nxt

        final = jax.lax.fori_loop(0, LC, body, init)
        if grid2:
            scr[0][0, :] = final

    NL = 2 if grid2 else 1
    L = LC * NL
    x = jnp.asarray(rng.integers(0, 256, size=(L, TB)).astype(np.int32))
    kwargs = dict(
        grid=(1, NL),
        in_specs=[
            pl.BlockSpec((256, S), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LC, TB), lambda b, l: (l, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LC, TB), lambda b, l: (l, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, TB), jnp.int32),
    )
    if grid2:
        kwargs["scratch_shapes"] = [pltpu.VMEM((1, TB), jnp.int32)]
    out = pl.pallas_call(k, **kwargs)(jnp.asarray(T), x)
    cn = np.asarray(x)
    s = np.zeros(TB, np.int64)
    ok = True
    for i in range(L):
        s = T.reshape(-1)[cn[i] * S + s]
        if not (np.asarray(out)[i] == s).all():
            ok = False
            break
    return ok


def main():
    report("device", kind=jax.devices()[0].device_kind)
    for name, (S, extract, grid2) in {
        "A_sel_S128_grid1": (128, "select", False),
        "B_sel_S32_grid1": (32, "select", False),
        "C_ta_S32_grid2": (32, "ta", True),
        "D_sel_S128_grid2": (128, "select", True),
        "E_ta_S128_grid2": (128, "ta", True),
    }.items():
        try:
            ok = scan_kernel(S, extract, grid2)
            report(name, ok=bool(ok))
        except Exception as e:
            fail(name, e)


if __name__ == "__main__":
    main()
