"""TPU probe round 6: bisect the gen-2 kernel Mosaic SIGABRT.

Incremental kernels, tiny shapes, each isolated. k5 is the production
PallasMatcher on a small model."""

import json
import sys
import time

sys.setrecursionlimit(100_000)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def fail(name, e):
    report(name, error=f"{type(e).__name__}: {str(e)[:200]}")


TB, LC, NL, S = 128, 64, 2, 32
L = LC * NL
rng = np.random.default_rng(0)


def main():
    report("device", kind=jax.devices()[0].device_kind)

    # ---- k1: 2D grid + scratch carry + pl.when ----
    try:
        def k1(x_ref, o_ref, scr):
            l = pl.program_id(1)

            @pl.when(l == 0)
            def _():
                scr[0, :] = jnp.zeros((TB,), jnp.int32)

            def body(i, acc):
                acc = acc + x_ref[i, :]
                o_ref[i, :] = acc
                return acc

            scr[0, :] = jax.lax.fori_loop(0, LC, body, scr[0, :])

        x = jnp.asarray(rng.integers(0, 5, size=(L, 2 * TB)).astype(np.int32))
        out = pl.pallas_call(
            k1,
            grid=(2, NL),
            in_specs=[pl.BlockSpec((LC, TB), lambda b, l: (l, b),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((LC, TB), lambda b, l: (l, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, 2 * TB), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, TB), jnp.int32)],
        )(x)
        exp = np.cumsum(np.asarray(x), axis=0)
        report("k1_grid_scratch", ok=bool((np.asarray(out) == exp).all()))
    except Exception as e:
        fail("k1_grid_scratch", e)

    # ---- k2: + onehot matmul + select extraction in the loop ----
    T = rng.integers(0, S, size=(256, S)).astype(np.int32)
    try:
        def k2(t_ref, x_ref, o_ref, scr):
            l = pl.program_id(1)

            @pl.when(l == 0)
            def _():
                scr[0, :] = jnp.zeros((TB,), jnp.int32)

            t_bf = t_ref[:].astype(jnp.bfloat16)

            def body(i, s):
                c = x_ref[i, :]
                onehot = (
                    c[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TB, 256), 1)
                ).astype(jnp.bfloat16)
                cols = jnp.dot(onehot, t_bf, preferred_element_type=jnp.float32
                               ).astype(jnp.int32)
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1) == s[:, None]
                ).astype(jnp.int32)
                nxt = jnp.sum(cols * sel, axis=-1)
                o_ref[i, :] = nxt
                return nxt

            scr[0, :] = jax.lax.fori_loop(0, LC, body, scr[0, :])

        x = jnp.asarray(rng.integers(0, 256, size=(L, TB)).astype(np.int32))
        out = pl.pallas_call(
            k2,
            grid=(1, NL),
            in_specs=[
                pl.BlockSpec((256, S), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((LC, TB), lambda b, l: (l, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LC, TB), lambda b, l: (l, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, TB), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, TB), jnp.int32)],
        )(jnp.asarray(T), x)
        cn = np.asarray(x)
        s = np.zeros(TB, np.int64)
        ok = True
        for i in range(L):
            s = T.reshape(-1)[cn[i] * S + s]
            if not (np.asarray(out)[i] == s).all():
                ok = False
                break
        report("k2_onehot_sel_grid", ok=ok)
    except Exception as e:
        fail("k2_onehot_sel_grid", e)

    # ---- k3: + static-slice extraction of packed 4S tables ----
    try:
        P4 = rng.integers(0, S, size=(256, 4 * S)).astype(np.int32)

        def k3(t_ref, x_ref, o_ref, scr):
            l = pl.program_id(1)

            @pl.when(l == 0)
            def _():
                scr[0, :] = jnp.zeros((TB,), jnp.int32)

            t_bf = t_ref[:].astype(jnp.bfloat16)

            def body(i, s):
                c = x_ref[i, :]
                onehot = (
                    c[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TB, 256), 1)
                ).astype(jnp.bfloat16)
                cols = jnp.dot(onehot, t_bf, preferred_element_type=jnp.float32
                               ).astype(jnp.int32)
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1) == s[:, None]
                ).astype(jnp.int32)
                nxt = jnp.sum(cols[:, 0:S] * sel, axis=-1)
                o_ref[i, :] = jnp.sum(cols[:, S : 2 * S] * sel, axis=-1)
                return nxt

            scr[0, :] = jax.lax.fori_loop(0, LC, body, scr[0, :])

        x = jnp.asarray(rng.integers(0, 256, size=(L, TB)).astype(np.int32))
        out = pl.pallas_call(
            k3,
            grid=(1, NL),
            in_specs=[
                pl.BlockSpec((256, 4 * S), lambda b, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LC, TB), lambda b, l: (l, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((LC, TB), lambda b, l: (l, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, TB), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, TB), jnp.int32)],
        )(jnp.asarray(P4), x)
        report("k3_packed_slices", ok=bool(np.asarray(out).shape == (L, TB)))
    except Exception as e:
        fail("k3_packed_slices", e)

    # ---- k4: boundary-chain class build ----
    try:
        terms = [(int(b), int(d)) for b, d in
                 zip(rng.integers(1, 256, 30), rng.integers(-3, 4, 30)) if d != 0]

        def k4(x_ref, o_ref):
            def body(i, acc):
                c = x_ref[i, :]
                cls = jnp.zeros((TB,), jnp.int32)
                for b_r, delta in terms:
                    cls = cls + delta * (c >= b_r).astype(jnp.int32)
                o_ref[i, :] = cls
                return acc

            jax.lax.fori_loop(0, LC, body, jnp.zeros((TB,), jnp.int32))

        x = jnp.asarray(rng.integers(0, 256, size=(LC, TB)).astype(np.int32))
        out = pl.pallas_call(
            k4,
            out_shape=jax.ShapeDtypeStruct((LC, TB), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        report("k4_boundary_chain", ok=bool(np.asarray(out).shape == (LC, TB)))
    except Exception as e:
        fail("k4_boundary_chain", e)

    # ---- k5: production PallasMatcher, tiny model ----
    try:
        from fixtures import CONFIGS
        from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
        from halo2_regex_tpu.models.compiled import CompiledRegexModel
        from halo2_regex_tpu.ops import reference as ref_ops
        from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
        from halo2_regex_tpu.ops.scan_jax import pack_batch

        model = CompiledRegexModel.from_decomposed(
            DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=64
        )
        matcher = PallasMatcher(model, batch_tile=128, chunk=32)
        strings = [b"from:alice@gmail.com\r\n", b"", b"x" * 64] * 43
        chars, lengths = pack_batch(strings, 64)
        res = matcher(chars, lengths)
        oracle = ref_ops.match_substrs(model.regex_defs, strings[0], 64)
        row = res.map(lambda a: np.asarray(a)[0])
        ok = all(
            (np.asarray(getattr(row, n)).astype(np.int64)
             == np.asarray(getattr(oracle, n)).astype(np.int64)).all()
            for n in row.field_names()
        )
        report("k5_production_small", ok=bool(ok))
    except Exception as e:
        fail("k5_production_small", e)


if __name__ == "__main__":
    main()
