"""TPU probe round 9: per-step overhead floor and slab-unrolled scan.

Hypothesis: the fused kernel is bound by per-iteration costs of the
fori_loop (dynamic row reads/writes), not compute. A: loop floor with one
read+add+write per step. B: slab-8 (read 8 rows, 8 static sub-steps in
registers, write 8 rows). C: full scan step slab-ized."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def fail(name, e):
    report(name, error=f"{type(e).__name__}: {str(e)[:200]}")


def timed(fn, variants, iters=5):
    out = fn(variants[0])
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(variants[i % len(variants)])
        np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / iters


TB, L = 256, 1024
S, K = 32, 16
rng = np.random.default_rng(0)


def variants_of(shape, dtype=np.int32, lo=0, hi=256, n=2):
    return [jnp.asarray(rng.integers(lo, hi, size=shape).astype(dtype)) for _ in range(n)]


def main():
    report("device", kind=jax.devices()[0].device_kind)

    # ---- A: loop floor ----
    try:
        def ka(x_ref, o_ref):
            def body(i, carry):
                v = x_ref[i, :] + carry
                o_ref[i, :] = v
                return v

            jax.lax.fori_loop(0, L, body, jnp.zeros((TB,), jnp.int32))

        run = jax.jit(
            pl.pallas_call(
                ka,
                out_shape=jax.ShapeDtypeStruct((L, TB), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )
        vs = variants_of((L, TB))
        dt = timed(run, vs)
        report("A_loop_floor", sec=dt, us_per_step=dt / L * 1e6)
    except Exception as e:
        fail("A_loop_floor", e)

    # ---- B: slab-8 floor ----
    try:
        SB = 8

        def kb(x_ref, o_ref):
            def body(t, carry):
                slab = x_ref[pl.ds(t * SB, SB), :]  # [SB, TB]
                outs = []
                for j in range(SB):
                    carry = slab[j, :] + carry
                    outs.append(carry)
                o_ref[pl.ds(t * SB, SB), :] = jnp.stack(outs, axis=0)
                return carry

            jax.lax.fori_loop(0, L // SB, body, jnp.zeros((TB,), jnp.int32))

        run = jax.jit(
            pl.pallas_call(
                kb,
                out_shape=jax.ShapeDtypeStruct((L, TB), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )
        vs = variants_of((L, TB))
        out = run(vs[0])
        exp = np.cumsum(np.asarray(vs[0]), axis=0)
        ok = bool((np.asarray(out) == exp).all())
        dt = timed(run, vs)
        report("B_slab8_floor", ok=ok, sec=dt, us_per_step=dt / L * 1e6)
    except Exception as e:
        fail("B_slab8_floor", e)

    # ---- C: full scan step, slab-8, class matmul + select extract ----
    try:
        SB = 8
        classes = rng.integers(0, K, size=256).astype(np.int32)
        Tk = rng.integers(0, S, size=(K, 4 * S)).astype(np.float32)
        terms = []
        for c in range(1, 256):
            d = int(classes[c]) - int(classes[c - 1])
            if d:
                terms.append((c, d))
        cls0 = int(classes[0])

        def kc(tk_ref, x_ref, o_ref, i1_ref, i2_ref, i3_ref):
            t_bf = tk_ref[:].astype(jnp.bfloat16)

            def body(t, carry):
                slab = x_ref[pl.ds(t * SB, SB), :]  # [SB, TB] chars
                outs0 = []
                outs1 = []
                outs2 = []
                outs3 = []
                s = carry
                for j in range(SB):
                    c = slab[j, :]
                    cls = jnp.full((TB,), cls0, jnp.int32)
                    for b_r, delta in terms:
                        cls = cls + delta * (c >= b_r).astype(jnp.int32)
                    onehot = (
                        cls[:, None]
                        == jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
                    ).astype(jnp.bfloat16)
                    cols = jnp.dot(
                        onehot, t_bf, preferred_element_type=jnp.float32
                    ).astype(jnp.int32)
                    sel = (
                        jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1)
                        == s[:, None]
                    ).astype(jnp.int32)
                    v0 = jnp.sum(cols[:, 0:S] * sel, axis=-1)
                    v1 = jnp.sum(cols[:, S : 2 * S] * sel, axis=-1)
                    v2 = jnp.sum(cols[:, 2 * S : 3 * S] * sel, axis=-1)
                    v3 = jnp.sum(cols[:, 3 * S :] * sel, axis=-1)
                    s = v0
                    outs0.append(v0)
                    outs1.append(v1)
                    outs2.append(v2)
                    outs3.append(v3)
                o_ref[pl.ds(t * SB, SB), :] = jnp.stack(outs0, 0)
                i1_ref[pl.ds(t * SB, SB), :] = jnp.stack(outs1, 0)
                i2_ref[pl.ds(t * SB, SB), :] = jnp.stack(outs2, 0)
                i3_ref[pl.ds(t * SB, SB), :] = jnp.stack(outs3, 0)
                return s

            jax.lax.fori_loop(0, L // SB, body, jnp.zeros((TB,), jnp.int32))

        run = jax.jit(
            pl.pallas_call(
                kc,
                out_shape=[jax.ShapeDtypeStruct((L, TB), jnp.int32)] * 4,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            )
        )
        vs = variants_of((L, TB))
        outs = run(jnp.asarray(Tk), vs[0])
        # correctness vs numpy
        Tc = Tk[classes]  # [256, 4S]
        cn = np.asarray(vs[0])
        s = np.zeros(TB, np.int64)
        ok = True
        for i in range(L):
            row = Tc[cn[i]]  # [TB, 4S]
            v0 = row[np.arange(TB), s]
            if not (np.asarray(outs[0])[i] == v0).all():
                ok = False
                break
            s = v0.astype(np.int64)
        def f(v):
            return run(jnp.asarray(Tk), v)[0]
        dt = timed(f, vs)
        report("C_slab8_scan", ok=ok, sec=dt, us_per_step=dt / L * 1e6,
               mbytes_per_sec=TB * L / dt / 1e6)
    except Exception as e:
        fail("C_slab8_scan", e)

    # ---- D: same as C but slab 16 ----
    # (skipped if C fails)


if __name__ == "__main__":
    main()
