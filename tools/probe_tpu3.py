"""TPU probe round 3: isolate the take_along_axis [TB,1] lowering bug and
measure extraction variants + verified MXU peak."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 128
rng = np.random.default_rng(0)
T = rng.integers(0, S, size=(256, S)).astype(np.int32)


def timeit(f, *a, n=10):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def report(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def fail(name, e):
    report(name, error=f"{type(e).__name__}: {str(e)[:300]}")


def ref_scan(cn):
    L, TB = cn.shape
    s = np.zeros(TB, np.int64)
    out = np.zeros((L, TB), np.int64)
    for i in range(L):
        s = T.reshape(-1)[cn[i] * S + s]
        out[i] = s
    return out


def vmem_call(k, out_shape, n_in):
    return pl.pallas_call(
        k,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def main():
    report("device", kind=jax.devices()[0].device_kind)

    # ---- 1. take_along [TB, 1] idx correctness, no loop ----
    try:
        TB = 64

        def k1(g_ref, i_ref, o_ref):
            v = jnp.take_along_axis(g_ref[:], i_ref[:, 0:1], axis=-1)
            o_ref[:] = jnp.broadcast_to(v, (TB, 128))

        g = jnp.asarray(rng.integers(0, 999, size=(TB, 128)).astype(np.int32))
        idx = jnp.asarray(rng.integers(0, 128, size=(TB, 8)).astype(np.int32))
        out = np.asarray(vmem_call(k1, jax.ShapeDtypeStruct((TB, 128), jnp.int32), 2)(g, idx))
        exp = np.take_along_axis(np.asarray(g), np.asarray(idx)[:, 0:1], axis=-1)
        report("take_along_TBx1", ok=bool((out[:, 0:1] == exp).all()))
    except Exception as e:
        fail("take_along_TBx1", e)

    # ---- 2. scan kernel with FULL-WIDTH take_along idx ----
    def make_scan_fullwidth(TB, LB):
        def k(t_ref, c_ref, o_ref):
            t_bf = t_ref[:].astype(jnp.bfloat16)

            def body(i, s):
                c = c_ref[i, :]
                onehot = (
                    c[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TB, 256), 1)
                ).astype(jnp.bfloat16)
                col = jnp.dot(onehot, t_bf, preferred_element_type=jnp.float32).astype(
                    jnp.int32
                )
                idx = jnp.broadcast_to(s[:, None], (TB, S))
                nxt = jnp.take_along_axis(col, idx, axis=-1)[:, 0]
                o_ref[i, :] = nxt
                return nxt

            jax.lax.fori_loop(0, LB, body, jnp.zeros((TB,), jnp.int32))

        return k

    for TB, LB in [(256, 512), (512, 512)]:
        try:
            ctm = jnp.asarray(rng.integers(0, 256, size=(LB, TB)).astype(np.int32))
            run = jax.jit(
                vmem_call(
                    make_scan_fullwidth(TB, LB),
                    jax.ShapeDtypeStruct((LB, TB), jnp.int32),
                    2,
                )
            )
            out = np.asarray(run(jnp.asarray(T), ctm))
            ok = bool((out == ref_scan(np.asarray(ctm))).all())
            dt = timeit(run, jnp.asarray(T), ctm, n=5)
            report(
                f"scan_fullwidth_{TB}x{LB}", ok=ok, sec=dt,
                mbytes_per_sec=TB * LB / dt / 1e6,
            )
        except Exception as e:
            fail(f"scan_fullwidth_{TB}x{LB}", e)

    # ---- 3. scan kernel with onehot-select extraction (no take_along) ----
    def make_scan_select(TB, LB):
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1)

        def k(t_ref, c_ref, o_ref):
            t_bf = t_ref[:].astype(jnp.bfloat16)

            def body(i, s):
                c = c_ref[i, :]
                onehot = (
                    c[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TB, 256), 1)
                ).astype(jnp.bfloat16)
                col = jnp.dot(onehot, t_bf, preferred_element_type=jnp.float32).astype(
                    jnp.int32
                )
                sel = (lane_s == s[:, None]).astype(jnp.int32)
                nxt = jnp.sum(col * sel, axis=-1)
                o_ref[i, :] = nxt
                return nxt

            jax.lax.fori_loop(0, LB, body, jnp.zeros((TB,), jnp.int32))

        return k

    for TB, LB in [(256, 512), (512, 512), (1024, 512)]:
        try:
            ctm = jnp.asarray(rng.integers(0, 256, size=(LB, TB)).astype(np.int32))
            run = jax.jit(
                vmem_call(
                    make_scan_select(TB, LB),
                    jax.ShapeDtypeStruct((LB, TB), jnp.int32),
                    2,
                )
            )
            out = np.asarray(run(jnp.asarray(T), ctm))
            ok = bool((out == ref_scan(np.asarray(ctm))).all())
            dt = timeit(run, jnp.asarray(T), ctm, n=5)
            report(
                f"scan_select_{TB}x{LB}", ok=ok, sec=dt,
                mbytes_per_sec=TB * LB / dt / 1e6,
            )
        except Exception as e:
            fail(f"scan_select_{TB}x{LB}", e)

    # ---- 4. verified MXU peak: fresh inputs, check numerics ----
    try:
        N = 2048
        a = rng.standard_normal((N, N)).astype(np.float32)
        b = rng.standard_normal((N, N)).astype(np.float32)
        aj = jnp.asarray(a).astype(jnp.bfloat16)
        bj = jnp.asarray(b).astype(jnp.bfloat16)

        @jax.jit
        def mm(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32)

        out = np.asarray(mm(aj, bj))
        ref = a.astype(np.float32) @ b.astype(np.float32)
        rel = np.abs(out - ref).mean() / np.abs(ref).mean()
        dt = timeit(mm, aj, bj, n=20)
        report("mxu_verified_2048", rel_err=float(rel), sec=dt,
               tflops=2 * N**3 / dt / 1e12)
    except Exception as e:
        fail("mxu_verified_2048", e)

    # ---- 5. take_along composition loop (no unroll kwarg) ----
    try:
        def k3(g_ref, f_ref, o_ref):
            def body(i, acc):
                return jnp.take_along_axis(g_ref[:], acc, axis=-1)

            o_ref[:] = jax.lax.fori_loop(0, 1024, body, f_ref[:])

        g = jnp.asarray(rng.integers(0, 128, size=(256, 128)).astype(np.int32))
        f = jnp.asarray(rng.integers(0, 128, size=(256, 128)).astype(np.int32))
        run = jax.jit(vmem_call(k3, jax.ShapeDtypeStruct((256, 128), jnp.int32), 2))
        jax.block_until_ready(run(g, f))
        dt = timeit(run, g, f, n=5)
        report("take_along_loop", sec_per_op=dt / 1024,
               gathers_per_sec=256 * 128 * 1024 / dt)
    except Exception as e:
        fail("take_along_loop", e)


if __name__ == "__main__":
    main()
