"""TPU capability + throughput probes for the DFA-scan kernel design.

Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_tpu.py

Prints one JSON line per probe. Each probe is isolated in try/except so a
single unsupported op doesn't kill the sweep. Findings drive the Pallas
kernel design in ops/pallas_scan.py.
"""

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.setrecursionlimit(100_000)

S = 128  # padded state count
L = 1024
B = 4096


def timeit(f, *a, n=10):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def report(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def fail(name, e):
    report(name, error=f"{type(e).__name__}: {str(e)[:200]}")


def main():
    dev = jax.devices()[0]
    report("device", kind=dev.device_kind, platform=dev.platform)
    rng = np.random.default_rng(0)
    T = rng.integers(0, S, size=(256, S)).astype(np.int32)
    chars = rng.integers(0, 256, size=(B, L)).astype(np.uint8)

    # ---- 1. XLA batched scan: lax.scan over L, flat gather per step ----
    try:
        t_flat = jnp.asarray(T.reshape(-1))
        cj = jnp.asarray(chars)

        @jax.jit
        def xla_scan(c):
            ct = c.astype(jnp.int32).T

            def step(s, cc):
                nxt = jnp.take(t_flat, cc * S + s)
                return nxt, nxt

            init = jnp.zeros((c.shape[0],), jnp.int32)
            _, seq = jax.lax.scan(step, init, ct)
            return seq

        dt = timeit(xla_scan, cj)
        report("xla_scan_gather", sec=dt, bytes_per_sec=B * L / dt)
    except Exception as e:
        fail("xla_scan_gather", e)

    # ---- 2. XLA one-shot big gather (no scan): all (c,s) pairs at once ----
    try:
        idx = jnp.asarray(rng.integers(0, 256 * S, size=(B, L)).astype(np.int32))
        t_flat = jnp.asarray(T.reshape(-1))

        @jax.jit
        def big_gather(i):
            return jnp.take(t_flat, i)

        dt = timeit(big_gather, idx)
        report("xla_big_gather", sec=dt, gathers_per_sec=B * L / dt)
    except Exception as e:
        fail("xla_big_gather", e)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # ---- 3. Pallas: take_along_axis along lanes [8,128] ----
    try:
        def k3(g_ref, f_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(g_ref[:], f_ref[:], axis=-1)

        g = jnp.asarray(rng.integers(0, S, size=(8, 128)).astype(np.int32))
        f = jnp.asarray(rng.integers(0, 128, size=(8, 128)).astype(np.int32))
        out = pl.pallas_call(
            k3,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(g, f)
        expected = np.take_along_axis(np.asarray(g), np.asarray(f), axis=-1)
        ok = bool((np.asarray(out) == expected).all())
        report("pallas_take_along_lanes_8x128", ok=ok)
    except Exception as e:
        fail("pallas_take_along_lanes_8x128", e)

    # ---- 4. Pallas: take_along_axis along lanes for bigger sublane dim ----
    try:
        def k4(g_ref, f_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(g_ref[:], f_ref[:], axis=-1)

        g = jnp.asarray(rng.integers(0, S, size=(256, 128)).astype(np.int32))
        f = jnp.asarray(rng.integers(0, 128, size=(256, 128)).astype(np.int32))
        run4 = jax.jit(
            pl.pallas_call(
                k4,
                out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )
        out = run4(g, f)
        expected = np.take_along_axis(np.asarray(g), np.asarray(f), axis=-1)
        ok = bool((np.asarray(out) == expected).all())
        dt = timeit(run4, g, f)
        report("pallas_take_along_lanes_256x128", ok=ok, sec=dt,
               gathers_per_sec=256 * 128 / dt)
    except Exception as e:
        fail("pallas_take_along_lanes_256x128", e)

    # ---- 5. Pallas: gather rows of T by per-sublane byte (dynamic row idx) --
    try:
        def k5(t_ref, c_ref, o_ref):
            # out[i, :] = t[c[i], :] — dynamic row gather via take on axis 0
            o_ref[:] = jnp.take(t_ref[:], c_ref[:, 0], axis=0)

        tj = jnp.asarray(T)
        c = jnp.asarray(rng.integers(0, 256, size=(8, 1)).astype(np.int32))
        out = pl.pallas_call(
            k5,
            out_shape=jax.ShapeDtypeStruct((8, S), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tj, c)
        expected = np.asarray(T)[np.asarray(c)[:, 0]]
        ok = bool((np.asarray(out) == expected).all())
        report("pallas_row_gather_by_byte", ok=ok)
    except Exception as e:
        fail("pallas_row_gather_by_byte", e)

    # ---- 6. Pallas DFA step via MXU onehot: col = onehot(c)@T; next = col[s] --
    try:
        TB = 256  # strings per tile

        def k6(t_ref, c_ref, o_ref):
            # c_ref: [TB, LB] chars; scan over LB positions
            LB = c_ref.shape[1]
            t_bf = t_ref[:].astype(jnp.bfloat16)  # [256, S]

            def body(i, s):
                c = c_ref[:, i]  # [TB]
                onehot = (
                    c[:, None] == jax.lax.broadcasted_iota(jnp.int32, (TB, 256), 1)
                ).astype(jnp.bfloat16)
                col = jnp.dot(onehot, t_bf, preferred_element_type=jnp.float32)
                col_i = col.astype(jnp.int32)  # [TB, S]
                nxt = jnp.take_along_axis(col_i, s[:, None], axis=-1)[:, 0]
                o_ref[:, i] = nxt
                return nxt

            jax.lax.fori_loop(0, LB, body, jnp.zeros((TB,), jnp.int32))

        LB = 256
        tj = jnp.asarray(T)
        cb = jnp.asarray(chars[:TB, :LB].astype(np.int32))
        run6 = jax.jit(
            pl.pallas_call(
                k6,
                out_shape=jax.ShapeDtypeStruct((TB, LB), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )
        out = np.asarray(run6(tj, cb))
        # correctness
        s = np.zeros(TB, np.int64)
        ok = True
        for i in range(LB):
            s = T.reshape(-1)[np.asarray(cb)[:, i] * S + s]
            if not (out[:, i] == s).all():
                ok = False
                break
        dt = timeit(run6, tj, cb)
        report("pallas_mxu_onehot_step", ok=ok, sec=dt,
               bytes_per_sec=TB * LB / dt)
    except Exception as e:
        fail("pallas_mxu_onehot_step", e)

    # ---- 7. Pallas: flat-table gather via double take_along ----
    try:
        TB = 256

        def k7(t_ref, c_ref, o_ref):
            # per-lane flat gather emulation: rows by c via onehot-free
            # approach: t is [256, S]; idx = c*S + s -> row=c, lane=s.
            # Try direct 2D advanced indexing.
            LB = c_ref.shape[1]

            def body(i, s):
                c = c_ref[:, i]
                nxt = t_ref[c, s]
                o_ref[:, i] = nxt
                return nxt

            jax.lax.fori_loop(0, LB, body, jnp.zeros((TB,), jnp.int32))

        LB = 256
        tj = jnp.asarray(T)
        cb = jnp.asarray(chars[:TB, :LB].astype(np.int32))
        run7 = jax.jit(
            pl.pallas_call(
                k7,
                out_shape=jax.ShapeDtypeStruct((TB, LB), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )
        out = np.asarray(run7(tj, cb))
        s = np.zeros(TB, np.int64)
        ok = True
        for i in range(LB):
            s = T.reshape(-1)[np.asarray(cb)[:, i] * S + s]
            if not (out[:, i] == s).all():
                ok = False
                break
        dt = timeit(run7, tj, cb)
        report("pallas_2d_fancy_index", ok=ok, sec=dt, bytes_per_sec=TB * LB / dt)
    except Exception as e:
        fail("pallas_2d_fancy_index", e)

    # ---- 8. MXU peak sanity: bf16 matmul ----
    try:
        a = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32)).astype(
            jnp.bfloat16
        )

        @jax.jit
        def mm(x):
            return jnp.dot(x, x, preferred_element_type=jnp.float32)

        dt = timeit(mm, a, n=5)
        report("mxu_bf16_4096", sec=dt, tflops=2 * 4096**3 / dt / 1e12)
    except Exception as e:
        fail("mxu_bf16_4096", e)

    # ---- 9. HBM bandwidth sanity: big copy ----
    try:
        x = jnp.asarray(rng.integers(0, 255, size=(1 << 28,)).astype(np.uint8))

        @jax.jit
        def cp(v):
            return v + 1

        dt = timeit(cp, x, n=5)
        report("hbm_copy_256MB", sec=dt, gbytes_per_sec=2 * x.size / dt / 1e9)
    except Exception as e:
        fail("hbm_copy_256MB", e)


if __name__ == "__main__":
    main()
