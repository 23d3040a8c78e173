"""Round-2 probe: full bitplane pipeline on hardware, staged timings.

Compiles the real BitplaneMatcher on the email model (B=32768, L=1024) and
measures end-to-end + per-stage throughput to locate the bottleneck:
pack -> class -> scan kernel -> tag+FSM -> unpack.

Also re-tests (with correct write shapes) the MXU-matmul-in-2D-grid+scratch
pattern that SIGABRT'd in round 1 (probe_tpu7) — gate for the chunked
split kernels.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.setrecursionlimit(100_000)
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.ops.bitplane import BitplaneMatcher, pack_bytes
    from halo2_regex_tpu.utils.profiling import benchmark_chained

    print(jax.devices(), flush=True)
    B, L = 32768, 1024
    model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
    m = BitplaneMatcher(model)
    circ = m.circuits[0]
    print(
        f"email model: k={circ.k} live={len(circ.live_states)} sb={circ.sb} "
        f"class_ops={circ.class_prog.n_ops} step_ops={circ.step_ops} "
        f"tag_ops={circ.tag_ops}",
        flush=True,
    )

    rng = np.random.default_rng(0)
    chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
    lengths = np.full((B,), L, np.int32)
    chars_j = jnp.asarray(chars)
    lengths_j = jnp.asarray(lengths)

    def timed(name, run_one, fetch, arg):
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
            sec = benchmark_chained(mk, (arg,), ks=(1, 4))
            print(
                f"{name}: {sec*1e3:.3f} ms -> {B*L/sec/1e9:.2f} GB/s "
                f"(wall {time.time()-t0:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)

    # stage 1+2: pack + class
    def s12(c):
        bp = pack_bytes(c, m.L_pad)
        NWS = bp[0].shape[-1] // 128
        bp4 = [p.reshape(m.L_pad, NWS, 128) for p in bp]
        env = {f"byte_bit{j}": bp4[j] for j in range(8)}
        out = circ.class_prog.run(env)
        return jnp.stack([out[f"cls{cc}"] for cc in range(circ.k)], axis=1)

    timed("s12 pack+class", s12, lambda o: o[0, 0, 0, 0] & 1, chars_j)

    # scan kernel only, on a precomputed class stack
    cls_stack = jax.jit(s12)(chars_j)
    _ = np.asarray(cls_stack.ravel()[0])
    timed("scan kernel", m.scan_planes, lambda o: o[0, 0, 0, 0] & 1, cls_stack)

    # end-to-end (all witness columns materialized)
    timed(
        "full pipeline",
        lambda c: m.core(c, lengths_j),
        lambda o: o["mask"][0, 0] & 1,
        chars_j,
    )

    # ---- D (corrected): MXU matmul in 2D grid + scratch ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def mm_kern(a_ref, b_ref, o_ref, scr):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            scr[:] = jnp.zeros_like(scr)

        scr[:] = scr[:] + jnp.dot(
            a_ref[0, 0], b_ref[0, 0], preferred_element_type=jnp.float32
        )
        o_ref[0, 0] = scr[:]

    try:
        a = jnp.ones((4, 2, 128, 128), jnp.bfloat16)
        b = jnp.ones((4, 2, 128, 128), jnp.bfloat16)
        f = pl.pallas_call(
            mm_kern,
            grid=(4, 2),
            in_specs=[
                pl.BlockSpec((1, 1, 128, 128), lambda i, l: (i, l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 128, 128), lambda i, l: (i, l, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 128, 128), lambda i, l: (i, l, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4, 2, 128, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.float32)],
        )
        r = jax.jit(f)(a, b)
        print("D mxu-2dgrid-scratch: OK", float(np.asarray(r).sum()), flush=True)
    except Exception as e:
        print(f"D mxu-2dgrid-scratch: FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    main()
