"""Round-2 probe: bit-sliced (bitplane) scan kernel viability.

The round-2 perf design (docs/ROADMAP.md item 3) packs 32 strings per
int32 lane and evaluates the DFA transition as a synthesized boolean
circuit over one-hot state/class indicator planes — pure VPU bitwise ops.
This probe measures, on hardware:

  A. serial bitop scan throughput: fori_loop over L steps, N and/or/xor
     ops per step on [8, 128] int32 planes (k class planes read per step,
     SB planes written) — sweep N. This bounds the scan-kernel stage.
  B. XLA packed-bitop throughput (position-parallel circuit stage).
  C. XLA pack (bytes -> bit-planes via shift/and + matmul) and unpack
     throughput.
  D. probe_tpu7 regression: MXU matmul inside a 2D grid with scratch
     (the round-1 Mosaic SIGABRT) — gate for chunked kernels.
  E. 2D grid (b, l) with scratch carry + pure-VPU bitops (the bitplane
     scan kernel's actual shape).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from halo2_regex_tpu.utils.profiling import benchmark_chained

    print(jax.devices(), flush=True)

    L = 1024
    NWS, LANE = 8, 128  # plane shape [8, 128] = 1 vreg; 32768 strings
    B_eq = 32 * NWS * LANE  # string count equivalent

    # ---------------- A: serial bitop scan ----------------
    def make_scan_probe(n_ops, k=12, sb=5, lc=128):
        n_l = L // lc

        def kern(cls_ref, out_ref, st_scr):
            l = pl.program_id(0)

            @pl.when(l == 0)
            def _():
                st_scr[:] = jnp.zeros_like(st_scr)

            def body(i, carry):
                planes = [st_scr[j] for j in range(sb)]
                cls = [cls_ref[i, c] for c in range(k)]
                acc = carry
                # n_ops mixed and/or/xor ops with serial-ish dependency
                j = 0
                for t in range(n_ops):
                    a = planes[t % sb]
                    c = cls[t % k]
                    if t % 3 == 0:
                        acc = acc ^ (a & c)
                    elif t % 3 == 1:
                        acc = acc | (a & ~c)
                    else:
                        planes[t % sb] = a ^ acc
                for j in range(sb):
                    st_scr[j] = planes[j]
                out_ref[i, 0] = acc
                return acc

            jax.lax.fori_loop(0, lc, body, st_scr[0])

        f = pl.pallas_call(
            kern,
            grid=(n_l,),
            in_specs=[
                pl.BlockSpec((lc, k, NWS, LANE), lambda l: (l, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((lc, 1, NWS, LANE), lambda l: (l, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, 1, NWS, LANE), jnp.int32),
            scratch_shapes=[pltpu.VMEM((sb, NWS, LANE), jnp.int32)],
        )
        return f

    rng = np.random.default_rng(0)
    for n_ops in (96, 192, 384, 768):
        try:
            k = 12
            cls = jnp.asarray(
                rng.integers(0, 2**31, size=(L, k, NWS, LANE)), jnp.int32
            )
            f = make_scan_probe(n_ops, k=k)

            def mk(K, f=f):
                @jax.jit
                def g(c):
                    out = None
                    for _ in range(K):
                        out = f(c)
                        c = c ^ (out[0, 0, 0, 0] & 1)
                    return out

                return g

            t0 = time.time()
            sec = benchmark_chained(mk, (cls,), ks=(1, 5))
            gbs = B_eq * L / sec / 1e9
            print(f"A n_ops={n_ops}: {sec*1e3:.3f} ms -> {gbs:.1f} GB/s "
                  f"(compile+run {time.time()-t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"A n_ops={n_ops}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # ---------------- B: XLA packed bitops ----------------
    def xla_circuit(n_ops):
        def f(x):  # x [P, L, NWS, LANE]
            planes = [x[i] for i in range(x.shape[0])]
            acc = planes[0]
            for t in range(n_ops):
                a = planes[t % len(planes)]
                if t % 3 == 0:
                    acc = acc ^ (a & planes[(t + 1) % len(planes)])
                elif t % 3 == 1:
                    acc = acc | (a & ~acc)
                else:
                    acc = (acc ^ a) & planes[(t + 2) % len(planes)]
            return acc

        return f

    for n_ops in (64, 256):
        x = jnp.asarray(rng.integers(0, 2**31, size=(8, L, NWS, LANE)), jnp.int32)
        f = xla_circuit(n_ops)

        def mk(K, f=f):
            @jax.jit
            def g(x):
                out = None
                for _ in range(K):
                    out = f(x)
                    x = x ^ (out[0, 0, 0] & 1)
                return out

            return g

        sec = benchmark_chained(mk, (x,), ks=(1, 5))
        print(f"B xla n_ops={n_ops}: {sec*1e3:.3f} ms -> "
              f"{B_eq * L / sec / 1e9:.1f} GB/s", flush=True)

    # ---------------- C: pack / unpack ----------------
    B = B_eq
    chars = jnp.asarray(rng.integers(0, 256, size=(B, L)), jnp.uint8)
    pw_lo = (1 << jnp.arange(16, dtype=jnp.int32)).astype(jnp.float32)

    def pack_fn(c):
        # [B, L] uint8 -> 8 bit planes [8, L, B//32] int32
        x = c.astype(jnp.int32)
        planes = []
        xt = x.T.reshape(L, B // 32, 32)  # [L, NW, 32]
        for j in range(8):
            bits = ((xt >> j) & 1).astype(jnp.float32)
            lo = bits[..., :16] @ pw_lo
            hi = bits[..., 16:] @ pw_lo
            planes.append(lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16))
        return jnp.stack(planes)

    def mk(K):
        @jax.jit
        def g(c):
            out = None
            for _ in range(K):
                out = pack_fn(c)
                c = c ^ (out[0, 0, 0] & 1).astype(jnp.uint8)
            return out

        return g

    sec = benchmark_chained(mk, (chars,), ks=(1, 5))
    print(f"C pack: {sec*1e3:.3f} ms -> {B * L / sec / 1e9:.1f} GB/s", flush=True)

    planes5 = jnp.asarray(
        rng.integers(0, 2**31, size=(5, L, B // 32)), jnp.int32
    )
    bit_iota = jnp.arange(32, dtype=jnp.int32)

    def unpack_fn(p):
        # [5, L, NW] -> [B, L] uint8 via shift-and + weighted sum
        acc = jnp.zeros((L, B // 32, 32), jnp.int32)
        for j in range(5):
            acc = acc + (((p[j][..., None] >> bit_iota) & 1) << j)
        return acc.reshape(L, B).T.astype(jnp.uint8)

    def mk(K):
        @jax.jit
        def g(p):
            out = None
            for _ in range(K):
                out = unpack_fn(p)
                p = p ^ (out[0, 0] & 1).astype(jnp.int32)
            return out

        return g

    sec = benchmark_chained(mk, (planes5,), ks=(1, 5))
    print(f"C unpack5: {sec*1e3:.3f} ms -> {B * L / sec / 1e9:.1f} GB/s", flush=True)

    # ---------------- D: probe_tpu7 regression (MXU in 2D grid + scratch) --
    def mm_kern(a_ref, b_ref, o_ref, scr):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            scr[:] = jnp.zeros_like(scr)

        scr[:] = scr[:] + jnp.dot(
            a_ref[0], b_ref[0], preferred_element_type=jnp.float32
        )
        o_ref[0] = scr[:]

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
        print(f"D mxu-2dgrid-scratch: FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)

    # ---------------- E: 2D grid (b, l) + scratch carry + bitops ----------
    def kern2(cls_ref, out_ref, st_scr):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            st_scr[:] = jnp.zeros_like(st_scr)

        def body(i, acc):
            c = cls_ref[i, 0]
            acc = acc ^ (c & st_scr[0])
            st_scr[0] = acc
            return acc

        out_ref[0, 0] = jax.lax.fori_loop(0, cls_ref.shape[0], body, st_scr[0])

    try:
        lc = 128
        cls = jnp.asarray(
            rng.integers(0, 2**31, size=(2, L, 1, NWS, LANE)), jnp.int32
        )
        f = pl.pallas_call(
            kern2,
            grid=(2, L // lc),
            in_specs=[
                pl.BlockSpec((1, lc, 1, NWS, LANE),
                             lambda b, l: (b, l, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, NWS, LANE),
                                   lambda b, l: (b, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, 1, 1, NWS, LANE), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, NWS, LANE), jnp.int32)],
        )
        r = jax.jit(f)(cls)
        print("E 2dgrid-bitops-scratch: OK", int(np.asarray(r)[0, 0, 0, 0, 0]),
              flush=True)
    except Exception as e:
        print(f"E 2dgrid-bitops-scratch: FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)


if __name__ == "__main__":
    main()
