"""TPU probe 18: cost anatomy of the slab kernel.

Times stripped-down variants of the slab kernel to locate the per-slab
overhead: (a) scan-only (1 pick, 1 output), (b) scan+ids (2 picks, 2
outputs), (c) the full kernel (4 picks + FSMs) for reference. All chained.
"""

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


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


B, L, TB, SLAB = 4096, 1024, 512, 8


def build(n_outputs):
    """Slab scan kernel with n_outputs picks/outputs (1=scan only)."""
    from halo2_regex_tpu.models import zoo
    from halo2_regex_tpu.ops.pallas_scan import (
        build_packed_tables, byte_classes, class_boundaries,
    )

    model = zoo.email_headers_model(max_chars_size=L, headers=("from",))
    S = model.s_pad
    packed = build_packed_tables(model)
    class_of, ctab = byte_classes(packed[0])
    cls0, terms = class_boundaries(class_of)
    kdim = ctab.shape[0]
    kp = -(-max(kdim, 8) // 8) * 8
    tab = np.zeros((kp, 4 * S), np.float32)
    tab[:kdim] = ctab
    first = int(model.first_states[0])
    n_slab = L // SLAB

    def kernel(t_ref, c_ref, *out_refs):
        t_bf = t_ref[:].astype(jnp.bfloat16)

        def slab_body(t, s):
            base = t * SLAB
            c_slab = c_ref[pl.ds(base, SLAB), :]
            cols = []
            for j in range(SLAB):
                cls = jnp.full((TB,), cls0, jnp.int32)
                for b_r, delta in terms:
                    cls = cls + delta * (c_slab[j] >= b_r).astype(jnp.int32)
                onehot = (
                    cls[:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (TB, kp), 1)
                ).astype(jnp.bfloat16)
                cols.append(
                    jnp.dot(onehot, t_bf, preferred_element_type=jnp.float32)
                    .astype(jnp.int32)
                )
            outs = [[] for _ in range(n_outputs)]
            for j in range(SLAB):
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1)
                    == s[:, None]
                ).astype(jnp.int32)
                picks = [
                    jnp.sum(cols[j][:, kk * S : (kk + 1) * S] * sel, axis=-1)
                    for kk in range(n_outputs)
                ]
                s = picks[0]
                for o in range(n_outputs):
                    outs[o].append(picks[o])
            for o in range(n_outputs):
                out_refs[o][pl.ds(base, SLAB), :] = jnp.stack(outs[o], 0)
            return s

        jax.lax.fori_loop(
            0, n_slab, slab_body, jnp.full((TB,), first, jnp.int32)
        )

    call = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec(tab.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, TB), lambda b: (0, b), memory_space=pltpu.VMEM)
        ] * n_outputs,
        out_shape=[jax.ShapeDtypeStruct((L, B), jnp.int32)] * n_outputs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    tj = jnp.asarray(tab)

    def run_one(c):
        outs = call(tj, c)
        return outs[0] if n_outputs > 1 else outs[0]

    return run_one


def chained(run_one, chars):
    def make(K):
        @jax.jit
        def f(ctm):
            out = None
            for _ in range(K):
                out = run_one(ctm)
                dep = (out[0, 0] & 1).astype(jnp.int32)
                ctm = ctm ^ dep
            return out

        return f

    f1, f5 = make(1), make(5)
    for f in (f1, f5):
        fetch(f(chars))

    def t(f, n=4):
        t0 = time.perf_counter()
        for _ in range(n):
            fetch(f(chars))
        return (time.perf_counter() - t0) / n

    return (t(f5) - t(f1)) / 4


def main():
    report("device", kind=jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    ctm = jnp.asarray(rng.integers(32, 127, size=(L, B)).astype(np.int32))
    for n_out, name in [(1, "scan_only"), (2, "scan_ids"), (4, "scan_all4")]:
        try:
            run_one = build(n_out)
            per = chained(run_one, ctm)
            report(name, per_iter_sec=per, mbytes_per_sec=B * L / per / 1e6)
        except Exception as e:
            fail(name, e)


if __name__ == "__main__":
    main()
