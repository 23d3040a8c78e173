"""Round-2 probe: bisect the Mosaic SIGABRT hit by the chunked split scan
kernel on the configs[3] shape (probe_tpu26: HTTP 500 / SIGABRT from the
compile helper), which the simplified 2D-grid+scratch+matmul probe (D in
probe_tpu21) does NOT reproduce.  Variants add one feature at a time.
"""

import sys
import time

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

    TB, S, K = 128, 1008, 96
    LCC, NL = 1024, 4
    L = LCC * NL
    SLAB = 8

    tbl_np = rng.integers(0, 256, size=(K, 2 * S)).astype(np.float32)
    chars_np = rng.integers(32, 127, size=(L, TB)).astype(np.int32)

    def try_variant(name, kern, scratch, n_in=2):
        try:
            specs = [
                pl.BlockSpec((K, 2 * S), lambda b, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LCC, TB), lambda b, l: (l, b),
                             memory_space=pltpu.VMEM),
            ][:n_in]
            f = pl.pallas_call(
                kern,
                grid=(1, NL),
                in_specs=specs,
                out_specs=pl.BlockSpec((LCC, TB), lambda b, l: (l, b),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((L, TB), jnp.int32),
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )
            args = [jnp.asarray(tbl_np), jnp.asarray(chars_np)][:n_in]
            r = jax.jit(f)(*args)
            print(f"{name}: OK sum={int(np.asarray(r).sum()) & 0xFFFF}",
                  flush=True)
            return True
        except ValueError as e:
            print(f"{name}: SKIPPED (mode removed in r3 — re-integrate "
                  f"tools/archive_chunked_kernels.py to re-probe): "
                  f"{str(e)[:100]}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
            return False

    # v1: matmul inside fori_loop, 2D grid, scratch carry
    def v1(tbl_ref, chars_ref, out_ref, st_scr):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            st_scr[0, :] = jnp.zeros((TB,), jnp.int32)

        tbl = tbl_ref[:, 0:S].astype(jnp.bfloat16)

        def body(t, s):
            c = chars_ref[t, :]
            onehot = (
                c[:, None] % K
                == jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
            ).astype(jnp.bfloat16)
            cols = jnp.dot(onehot, tbl, preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
            out_ref[t, :] = cols[:, 0] + s
            return s + 1

        st_scr[0, :] = jax.lax.fori_loop(0, LCC, body, st_scr[0, :])

    try_variant("v1 fori+matmul+scratch", v1,
                [pltpu.VMEM((1, TB), jnp.int32)])

    # v2: v1 + select-extract against the state + dyn-slice slab writes
    def v2(tbl_ref, chars_ref, out_ref, st_scr):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            st_scr[0, :] = jnp.zeros((TB,), jnp.int32)

        tbl = tbl_ref[:].astype(jnp.bfloat16)  # [K, 2S]

        def body(t, s):
            base = t * SLAB
            c_slab = chars_ref[pl.ds(base, SLAB), :]
            outs = []
            for j in range(SLAB):
                onehot = (
                    c_slab[j][:, None] % K
                    == jax.lax.broadcasted_iota(jnp.int32, (TB, K), 1)
                ).astype(jnp.bfloat16)
                cols = jnp.dot(onehot, tbl, preferred_element_type=jnp.float32
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

        st_scr[0, :] = jax.lax.fori_loop(0, LCC // SLAB, body, st_scr[0, :])

    try_variant("v2 +select-extract+slab", v2,
                [pltpu.VMEM((1, TB), jnp.int32)])

    # v3/v4: the real chunked matcher on a scaled-down configs[3] model
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.models.defs import AllstrRegexDef, RegexDefs
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher

    allstr = AllstrRegexDef(first_state_val=0, accepted_state_val=1,
                            largest_state_val=S - 3)
    line = 3
    for c in range(32, 127):
        for s in range(S - 2):
            allstr.state_lookup[(c, s)] = (line, int(rng.integers(0, S - 2)))
            line += 1
    model = CompiledRegexModel.from_defs(
        [RegexDefs(allstr=allstr, substrs=[])], max_chars_size=L
    )
    chars_b = rng.integers(32, 127, size=(TB, L)).astype(np.uint8)
    lengths_b = np.full((TB,), L, np.int32)
    # NOTE (round 3): grid_mode="chunked" was removed from PallasMatcher
    # (Mosaic SIGABRT; kernels archived in tools/archive_chunked_kernels.py).
    # Re-probing the SIGABRT on a new toolchain requires re-integrating the
    # archived kernel source first — these cases then exercise it.
    for name, kw in [
        ("v3 real chunked bf16", dict()),
        ("v4 real chunked int8", dict(table_dtype="int8")),
    ]:
        try:
            m = PallasMatcher(model, batch_tile=TB, grid_mode="chunked",
                              mode="split", **kw)
            res = m(chars_b[:TB], lengths_b[:TB])
            from halo2_regex_tpu.ops import reference as ref_ops

            oracle = ref_ops.match_substrs(
                model.regex_defs, chars_b[0].tobytes(), L
            )
            exact = (np.asarray(res.states)[0] == oracle.states).all()
            print(f"{name}: OK exact={bool(exact)}", flush=True)
        except ValueError as e:
            print(f"{name}: SKIPPED (mode removed in r3 — re-integrate "
                  f"tools/archive_chunked_kernels.py to re-probe): "
                  f"{str(e)[:100]}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
