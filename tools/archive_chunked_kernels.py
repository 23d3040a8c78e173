"""ARCHIVED: chunked (2D-grid + scratch-carry) split-mode Pallas kernels.

Removed from halo2_regex_tpu/ops/pallas_scan.py in round 3: the current
Mosaic toolchain SIGABRTs on their wide-select + slab dynamic-slice bodies
inside a multi-dim grid with scratch (tools/probe_tpu28/31/32), so they
were interpret-verified only and hardware-dead for two rounds. The
"segmented" 1D-grid kernels (pallas_scan.py) are the shipped long-L path.

This file preserves the kernel bodies verbatim for a future toolchain that
fixes the SIGABRT (re-probe once per round: tools/probe_tpu28.py). They are
closures from the PallasMatcher constructor scope and are NOT importable
standalone -- re-integrate into pallas_scan.py to use.
"""

# flake8: noqa
# fmt: off

CHUNKED_KERNELS = r'''
        # ---------------- chunked split-mode kernels ----------------
        # Stream L in LCC-position chunks over a (batch, chunk) 2D grid;
        # per-kernel carries live in scratch and persist across the
        # sequentially-iterated chunk dimension (BASELINE configs[3]).
        def scan_kernel_chunked(ctab_ref, raw_ref, chars_ref, states_ref,
                                st_scr):
            l = pl.program_id(1)

            @pl.when(l == 0)
            def _():
                for d in range(n_defs):
                    st_scr[d, :] = jnp.full((TB,), firsts[d], jnp.int32)

            def class_of(c, cls0, terms, use_classes):
                if not use_classes:
                    return c
                cls = jnp.full((TB,), cls0, jnp.int32)
                for b_r, delta in terms:
                    cls = cls + delta * (c >= b_r).astype(jnp.int32)
                return cls

            def onehot_cols(cls, kdim, tbl):
                onehot_i = (
                    cls[:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (TB, kdim), 1)
                )
                if table_dtype == "int8":
                    oh = onehot_i.astype(jnp.int8)
                    t8 = (tbl - 128.0).astype(jnp.int8)
                    return (
                        jnp.dot(oh, t8, preferred_element_type=jnp.int32)
                        + 128
                    )
                return jnp.dot(
                    onehot_i.astype(jnp.bfloat16),
                    tbl.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)

            n_slab_c = LCC // SLAB
            for d in range(n_defs):
                use_classes, cls0, terms, ctab = class_info[d]
                width = 2 * S if hi_lo else S
                tbl = (
                    ctab_ref[d][:, 0:width]
                    if use_classes
                    else raw_ref[d][:, 0:width]
                ).astype(jnp.bfloat16)
                kdim = tbl.shape[0]

                def slab_body(t, s, d=d, tbl=tbl, use_classes=use_classes,
                              cls0=cls0, terms=terms, kdim=kdim):
                    base = t * SLAB
                    c_slab = chars_ref[pl.ds(base, SLAB), :]
                    cols = [
                        onehot_cols(
                            class_of(c_slab[j], cls0, terms, use_classes),
                            kdim,
                            tbl,
                        )
                        for j in range(SLAB)
                    ]
                    outs = []
                    for j in range(SLAB):
                        sel = (
                            jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1)
                            == s[:, None]
                        ).astype(jnp.int32)
                        if hi_lo:
                            lo = jnp.sum(cols[j][:, 0:S] * sel, axis=-1)
                            hi = jnp.sum(cols[j][:, S : 2 * S] * sel, axis=-1)
                            s = lo + 256 * hi
                        else:
                            s = jnp.sum(cols[j] * sel, axis=-1)
                        outs.append(s)
                    states_ref[d, pl.ds(base, SLAB), :] = jnp.stack(outs, 0)
                    return s

                st_scr[d, :] = jax.lax.fori_loop(
                    0, n_slab_c, slab_body, st_scr[d, :]
                )

        def tag_kernel_chunked(states_ref, lengths_ref, ids_ref, start_ref,
                               endf_ref, prev_scr):
            l = pl.program_id(1)

            @pl.when(l == 0)
            def _():
                for d in range(n_defs):
                    prev_scr[d, :] = jnp.full((TB,), firsts[d], jnp.int32)

            lengths = lengths_ref[0, :]
            base = l * LCC
            pos = base + jax.lax.broadcasted_iota(jnp.int32, (LCC, TB), 0)
            en = (pos < lengths[None, :]).astype(jnp.int32)
            for d in range(n_defs):
                nxt = states_ref[d]
                prev = jnp.concatenate(
                    [prev_scr[d, :][None, :], nxt[: LCC - 1]], axis=0
                )
                ids = jnp.zeros((LCC, TB), jnp.int32)
                st = jnp.zeros((LCC, TB), jnp.int32)
                ef = jnp.zeros((LCC, TB), jnp.int32)
                for a, b, gid, s_flag, e_flag in pair_info[d]:
                    m = ((prev == a) & (nxt == b)).astype(jnp.int32)
                    ids = ids + gid * m
                    if s_flag:
                        st = st + m
                    if e_flag:
                        ef = ef + m
                ids_ref[d] = ids * en
                start_ref[d] = st * en
                endf_ref[d] = ef * en
                prev_scr[d, :] = nxt[LCC - 1]

        def _log_scan_pair(a, b, n, reverse):
            """Inclusive affine-map composition along axis 0 of [n, TB]
            arrays; returns (A, B) so value[i] = A[i]*entry + B[i]."""
            shift = 1
            while shift < n:
                if not reverse:
                    a_prev = jnp.concatenate(
                        [jnp.ones((shift, TB), jnp.int32), a[: n - shift]], 0
                    )
                    b_prev = jnp.concatenate(
                        [jnp.zeros((shift, TB), jnp.int32), b[: n - shift]], 0
                    )
                else:
                    a_prev = jnp.concatenate(
                        [a[shift:], jnp.ones((shift, TB), jnp.int32)], 0
                    )
                    b_prev = jnp.concatenate(
                        [b[shift:], jnp.zeros((shift, TB), jnp.int32)], 0
                    )
                a, b = a_prev * a, a * b_prev + b
                shift *= 2
            return a, b

        def _sum_defs(ref):
            acc = ref[0]
            for d in range(1, n_defs):
                acc = acc + ref[d]
            return acc

        def fsm_fwd_chunked(ids_ref, start_ref, endf_ref, fwd_ref, carry_scr):
            # carry: [0] last mask value, [1] last ids_sum, [2] last endf_sum
            l = pl.program_id(1)

            @pl.when(l == 0)
            def _():
                carry_scr[0, :] = jnp.zeros((TB,), jnp.int32)
                carry_scr[1, :] = jnp.zeros((TB,), jnp.int32)
                carry_scr[2, :] = jnp.zeros((TB,), jnp.int32)

            ids_sum = _sum_defs(ids_ref)
            st_sum = _sum_defs(start_ref)
            ef_sum = _sum_defs(endf_ref)
            prev_ids = jnp.concatenate(
                [carry_scr[1, :][None, :], ids_sum[: LCC - 1]], 0
            )
            prev_ef = jnp.concatenate(
                [carry_scr[2, :][None, :], ef_sum[: LCC - 1]], 0
            )
            changed = (prev_ids != ids_sum).astype(jnp.int32)
            is_set = ((st_sum > 0) & (changed > 0)).astype(jnp.int32)
            is_reset = (
                (st_sum == 0) & (prev_ef > 0) & (changed > 0)
            ).astype(jnp.int32)
            hold = (1 - is_set) * (1 - is_reset)
            A, Bv = _log_scan_pair(hold, is_set, LCC, reverse=False)
            fwd = A * carry_scr[0, :][None, :] + Bv
            fwd_ref[:] = fwd
            carry_scr[0, :] = fwd[LCC - 1]
            carry_scr[1, :] = ids_sum[LCC - 1]
            carry_scr[2, :] = ef_sum[LCC - 1]

        def fsm_bwd_chunked(ids_ref, start_ref, endf_ref, bwd_ref, carry_scr):
            # reversed chunk order via index maps; carry: [0] entry mask,
            # [1] ids_sum row 0 of the later chunk, [2] st_sum row 0
            l = pl.program_id(1)

            @pl.when(l == 0)
            def _():
                carry_scr[0, :] = jnp.zeros((TB,), jnp.int32)
                carry_scr[1, :] = jnp.zeros((TB,), jnp.int32)
                carry_scr[2, :] = jnp.zeros((TB,), jnp.int32)

            ids_sum = _sum_defs(ids_ref)
            st_sum = _sum_defs(start_ref)
            ef_sum = _sum_defs(endf_ref)
            next_ids = jnp.concatenate(
                [ids_sum[1:], carry_scr[1, :][None, :]], 0
            )
            next_st = jnp.concatenate(
                [st_sum[1:], carry_scr[2, :][None, :]], 0
            )
            changed = (next_ids != ids_sum).astype(jnp.int32)
            set_b = ((ef_sum > 0) & (changed > 0)).astype(jnp.int32)
            reset_b = (
                (ef_sum == 0) & (next_st > 0) & (changed > 0)
            ).astype(jnp.int32)
            hold_b = (1 - set_b) * (1 - reset_b)
            A, Bv = _log_scan_pair(hold_b, set_b, LCC, reverse=True)
            bwd = A * carry_scr[0, :][None, :] + Bv
            bwd_ref[:] = bwd
            carry_scr[0, :] = bwd[0]
            carry_scr[1, :] = ids_sum[0]
            carry_scr[2, :] = st_sum[0]


        def make_scan_chunked(B):
            return pl.pallas_call(
                scan_kernel_chunked,
                grid=(B // TB, n_lc),
                in_specs=[
                    pl.BlockSpec(tables_c.shape, lambda b, l: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(tables_raw.shape, lambda b, l: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((LCC, TB), lambda b, l: (l, b),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (n_defs, LCC, TB), lambda b, l: (0, l, b),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((n_defs, L, B), jnp.int32),
                scratch_shapes=[pltpu.VMEM((n_defs, TB), jnp.int32)],
                interpret=interpret,
                compiler_params=_vmem_params,
            )

        def make_tag_chunked(B):
            return pl.pallas_call(
                tag_kernel_chunked,
                grid=(B // TB, n_lc),
                in_specs=[
                    pl.BlockSpec((n_defs, LCC, TB), lambda b, l: (0, l, b),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TB), lambda b, l: (0, b),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((n_defs, LCC, TB), lambda b, l: (0, l, b),
                                 memory_space=pltpu.VMEM)
                ] * 3,
                out_shape=[jax.ShapeDtypeStruct((n_defs, L, B), jnp.int32)] * 3,
                scratch_shapes=[pltpu.VMEM((n_defs, TB), jnp.int32)],
                interpret=interpret,
                compiler_params=_vmem_params,
            )

        def make_fsm_chunked(B, reverse):
            rev3 = lambda b, l: (0, n_lc - 1 - l, b)
            rev2 = lambda b, l: (n_lc - 1 - l, b)
            fw3 = lambda b, l: (0, l, b)
            fw2 = lambda b, l: (l, b)
            return pl.pallas_call(
                fsm_bwd_chunked if reverse else fsm_fwd_chunked,
                grid=(B // TB, n_lc),
                in_specs=[
                    pl.BlockSpec((n_defs, LCC, TB),
                                 rev3 if reverse else fw3,
                                 memory_space=pltpu.VMEM)
                ] * 3,
                out_specs=pl.BlockSpec(
                    (LCC, TB), rev2 if reverse else fw2,
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((L, B), jnp.int32),
                scratch_shapes=[pltpu.VMEM((3, TB), jnp.int32)],
                interpret=interpret,
                compiler_params=_vmem_params,
            )

'''
