"""Fused Pallas TPU kernels: DFA scan + substring tagging + mask FSMs.

Produces the full witness column set that the reference computes
row-by-row on the host (reference: src/lib.rs:311-773, 804-888). The
default configuration ("split" mode) runs three kernels per batch tile:

  1. **scan** — the only sequential part. Byte classes come from a
     boundary-sum chain (`cls = cls0 + Σ Δ_r·(c ≥ b_r)`); with k classes
     and k² ≤ 256 the kernel steps TWO bytes at a time against a composed
     pair-class table (stride-2), so the in-chain work is one one-hot
     select per byte PAIR; the per-pair column vectors come from MXU
     one-hot matmuls that depend only on the bytes and therefore pipeline
     OFF the critical path (slab-batched). Intermediate states are
     reconstructed off-chain. Models beyond 256 states use lo/hi
     byte-plane tables (bf16 holds integers exactly only to 256).
  2. **tag** — substr ids and start/end flags are pure functions of the
     (prev, next) state pair; real substr defs have few valid pairs, so
     the whole pass is position-parallel elementwise pair enumeration
     (no recurrence, no matmul).
  3. **fsm** — both set/reset/hold mask recurrences as Hillis-Steele
     log-scans over affine boolean maps (whole-array ops).

"monolithic" mode (single fused kernel, 4-way packed tables
[k, 4S] = next|id|start|end per byte step) remains for many-pair models.

Hard-won constraints of this toolchain (tools/probe_tpu*.py, docs/PERF.md):
take_along_axis mis-lowers narrow indices and is ~8 gathers/cycle (use
one-hot selects); no dynamic_slice on values (only refs); no
(a,b)->(a*b,) shape casts; MXU matmuls inside multi-dim grids with
scratch SIGABRT the compiler (hence 1D whole-L grids; the dead 2D
"chunked" kernels are archived in tools/archive_chunked_kernels.py until
a toolchain fixes the SIGABRT); scoped VMEM defaults to 16 MB with a
usable ceiling near 56-60 MB (auto batch-tile sizing); data is time-major
[L, TB] since lane-dimension dynamic indexing is the slow direction.

Outputs are bit-identical to :mod:`halo2_regex_tpu.ops.reference`
(tests/test_pallas_scan.py in interpret mode; tools/probe_tpu* compiled
on hardware).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.compiled import CompiledRegexModel
from ..witness.result import RegexResult


def build_packed_tables(model: CompiledRegexModel) -> np.ndarray:
    """Per-def [256, 4*S] packed tables: next | substr_id | is_start | is_end.

    ``is_start``/``is_end`` are per-transition flags as functions of
    (char, cur): id = substr_id_table[cur, next]; is_start = id!=0 and
    cur in start_states(id); is_end = id!=0 and next in end_states(id)
    (the oracle's is_end at index i+1, i.e. unshifted).
    """
    S = model.s_pad
    assert S <= 256, f"s_pad {S} > 256 breaks bf16 exactness"
    assert model.total_substrs <= 256, "substr ids > 256 break bf16 exactness"
    n_defs = model.n_defs
    out = np.zeros((n_defs, 256, 4 * S), np.float32)
    for d in range(n_defs):
        T = model.transition[d]  # [256, S]
        sub = model.substr_id_table[d]  # [S, S]
        cur = np.arange(S)[None, :].repeat(256, 0)
        nxt = T
        ids = sub[cur, nxt]
        out[d, :, 0 * S : 1 * S] = nxt
        out[d, :, 1 * S : 2 * S] = ids
        out[d, :, 2 * S : 3 * S] = model.is_start_table[ids, cur]
        out[d, :, 3 * S : 4 * S] = model.is_end_table[ids, nxt]
    return out


def byte_classes(packed_def: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Collapse the 256 byte rows of one def's packed table into
    equivalence classes. Returns (class_of [256] int32, class_table
    [k, 4S] f32)."""
    uniq, inverse = np.unique(packed_def, axis=0, return_inverse=True)
    return inverse.astype(np.int32), uniq.astype(np.float32)


def class_boundaries(class_of: np.ndarray) -> Tuple[int, List[Tuple[int, int]]]:
    """Represent the byte->class map as cls(c) = cls0 + Σ Δ_r·(c >= b_r).
    Returns (cls0, [(b_r, Δ_r)...]) with one term per point where the map
    changes as c increases."""
    cls0 = int(class_of[0])
    terms = []
    for c in range(1, 256):
        d = int(class_of[c]) - int(class_of[c - 1])
        if d != 0:
            terms.append((c, d))
    return cls0, terms


def _round_up(x, m):
    return -(-x // m) * m


class PallasMatcher:
    """Fused-kernel matcher; drop-in for BatchMatcher (bit-identical
    RegexResult output).

    Construction is decomposed into named phases (mirroring
    BitplaneMatcher): ``_build_tables`` (byte-class compression + packed
    tables), ``_build_joint`` (multi-def lane fusion), ``_resolve_mode``
    (split vs monolithic), ``_size_tiles`` (VMEM-budget batch tiling,
    segmented demotion, stride-2 pair tables, slab sizing) and
    ``_upload_tables``.  Kernel bodies are named methods reading layout
    state from attributes.

    Args:
      batch_tile: strings per kernel instance (lane-tiling unit).
      chunk: sequence positions per grid step (VMEM block length).
      max_boundary_terms: if a def's byte->class map needs more boundary
        terms than this, fall back to a 256-wide one-hot for that def.
    """

    def __init__(
        self,
        model: CompiledRegexModel,
        batch_tile: int = 0,  # 0 = auto-size to the VMEM budget
        chunk: int = 256,
        interpret: bool = False,
        max_boundary_terms: int = 96,
        extract: str = "select",  # "select" | "take_along"
        grid_mode: str = "batch",  # "batch" (1D, whole L) | "segmented"
        slab: int = 8,  # positions per batched matmul + static unroll
        compute: str = "mxu",  # "mxu" (onehot matmul) | "vpu" (masked accumulate)
        mode: str = "auto",  # "auto" | "split" | "monolithic"
        max_pairs: int = 160,  # split mode needs few valid substr pairs
        table_dtype: str = "bf16",  # "bf16" | "int8" (2x MXU rate; values
        #   stored offset by -128 so 0..255 fits int8, re-added after the
        #   one-hot matmul since each row has exactly one hit)
    ):
        """``grid_mode="batch"`` keeps the whole sequence in one VMEM block
        per batch tile with a 1D grid — the form this toolchain compiles
        (the current Mosaic build SIGABRTs on MXU matmuls inside multi-dim
        grids with scratch, probe_tpu7). ``"segmented"`` streams L in
        1D-grid segments with carries threaded through kernel inputs
        (auto-selected when whole-L blocks exceed the VMEM budget)."""
        if grid_mode == "chunked":
            raise ValueError(
                "grid_mode='chunked' was removed (Mosaic SIGABRT, "
                "tools/probe_tpu28); use 'segmented'. To re-probe on a new "
                "toolchain, re-integrate the archived kernel source from "
                "tools/archive_chunked_kernels.py, then run probe_tpu28"
            )
        self.model = model
        self.interpret = interpret
        self.extract = extract
        self.compute = compute
        self.table_dtype = table_dtype
        self.grid_mode = grid_mode
        L = self.L = model.max_chars_size
        self.S = model.s_pad
        self.n_defs = model.n_defs
        self.firsts = [
            int(model.first_states[d]) for d in range(self.n_defs)
        ]
        if grid_mode == "batch":
            chunk = L
        LC = min(chunk, L)
        while L % LC != 0:
            LC //= 2
        self.chunk = LC
        self._budget = int(float(os.environ.get("H2R_VMEM_BUDGET", 56e6)))

        mode = self._build_tables(mode, max_boundary_terms)
        self._build_joint(max_boundary_terms)
        self._resolve_mode(mode, max_pairs)
        self._size_tiles(batch_tile, slab)
        self._upload_tables()
        self.core = self._core  # unjitted — usable inside shard_map
        self._run = jax.jit(self._core)

    # ------------------------------------------------- construction phases

    def _build_tables(self, mode: str, max_boundary_terms: int) -> str:
        """Byte-class compression per def. Sets ``hi_lo``, ``class_info``
        (use_classes, cls0, terms, table), the padded class-table stack
        ``_ctabs`` and the raw fallback stack ``_packed``; >256-state
        models force split mode with lo|hi byte-plane tables."""
        model = self.model
        S = self.S
        n_defs = self.n_defs
        # Beyond 256 states bf16 cannot hold state ids exactly; the split
        # scan then uses TWO byte planes (lo | hi) of the next-state table
        # and tagging stays integer pair-enumeration. Only split mode
        # supports this (the monolithic packed tables stay <=256 states).
        hi_lo = S > 256
        self.hi_lo = hi_lo
        if hi_lo:
            assert model.total_substrs <= 256, "substr ids > 256 unsupported"
            if mode == "monolithic":
                raise ValueError(">256-state models need mode='split'")
            mode = "split"
            class_info = []
            k_max = 1
            for d in range(n_defs):
                class_of, ctab_next = byte_classes(
                    model.transition[d].astype(np.float32)
                )
                cls0, terms = class_boundaries(class_of)
                use_classes = len(terms) <= max_boundary_terms
                # lo | hi planes side by side: [k, 2S]
                tab = np.concatenate(
                    [
                        ctab_next.astype(np.int64) & 0xFF,
                        ctab_next.astype(np.int64) >> 8,
                    ],
                    axis=1,
                ).astype(np.float32)
                class_info.append((use_classes, cls0, terms, tab))
                if use_classes:
                    k_max = max(k_max, tab.shape[0])
            k_pad = _round_up(max(k_max, 8), 8)
            ctabs = np.zeros((n_defs, k_pad, 2 * S), np.float32)
            raw_needed = any(not ci[0] for ci in class_info)
            for d, (use_classes, _, _, tab) in enumerate(class_info):
                if use_classes:
                    ctabs[d, : tab.shape[0]] = tab
            if raw_needed:
                packed = np.zeros((n_defs, 256, 2 * S), np.float32)
                for d in range(n_defs):
                    t = model.transition[d].astype(np.int64)
                    packed[d, :, 0:S] = t & 0xFF
                    packed[d, :, S : 2 * S] = t >> 8
            else:
                packed = np.zeros((n_defs, 1, 2 * S), np.float32)
        else:
            packed = build_packed_tables(model)
            class_info = []
            k_max = 1
            for d in range(n_defs):
                class_of, ctab = byte_classes(packed[d])
                cls0, terms = class_boundaries(class_of)
                use_classes = len(terms) <= max_boundary_terms
                class_info.append((use_classes, cls0, terms, ctab))
                if use_classes:
                    k_max = max(k_max, ctab.shape[0])
            k_pad = _round_up(max(k_max, 8), 8)
            # Per-def class tables padded to a common k; defs that fall back
            # to raw bytes use the full [256, 4S] table.
            ctabs = np.zeros((n_defs, k_pad, 4 * S), np.float32)
            raw_needed = any(not ci[0] for ci in class_info)
            for d, (use_classes, _, _, ctab) in enumerate(class_info):
                if use_classes:
                    ctabs[d, : ctab.shape[0]] = ctab
        self.class_info = class_info
        self._ctabs = ctabs
        self._packed = packed
        self._raw_needed = raw_needed
        return mode

    def _build_joint(self, max_boundary_terms: int) -> None:
        """Multi-def lane packing: when every def class-compresses and all
        defs' packed tables fit the lane budget side by side, fuse them
        into ONE matmul per byte against a joint-class table. Joint
        classes = unique rows of the def-concatenated packed tables."""
        n_defs = self.n_defs
        S = self.S
        self.fuse_defs = (
            n_defs > 1
            and not self._raw_needed
            and not self.hi_lo
            and n_defs * 4 * S <= 512
        )
        joint_tab = None
        self._joint_cls0 = 0
        self._joint_terms: List[Tuple[int, int]] = []
        if self.fuse_defs:
            concat = self._packed.transpose(1, 0, 2).reshape(
                256, n_defs * 4 * S
            )
            joint_class_of, joint_tab = byte_classes(concat)
            self._joint_cls0, self._joint_terms = class_boundaries(
                joint_class_of
            )
            if len(self._joint_terms) > max_boundary_terms:
                self.fuse_defs = False
                joint_tab = None
        if joint_tab is not None:
            kj_pad = _round_up(max(joint_tab.shape[0], 8), 8)
            jt = np.zeros((kj_pad, n_defs * 4 * S), np.float32)
            jt[: joint_tab.shape[0]] = joint_tab
            joint_tab = jt
        self._joint_tab = joint_tab
        self.joint_k = 0 if joint_tab is None else joint_tab.shape[0]

    def _resolve_mode(self, mode: str, max_pairs: int) -> None:
        """Split-mode pair enumeration: ids/start/endf are functions of the
        (prev, next) state pair alone; when the valid-pair sets are small
        (typical email substrs have ~15-60 transitions) the tagging pass
        becomes a handful of fully position-parallel elementwise ops and
        the sequential scan kernel shrinks to ONE pick per byte
        (920 MB/s scan-only vs 217 MB/s monolithic, probe_tpu18)."""
        model = self.model
        pair_info: List[List[Tuple[int, int, int, bool, bool]]] = []
        split_ok = True
        for d in range(self.n_defs):
            nz = np.argwhere(model.substr_id_table[d] > 0)
            plist = []
            for a, b in nz:
                gid = int(model.substr_id_table[d][a, b])
                plist.append(
                    (
                        int(a),
                        int(b),
                        gid,
                        bool(model.is_start_table[gid, a]),
                        bool(model.is_end_table[gid, b]),
                    )
                )
            pair_info.append(plist)
            if len(plist) > max_pairs:
                split_ok = False
        if mode == "auto":
            mode = "split" if split_ok else "monolithic"
        elif mode == "split" and not split_ok:
            raise ValueError(
                f"split mode needs <= {max_pairs} valid pairs per def"
            )
        self.mode = mode
        self.pair_info = pair_info

    def _size_tiles(self, batch_tile: int, slab: int) -> None:
        """Batch-tile auto-sizing against the scoped-VMEM ceiling,
        segmented demotion for long L, stride-2 pair-table composition
        and slab sizing (order preserved from the original inline code:
        stride is chosen before SLAB and demoted after)."""
        L = self.L
        S = self.S
        n_defs = self.n_defs
        mode = self.mode
        if not batch_tile:
            # Auto-size the batch tile to the usable scoped-VMEM ceiling
            # (~56 MB on this part: probe_tpu16 — 3-def TB=512 at ~63 MB
            # fails, 1-def TB=1024 at ~57 MB works). Per-TB residency is
            # the largest kernel's double-buffered blocks:
            #   monolithic flat kernel: chars+lengths+6 outputs
            #     ≈ 2·L·4·(4·n_defs + 3) bytes;
            #   split mode: the widest of scan (n_defs+1), tag (4·n_defs)
            #     and fsm (3·n_defs + 2) kernels.
            if mode == "split":
                blocks = max(n_defs + 1, 4 * n_defs, 3 * n_defs + 2)
            else:
                blocks = 4 * n_defs + 3
            per_tb = 2 * L * 4 * blocks
            batch_tile = max(
                128, min(1024, (self._budget // per_tb) // 128 * 128)
            )
        self.batch_tile = batch_tile
        TB = batch_tile

        # Long sequences cannot hold whole-L blocks in VMEM (BASELINE
        # configs[3]: 64 KB inputs). Split mode then streams L in segments
        # ("segmented": 1D grids, carries threaded through kernel inputs at
        # the XLA level — the hardware-safe long-L form). The former
        # "chunked" (2D grid + scratch) kernels SIGABRT the current Mosaic
        # with wide-select bodies (tools/probe_tpu28/31/32) and were
        # quarantined to tools/archive_chunked_kernels.py in round 3.
        split_blocks = max(n_defs + 1, 4 * n_defs, 3 * n_defs + 2)
        if (
            mode == "split"
            and self.grid_mode == "batch"
            and 2 * L * 4 * split_blocks * TB > self._budget
        ):
            self.grid_mode = "segmented"

        # Stride-2 scanning: compose byte PAIRS at the class level. With k
        # classes per def and k^2 <= 256, the pair class id is plain
        # arithmetic (cls_a * k + cls_b) and the sequential chain halves;
        # the intermediate (odd) states are reconstructed off-chain.
        stride = 2
        pair_tabs = None
        if self.hi_lo or (mode == "split" and self.grid_mode == "segmented"):
            stride = 1
        elif mode == "split":
            for d in range(n_defs):
                use_classes, _, _, ctab = self.class_info[d]
                kd = ctab.shape[0]
                if not use_classes or kd * kd > 256:
                    stride = 1
                    break
            if L % 2 != 0:
                stride = 1
        else:
            stride = 1
        if stride == 2:
            kk_pad = _round_up(
                max(max(ci[3].shape[0] ** 2 for ci in self.class_info), 8), 8
            )
            pair_tabs = np.zeros((n_defs, kk_pad, S), np.float32)
            for d in range(n_defs):
                ctab_next = self.class_info[d][3][:, 0:S].astype(
                    np.int64
                )  # [k, S]
                kd = ctab_next.shape[0]
                for a in range(kd):
                    for b in range(kd):
                        pair_tabs[d, a * kd + b] = ctab_next[b][ctab_next[a]]
        self._pair_tabs = pair_tabs

        SLAB = min(slab, L)
        while L % SLAB != 0:
            SLAB //= 2
        self.n_slab = L // SLAB
        self.slab = SLAB
        # stride-2 covers 2*SLAB positions per slab iteration; a non-dividing
        # tail would go unscanned (caught by tests/test_pallas_scan.py
        # odd-length cases).
        if stride == 2 and L % (2 * SLAB) != 0:
            stride = 1
        self.scan_stride = stride

        # Segmented sizing. The segmented kernels need their own slab
        # size: the flat/split kernels use self.slab, so shrinking it here
        # would silently leave them covering n_slab*SLAB < L positions
        # (ADVICE r2: reproduced with H2R_SEGMENT=96).
        LS = min(int(os.environ.get("H2R_SEGMENT", 4096)), L)
        while L % LS != 0:
            LS //= 2
        SLAB_SEG = SLAB
        while LS % SLAB_SEG != 0:
            SLAB_SEG //= 2
        assert L == self.n_slab * SLAB, "flat-kernel slab must tile L exactly"
        self.segment = LS
        self.slab_seg = SLAB_SEG
        self.n_seg = L // LS

    def _upload_tables(self) -> None:
        """Device-resident table stacks + model scalar arrays."""
        model = self.model
        self._tables_c = jnp.asarray(self._ctabs)
        self._tables_raw = jnp.asarray(
            self._packed if self._raw_needed else self._packed[:, :1, :]
        )
        self._tables_joint = jnp.asarray(
            self._joint_tab
            if self._joint_tab is not None
            else np.zeros((8, 8), np.float32)
        )
        self._tables_pair = jnp.asarray(
            self._pair_tabs
            if self._pair_tabs is not None
            else np.zeros((self.n_defs, 8, self.S), np.float32)
        )
        self._model_arrays = dict(
            accepted_states=jnp.asarray(model.accepted_states),
            accept_mask=jnp.asarray(model.accept_mask),
            dummy_states=jnp.asarray(model.dummy_states),
            dead_states=jnp.asarray(model.dead_states),
            first_states=jnp.asarray(model.first_states),
        )

    @property
    def _vmem_params(self):
        return (
            None
            if self.interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=int(
                    os.environ.get("H2R_VMEM_LIMIT", 100 * 1024 * 1024)
                )
            )
        )

    # -------------------------------------------------- in-kernel helpers

    def _class_of(self, c, cls0, terms, use_classes):
        """Byte->class boundary-sum chain; shape-polymorphic ([TB] in the
        split kernels, [SLAB, TB] in the flat kernel)."""
        if not use_classes:
            return c
        cls = jnp.full(c.shape, cls0, jnp.int32)
        for b_r, delta in terms:
            cls = cls + delta * (c >= b_r).astype(jnp.int32)
        return cls

    def _onehot_cols(self, cls, kdim, tbl):
        """One-hot [TB, k] @ [k, W] table row select on the MXU."""
        TB = self.batch_tile
        onehot_i = (
            cls[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (TB, kdim), 1)
        )
        if self.table_dtype == "int8":
            oh = onehot_i.astype(jnp.int8)
            t8 = (tbl - 128.0).astype(jnp.int8)
            return (
                jnp.dot(oh, t8, preferred_element_type=jnp.int32) + 128
            )
        return jnp.dot(
            onehot_i.astype(jnp.bfloat16),
            tbl.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    # --------------------------------------------- monolithic flat kernel

    def _flat_kernel(
        self,
        ctab_ref,
        raw_ref,
        jtab_ref,  # [kj_pad, n_defs*4S] f32 (dummy when not fused)
        chars_ref,  # [L, TB]
        lengths_ref,  # [1, TB]
        states_ref,  # [n_defs, L, TB]
        ids_ref,
        start_ref,
        endf_ref,
        fwd_ref,  # [L, TB]
        bwd_ref,  # [L, TB]
    ):
        """1D-grid slab kernel. Per SLAB positions: ONE batched MXU
        matmul computes the packed columns for every (position, string)
        — the matmul depends only on the byte, so it sits OFF the
        sequential chain; the recurrence itself is SLAB statically
        unrolled steps of pure-VPU one-hot selects. The forward mask
        FSM rides the same unroll; the backward FSM is a second
        reversed slab pass over the emitted columns."""
        L = self.L
        S = self.S
        TB = self.batch_tile
        SLAB = self.slab
        n_defs = self.n_defs
        lengths = lengths_ref[0, :]

        def cols_slab(t_bf, kdim, cls):
            # One independent [TB, k] @ [k, W] matmul per slab position.
            # They carry no data dependency between them (only the byte
            # matters), so the MXU pipelines them; a single flattened
            # [SLAB*TB, k] matmul would be marginally better but Mosaic
            # cannot shape-cast (SLAB, TB) -> (SLAB*TB,) (probe_tpu13).
            # compute="vpu" instead accumulates k masked table rows on
            # the VPU — no MXU latency in the pipeline, better for tiny k.
            out = []
            if self.compute == "vpu":
                t_i32 = t_bf.astype(jnp.int32)
                for j in range(SLAB):
                    acc = jnp.zeros((TB, t_i32.shape[1]), jnp.int32)
                    for kk in range(kdim):
                        mask = (cls[j] == kk).astype(jnp.int32)[:, None]
                        acc = acc + mask * t_i32[kk][None, :]
                    out.append(acc)
                return out
            for j in range(SLAB):
                onehot = (
                    cls[j][:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (TB, kdim), 1)
                ).astype(jnp.bfloat16)
                out.append(
                    jnp.dot(
                        onehot, t_bf, preferred_element_type=jnp.float32
                    ).astype(jnp.int32)
                )
            return out  # list of SLAB x [TB, W]

        def step_pick(cols_row, s, off):
            # cols_row [TB, W]; returns (nxt, id, start, endf)
            if self.extract == "select":
                sel = (
                    jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1)
                    == s[:, None]
                ).astype(jnp.int32)

                def pick(kk):
                    lo = off + kk * S
                    return jnp.sum(cols_row[:, lo : lo + S] * sel, axis=-1)

            else:
                idx = jnp.broadcast_to(s[:, None], (TB, S))

                def pick(kk):
                    lo = off + kk * S
                    return jnp.take_along_axis(
                        cols_row[:, lo : lo + S], idx, axis=-1
                    )[:, 0]

            return pick(0), pick(1), pick(2), pick(3)

        zero = jnp.zeros((TB,), jnp.int32)

        def slab_body(t, carry):
            ss = carry[:n_defs]  # per-def states [TB]
            last, prev_ids, prev_endf = carry[n_defs:]
            base = t * SLAB
            c_slab = chars_ref[pl.ds(base, SLAB), :]  # [SLAB, TB]
            pos = base + jax.lax.broadcasted_iota(jnp.int32, (SLAB, TB), 0)
            en_slab = (pos < lengths[None, :]).astype(jnp.int32)

            if self.fuse_defs:
                cls = self._class_of(
                    c_slab, self._joint_cls0, self._joint_terms, True
                )
                cols = cols_slab(
                    jtab_ref[:].astype(jnp.bfloat16), self.joint_k, cls
                )  # [SLAB, TB, n_defs*4S]
                cols_per_def = [cols] * n_defs
                offs = [d * 4 * S for d in range(n_defs)]
            else:
                cols_per_def = []
                offs = []
                for d in range(n_defs):
                    use_classes, cls0, terms, _ = self.class_info[d]
                    t_bf = (
                        ctab_ref[d] if use_classes else raw_ref[d]
                    ).astype(jnp.bfloat16)
                    cls = self._class_of(c_slab, cls0, terms, use_classes)
                    cols_per_def.append(cols_slab(t_bf, t_bf.shape[0], cls))
                    offs.append(0)

            new_ss = list(ss)
            ids_js = []  # per j: summed ids
            start_js = []
            endf_js = []
            outs = [
                {"nxt": [], "ids": [], "start": [], "endf": []}
                for _ in range(n_defs)
            ]
            for j in range(SLAB):
                ids_sum_j = zero
                start_sum_j = zero
                endf_sum_j = zero
                for d in range(n_defs):
                    nxt, idv, stv, env = step_pick(
                        cols_per_def[d][j], new_ss[d], offs[d]
                    )
                    en = en_slab[j]
                    idv = idv * en
                    stv = stv * en
                    env = env * en
                    outs[d]["nxt"].append(nxt)
                    outs[d]["ids"].append(idv)
                    outs[d]["start"].append(stv)
                    outs[d]["endf"].append(env)
                    new_ss[d] = nxt
                    ids_sum_j = ids_sum_j + idv
                    start_sum_j = start_sum_j + stv
                    endf_sum_j = endf_sum_j + env
                ids_js.append(ids_sum_j)
                start_js.append(start_sum_j)
                endf_js.append(endf_sum_j)

            for d in range(n_defs):
                states_ref[d, pl.ds(base, SLAB), :] = jnp.stack(outs[d]["nxt"], 0)
                ids_ref[d, pl.ds(base, SLAB), :] = jnp.stack(outs[d]["ids"], 0)
                start_ref[d, pl.ds(base, SLAB), :] = jnp.stack(outs[d]["start"], 0)
                endf_ref[d, pl.ds(base, SLAB), :] = jnp.stack(outs[d]["endf"], 0)

            # forward mask FSM on the same unroll (lib.rs:598-645)
            fwd_js = []
            for j in range(SLAB):
                cur_ids = ids_js[j]
                changed = (prev_ids != cur_ids).astype(jnp.int32)
                st = start_js[j]
                is_set = (st > 0) & (changed > 0)
                is_reset = (st == 0) & (prev_endf > 0) & (changed > 0)
                last = jnp.where(is_set, 1, jnp.where(is_reset, 0, last))
                fwd_js.append(last)
                prev_ids = cur_ids
                prev_endf = endf_js[j]
            fwd_ref[pl.ds(base, SLAB), :] = jnp.stack(fwd_js, 0)

            return tuple(new_ss) + (last, prev_ids, prev_endf)

        init = tuple(
            jnp.full((TB,), f, jnp.int32) for f in self.firsts
        ) + (zero, zero, zero)
        jax.lax.fori_loop(0, self.n_slab, slab_body, init)

        # backward mask FSM: reversed slab pass over the emitted columns
        # (lib.rs:663-714)
        def bwd_slab(t, carry):
            last, next_ids, next_start = carry
            base = (self.n_slab - 1 - t) * SLAB
            ids_slab = ids_ref[0, pl.ds(base, SLAB), :]
            start_slab = start_ref[0, pl.ds(base, SLAB), :]
            endf_slab = endf_ref[0, pl.ds(base, SLAB), :]
            for d in range(1, n_defs):
                ids_slab = ids_slab + ids_ref[d, pl.ds(base, SLAB), :]
                start_slab = start_slab + start_ref[d, pl.ds(base, SLAB), :]
                endf_slab = endf_slab + endf_ref[d, pl.ds(base, SLAB), :]
            bwd_js = [None] * SLAB
            for j in range(SLAB - 1, -1, -1):
                cur_ids = ids_slab[j]
                ef = endf_slab[j]  # is_end_sum[j+1]
                changed = (next_ids != cur_ids).astype(jnp.int32)
                is_set = (ef > 0) & (changed > 0)
                is_reset = (ef == 0) & (next_start > 0) & (changed > 0)
                last = jnp.where(is_set, 1, jnp.where(is_reset, 0, last))
                bwd_js[j] = last
                next_ids = cur_ids
                next_start = start_slab[j]
            bwd_ref[pl.ds(base, SLAB), :] = jnp.stack(bwd_js, 0)
            return last, next_ids, next_start

        jax.lax.fori_loop(0, self.n_slab, bwd_slab, (zero, zero, zero))

    def _make_flat(self, B):
        L = self.L
        TB = self.batch_tile
        n_defs = self.n_defs
        n_b = B // TB
        return pl.pallas_call(
            self._flat_kernel,
            grid=(n_b,),
            in_specs=[
                pl.BlockSpec(
                    self._tables_c.shape, lambda b: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    self._tables_raw.shape, lambda b: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    self._tables_joint.shape, lambda b: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((L, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(
                    (n_defs, L, TB), lambda b: (0, 0, b),
                    memory_space=pltpu.VMEM,
                )
            ] * 4
            + [
                pl.BlockSpec((L, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_defs, L, B), jnp.int32),
                jax.ShapeDtypeStruct((n_defs, L, B), jnp.int32),
                jax.ShapeDtypeStruct((n_defs, L, B), jnp.int32),
                jax.ShapeDtypeStruct((n_defs, L, B), jnp.int32),
                jax.ShapeDtypeStruct((L, B), jnp.int32),
                jax.ShapeDtypeStruct((L, B), jnp.int32),
            ],
            interpret=self.interpret,
            compiler_params=self._vmem_params,
        )

    # ------------------------------------------------- split-mode kernels

    def _scan_kernel(self, ctab_ref, raw_ref, pair_ref, chars_ref, states_ref):
        """Sequential scan only. stride==1: one in-chain pick per byte.
        stride==2: one in-chain pick per byte PAIR against the composed
        pair-class table; the intermediate states come from off-chain
        picks against the single-byte table after the chain resolves."""
        L = self.L
        S = self.S
        TB = self.batch_tile
        SLAB = self.slab
        stride = self.scan_stride

        def pick(cols, s):
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1)
                == s[:, None]
            ).astype(jnp.int32)
            return jnp.sum(cols * sel, axis=-1)

        for d in range(self.n_defs):
            use_classes, cls0, terms, ctab = self.class_info[d]
            width = 2 * S if self.hi_lo else S
            tbl = (
                ctab_ref[d][:, 0:width]
                if use_classes
                else raw_ref[d][:, 0:width]
            ).astype(jnp.bfloat16)
            kdim = tbl.shape[0]

            if stride == 2:
                kd = ctab.shape[0]
                tbl2 = pair_ref[d].astype(jnp.bfloat16)
                kk = tbl2.shape[0]
                n_slab2 = L // (2 * SLAB)

                def slab_body2(t, s, d=d, tbl=tbl, tbl2=tbl2, kd=kd,
                               kk=kk, cls0=cls0, terms=terms,
                               use_classes=use_classes, kdim=kdim):
                    base = t * 2 * SLAB
                    c_slab = chars_ref[pl.ds(base, 2 * SLAB), :]
                    clss = [
                        self._class_of(c_slab[j], cls0, terms, use_classes)
                        for j in range(2 * SLAB)
                    ]
                    cols1 = [
                        self._onehot_cols(clss[2 * j], kdim, tbl)
                        for j in range(SLAB)
                    ]
                    cols2 = [
                        self._onehot_cols(
                            clss[2 * j] * kd + clss[2 * j + 1], kk, tbl2
                        )
                        for j in range(SLAB)
                    ]
                    befores = []
                    ends = []
                    for j in range(SLAB):
                        befores.append(s)
                        s = pick(cols2[j], s)
                        ends.append(s)
                    rows = []
                    for j in range(SLAB):
                        rows.append(pick(cols1[j], befores[j]))  # off-chain
                        rows.append(ends[j])
                    states_ref[d, pl.ds(base, 2 * SLAB), :] = jnp.stack(
                        rows, 0
                    )
                    return s

                jax.lax.fori_loop(
                    0, n_slab2, slab_body2,
                    jnp.full((TB,), self.firsts[d], jnp.int32),
                )
                continue

            def slab_body(t, s, d=d, tbl=tbl, use_classes=use_classes,
                          cls0=cls0, terms=terms, kdim=kdim):
                base = t * SLAB
                c_slab = chars_ref[pl.ds(base, SLAB), :]
                cols = [
                    self._onehot_cols(
                        self._class_of(c_slab[j], cls0, terms, use_classes),
                        kdim,
                        tbl,
                    )
                    for j in range(SLAB)
                ]
                outs = []
                for j in range(SLAB):
                    if self.hi_lo:
                        # state ids split across lo | hi byte planes
                        sel = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (TB, S), 1
                            )
                            == s[:, None]
                        ).astype(jnp.int32)
                        lo = jnp.sum(cols[j][:, 0:S] * sel, axis=-1)
                        hi = jnp.sum(cols[j][:, S : 2 * S] * sel, axis=-1)
                        s = lo + 256 * hi
                    else:
                        s = pick(cols[j], s)
                    outs.append(s)
                states_ref[d, pl.ds(base, SLAB), :] = jnp.stack(outs, 0)
                return s

            jax.lax.fori_loop(
                0, self.n_slab, slab_body,
                jnp.full((TB,), self.firsts[d], jnp.int32),
            )

    def _tag_kernel(self, states_ref, lengths_ref, ids_ref, start_ref,
                    endf_ref):
        """Position-parallel tagging: whole-[L, TB] elementwise pair
        enumeration — no recurrence, no matmul."""
        L = self.L
        TB = self.batch_tile
        lengths = lengths_ref[0, :]
        pos = jax.lax.broadcasted_iota(jnp.int32, (L, TB), 0)
        en = (pos < lengths[None, :]).astype(jnp.int32)
        for d in range(self.n_defs):
            nxt = states_ref[d]
            prev = jnp.concatenate(
                [
                    jnp.full((1, TB), self.firsts[d], jnp.int32),
                    nxt[: L - 1],
                ],
                axis=0,
            )
            ids = jnp.zeros((L, TB), jnp.int32)
            st = jnp.zeros((L, TB), jnp.int32)
            ef = jnp.zeros((L, TB), jnp.int32)
            for a, b, gid, s_flag, e_flag in self.pair_info[d]:
                m = ((prev == a) & (nxt == b)).astype(jnp.int32)
                ids = ids + gid * m
                if s_flag:
                    st = st + m
                if e_flag:
                    ef = ef + m
            ids_ref[d] = ids * en
            start_ref[d] = st * en
            endf_ref[d] = ef * en

    def _fsm_kernel(self, ids_ref, start_ref, endf_ref, fwd_ref, bwd_ref):
        """Both mask FSMs via a Hillis-Steele log-scan over affine
        boolean maps — fully position-parallel whole-array ops.

        Each position's set/reset/hold step is x' = a*x + b with
        (a, b) in {(0,1) set, (0,0) reset, (1,0) hold}; maps compose as
        (a1,b1)-then-(a2,b2) = (a1*a2, a2*b1 + b2), so log2(L) levels
        of compose-with-shifted-self replace the sequential carry
        (lib.rs:598-714 semantics preserved exactly)."""
        L = self.L
        TB = self.batch_tile
        ids_sum = ids_ref[0]
        st_sum = start_ref[0]
        ef_sum = endf_ref[0]
        for d in range(1, self.n_defs):
            ids_sum = ids_sum + ids_ref[d]
            st_sum = st_sum + start_ref[d]
            ef_sum = ef_sum + endf_ref[d]

        zero_row = jnp.zeros((1, TB), jnp.int32)

        def log_scan(a, b, reverse):
            # inclusive scan of map composition along axis 0
            shift = 1
            while shift < L:
                if not reverse:
                    # earlier neighbor: index i - shift (identity pad at top)
                    a_prev = jnp.concatenate(
                        [jnp.ones((shift, TB), jnp.int32), a[: L - shift]], 0
                    )
                    b_prev = jnp.concatenate(
                        [jnp.zeros((shift, TB), jnp.int32), b[: L - shift]], 0
                    )
                else:
                    a_prev = jnp.concatenate(
                        [a[shift:], jnp.ones((shift, TB), jnp.int32)], 0
                    )
                    b_prev = jnp.concatenate(
                        [b[shift:], jnp.zeros((shift, TB), jnp.int32)], 0
                    )
                # compose prev-then-cur: (ap,bp) then (a,b)
                a, b = a_prev * a, a * b_prev + b
                shift *= 2
            return b  # applied to initial value 0

        # forward FSM (lib.rs:598-645)
        prev_ids = jnp.concatenate([zero_row, ids_sum[: L - 1]], 0)
        prev_ef = jnp.concatenate([zero_row, ef_sum[: L - 1]], 0)
        changed = (prev_ids != ids_sum).astype(jnp.int32)
        is_set = ((st_sum > 0) & (changed > 0)).astype(jnp.int32)
        is_reset = ((st_sum == 0) & (prev_ef > 0) & (changed > 0)).astype(
            jnp.int32
        )
        hold = (1 - is_set) * (1 - is_reset)
        fwd_ref[:] = log_scan(hold, is_set, reverse=False)

        # backward FSM (lib.rs:663-714)
        next_ids = jnp.concatenate([ids_sum[1:], zero_row], 0)
        next_st = jnp.concatenate([st_sum[1:], zero_row], 0)
        changed_b = (next_ids != ids_sum).astype(jnp.int32)
        set_b = ((ef_sum > 0) & (changed_b > 0)).astype(jnp.int32)
        reset_b = (
            (ef_sum == 0) & (next_st > 0) & (changed_b > 0)
        ).astype(jnp.int32)
        hold_b = (1 - set_b) * (1 - reset_b)
        bwd_ref[:] = log_scan(hold_b, set_b, reverse=True)

    def _make_scan(self, B):
        L = self.L
        TB = self.batch_tile
        return pl.pallas_call(
            self._scan_kernel,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec(self._tables_c.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(self._tables_raw.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(self._tables_pair.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (self.n_defs, L, TB), lambda b: (0, 0, b),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((self.n_defs, L, B), jnp.int32),
            interpret=self.interpret,
            compiler_params=self._vmem_params,
        )

    def _make_tag(self, B):
        L = self.L
        TB = self.batch_tile
        n_defs = self.n_defs
        return pl.pallas_call(
            self._tag_kernel,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((n_defs, L, TB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_defs, L, TB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_shape=[jax.ShapeDtypeStruct((n_defs, L, B), jnp.int32)] * 3,
            interpret=self.interpret,
            compiler_params=self._vmem_params,
        )

    def _make_fsm(self, B):
        L = self.L
        TB = self.batch_tile
        return pl.pallas_call(
            self._fsm_kernel,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((self.n_defs, L, TB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_specs=[
                pl.BlockSpec((L, TB), lambda b: (0, b), memory_space=pltpu.VMEM)
            ] * 2,
            out_shape=[jax.ShapeDtypeStruct((L, B), jnp.int32)] * 2,
            interpret=self.interpret,
            compiler_params=self._vmem_params,
        )

    # -------------------------------------- segmented split-mode kernels
    # Long inputs with carries threaded through kernel INPUTS/OUTPUTS
    # at the XLA level: the current Mosaic SIGABRTs on the chunked
    # kernels' 2D-grid+scratch form but compiles the identical body on
    # a 1D grid (tools/probe_tpu32.py matrix). Each L-segment is one
    # 1D-grid (batch-tiled) pallas_call. Two further Mosaic landmines
    # shape these kernels (tools/probe_tpu34/35.py): carries ride as
    # PREPENDED/APPENDED ROWS of the existing inputs (a separate small
    # input works only when unused), and the scan's loop carry is 2-D
    # [1, TB] (a 1-D ref-load carry SIGABRTs; h1 vs h2/g3).

    def _scan_kernel_seg(self, ctab_ref, raw_ref, chars_ref, states_ref):
        S = self.S
        TB = self.batch_tile
        SLAB_SEG = self.slab_seg
        LS = self.segment
        n_defs = self.n_defs
        for d in range(n_defs):
            use_classes, cls0, terms, _ = self.class_info[d]
            width = 2 * S if self.hi_lo else S
            tbl = (
                ctab_ref[d][:, 0:width]
                if use_classes
                else raw_ref[d][:, 0:width]
            ).astype(jnp.bfloat16)
            kdim = tbl.shape[0]

            def slab_body(t, s2, d=d, tbl=tbl, use_classes=use_classes,
                          cls0=cls0, terms=terms, kdim=kdim):
                base = t * SLAB_SEG
                c_slab = chars_ref[pl.ds(n_defs + base, SLAB_SEG), :]
                cols = [
                    self._onehot_cols(
                        self._class_of(c_slab[j], cls0, terms, use_classes),
                        kdim,
                        tbl,
                    )
                    for j in range(SLAB_SEG)
                ]
                outs = []
                for j in range(SLAB_SEG):
                    sel = (
                        jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1)
                        == s2[0][:, None]
                    ).astype(jnp.int32)
                    if self.hi_lo:
                        lo = jnp.sum(cols[j][:, 0:S] * sel, axis=-1)
                        hi = jnp.sum(cols[j][:, S : 2 * S] * sel, axis=-1)
                        nv = lo + 256 * hi
                    else:
                        nv = jnp.sum(cols[j] * sel, axis=-1)
                    s2 = nv[None, :]
                    outs.append(nv)
                states_ref[d, pl.ds(base, SLAB_SEG), :] = jnp.stack(outs, 0)
                return s2

            # init states ride as the first n_defs chars rows; the
            # carry stays 2-D (probe_tpu35 h1)
            jax.lax.fori_loop(
                0, LS // SLAB_SEG, slab_body, chars_ref[d : d + 1, :]
            )

    def _tag_kernel_seg(self, states_ref, lengths_ref, ids_ref, start_ref,
                        endf_ref):
        # states_ref [n_defs, LS+1, TB]: row 0 = previous boundary
        # state; lengths_ref = lengths - segment_base (adjusted in XLA)
        LS = self.segment
        TB = self.batch_tile
        lengths = lengths_ref[0, :]
        pos = jax.lax.broadcasted_iota(jnp.int32, (LS, TB), 0)
        en = (pos < lengths[None, :]).astype(jnp.int32)
        for d in range(self.n_defs):
            nxt = states_ref[d, 1:, :]
            prev = states_ref[d, :LS, :]
            ids = jnp.zeros((LS, TB), jnp.int32)
            st = jnp.zeros((LS, TB), jnp.int32)
            ef = jnp.zeros((LS, TB), jnp.int32)
            for a, b, gid, s_flag, e_flag in self.pair_info[d]:
                m = ((prev == a) & (nxt == b)).astype(jnp.int32)
                ids = ids + gid * m
                if s_flag:
                    st = st + m
                if e_flag:
                    ef = ef + m
            ids_ref[d] = ids * en
            start_ref[d] = st * en
            endf_ref[d] = ef * en

    def _log_scan_pair_seg(self, a, b, reverse):
        LS = self.segment
        TB = self.batch_tile
        shift = 1
        while shift < LS:
            if not reverse:
                a_prev = jnp.concatenate(
                    [jnp.ones((shift, TB), jnp.int32), a[: LS - shift]], 0
                )
                b_prev = jnp.concatenate(
                    [jnp.zeros((shift, TB), jnp.int32), b[: LS - shift]], 0
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

    def _sum_defs_seg(self, ref):
        acc = ref[0]
        for d in range(1, self.n_defs):
            acc = acc + ref[d]
        return acc

    def _fsm_kernel_seg_fwd(self, ids_ref, start_ref, endf_ref, fwd_ref):
        # [n_defs, LS+1, TB] inputs; row 0 carries per-def prev-boundary
        # ids / the entry mask (def 0 of start) / per-def prev endf
        LS = self.segment
        ids_sum = self._sum_defs_seg(ids_ref)[1:, :]
        st_sum = self._sum_defs_seg(start_ref)[1:, :]
        ef_sum = self._sum_defs_seg(endf_ref)[1:, :]
        prev_ids = jnp.concatenate(
            [self._sum_defs_seg(ids_ref)[0:1, :], ids_sum[: LS - 1]], 0
        )
        prev_ef = jnp.concatenate(
            [self._sum_defs_seg(endf_ref)[0:1, :], ef_sum[: LS - 1]], 0
        )
        entry_mask = start_ref[0, 0, :]
        changed = (prev_ids != ids_sum).astype(jnp.int32)
        is_set = ((st_sum > 0) & (changed > 0)).astype(jnp.int32)
        is_reset = (
            (st_sum == 0) & (prev_ef > 0) & (changed > 0)
        ).astype(jnp.int32)
        hold = (1 - is_set) * (1 - is_reset)
        A, Bv = self._log_scan_pair_seg(hold, is_set, reverse=False)
        fwd_ref[:] = A * entry_mask[None, :] + Bv

    def _fsm_kernel_seg_bwd(self, ids_ref, start_ref, endf_ref, bwd_ref):
        # [n_defs, LS+1, TB] inputs; row LS carries per-def next-boundary
        # ids / start, and the entry mask (def 0 of endf)
        LS = self.segment
        ids_sum = self._sum_defs_seg(ids_ref)[:LS, :]
        st_sum = self._sum_defs_seg(start_ref)[:LS, :]
        ef_sum = self._sum_defs_seg(endf_ref)[:LS, :]
        next_ids = jnp.concatenate(
            [ids_sum[1:], self._sum_defs_seg(ids_ref)[LS : LS + 1, :]], 0
        )
        next_st = jnp.concatenate(
            [st_sum[1:], self._sum_defs_seg(start_ref)[LS : LS + 1, :]], 0
        )
        entry_mask = endf_ref[0, LS, :]
        changed = (next_ids != ids_sum).astype(jnp.int32)
        set_b = ((ef_sum > 0) & (changed > 0)).astype(jnp.int32)
        reset_b = (
            (ef_sum == 0) & (next_st > 0) & (changed > 0)
        ).astype(jnp.int32)
        hold_b = (1 - set_b) * (1 - reset_b)
        A, Bv = self._log_scan_pair_seg(hold_b, set_b, reverse=True)
        bwd_ref[:] = A * entry_mask[None, :] + Bv

    def _make_scan_seg(self, B):
        TB = self.batch_tile
        LS = self.segment
        n_defs = self.n_defs
        return pl.pallas_call(
            self._scan_kernel_seg,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec(self._tables_c.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(self._tables_raw.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_defs + LS, TB), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (n_defs, LS, TB), lambda b: (0, 0, b),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n_defs, LS, B), jnp.int32),
            interpret=self.interpret,
            compiler_params=self._vmem_params,
        )

    def _make_tag_seg(self, B):
        TB = self.batch_tile
        LS = self.segment
        n_defs = self.n_defs
        return pl.pallas_call(
            self._tag_kernel_seg,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((n_defs, LS + 1, TB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TB), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_defs, LS, TB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_shape=[jax.ShapeDtypeStruct((n_defs, LS, B), jnp.int32)] * 3,
            interpret=self.interpret,
            compiler_params=self._vmem_params,
        )

    def _make_fsm_seg(self, B, reverse):
        TB = self.batch_tile
        LS = self.segment
        return pl.pallas_call(
            self._fsm_kernel_seg_bwd if reverse else self._fsm_kernel_seg_fwd,
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((self.n_defs, LS + 1, TB), lambda b: (0, 0, b),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_specs=pl.BlockSpec((LS, TB), lambda b: (0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((LS, B), jnp.int32),
            interpret=self.interpret,
            compiler_params=self._vmem_params,
        )

    def _run_segmented(self, ctm, lengths, B):
        """Full split pipeline over n_seg L-segments, carries threaded
        in XLA (prepended/appended rows; see the landmine note above)."""
        LS = self.segment
        n_seg = self.n_seg
        n_defs = self.n_defs
        firsts_arr = jnp.broadcast_to(
            jnp.asarray(self.firsts, jnp.int32)[:, None], (n_defs, B)
        )
        scan_f = self._make_scan_seg(B)
        tag_f = self._make_tag_seg(B)
        fsm_fwd_f = self._make_fsm_seg(B, reverse=False)
        fsm_bwd_f = self._make_fsm_seg(B, reverse=True)

        states_segs = []
        init = firsts_arr
        for si in range(n_seg):
            seg = scan_f(
                self._tables_c, self._tables_raw,
                jnp.concatenate(
                    [init, ctm[si * LS : (si + 1) * LS]], axis=0
                ),
            )
            states_segs.append(seg)
            init = seg[:, LS - 1, :]

        ids_segs, start_segs, endf_segs = [], [], []
        prev = firsts_arr
        for si in range(n_seg):
            len_adj = (lengths - si * LS)[None, :]
            ids_s, st_s, ef_s = tag_f(
                jnp.concatenate(
                    [prev[:, None, :], states_segs[si]], axis=1
                ),
                len_adj,
            )
            ids_segs.append(ids_s)
            start_segs.append(st_s)
            endf_segs.append(ef_s)
            prev = states_segs[si][:, LS - 1, :]

        def with_row(seg_arr, row, front):
            row3 = row[:, None, :]
            return jnp.concatenate(
                [row3, seg_arr] if front else [seg_arr, row3], axis=1
            )

        zero_rows = jnp.zeros((n_defs, B), jnp.int32)

        def mask_row(mask_vals):
            return jnp.zeros((n_defs, B), jnp.int32).at[0].set(mask_vals)

        fwd_segs = [None] * n_seg
        m_entry = jnp.zeros((B,), jnp.int32)
        prev_ids_row = zero_rows
        prev_ef_row = zero_rows
        for si in range(n_seg):
            fwd_s = fsm_fwd_f(
                with_row(ids_segs[si], prev_ids_row, True),
                with_row(start_segs[si], mask_row(m_entry), True),
                with_row(endf_segs[si], prev_ef_row, True),
            )
            fwd_segs[si] = fwd_s
            m_entry = fwd_s[LS - 1]
            prev_ids_row = ids_segs[si][:, LS - 1, :]
            prev_ef_row = endf_segs[si][:, LS - 1, :]

        bwd_segs = [None] * n_seg
        m_entry = jnp.zeros((B,), jnp.int32)
        next_ids_row = zero_rows
        next_st_row = zero_rows
        for si in range(n_seg - 1, -1, -1):
            bwd_s = fsm_bwd_f(
                with_row(ids_segs[si], next_ids_row, False),
                with_row(start_segs[si], next_st_row, False),
                with_row(endf_segs[si], mask_row(m_entry), False),
            )
            bwd_segs[si] = bwd_s
            m_entry = bwd_s[0]
            next_ids_row = ids_segs[si][:, 0, :]
            next_st_row = start_segs[si][:, 0, :]

        states_tm = jnp.concatenate(states_segs, axis=1)
        ids_tm = jnp.concatenate(ids_segs, axis=1)
        start_tm = jnp.concatenate(start_segs, axis=1)
        endf_tm = jnp.concatenate(endf_segs, axis=1)
        fwd_tm = jnp.concatenate(fwd_segs, axis=0)
        bwd_tm = jnp.concatenate(bwd_segs, axis=0)
        return states_tm, ids_tm, start_tm, endf_tm, fwd_tm, bwd_tm

    def scan_states_tm(self, ctm, init, B):
        """Per-position states [n_defs, L, B] scanned from PER-STRING
        initial states ``init`` [n_defs, B] (instead of the model's
        first states) — the per-shard hook for sequence-sharded /
        speculative scanning (parallel/seq_parallel.py): the segmented
        kernels already thread carries through their input rows, so an
        external entry state plugs in for free.  Requires a
        mode="split", grid_mode="segmented" matcher."""
        if self.grid_mode != "segmented":
            raise ValueError(
                "scan_states_tm needs grid_mode='segmented' "
                f"(got {self.grid_mode!r})"
            )
        LS = self.segment
        scan_f = self._make_scan_seg(B)
        segs = []
        cur = jnp.asarray(init, jnp.int32)
        for si in range(self.n_seg):
            seg = scan_f(
                self._tables_c,
                self._tables_raw,
                jnp.concatenate(
                    [cur, ctm[si * LS : (si + 1) * LS]], axis=0
                ),
            )
            segs.append(seg)
            cur = seg[:, LS - 1, :]
        return jnp.concatenate(segs, axis=1)

    # ----------------------------------------------------------- pipeline

    def _core(self, chars, lengths):
        L = self.L
        n_defs = self.n_defs
        B = chars.shape[0]
        ctm = chars.astype(jnp.int32).T  # [L, B]
        if self.mode == "split" and self.grid_mode == "segmented":
            (
                states_tm,
                ids_tm,
                start_tm,
                endf_tm,
                fwd_tm,
                bwd_tm,
            ) = self._run_segmented(ctm, lengths, B)
        elif self.mode == "split":
            states_tm = self._make_scan(B)(
                self._tables_c, self._tables_raw, self._tables_pair, ctm
            )
            ids_tm, start_tm, endf_tm = self._make_tag(B)(
                states_tm, lengths[None, :]
            )
            fwd_tm, bwd_tm = self._make_fsm(B)(ids_tm, start_tm, endf_tm)
        else:
            states_tm, ids_tm, start_tm, endf_tm, fwd_tm, bwd_tm = (
                self._make_flat(B)(
                    self._tables_c, self._tables_raw, self._tables_joint,
                    ctm, lengths[None, :],
                )
            )

        pos = jnp.arange(L, dtype=jnp.int32)
        enable = (pos[None, :] < lengths[:, None]).astype(jnp.int32)
        chars_i32 = chars.astype(jnp.int32) * enable

        after = jnp.moveaxis(states_tm, -1, 0)  # [B, n_defs, L]
        ids_per_def = jnp.moveaxis(ids_tm, -1, 0)
        start_per_def = jnp.moveaxis(start_tm, -1, 0)
        endf_per_def = jnp.moveaxis(endf_tm, -1, 0)
        fwd = fwd_tm.T
        bwd = bwd_tm.T

        first = self._model_arrays["first_states"][None, :, None]
        raw = jnp.concatenate(
            [jnp.broadcast_to(first, (B, n_defs, 1)), after], axis=2
        )
        posL1 = jnp.arange(L + 1, dtype=jnp.int32)
        in_range = posL1[None, None, :] <= lengths[:, None, None]
        dummy = self._model_arrays["dummy_states"][None, :, None]
        states = jnp.where(in_range, raw, dummy)

        final = jnp.take_along_axis(
            raw, lengths[:, None, None].repeat(n_defs, 1), axis=2
        )[:, :, 0]
        accepted = self._model_arrays["accept_mask"][
            jnp.arange(n_defs)[None, :], final
        ]
        has_dead = final == self._model_arrays["dead_states"][None, :]

        substr_id_sum = ids_per_def.sum(axis=1)
        is_start_sum = jnp.concatenate(
            [start_per_def.sum(axis=1), jnp.zeros((B, 1), jnp.int32)], axis=1
        )
        is_end_sum = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), endf_per_def.sum(axis=1)], axis=1
        )
        start_enable = enable[:, None, :] * start_per_def
        end_enable = enable[:, None, :] * endf_per_def
        mask = fwd * bwd
        return dict(
            all_enable_flags=enable,
            all_characters=chars_i32,
            all_substr_ids=mask * substr_id_sum,
            masked_characters=mask * chars_i32,
            states=states,
            substr_ids_per_def=ids_per_def,
            start_enable=start_enable,
            end_enable=end_enable,
            is_start_sum=is_start_sum,
            is_end_sum=is_end_sum,
            substr_id_sum=substr_id_sum,
            fwd_mask=fwd,
            bwd_mask=bwd,
            mask=mask,
            accepted=accepted,
            has_dead=has_dead,
            match_ok=accepted.all(axis=1) & (~has_dead.any(axis=1)),
        )

    def __call__(self, chars, lengths) -> RegexResult:
        chars = jnp.asarray(chars, jnp.uint8)
        lengths = jnp.asarray(lengths, jnp.int32)
        B = chars.shape[0]
        if B % self.batch_tile != 0:
            pad = self.batch_tile - B % self.batch_tile
            chars = jnp.pad(chars, ((0, pad), (0, 0)))
            lengths = jnp.pad(lengths, (0, pad))
            out = self._run(chars, lengths)
            return RegexResult(**{k: v[:B] for k, v in out.items()})
        return RegexResult(**self._run(chars, lengths))

    def match_one(self, characters: bytes) -> RegexResult:
        L = self.model.max_chars_size
        buf = np.zeros((1, L), np.uint8)
        buf[0, : len(characters)] = bytearray(characters)
        res = self(buf, np.array([len(characters)], np.int32))
        return res.map(lambda a: np.asarray(a)[0])
