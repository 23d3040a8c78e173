"""Bit-sliced (bitplane) witness pipeline — the high-throughput backend.

Thirty-two strings are packed into each int32 lane ("planes") and the whole
witness pipeline runs as boolean circuits on planes:

  1. **pack**: bytes ``[B, L]`` -> 8 byte-bit planes.  XLA does only a
     transpose + uint8x4->int32 bitcast (a pure view after that: words
     combine STRIDED quads, see the mapping note below); the per-plane bit
     extraction runs in a tiny position-parallel Pallas kernel with
     VMEM-resident logic (~free: 0.03 ms at B=32k on hardware).
  2. **scan kernel** (Pallas): the only sequential stage.  Per byte step a
     synthesized boolean circuit (:mod:`..compiler.bitslice`, byte-class
     BDD folded in, ~200-400 VPU bitops for email-scale DFAs, each op
     covering 32,768 strings) maps one-hot state planes — carried in
     registers across the fori_loop — through the byte-bit planes;
     log2-encoded state planes stream out.  Replaces the reference's
     per-byte HashMap loop (src/lib.rs:804-823).
  3. **tag + mask FSMs** (XLA, packed): substr ids / start / end flags are
     pure functions of the (prev, next) state pair (src/lib.rs:825-888) —
     a synthesized pair circuit; the two set/reset/hold mask FSMs
     (src/lib.rs:598-714) run as Hillis-Steele log-scans over 1-bit affine
     maps, all in the packed domain.
  4. **unpack** (XLA): planes -> compact value-domain witness columns
     (uint8 states/ids/chars, 0/1 flags).  Plane groups of <=8 bits unpack
     in ONE fused OR-reduction with uint8 output (the naive per-plane
     accumulate materialized 32x-expanded int32 intermediates and
     dominated the pipeline).

Outputs are bit-identical to :mod:`.reference` (tests/test_bitplane.py).
Supported models: every def's live state count and byte-class count must
synthesize to a bounded circuit (all email fixtures qualify); others fall
back to the split Pallas kernel or XLA backend.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.bitslice import DefCircuits, synthesize_def
from ..models.compiled import CompiledRegexModel
from ..witness.result import RegexResult
from .knobs import BitplaneKnobs

LANE = 128

# Packed-word mapping.  The uint8x4 bitcast yields raw quads q (strings
# 4q+s in byte lanes s).  Word w combines the STRIDED quads q = w + NW*m
# (m = 0..7) — chosen so the grouping is a pure reshape of the bitcast
# array, no transpose — putting string
#     g(w, beta) = 4*(w + NW*(beta % 8)) + beta // 8
# at bit beta of word w.  Every packed-domain stage is bit-position
# agnostic; pack/unpack/enable all derive from this one mapping (the
# word<->string association depends on NW = B/32, which is fine: the
# packed layout is internal to one matcher invocation).
_QUAD_MASK = 0x01010101


def _substr_pairs(model: CompiledRegexModel, d: int):
    nz = np.argwhere(model.substr_id_table[d] > 0)
    out = []
    for a, b in nz:
        gid = int(model.substr_id_table[d][a, b])
        out.append(
            (
                int(a),
                int(b),
                gid,
                bool(model.is_start_table[gid, a]),
                bool(model.is_end_table[gid, b]),
            )
        )
    return out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Packed-domain helpers (all jnp, position-parallel)
# ---------------------------------------------------------------------------


def _bytes_to_words(x_u8: jnp.ndarray) -> jnp.ndarray:
    """[L, B] uint8 -> [L, B//4] int32 via bitcast (4 bytes per word)."""
    L, B = x_u8.shape
    return jax.lax.bitcast_convert_type(
        x_u8.reshape(L, B // 4, 4), jnp.int32
    )


def _combine_strided(R: jnp.ndarray) -> jnp.ndarray:
    """[L, 8, NW] masked quad-bit rows -> [L, NW] words: word w =
    OR over m of row[m] << m (bits land at 8s+m, all disjoint)."""
    sh = jnp.arange(8, dtype=jnp.int32)
    return jax.lax.reduce(
        R << sh[None, :, None], jnp.int32(0), jax.lax.bitwise_or, (1,)
    )


def raw_quads(chars: jnp.ndarray, L_pad: int) -> jnp.ndarray:
    """[B, L] uint8 -> [L_pad, 8, B//32] int32 raw quad rows (transpose +
    bitcast + reshape only; the plane extraction happens in the pack
    kernel or a fused XLA reduce)."""
    B, L = chars.shape
    x = chars.T
    if L_pad != L:
        x = jnp.pad(x, ((0, L_pad - L), (0, 0)))
    return _bytes_to_words(x).reshape(L_pad, 8, B // 32)


def tile_corpus(chars: "np.ndarray", L_pad: int) -> "np.ndarray":
    """Host-side packer for ``input_layout="tiled"``: [B, L] uint8 chars
    -> [NWS, 8, L_pad, LANE] int32 quad words, the raw_quads tiling with
    the word-group (NWS) axis leading so every device read is
    contiguous.  T[nws, m, l, lane] packs bytes s=0..3 of strings
    g = 4*((nws*LANE+lane) + NW*m) + s at position l (module header).
    Pads B up to a multiple of 32*LANE (trailing strings read as empty —
    pass the unpadded lengths and the matcher slices outputs back) and
    L up to L_pad with zeros.  Corpus loaders should call this during
    collation, where the permuted copy overlaps file IO.  Uses the
    multithreaded C++ packer (native/scan.cpp h2r_tile_corpus) when the
    toolchain is available; numpy fallback otherwise."""
    B, L = chars.shape
    assert L <= L_pad
    try:
        from .. import native

        if native.available():
            return native.tile_corpus(np.ascontiguousarray(chars), L_pad)
    except Exception:
        pass
    tile = 32 * LANE
    Bp = -(-B // tile) * tile
    x = np.zeros((L_pad, Bp), np.uint8)
    x[:L, :B] = chars.T
    words = x.reshape(L_pad, Bp // 4, 4).view(np.int32)[..., 0]
    return np.ascontiguousarray(
        words.reshape(L_pad, 8, Bp // 32 // LANE, LANE)
        .transpose(2, 1, 0, 3)
    )


def tile_corpus_jax(chars: jnp.ndarray, L_pad: int) -> jnp.ndarray:
    """Device-side equivalent of ``tile_corpus`` (an XLA transpose — use
    only where the host cannot pre-tile, e.g. the ScanJob device-expand
    path; it reintroduces the transpose cost tiled mode exists to
    avoid).  Pads B up to a multiple of 32*LANE like tile_corpus."""
    B = chars.shape[0]
    tile = 32 * LANE
    if B % tile != 0:
        chars = jnp.pad(chars, ((0, tile - B % tile), (0, 0)))
        B = chars.shape[0]
    return (
        raw_quads(chars, L_pad)
        .reshape(L_pad, 8, B // 32 // LANE, LANE)
        .transpose(2, 1, 0, 3)
    )


def pack_bytes(chars: jnp.ndarray, L_pad: int) -> List[jnp.ndarray]:
    """[B, L] uint8 -> list of 8 byte-bit planes [L_pad, B//32] int32.

    One transpose+bitcast materialization; the quad grouping is a reshape
    (strided-partner mapping, see module header) and the per-plane
    extraction is one fused OR-reduction."""
    B, L = chars.shape
    x = chars.T
    if L_pad != L:
        x = jnp.pad(x, ((0, L_pad - L), (0, 0)))
    w = _bytes_to_words(x)  # [L_pad, B//4]
    R = w.reshape(L_pad, 8, B // 32)
    mask = jnp.int32(_QUAD_MASK)
    js = jnp.arange(8, dtype=jnp.int32)
    # [L_pad, 8m, 8j, NW]: bit j of each byte lane, per quad row m
    bits = (R[:, :, None, :] >> js[None, None, :, None]) & mask
    sh = jnp.arange(8, dtype=jnp.int32)
    planes = jax.lax.reduce(
        bits << sh[None, :, None, None], jnp.int32(0),
        jax.lax.bitwise_or, (1,),
    )  # [L_pad, 8j, NW]
    return [planes[:, j] for j in range(8)]


def pack_bool(col: jnp.ndarray, L_pad: int) -> jnp.ndarray:
    """[B, L] bool/0-1 -> one plane [L_pad, B//32] int32."""
    B, L = col.shape
    x = col.astype(jnp.uint8).T
    if L_pad != L:
        x = jnp.pad(x, ((0, L_pad - L), (0, 0)))
    w = _bytes_to_words(x)
    return _combine_strided(
        w.reshape(L_pad, 8, B // 32) & jnp.int32(_QUAD_MASK)
    )


def transpose8_planes(planes: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """SWAR 8x8 bit-block transpose of eight int32 planes.

    Input plane ``P_j`` carries bit ``j`` of each string's byte at bit
    position ``beta = 8s+m``; output word ``O_b`` carries, in byte lane
    ``s`` bit ``j``, the bit ``P_j[8s+b]`` — i.e. ``O_b`` holds the
    fully-assembled VALUE BYTES of the four strings at ``beta % 8 == b``
    (little-endian byte lanes).  72 VPU ops per 8-plane group vs ~192 for
    per-bit extraction; the delta-swap masks make the arithmetic right
    shifts safe (sign bits are masked off)."""
    x = list(planes)
    assert len(x) == 8
    for d, mask in ((4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        m = jnp.int32(mask)
        for i in range(8):
            if i & d:
                continue
            a, b = x[i], x[i + d]
            t = ((a >> d) ^ b) & m
            x[i + d] = b ^ t
            x[i] = a ^ (t << d)
    return x


def unpack_planes(planes: List[jnp.ndarray], L: int, out_dtype=jnp.uint8):
    """List of NB planes -> values [B, L] (bit j of the value from
    planes[j]; PI bit order inverted).  Planes are NWS-major
    [NWS, L_pad, LANE] (the scan/post kernel layout) or L-major
    [L_pad, NW]."""
    return _unpack_raw(planes, L).astype(out_dtype)


def _to_nws_major(p: jnp.ndarray) -> jnp.ndarray:
    if p.ndim == 2:  # [L_pad, NW] L-major
        return p.reshape(p.shape[0], -1, LANE).transpose(1, 0, 2)
    return p


def _unpack_raw(planes: List[jnp.ndarray], L: int) -> jnp.ndarray:
    """Fused expansion: stack the plane axis and OR-reduce over it so XLA
    emits ONE pass producing the (narrow) value array — the naive
    plane-by-plane accumulate materializes a 32x-expanded int32
    intermediate per plane (~4 ms for a 13-plane witness set at B=32k)."""
    beta = jnp.arange(32, dtype=jnp.int32)
    stack = jnp.stack([_to_nws_major(p) for p in planes])  # [NP,NWS,L_pad,LANE]
    NP = stack.shape[0]
    dtype = jnp.uint8 if NP <= 8 else jnp.int32
    shifts = jnp.arange(NP, dtype=jnp.uint8 if NP <= 8 else jnp.int32)
    bits = ((stack[:, :, :L, :, None] >> beta) & 1).astype(dtype)
    expanded = bits << shifts[:, None, None, None, None]
    acc = jax.lax.reduce(
        expanded, jnp.array(0, dtype), jax.lax.bitwise_or, (0,)
    )  # [NWS, L, LANE, 32(beta)]
    NWS = acc.shape[0]
    B = NWS * LANE * 32
    # bit beta = 8s+m holds string g = 4*(w + NW*m) + s (module header):
    # reorder (m, nws, lane, s) -> flat string order.
    acc5 = acc.reshape(NWS, L, LANE, 4, 8)  # [..., s, m]
    vals = acc5.transpose(1, 4, 0, 2, 3).reshape(L, B)  # [L, B] g-ordered
    return vals.T  # [B, L]


def unpack_groups(
    named: List[Tuple[str, List[jnp.ndarray]]], L: int
) -> Dict[str, jnp.ndarray]:
    """Unpack many named plane-vectors with one fused bit-expansion per
    <=8-bit group (uint8 values): each group's planes become bit-fields of
    one byte per (string, position), split by shift/mask afterwards."""
    groups: List[List[Tuple[str, int, List[jnp.ndarray]]]] = []
    cur: List[Tuple[str, int, List[jnp.ndarray]]] = []
    bits = 0
    for name, planes in named:
        nb = len(planes)
        if bits + nb > 8:
            groups.append(cur)
            cur, bits = [], 0
        cur.append((name, bits, planes))
        bits += nb
    if cur:
        groups.append(cur)
    out: Dict[str, jnp.ndarray] = {}
    for g in groups:
        all_planes = [p for (_, _, ps) in g for p in ps]
        vals = _unpack_raw(all_planes, L)  # [B, L] uint8
        for name, off, ps in g:
            nb = len(ps)
            field = (vals >> off) & ((1 << nb) - 1)
            out[name] = field
    return out


def plane_add(a: List[jnp.ndarray], b: List[jnp.ndarray], n_out: int):
    """Bit-sliced ripple-carry add of two plane vectors (LSB first)."""
    out = []
    carry = None
    for j in range(n_out):
        x = a[j] if j < len(a) else None
        y = b[j] if j < len(b) else None
        terms = [t for t in (x, y, carry) if t is not None]
        if not terms:
            out.append(jnp.zeros_like(a[0]))
            continue
        s = terms[0]
        c = None
        for t in terms[1:]:
            new_c = s & t
            s = s ^ t
            c = new_c if c is None else (c | new_c)
        out.append(s)
        carry = c
    return out


def _fori_unrolled(n_steps: int, body, carry0, unroll: int):
    """fori_loop with MANUAL unroll: this Mosaic's fori lowering supports
    only ``unroll=1`` or ``unroll=n_steps`` (probe58_quick r4 hardware
    traceback), so intermediate factors are expressed by running ``unroll``
    body steps per loop iteration — same schedule exposure, legal lowering.
    A remainder tail (n_steps % unroll) is peeled statically."""
    if unroll <= 1:
        return jax.lax.fori_loop(0, n_steps, body, carry0)
    if unroll >= n_steps:
        return jax.lax.fori_loop(0, n_steps, body, carry0, unroll=n_steps)
    n, rem = divmod(n_steps, unroll)

    def body_u(k, carry):
        i0 = k * unroll
        for u in range(unroll):
            carry = body(i0 + u, carry)
        return carry

    carry = jax.lax.fori_loop(0, n, body_u, carry0)
    for i in range(n_steps - rem, n_steps):
        carry = body(i, carry)
    return carry


def _fsm_log_scan(
    hold: jnp.ndarray, setp: jnp.ndarray, reverse: bool, axis: int = 0
):
    """Inclusive scan of 1-bit affine maps x' = hold·x + set along ``axis``.

    Maps compose (earlier-then-later) as (h1·h2, h2·s1 + s2); log2(L)
    rounds of compose-with-shifted-self. Returns the per-position value
    applied to initial state 0 (= the composed ``set`` bit).
    (Reference FSM semantics: src/lib.rs:598-714.)
    """
    L = hold.shape[axis]

    def take(x, sl):
        idx = [slice(None)] * x.ndim
        idx[axis] = sl
        return x[tuple(idx)]

    def pad_shape(x, n):
        shape = list(x.shape)
        shape[axis] = n
        return tuple(shape)

    a, b = hold, setp
    shift = 1
    while shift < L:
        ones = jnp.full(pad_shape(a, shift), -1, a.dtype)
        zeros = jnp.zeros(pad_shape(b, shift), b.dtype)
        if not reverse:
            a_prev = jnp.concatenate([ones, take(a, slice(0, L - shift))], axis)
            b_prev = jnp.concatenate([zeros, take(b, slice(0, L - shift))], axis)
        else:
            a_prev = jnp.concatenate([take(a, slice(shift, None)), ones], axis)
            b_prev = jnp.concatenate([take(b, slice(shift, None)), zeros], axis)
        a, b = a_prev & a, (a & b_prev) | b
        shift *= 2
    return b


def _post_xla(circuits, logs_per_def, en_plane, idb, L_pad, NWS):
    """XLA (non-kernel) tag + id-sum + FSM path on NWS-major planes
    [NWS, L_pad, LANE]; returns the same named plane lists as the fused
    post kernel.  Kept for A/B measurement — XLA materializes the
    intermediates to HBM, so the kernel path is the default on TPU."""

    def shift_down(p, first_row):  # p[l] := p[l-1], row 0 := first_row
        return jnp.concatenate([first_row, p[:, : L_pad - 1]], axis=1)

    def shift_up(p):  # p[l] := p[l+1], last row := 0
        return jnp.concatenate(
            [p[:, 1:], jnp.zeros((NWS, 1, LANE), jnp.int32)], axis=1
        )

    zrow = jnp.zeros((NWS, 1, LANE), jnp.int32)
    ids_sum = None
    start_any = None
    endf_any = None
    out: Dict[str, List[jnp.ndarray]] = {}
    for d, circ in enumerate(circuits):
        logs = logs_per_def[d]  # [NWS, sb, L_pad, LANE]
        nxt = [logs[:, j] for j in range(circ.sb)]
        prv = [
            shift_down(
                nxt[j],
                jnp.full(
                    (NWS, 1, LANE),
                    -1 if (circ.first_state >> j) & 1 else 0,
                    jnp.int32,
                ),
            )
            for j in range(circ.sb)
        ]
        env = {f"prev{j}": prv[j] for j in range(circ.sb)}
        env.update({f"next{j}": nxt[j] for j in range(circ.sb)})
        tag = circ.tag_prog.run(env)
        idp = [tag[f"id{j}"] & en_plane for j in range(idb)]
        stp = tag["is_start"] & en_plane
        efp = tag["is_end"] & en_plane
        out[f"ids{d}"] = idp
        out[f"start{d}"] = [stp]
        out[f"endf{d}"] = [efp]
        if ids_sum is None:
            ids_sum, start_any, endf_any = list(idp), stp, efp
        else:
            ids_sum = plane_add(ids_sum, idp, idb + d.bit_length() + 1)
            start_any = start_any | stp
            endf_any = endf_any | efp

    prev_sum = [shift_down(p, zrow) for p in ids_sum]
    changed = None
    for a, b in zip(ids_sum, prev_sum):
        x = a ^ b
        changed = x if changed is None else (changed | x)
    prev_endf = shift_down(endf_any, zrow)
    is_set = start_any & changed
    is_reset = ~start_any & prev_endf & changed
    fwd = _fsm_log_scan(~(is_set | is_reset), is_set, reverse=False, axis=1)

    next_sum = [shift_up(p) for p in ids_sum]
    changed_b = None
    for a, b in zip(ids_sum, next_sum):
        x = a ^ b
        changed_b = x if changed_b is None else (changed_b | x)
    next_start = shift_up(start_any)
    set_b = endf_any & changed_b
    reset_b = ~endf_any & next_start & changed_b
    bwd = _fsm_log_scan(~(set_b | reset_b), set_b, reverse=True, axis=1)
    mask = fwd & bwd
    out["idsum"] = ids_sum
    out["start_any"] = [start_any]
    out["endf_any"] = [endf_any]
    out["masked_idsum"] = [p & mask for p in ids_sum]
    out["fwd"] = [fwd]
    out["bwd"] = [bwd]
    out["mask"] = [mask]
    return out


# ---------------------------------------------------------------------------
# The matcher
# ---------------------------------------------------------------------------


class BitplaneMatcher:
    """Bit-sliced matcher; drop-in for BatchMatcher / PallasMatcher
    (bit-identical RegexResult values, compact dtypes).

    Args:
      lc: sequence positions per kernel grid step (VMEM chunk).
      nws_tile: plane sublane-tile per kernel instance (8 -> 32,768 strings
        per grid step; smaller batches underfill the VPU but still work).
      interpret: run the Pallas kernel in interpreter mode (CPU tests).
      max_step_ops: refuse models whose synthesized per-byte circuit
        exceeds this (falls back to other backends).
      compact: emit uint8 value-domain columns (the ~6 B/byte witness
        format); set False for int32 columns matching the other backends'
        dtypes exactly.
    """

    def __init__(
        self,
        model: CompiledRegexModel,
        lc: int = 128,
        nws_tile: int = 8,
        interpret: bool = False,
        max_step_ops: int = 4096,
        compact: bool = True,
        post: str = "pallas",  # "pallas" (fused tag+FSM kernel) | "xla"
        columns: str = "full",  # "full" (RegexResult set) | "witness"
        #   (compact ~6 B/input-byte emission: states, masked ids, masked
        #   chars, one packed flags byte — the BASELINE traffic model)
        #   | "match" (round 3: match_ok/accepted/final states ONLY —
        #   pack + scan + a boundary-reduce kernel, ~2.8 B/byte traffic;
        #   the corpus-filtering serving mode)
        class_stage=None,  # None = "binary": compute byte->class planes
        #   position-parallel in the pack kernel so the sequential step
        #   circuit takes class planes (smaller serial chain).  "binary"
        #   emits ceil(log2 k) code planes (fewer than the 8 byte planes:
        #   less pack->scan HBM traffic); "onehot"/True emits k indicator
        #   planes; False/H2R_CLASS_STAGE=0 reverts to byte-plane input
        #   with the class BDD folded into the step circuit.
        #   H2R_CLASS_STAGE accepts 0/1/onehot/binary.
        unroll: Optional[int] = None,  # scan fori_loop unroll factor
        #   (None = env H2R_SCAN_UNROLL, default 1).  Unrolling exposes
        #   adjacent byte steps to the Mosaic scheduler so position-
        #   independent ops (class decode, log writes) overlap the serial
        #   state recurrence.
        fuse_pack: Optional[bool] = None,  # None = off: A/B on hardware
        #   (tools/probe_tpu43.py) favors the separate pack kernel — the
        #   in-scan extraction serializes ~24k vops/chunk ahead of the
        #   recurrence, costing more than the pack round trip saves.
        #   Kept as an option (H2R_FUSE_PACK=1) for future toolchains.
        en_pack: Optional[bool] = None,  # None = env H2R_EN_PACK; compute
        #   the enable plane inside the pack/qpack kernel.
        qpack: Optional[bool] = None,  # None = env H2R_QPACK; fold the
        #   raw_quads transpose into the pack kernel (kills the 67 MB
        #   XLA transpose round trip; requires L == L_pad).
        emit: Optional[str] = None,  # None = env H2R_EMIT (default
        #   "bytes"): planes/bytes/direct/kdecode field emission mode.
        input_layout: str = "bl",  # "bl": __call__ takes [B, L] uint8
        #   chars (the default contract).  "tiled": __call__ takes the
        #   host-pretiled [NWS, 8, L_pad, LANE] int32 quad words
        #   (``tile_corpus``) — the pack kernel then reads fully
        #   contiguous 64 KB blocks instead of the inherently strided
        #   [B, L] u8 columns (docs/ROADMAP.md item 2), and the post
        #   kernel assembles masked_characters from the same words, so
        #   no string-major chars array exists anywhere in the graph.
        #   Supported with columns="witness" (bytes emission) and
        #   columns="match"; corpus-controlled callers (ScanJob/CLI)
        #   pack during collation, ad-hoc callers keep "bl".
    ):
        self.model = model
        self.interpret = interpret
        self.compact = compact
        if columns not in ("full", "witness", "match"):
            raise ValueError(
                f"columns={columns!r}: expected full/witness/match"
            )
        self.columns = columns
        if input_layout not in ("bl", "tiled"):
            raise ValueError(
                f"input_layout={input_layout!r}: expected bl/tiled"
            )
        self.input_layout = input_layout
        self._tiled = input_layout == "tiled"
        if self._tiled and columns == "full":
            raise ValueError(
                "input_layout='tiled' supports columns='witness'/'match' "
                "only: the full RegexResult set emits all_characters, "
                "which needs the string-major [B, L] chars"
            )
        if self._tiled and columns == "witness" and post != "pallas":
            raise ValueError(
                "input_layout='tiled' witness emission requires the "
                "Pallas post kernel (post='pallas')"
            )
        n_defs = self.n_defs = model.n_defs
        # All H2R_* knobs resolved + validated in one place (ops/knobs.py);
        # constructor args override env, env overrides defaults.
        knobs = BitplaneKnobs.from_env(
            unroll=unroll, fuse_pack=fuse_pack, class_stage=class_stage,
            en_pack=en_pack, qpack=qpack, emit=emit,
        )
        self.knobs = knobs
        unroll = self.unroll = knobs.unroll
        fuse_pack = self.fuse_pack = knobs.fuse_pack
        class_stage = self.class_stage = knobs.class_stage
        self._vmem_limit = knobs.vmem_limit
        self._post_mode = post
        L = self.L = model.max_chars_size
        total = model.total_substrs
        idb = max(1, int(total).bit_length())
        self.idb = idb

        self.circuits: List[DefCircuits] = []
        for d in range(n_defs):
            c = synthesize_def(
                model.transition[d],
                int(model.first_states[d]),
                int(model.dead_states[d]),
                _substr_pairs(model, d),
                idb=idb,
                # With the class stage, byte->class planes are computed
                # position-parallel in the pack kernel and the SERIAL step
                # circuit takes class planes — for the email model that
                # moves most of the 143-op class BDD off the sequential
                # critical path.
                fold_class=not class_stage,
                class_encoding=class_stage if class_stage else "onehot",
            )
            if c.step_ops > max_step_ops:
                raise ValueError(
                    f"def {d}: step circuit {c.step_ops} ops > {max_step_ops}"
                )
            self.circuits.append(c)
        # class-plane layout: per-def contiguous slices in the pack output
        self._cls_off: List[int] = []
        off_c = 0
        for c in self.circuits:
            self._cls_off.append(off_c)
            off_c += len(c.class_plane_names)
        KP = off_c if class_stage else 8
        self._kp = KP

        LC = min(lc, L)
        L_pad = _round_up(L, LC)
        self.L_pad = L_pad
        self.lc = LC
        self.nws_tile = nws_tile
        self._n_l = L_pad // LC

        # ----- per-def Pallas scan kernel -----
        # ``fused_pack``: the kernel takes RAW QUAD ROWS (the bitcast view
        # of the transposed input, no separate pack kernel) and extracts
        # the chunk's byte-bit planes into VMEM scratch position-parallel
        # before the sequential loop — same bit logic as the pack kernel
        # but without its 2x32 MB HBM round trip between kernels.  The
        # fori_loop reads planes from scratch (dynamic indexing is only
        # legal on refs, not values, on this Mosaic).

        # ----- fused multi-def scan kernel -----
        # All defs' step circuits run in ONE kernel: the plane stack is
        # read once (a per-def kernel re-reads it n_defs times) and the
        # independent serial chains interleave, giving the VPU cross-def
        # ILP a single 240-op chain lacks.  Output is the concatenated
        # log-plane stack [NWS, sum(sb_d), L_pad, LANE]; self._sb_off[d]
        # locates def d's planes.
        self._sb_off: List[int] = []
        off_sb = 0
        for c in self.circuits:
            self._sb_off.append(off_sb)
            off_sb += c.sb
        SB_sum = off_sb
        self._sb_sum = SB_sum


        # ----- pack kernel -----
        # Byte-bit plane extraction from the raw quad rows as a
        # position-parallel Pallas kernel: VMEM-resident bit logic instead
        # of an XLA pass that materializes per-plane intermediates.
        PLC = min(128, L_pad)
        while L_pad % PLC != 0:
            PLC //= 2
        self._plc = PLC
        # Opt-in (H2R_EN_PACK=1): the pack kernel also computes the enable
        # plane from a per-word length table, replacing the XLA broadcast-
        # compare-reduce pass of the run path (pending the hardware A/B).
        en_in_pack = knobs.en_pack
        self._en_in_pack = en_in_pack


        # ----- qpack: raw_quads fused into the pack kernel (H2R_QPACK=1) -----
        # The XLA raw_quads pass materializes the [L, B] transpose (67 MB
        # round trip at B=32k).  qpack reads the [B, L] chars directly via
        # the pure-view reshape [8m, NW, 4s, L] (string g = m*4NW + 4w + s)
        # and builds the quad rows with in-kernel tile transposes — light
        # kernel, so the transposes run at memcpy speed (probe_tpu47/48)
        # instead of serializing compute.  Requires L == L_pad.
        self._qpack = (
            knobs.qpack and L_pad == L
        )


        # ----- fused tag + FSM "post" kernel -----
        # Position-parallel packed-domain work (pair circuit, id-sum adder,
        # both mask FSM log-scans) in ONE kernel with whole-L blocks tiled
        # over the word dimension: XLA materializes every intermediate of
        # this op sequence to HBM (~4.5 ms at B=32k, probe_tpu23); in VMEM
        # it is a few hundred microseconds of pure VPU bitops.
        nsum = idb if n_defs == 1 else idb + (n_defs - 1).bit_length() + 1
        self.nsum = nsum
        post_plan: List[Tuple[str, int]] = []
        if columns == "witness":
            # Compact emission consumes only these planes — pruning the
            # rest drops the post kernel's HBM write traffic ~40%.
            post_plan += [
                ("masked_idsum", nsum),
                ("fwd", 1),
                ("bwd", 1),
                ("mask", 1),
                ("start_any", 1),
                ("endf_any", 1),
            ]
        else:
            for d in range(n_defs):
                post_plan += [
                    (f"ids{d}", idb),
                    (f"start{d}", 1),
                    (f"endf{d}", 1),
                ]
            post_plan += [
                ("idsum", nsum),
                ("masked_idsum", nsum),
                ("fwd", 1),
                ("bwd", 1),
                ("mask", 1),
            ]
        post_off: Dict[str, Tuple[int, int]] = {}
        off = 0
        for name, nb in post_plan:
            post_off[name] = (off, nb)
            off += nb
        P_total = off
        self._post_off = post_off
        self._p_total = P_total

        # Byte-packed witness emission.  Three modes (H2R_EMIT):
        #   "planes": post writes bit planes; XLA does a 32-way unpack
        #     (the round-2 profile's dominant stage, tools/probe_tpu40.py).
        #   "bytes": post assembles value bytes in-register (SWAR 8x8 bit
        #     transpose per <=8-bit field group); XLA pays one fused
        #     bitcast+transpose pass per field column.
        #   "direct" (experimental, default OFF): post additionally
        #     transposes the byte-lane words to final [B, L]-major order
        #     IN VMEM (sublane l4-pack + (L/4, LANE) tile transpose +
        #     s-interleave, tools/probe_tpu48.py) and writes one l4-packed
        #     int32 array per field whose [B, L] uint8 view is a zero-copy
        #     bitcast+reshape — no XLA decode pass.  Measured SLOWER
        #     in-pipeline (~3.1 ms vs ~1.1 ms at B=32k, probe_tpu49: the
        #     per-m tile transposes + s-interleave serialize the post
        #     kernel more than the saved decode pass costs); kept for
        #     future toolchains.
        self._emit = "planes"
        self._wgroups: List[List[Tuple[str, int, int]]] = []
        self._dfields: List[Tuple[str, int]] = []
        if columns == "witness" and post == "pallas":
            emit = knobs.emit if knobs.emit is not None else "bytes"
            fields: List[Tuple[str, int]] = [
                ("flags", 6),
                ("masked_idsum", nsum),
            ]
            for d in range(n_defs):
                fields.append((f"states{d}", self.circuits[d].sb))
            if self._tiled:
                # tiled input: the post kernel reads the quad words and
                # assembles mask & chars in the packed domain — masked
                # chars ride the same byte-group emission instead of the
                # XLA mask*chars pass (which would need [B, L] chars).
                fields.append(("masked_characters_pre", 8))
            if emit != "planes" and all(nb <= 8 for _, nb in fields):
                if emit == "direct" and L_pad % 4 == 0:
                    self._emit = "direct"
                    self._dfields = fields
                else:
                    # "bytes" and "kdecode" share the byte-group post
                    # emission; kdecode swaps the XLA field decode for the
                    # light standalone decode KERNEL below.
                    self._emit = (
                        "kdecode"
                        if emit == "kdecode" and L_pad % 4 == 0
                        else "bytes"
                    )
                    groups: List[List[Tuple[str, int, int]]] = []
                    cur: List[Tuple[str, int, int]] = []
                    bits = 0
                    for name, nb in fields:
                        if bits + nb > 8:
                            groups.append(cur)
                            cur, bits = [], 0
                        cur.append((name, bits, nb))
                        bits += nb
                    if cur:
                        groups.append(cur)
                    self._wgroups = groups
                    self._p_total = P_total = len(groups) * 8
        if self._tiled and columns == "witness" and self._emit != "bytes":
            raise ValueError(
                f"input_layout='tiled' witness emission requires "
                f"emit='bytes' (resolved emit={self._emit!r})"
            )
        # bytes_mode gates the byte-group post emission, shared by "bytes"
        # (XLA decode) and "kdecode" (Pallas decode kernel).
        self._bytes_mode = self._emit in ("bytes", "kdecode")
        self._kdecode_mode = self._emit == "kdecode"
        self._direct_mode = self._emit == "direct"
        # Pre-dummied states (round 5): in bytes/direct/kdecode emission
        # the post kernel splices the dummy value into the state planes
        # where enable is off ((log & en) | (dummy_j & ~en) — two vops
        # per plane in the packed domain), so the XLA finish skips the
        # [B, n_defs, L+1] in_range where-pass over the states column
        # (~0.22 ms at B=32k x 1KB, tools/probe_tpu65.py s5c vs s5b).
        # Requires each def's dummy value to fit its sb state planes
        # (dummy = largest+1 <= dead, and dead is in the live set, so
        # this holds for every compiled model; gated defensively).
        self._predummy = (
            self._bytes_mode or self._direct_mode
        ) and all(
            int(model.dummy_states[d]).bit_length() <= self.circuits[d].sb
            for d in range(n_defs)
        )

        self._l4 = L_pad // 4 if L_pad % 4 == 0 else 0


        # ----- fb-only kernel (columns="match") -----
        # Match-only serving (corpus filtering / counting) needs none of
        # the witness columns: this kernel reduces each def's boundary
        # state straight from the log stack (+ enable plane) — the whole
        # "post + decode + assembly" tail collapses to a [B]-sized
        # verdict.  Pipeline traffic drops to ~2.8 B/input byte and the
        # serial scan becomes the only meaningful cost.

        # ----- standalone decode kernel (H2R_EMIT=kdecode) -----
        # Replaces the XLA tail's per-field transpose passes AND the masked-
        # chars pass with ONE light kernel: read the byte-group words once,
        # emit every field column (and mask*chars) as l4-packed int32 arrays
        # whose [B, L] uint8 views are zero-copy bitcast+reshape.  Unlike
        # the rejected "direct" mode (probe_tpu49), the tile transposes live
        # in their own kernel where they run at memcpy speed instead of
        # serializing the tag/FSM work (probe_tpu47/48).
        #
        # Layout: byte-group word w=(nws,lane) at byte lane s, group-word b
        # holds string 4*(nws*128+lane) + 4096*b + s (module header with
        # NW=1024), so grid cell (nws, b) owns the contiguous 512-string
        # row block 4096*b + 512*nws and its l4-packed output row is
        # 4*lane + s — string-major order falls out of the index map.
        self._fields_flat = [
            (name, gi, off_b, nb)
            for gi, grp in enumerate(self._wgroups)
            for (name, off_b, nb) in grp
        ]


        self._model_arrays = dict(
            accepted_states=jnp.asarray(model.accepted_states),
            accept_mask=jnp.asarray(model.accept_mask),
            dummy_states=jnp.asarray(model.dummy_states),
            dead_states=jnp.asarray(model.dead_states),
            first_states=jnp.asarray(model.first_states),
        )
        self._val_dtype = jnp.uint8 if compact else jnp.int32

        # core (a bound method, unjitted) works inside shard_map;
        # _run is the jitted entry.
        self._run = jax.jit(self.core)

    def _make_scan(
        self,
        circ: DefCircuits,
        NWS: int,
        fused_pack: bool = False,
        cls_off: int = 0,
    ):
        sb = circ.sb
        live = circ.live_states
        n_live = len(live)
        NT = min(self.nws_tile, NWS)
        while NWS % NT != 0:
            NT -= 1
        n_b = NWS // NT
        KIN = self._kp if (self.class_stage and not circ.fold_class) else 8

        def kern(bits_ref, out_ref, st_scr, *maybe_bits_scr):
            l = pl.program_id(1)

            if fused_pack:
                bits_scr = maybe_bits_scr[0]
                qmask = jnp.int32(_QUAD_MASK)
                for j in range(8):
                    acc = None
                    for m in range(8):
                        v = ((bits_ref[:, m] >> j) & qmask) << m
                        acc = v if acc is None else acc | v
                    bits_scr[:, j] = acc
                plane_ref = bits_scr
            else:
                plane_ref = bits_ref

            @pl.when(l == 0)
            def _():
                for j, s in enumerate(live):
                    st_scr[j] = jnp.full(
                        (NT, LANE),
                        -1 if s == circ.first_state else 0,
                        jnp.int32,
                    )

            carry0 = tuple(st_scr[j] for j in range(n_live))

            def body(i, carry):
                if circ.fold_class:
                    env = {
                        f"byte_bit{j}": plane_ref[i, j] for j in range(8)
                    }
                else:
                    env = {
                        name: plane_ref[i, cls_off + c]
                        for c, name in enumerate(circ.class_plane_names)
                    }
                env.update(
                    {f"st{s}": carry[j] for j, s in enumerate(live)}
                )
                out = circ.step_prog.run(env)
                for j in range(sb):
                    out_ref[:, j, i] = out[f"log{j}"]
                return tuple(out[f"nst{s}"] for s in live)

            final = _fori_unrolled(self.lc, body, carry0, self.unroll)
            for j in range(n_live):
                st_scr[j] = final[j]

        scratch = [pltpu.VMEM((n_live, NT, LANE), jnp.int32)]
        if fused_pack:
            scratch.append(pltpu.VMEM((self.lc, 8, NT, LANE), jnp.int32))
        return pl.pallas_call(
            kern,
            grid=(n_b, self._n_l),
            in_specs=[
                pl.BlockSpec(
                    (self.lc, KIN, NT, LANE),
                    lambda b, l: (l, 0, b, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            # NWS-major output: downstream packed-domain stages tile the
            # word-group axis, and (self.L, LANE) minor dims satisfy Mosaic's
            # (8, 128) block-divisibility rule at any NWS.
            out_specs=pl.BlockSpec(
                (NT, sb, self.lc, LANE),
                lambda b, l: (b, 0, l, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (NWS, sb, self.L_pad, LANE), jnp.int32
            ),
            scratch_shapes=scratch,
            interpret=self.interpret,
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=self._vmem_limit
            ),
        )

    def _make_scan_fused(self, NWS: int, fused_pack: bool = False):
        NT = min(self.nws_tile, NWS)
        while NWS % NT != 0:
            NT -= 1
        n_b = NWS // NT
        # _kp is 8 (byte planes) when self.class_stage is off — which
        # fused_pack forces — and the concatenated class-plane count
        # otherwise, so it is the input plane count in every mode.
        KIN = self._kp

        def kern(bits_ref, out_ref, st_scr, *maybe_bits_scr):
            l = pl.program_id(1)

            if fused_pack:
                bits_scr = maybe_bits_scr[0]
                qmask = jnp.int32(_QUAD_MASK)
                for j in range(8):
                    acc = None
                    for mm in range(8):
                        v = ((bits_ref[:, mm] >> j) & qmask) << mm
                        acc = v if acc is None else acc | v
                    bits_scr[:, j] = acc
                plane_ref = bits_scr
            else:
                plane_ref = bits_ref

            # carry layout: def-major one-hot planes
            live_off = []
            off_c = 0
            for c in self.circuits:
                live_off.append(off_c)
                off_c += len(c.live_states)
            n_carry = off_c

            @pl.when(l == 0)
            def _():
                for d, c in enumerate(self.circuits):
                    for j, s in enumerate(c.live_states):
                        st_scr[live_off[d] + j] = jnp.full(
                            (NT, LANE),
                            -1 if s == c.first_state else 0,
                            jnp.int32,
                        )

            carry0 = tuple(st_scr[j] for j in range(n_carry))

            def body(i, carry):
                nxt: List = []
                for d, c in enumerate(self.circuits):
                    if c.fold_class:
                        env = {
                            f"byte_bit{j}": plane_ref[i, j]
                            for j in range(8)
                        }
                    else:
                        env = {
                            name: plane_ref[i, self._cls_off[d] + j]
                            for j, name in enumerate(c.class_plane_names)
                        }
                    env.update(
                        {
                            f"st{s}": carry[live_off[d] + j]
                            for j, s in enumerate(c.live_states)
                        }
                    )
                    out = c.step_prog.run(env)
                    for j in range(c.sb):
                        out_ref[:, self._sb_off[d] + j, i] = out[f"log{j}"]
                    nxt.extend(out[f"nst{s}"] for s in c.live_states)
                return tuple(nxt)

            final = _fori_unrolled(self.lc, body, carry0, self.unroll)
            for j in range(n_carry):
                st_scr[j] = final[j]

        n_carry_total = sum(len(c.live_states) for c in self.circuits)
        scratch = [pltpu.VMEM((n_carry_total, NT, LANE), jnp.int32)]
        if fused_pack:
            scratch.append(pltpu.VMEM((self.lc, 8, NT, LANE), jnp.int32))
        return pl.pallas_call(
            kern,
            grid=(n_b, self._n_l),
            in_specs=[
                pl.BlockSpec(
                    (self.lc, KIN, NT, LANE),
                    lambda b, l: (l, 0, b, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (NT, self._sb_sum, self.lc, LANE),
                lambda b, l: (b, 0, l, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (NWS, self._sb_sum, self.L_pad, LANE), jnp.int32
            ),
            scratch_shapes=scratch,
            interpret=self.interpret,
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=self._vmem_limit
            ),
        )

    def _make_pack(self, NWS: int):
        NT = min(self.nws_tile, NWS)
        while NWS % NT != 0:
            NT -= 1
        KOUT = self._kp if self.class_stage else 8

        def kern(*refs):
            if self._en_in_pack:
                r_ref, len_ref, out_ref, en_ref = refs
            else:
                r_ref, out_ref = refs
            mask = jnp.int32(_QUAD_MASK)
            planes = []
            for j in range(8):
                acc = None
                for m in range(8):
                    v = ((r_ref[:, m] >> j) & mask) << m
                    acc = v if acc is None else acc | v
                planes.append(acc)
            if self.class_stage:
                # run each def's byte->class circuit position-parallel
                # (moves the class BDD off the scan's serial chain)
                env = {f"byte_bit{j}": planes[j] for j in range(8)}
                for d, circ in enumerate(self.circuits):
                    out = circ.class_prog.run(env)
                    for c, name in enumerate(circ.class_plane_names):
                        out_ref[:, self._cls_off[d] + c] = out[name]
            else:
                for j in range(8):
                    out_ref[:, j] = planes[j]
            if self._en_in_pack:
                l = pl.program_id(1)
                pos = l * self._plc + jax.lax.broadcasted_iota(
                    jnp.int32, (NT, self._plc, LANE), 1
                )
                lv = len_ref[...]  # [NT, LANE, 32]
                acc = None
                for beta in range(32):
                    # static slice + trailing-1 reshape (a no-op
                    # relayout), NOT integer indexing: int+newaxis
                    # indexing lowers to a >2D gather, which this
                    # Mosaic rejects (probe58_quick r4 traceback).
                    lvb = jax.lax.slice_in_dim(
                        lv, beta, beta + 1, axis=2
                    ).reshape(NT, 1, LANE)
                    bit = (pos < lvb).astype(jnp.int32) << beta
                    acc = bit if acc is None else acc | bit
                en_ref[...] = acc

        in_specs = [
            pl.BlockSpec(
                (self._plc, 8, NT, LANE),
                lambda b, l: (l, 0, b, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_specs = pl.BlockSpec(
            (self._plc, KOUT, NT, LANE),
            lambda b, l: (l, 0, b, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (self.L_pad, KOUT, NWS, LANE), jnp.int32
        )
        if self._en_in_pack:
            in_specs.append(
                pl.BlockSpec(
                    (NT, LANE, 32),
                    lambda b, l: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            out_specs = [
                out_specs,
                pl.BlockSpec(
                    (NT, self._plc, LANE),
                    lambda b, l: (b, l, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            out_shape = [
                out_shape,
                jax.ShapeDtypeStruct((NWS, self.L_pad, LANE), jnp.int32),
            ]
        return pl.pallas_call(
            kern,
            grid=(NWS // NT, self.L_pad // self._plc),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=self._vmem_limit
            ),
        )

    def _make_qpack(self, NWS: int):
        NT = min(self.nws_tile, NWS)
        while NWS % NT != 0:
            NT -= 1
        W = NT * LANE
        KOUT = self._kp if self.class_stage else 8

        def kern(*refs):
            if self._en_in_pack:
                ch_ref, len_ref, out_ref, en_ref = refs
            else:
                ch_ref, out_ref = refs
            ch = ch_ref[...].astype(jnp.int32)  # [8, W, 4, self._plc]
            mask = jnp.int32(_QUAD_MASK)
            planes = [None] * 8
            for m in range(8):
                word = None
                for s2 in range(4):
                    v = ch[m, :, s2, :] << (8 * s2)
                    word = v if word is None else word | v
                Rm = jnp.swapaxes(word, 0, 1)  # [self._plc, W]
                for j in range(8):
                    v = ((Rm >> j) & mask) << m
                    planes[j] = v if planes[j] is None else planes[j] | v
            # planes[j]: [self._plc, W] == [self._plc, NT*LANE]; out block wants
            # (self._plc, KOUT, NT, LANE)
            def shaped(p):
                return p.reshape(self._plc, NT, LANE)

            if self.class_stage:
                env = {f"byte_bit{j}": planes[j] for j in range(8)}
                for d, circ in enumerate(self.circuits):
                    out = circ.class_prog.run(env)
                    for c, name in enumerate(circ.class_plane_names):
                        out_ref[:, self._cls_off[d] + c] = shaped(out[name])
            else:
                for j in range(8):
                    out_ref[:, j] = shaped(planes[j])
            if self._en_in_pack:
                l = pl.program_id(1)
                pos = l * self._plc + jax.lax.broadcasted_iota(
                    jnp.int32, (NT, self._plc, LANE), 1
                )
                lv = len_ref[...]
                acc = None
                for beta in range(32):
                    # slice + no-op reshape, not int indexing (>2D
                    # gather is rejected by this Mosaic — see
                    # make_pack above)
                    lvb = jax.lax.slice_in_dim(
                        lv, beta, beta + 1, axis=2
                    ).reshape(NT, 1, LANE)
                    bit = (pos < lvb).astype(jnp.int32) << beta
                    acc = bit if acc is None else acc | bit
                en_ref[...] = acc

        in_specs = [
            pl.BlockSpec(
                (8, W, 4, self._plc),
                lambda b, l: (0, b, 0, l),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_specs = pl.BlockSpec(
            (self._plc, KOUT, NT, LANE),
            lambda b, l: (l, 0, b, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (self.L_pad, KOUT, NWS, LANE), jnp.int32
        )
        if self._en_in_pack:
            in_specs.append(
                pl.BlockSpec(
                    (NT, LANE, 32),
                    lambda b, l: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            out_specs = [
                out_specs,
                pl.BlockSpec(
                    (NT, self._plc, LANE),
                    lambda b, l: (b, l, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            out_shape = [
                out_shape,
                jax.ShapeDtypeStruct((NWS, self.L_pad, LANE), jnp.int32),
            ]
        return pl.pallas_call(
            kern,
            grid=(NWS // NT, self.L_pad // self._plc),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=self._vmem_limit
            ),
        )

    def _make_tpack(self, NWS: int):
        """Pack kernel for the pretiled input contract (input_layout=
        "tiled"): the host hands over [NWS, 8m, L_pad, LANE] int32 quad
        words (``tile_corpus``), so every block read here is a fully
        contiguous (L-chunk, LANE) slab — the [B, L] u8 read that caps
        qpack ~3x off its floor is inherently strided (docs/ROADMAP.md
        item 2).  Same outputs as qpack with en_pack on: the bits_stack
        (byte-bit or class planes) plus the enable plane, which tiled
        mode always computes in-kernel."""
        NT = min(self.nws_tile, NWS)
        while NWS % NT != 0:
            NT -= 1
        KOUT = self._kp if self.class_stage else 8

        def kern(t_ref, len_ref, out_ref, en_ref):
            mask = jnp.int32(_QUAD_MASK)
            planes = [None] * 8
            for m in range(8):
                Tm = t_ref[:, m]  # [NT, self._plc, LANE] quad words
                for j in range(8):
                    v = ((Tm >> j) & mask) << m
                    planes[j] = v if planes[j] is None else planes[j] | v

            def shaped(p):  # [NT, plc, LANE] -> out block (plc, NT, LANE)
                return jnp.swapaxes(p, 0, 1)

            if self.class_stage:
                env = {f"byte_bit{j}": planes[j] for j in range(8)}
                for d, circ in enumerate(self.circuits):
                    out = circ.class_prog.run(env)
                    for c, name in enumerate(circ.class_plane_names):
                        out_ref[:, self._cls_off[d] + c] = shaped(out[name])
            else:
                for j in range(8):
                    out_ref[:, j] = shaped(planes[j])
            l = pl.program_id(1)
            pos = l * self._plc + jax.lax.broadcasted_iota(
                jnp.int32, (NT, self._plc, LANE), 1
            )
            lv = len_ref[...]  # [NT, LANE, 32]
            acc = None
            for beta in range(32):
                # static slice + no-op reshape, not int indexing (>2D
                # gather is rejected by this Mosaic — see _make_pack)
                lvb = jax.lax.slice_in_dim(
                    lv, beta, beta + 1, axis=2
                ).reshape(NT, 1, LANE)
                bit = (pos < lvb).astype(jnp.int32) << beta
                acc = bit if acc is None else acc | bit
            en_ref[...] = acc

        in_specs = [
            pl.BlockSpec(
                (NT, 8, self._plc, LANE),
                lambda b, l: (b, 0, l, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (NT, LANE, 32),
                lambda b, l: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_specs = [
            pl.BlockSpec(
                (self._plc, KOUT, NT, LANE),
                lambda b, l: (l, 0, b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (NT, self._plc, LANE),
                lambda b, l: (b, l, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            jax.ShapeDtypeStruct(
                (self.L_pad, KOUT, NWS, LANE), jnp.int32
            ),
            jax.ShapeDtypeStruct((NWS, self.L_pad, LANE), jnp.int32),
        ]
        return pl.pallas_call(
            kern,
            grid=(NWS // NT, self.L_pad // self._plc),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=self._vmem_limit
            ),
        )

    def _make_post(self, NWS: int):
        # All arrays lead with the word-group (NWS) axis so blocks end
        # in (self.L_pad, LANE) — Mosaic requires the last two block dims be
        # (multiple of 8, multiple of 128) or the full array dims.
        sbs = [c.sb for c in self.circuits]

        soff = self._sb_off

        def kern(*refs):
            log_ref = refs[0]  # fused [*, self._sb_sum, self.L_pad, LANE] stack
            en_ref = refs[1]
            # tiled input inserts the quad-word block after the inputs
            # (tiled implies bytes emission, so out/fb always follow)
            t_ref = refs[2] if self._tiled else None
            rest = refs[3:] if self._tiled else refs[2:]
            out_ref = rest[0] if not self._direct_mode else None
            fb_ref = rest[1] if self._bytes_mode else None
            out_refs = rest
            en = en_ref[0, 0]  # [self.L_pad, LANE]
            zrow = jnp.zeros((1, LANE), jnp.int32)

            def put(name, planes):
                if self._direct_mode or name not in self._post_off:
                    return
                o, nb = self._post_off[name]
                for j in range(nb):
                    out_ref[0, o + j] = (
                        planes[j] if j < len(planes) else jnp.zeros_like(en)
                    )

            ids_sum = None
            start_any = None
            endf_any = None
            for d, circ in enumerate(self.circuits):
                nxt = [log_ref[0, soff[d] + j] for j in range(sbs[d])]
                first_bits = [
                    jnp.full(
                        (1, LANE),
                        -1 if (circ.first_state >> j) & 1 else 0,
                        jnp.int32,
                    )
                    for j in range(sbs[d])
                ]
                prv = [
                    jnp.concatenate(
                        [first_bits[j], nxt[j][: self.L_pad - 1]], 0
                    )
                    for j in range(sbs[d])
                ]
                env = {f"prev{j}": prv[j] for j in range(sbs[d])}
                env.update({f"next{j}": nxt[j] for j in range(sbs[d])})
                tag = circ.tag_prog.run(env)
                idp = [tag[f"id{j}"] & en for j in range(self.idb)]
                stp = tag["is_start"] & en
                efp = tag["is_end"] & en
                put(f"ids{d}", idp)
                put(f"start{d}", [stp])
                put(f"endf{d}", [efp])
                if ids_sum is None:
                    ids_sum, start_any, endf_any = list(idp), stp, efp
                else:
                    ids_sum = plane_add(
                        ids_sum, idp, self.idb + d.bit_length() + 1
                    )
                    start_any = start_any | stp
                    endf_any = endf_any | efp
            put("idsum", ids_sum)
            put("start_any", [start_any])
            put("endf_any", [endf_any])

            # forward FSM (src/lib.rs:598-645)
            prev_sum = [
                jnp.concatenate([zrow, p[: self.L_pad - 1]], 0) for p in ids_sum
            ]
            changed = None
            for a, b in zip(ids_sum, prev_sum):
                x = a ^ b
                changed = x if changed is None else (changed | x)
            prev_endf = jnp.concatenate([zrow, endf_any[: self.L_pad - 1]], 0)
            is_set = start_any & changed
            is_reset = ~start_any & prev_endf & changed
            fwd = _fsm_log_scan(~(is_set | is_reset), is_set, reverse=False)

            # backward FSM (src/lib.rs:663-714)
            next_sum = [
                jnp.concatenate([p[1:], zrow], 0) for p in ids_sum
            ]
            changed_b = None
            for a, b in zip(ids_sum, next_sum):
                x = a ^ b
                changed_b = x if changed_b is None else (changed_b | x)
            next_start = jnp.concatenate([start_any[1:], zrow], 0)
            set_b = endf_any & changed_b
            reset_b = ~endf_any & next_start & changed_b
            bwd = _fsm_log_scan(~(set_b | reset_b), set_b, reverse=True)
            mask = fwd & bwd
            if self._bytes_mode or self._direct_mode:
                avail: Dict[str, List[jnp.ndarray]] = {
                    "flags": [mask, fwd, bwd, en, start_any, endf_any],
                    "masked_idsum": [p & mask for p in ids_sum],
                }
                for d in range(self.n_defs):
                    if self._predummy:
                        # dummy spliced in where enable is off, so the
                        # emitted states column is final (no XLA where)
                        dummy = int(self.model.dummy_states[d])
                        planes = []
                        for j in range(sbs[d]):
                            p = log_ref[0, soff[d] + j] & en
                            if (dummy >> j) & 1:
                                p = p | ~en
                            planes.append(p)
                        avail[f"states{d}"] = planes
                    else:
                        avail[f"states{d}"] = [
                            log_ref[0, soff[d] + j] for j in range(sbs[d])
                        ]
                if self._tiled:
                    # masked chars in the packed domain: extract the 8
                    # byte-bit planes from this word group's quad words
                    # (same quad-mask OR as the pack kernels) and AND
                    # with the FSM mask — replaces the XLA mask*chars
                    # pass, which would need string-major [B, L] chars.
                    T = t_ref[0]  # [8m, self.L_pad, LANE] int32
                    qm = jnp.int32(_QUAD_MASK)
                    mcp = []
                    for j in range(8):
                        acc = None
                        for m in range(8):
                            v = ((T[m] >> j) & qm) << m
                            acc = v if acc is None else acc | v
                        mcp.append(acc & mask)
                    avail["masked_characters_pre"] = mcp
            if self._direct_mode:
                # one l4-packed [B, self.L]-major int32 array per field:
                # byte-lane words -> per-m (LANE*4, self._l4) blocks whose
                # flat order is the final string order (m, nws, lane,
                # s) with positions packed 4-per-int32 (probe_tpu48)
                for fi, (name, _nb) in enumerate(self._dfields):
                    planes = list(avail[name])
                    planes += [jnp.zeros_like(en)] * (8 - len(planes))
                    words = transpose8_planes(planes)
                    for m in range(8):
                        rows = words[m].reshape(self._l4, 4, LANE)
                        qs_t = []
                        for s in range(4):
                            acc = None
                            for j in range(4):
                                v = (rows[:, j] >> (8 * s)) & 0xFF
                                v = v << (8 * j)
                                acc = v if acc is None else acc | v
                            qs_t.append(jnp.swapaxes(acc, 0, 1))
                        out_refs[fi][m, 0] = jnp.stack(
                            qs_t, axis=1
                        ).reshape(LANE * 4, self._l4)
            elif self._bytes_mode:
                for gi, grp in enumerate(self._wgroups):
                    planes: List[jnp.ndarray] = []
                    for name, _off_b, _nb in grp:
                        planes += avail[name]
                    planes += [jnp.zeros_like(en)] * (8 - len(planes))
                    words = transpose8_planes(planes)
                    for b in range(8):
                        out_ref[0, gi * 8 + b] = words[b]
                # Final-state boundary planes: per def the log bits of
                # the state AFTER the last enabled byte (first state
                # for empty strings) — replaces the XLA take_along
                # gather and lets match_ok skip the states decode.
                en_next = jnp.concatenate([en[1:], zrow], 0)
                bnd = en & ~en_next  # last enabled position per string
                empty = ~en[0]  # [LANE]
                for d, circ in enumerate(self.circuits):
                    for j in range(8):
                        if j < sbs[d]:
                            x = bnd & log_ref[0, soff[d] + j]
                            while x.shape[0] > 1:
                                half = x.shape[0] // 2
                                y = x[:half] | x[half : 2 * half]
                                if x.shape[0] % 2:
                                    y = jnp.concatenate(
                                        [y[:1] | x[-1:], y[1:]], 0
                                    )
                                x = y
                            first_j = jnp.int32(
                                -1 if (circ.first_state >> j) & 1 else 0
                            )
                            fb_ref[0, d, j] = x[0] | (empty & first_j)
                        else:
                            fb_ref[0, d, j] = jnp.zeros(
                                (LANE,), jnp.int32
                            )
            else:
                put("fwd", [fwd])
                put("bwd", [bwd])
                put("mask", [mask])
                put("masked_idsum", [p & mask for p in ids_sum])

        in_specs = [
            pl.BlockSpec(
                (1, self._sb_sum, self.L_pad, LANE),
                lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, self.L_pad, LANE),
                lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        if self._tiled:
            in_specs.append(
                pl.BlockSpec(
                    (1, 8, self.L_pad, LANE),
                    lambda b: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        if self._direct_mode:
            out_specs = [
                pl.BlockSpec(
                    (8, 1, LANE * 4, self._l4),
                    lambda b: (0, b, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                for _ in self._dfields
            ]
            out_shape = [
                jax.ShapeDtypeStruct((8, NWS, LANE * 4, self._l4), jnp.int32)
                for _ in self._dfields
            ]
        else:
            out_specs = pl.BlockSpec(
                (1, self._p_total, self.L_pad, LANE),
                lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            out_shape = jax.ShapeDtypeStruct(
                (NWS, self._p_total, self.L_pad, LANE), jnp.int32
            )
            if self._bytes_mode:
                out_specs = [
                    out_specs,
                    pl.BlockSpec(
                        (1, self.n_defs, 8, LANE),
                        lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ]
                out_shape = [
                    out_shape,
                    jax.ShapeDtypeStruct(
                        (NWS, self.n_defs, 8, LANE), jnp.int32
                    ),
                ]
        return pl.pallas_call(
            kern,
            grid=(NWS,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=self._vmem_limit
            ),
        )

    def _make_fb_only(self, NWS: int):
        sbs = [c.sb for c in self.circuits]
        soff = self._sb_off

        def kern(log_ref, en_ref, fb_ref):
            en = en_ref[0, 0]
            zrow = jnp.zeros((1, LANE), jnp.int32)
            en_next = jnp.concatenate([en[1:], zrow], 0)
            bnd = en & ~en_next
            empty = ~en[0]
            for d, circ in enumerate(self.circuits):
                for j in range(8):
                    if j < sbs[d]:
                        x = bnd & log_ref[0, soff[d] + j]
                        while x.shape[0] > 1:
                            half = x.shape[0] // 2
                            y = x[:half] | x[half : 2 * half]
                            if x.shape[0] % 2:
                                y = jnp.concatenate(
                                    [y[:1] | x[-1:], y[1:]], 0
                                )
                            x = y
                        first_j = jnp.int32(
                            -1 if (circ.first_state >> j) & 1 else 0
                        )
                        fb_ref[0, d, j] = x[0] | (empty & first_j)
                    else:
                        fb_ref[0, d, j] = jnp.zeros((LANE,), jnp.int32)

        return pl.pallas_call(
            kern,
            grid=(NWS,),
            in_specs=[
                pl.BlockSpec(
                    (1, self._sb_sum, self.L_pad, LANE),
                    lambda b: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, self.L_pad, LANE),
                    lambda b: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, self.n_defs, 8, LANE),
                lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (NWS, self.n_defs, 8, LANE), jnp.int32
            ),
            interpret=self.interpret,
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=self._vmem_limit
            ),
        )

    def _make_decode(self, NWS: int):
        G = len(self._wgroups)
        n_fields = len(self._fields_flat)

        def kern(g_ref, ch_ref, *out_refs):
            def to_rows(v):
                # [self.L_pad, LANE] byte-lane words -> [512, self._l4] l4-packed
                rows = v.reshape(self._l4, 4, LANE)
                qs = []
                for s2 in range(4):
                    acc = None
                    for j in range(4):
                        b8 = (rows[:, j] >> (8 * s2)) & 0xFF
                        b8 = b8 << (8 * j)
                        acc = b8 if acc is None else acc | b8
                    qs.append(jnp.swapaxes(acc, 0, 1))  # [LANE, self._l4]
                return jnp.stack(qs, axis=1).reshape(LANE * 4, self._l4)

            flags_rows = None
            for fi, (name, gi, off_b, nb) in enumerate(self._fields_flat):
                w = g_ref[0, gi, 0]
                maskrep = jnp.int32(((1 << nb) - 1) * 0x01010101)
                v = (w >> off_b) & maskrep
                r = to_rows(v)
                out_refs[fi][...] = r
                if name == "flags":
                    flags_rows = r
            # masked chars = chars & 0xFF-expanded mask bit (flags bit 0)
            mask4 = flags_rows & jnp.int32(0x01010101)
            maskff = mask4 * 255
            out_refs[n_fields][...] = ch_ref[...] & maskff

        # string-major row block: g = 512*(b*NWS + nws) + 4*lane + s
        row_map = lambda nws, b: (b * NWS + nws, 0)
        return pl.pallas_call(
            kern,
            grid=(NWS, 8),
            in_specs=[
                pl.BlockSpec(
                    (1, G, 1, self.L_pad, LANE),
                    lambda nws, b: (nws, 0, b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (LANE * 4, self._l4), row_map, memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (LANE * 4, self._l4), row_map, memory_space=pltpu.VMEM
                )
            ]
            * (n_fields + 1),
            out_shape=[
                jax.ShapeDtypeStruct((NWS * LANE * 32, self._l4), jnp.int32)
            ]
            * (n_fields + 1),
            interpret=self.interpret,
            compiler_params=None
            if self.interpret
            else pltpu.CompilerParams(
                vmem_limit_bytes=self._vmem_limit
            ),
        )

    def _final_from_fb(self, fb, B):
        """[NWS, self.n_defs, 8, LANE] boundary log planes -> final state
        [B, self.n_defs] (the packed-domain replacement for the take_along
        gather; bit beta = 8s+m of word w is string 4*(w + NW*m) + s,
        so per-def values reorder as (m, w, s))."""
        NW = B // 32
        beta = jnp.arange(32, dtype=jnp.int32)
        bits = (fb[:, :, :, :, None] >> beta) & 1
        shifts = jnp.arange(8, dtype=jnp.int32)
        vals_wb = (bits << shifts[None, None, :, None, None]).sum(
            axis=2
        )  # [NWS, self.n_defs, LANE, 32]
        cols = []
        for d in range(self.n_defs):
            v = vals_wb[:, d].reshape(NW, 4, 8)
            cols.append(v.transpose(2, 0, 1).reshape(B))
        return jnp.stack(cols, axis=1)

    def core(self, chars, lengths):
        if self._tiled:
            return self._core_tiled(chars, lengths)
        B, Lin = chars.shape
        assert Lin == self.L
        # whole packed words need B % (32*LANE) == 0; pad in-graph and
        # slice the outputs back (callers may invoke run/core directly,
        # e.g. under shard_map or benchmark harnesses)
        B_orig = B
        tile = 32 * LANE
        if B % tile != 0:
            pad = tile - B % tile
            chars = jnp.pad(chars, ((0, pad), (0, 0)))
            lengths = jnp.pad(lengths, (0, pad))
            B = B + pad
        NW = B // 32
        NWS = NW // LANE

        # 1. pack byte bit-planes -> kernel input stack (bitcast view
        # in XLA; plane extraction in the pack kernel, or fused into
        # the scan kernel's prologue for single-def models)
        R = raw_quads(chars, self.L_pad).reshape(self.L_pad, 8, NWS, LANE)

        # enable plane (pos < length) in the packed NWS-major domain.
        # bit beta = 8s+m of word w belongs to string 4*(w + NW*m) + s,
        # so the per-word length table is lengths viewed (m, w, s) and
        # reordered to (w, beta).
        pos = jnp.arange(self.L, dtype=jnp.int32)
        enable_bl = pos[None, :] < lengths[:, None]  # [B, self.L] bool
        len_wb = (
            lengths.reshape(8, NW, 4)
            .transpose(1, 2, 0)
            .reshape(NWS, LANE, 32)
        )
        if self.fuse_pack:
            bits_stack = R  # raw quads; scan kernel extracts in VMEM
        elif self._qpack:
            # raw_quads fused into the pack kernel: read the [B, self.L]
            # chars via the pure-view [8m, NW, 4s, self.L] reshape
            ch_v = chars.reshape(8, NW, 4, self.L)
            if self._en_in_pack:
                bits_stack, en_plane = self._make_qpack(NWS)(ch_v, len_wb)
            else:
                bits_stack = self._make_qpack(NWS)(ch_v)
        elif self._en_in_pack:
            # pack kernel computes byte/class planes AND the enable
            # plane (H2R_EN_PACK=1), replacing the XLA pass below
            bits_stack, en_plane = self._make_pack(NWS)(R, len_wb)
        else:
            bits_stack = self._make_pack(NWS)(R)  # [self.L_pad, 8, NWS, LANE]
        if self.fuse_pack or not self._en_in_pack:
            beta = jnp.arange(32, dtype=jnp.int32)
            en_bits = (
                jnp.arange(self.L_pad, dtype=jnp.int32)[None, :, None, None]
                < len_wb[:, None]
            ).astype(jnp.int32) << beta
            en_plane = en_bits.sum(-1, dtype=jnp.int32)  # [NWS, self.L_pad, LANE]

        # 2. fused scan kernel: all defs' step circuits in one pass
        # over the plane stack (single read; cross-def chain ILP)
        logs_stack = self._make_scan_fused(NWS, fused_pack=self.fuse_pack)(
            bits_stack
        )  # [NWS, self._sb_sum, self.L_pad, LANE]
        logs_per_def = [
            logs_stack[:, self._sb_off[d] : self._sb_off[d] + c.sb]
            for d, c in enumerate(self.circuits)
        ]

        if self.columns == "match":
            return self._finish_match(logs_stack, en_plane, B, B_orig)

        vals, planes_of, fb = self._post_decode(
            chars, B, NWS, logs_stack, logs_per_def, en_plane
        )
        if self.columns == "witness":
            return self._finish_witness(
                chars, lengths, B, B_orig, vals, planes_of, fb,
                logs_per_def, en_plane,
            )
        return self._finish_full(
            chars, lengths, B, B_orig, enable_bl, planes_of, logs_per_def
        )
    def _core_tiled(self, tiled, lengths):
        """Pipeline entry for the pretiled input contract: ``tiled`` is
        the [NWS, 8, L_pad, LANE] int32 quad-word buffer from
        ``tile_corpus`` (B = NWS*32*LANE strings); ``lengths`` may be
        shorter than B (host batch padding is part of the contract —
        trailing strings beyond len(lengths) are treated as empty and
        sliced off the outputs)."""
        NWS, _m8, Lp, _lane = tiled.shape
        assert _m8 == 8 and _lane == LANE and Lp == self.L_pad, (
            f"tiled input {tiled.shape}: expected "
            f"[NWS, 8, {self.L_pad}, {LANE}] (see tile_corpus)"
        )
        B = NWS * 32 * LANE
        B_orig = lengths.shape[0]
        if B_orig != B:
            assert B_orig < B, (
                f"lengths ({B_orig}) exceed the tiled batch ({B})"
            )
            lengths = jnp.pad(lengths, (0, B - B_orig))
        NW = B // 32
        len_wb = (
            lengths.reshape(8, NW, 4)
            .transpose(1, 2, 0)
            .reshape(NWS, LANE, 32)
        )
        bits_stack, en_plane = self._make_tpack(NWS)(tiled, len_wb)
        logs_stack = self._make_scan_fused(NWS)(bits_stack)
        logs_per_def = [
            logs_stack[:, self._sb_off[d] : self._sb_off[d] + c.sb]
            for d, c in enumerate(self.circuits)
        ]
        if self.columns == "match":
            return self._finish_match(logs_stack, en_plane, B, B_orig)
        vals, planes_of, fb = self._post_decode(
            None, B, NWS, logs_stack, logs_per_def, en_plane, tiled=tiled
        )
        return self._finish_witness(
            None, lengths, B, B_orig, vals, planes_of, fb,
            logs_per_def, en_plane,
        )

    def _finish_match(self, logs_stack, en_plane, B, B_orig):
        """columns="match" serving: reduce each def's boundary state
        straight to the [B]-sized verdicts (no witness columns)."""
        NWS = logs_stack.shape[0]
        fbm = self._make_fb_only(NWS)(logs_stack, en_plane[:, None])
        final = self._final_from_fb(fbm, B)
        accepted = self._model_arrays["accept_mask"][
            jnp.arange(self.n_defs)[None, :], final
        ]
        has_dead = final == self._model_arrays["dead_states"][None, :]
        out = dict(
            final_states=final,
            accepted=accepted,
            has_dead=has_dead,
            match_ok=accepted.all(axis=1) & (~has_dead.any(axis=1)),
        )
        if B_orig != B:
            out = {k: v[:B_orig] for k, v in out.items()}
        return out

    def _post_decode(self, chars, B, NWS, logs_stack, logs_per_def,
                     en_plane, tiled=None):
        """Stages 3+4: tag + id-sum + mask FSMs, then the per-mode
        field decode.  direct/kdecode/bytes modes fill ``vals`` (final
        [B, L] columns); plane modes return a ``planes_of`` accessor;
        ``fb`` is the final-state boundary plane set when the post
        kernel emitted it."""
        fb = None  # final-state boundary planes (bytes/kdecode posts)
        vals = None
        planes_of = None
        if self._direct_mode:
            # Post kernel wrote l4-packed [B, self.L]-major int32 per field
            # — the [B, self.L] uint8 column is a zero-copy bitcast+reshape
            # (flat order (m, nws, lane, s, l4, byte) IS string-major).
            outs = self._make_post(NWS)(logs_stack, en_plane[:, None])
            vals = {}
            for (name, _nb), arr in zip(self._dfields, outs):
                u8 = jax.lax.bitcast_convert_type(arr, jnp.uint8)
                col = u8.reshape(B, self.L_pad)
                vals[name] = col[:, :self.L] if self.L_pad != self.L else col
        elif self._kdecode_mode:
            # Post emits byte-group words; the decode KERNEL emits all
            # field columns + masked chars as l4-packed string-major
            # int32 — the uint8 view is a zero-copy bitcast+reshape.
            g4, fb = self._make_post(NWS)(logs_stack, en_plane[:, None])
            G = len(self._wgroups)
            chars_pad = (
                chars if self.L_pad == self.L else jnp.pad(chars, ((0, 0), (0, self.L_pad - self.L)))
            )
            ch_l4 = jax.lax.bitcast_convert_type(
                chars_pad.reshape(B, self._l4, 4), jnp.int32
            )
            outs = self._make_decode(NWS)(
                g4.reshape(NWS, G, 8, self.L_pad, LANE), ch_l4
            )
            vals = {}
            for (name, _gi, _off, _nb), arr in zip(self._fields_flat, outs):
                u8 = jax.lax.bitcast_convert_type(arr, jnp.uint8).reshape(
                    B, self.L_pad
                )
                vals[name] = u8 if self.L_pad == self.L else u8[:, :self.L]
            mc = jax.lax.bitcast_convert_type(outs[-1], jnp.uint8).reshape(
                B, self.L_pad
            )
            vals["masked_characters_pre"] = mc if self.L_pad == self.L else mc[:, :self.L]
        elif self._bytes_mode:
            # Post kernel already assembled the final value bytes —
            # XLA only bitcasts int32 words to their four byte lanes
            # and transposes to string-major [B, self.L] order (bit beta =
            # 8s+b of word w is string 4*(w + NW*b) + s, so flat
            # string order is dims (b, nws, lane, s)).
            post_in = (logs_stack, en_plane[:, None]) + (
                (tiled,) if self._tiled else ()
            )
            g4, fb = self._make_post(NWS)(*post_in)
            G = len(self._wgroups)
            u8 = jax.lax.bitcast_convert_type(
                g4.reshape(NWS, G, 8, self.L_pad, LANE)[:, :, :, :self.L],
                jnp.uint8,
            )  # [NWS, G, 8, self.L, LANE, 4]
            vals = {}
            for gi, grp in enumerate(self._wgroups):
                arr = u8[:, gi]  # [NWS, 8, self.L, LANE, 4]
                for name, off_b, nb in grp:
                    # shift/mask fuses into the transpose; each field
                    # is written once in final [B, self.L] form with no
                    # combined intermediate.
                    v = (arr >> off_b) & ((1 << nb) - 1)
                    vals[name] = (
                        v.transpose(1, 0, 3, 4, 2).reshape(B, self.L)
                    )
        elif self._post_mode == "pallas":
            post_out = self._make_post(NWS)(logs_stack, en_plane[:, None])

            def planes_of(name):
                o, nb = self._post_off[name]
                return [post_out[:, o + j] for j in range(nb)]

        else:
            post_planes = _post_xla(
                self.circuits, logs_per_def, en_plane, self.idb, self.L_pad, NWS
            )

            def planes_of(name, pp=post_planes):
                return pp[name]
        return vals, planes_of, fb

    def _finish_witness(self, chars, lengths, B, B_orig, vals,
                        planes_of, fb, logs_per_def, en_plane):
        """Assemble the compact witness emission (the BASELINE
        ScanTraffic column set: states, masked ids, masked chars,
        packed flags, verdicts)."""
        if not (
            self._bytes_mode or self._direct_mode or self._kdecode_mode
        ):
            # Compact witness emission — the BASELINE ScanTraffic model
            # (~6 B per input byte): per-def uint8 state rows, masked
            # ids, masked chars, and ONE packed flags byte
            # (bit0 mask, 1 fwd, 2 bwd, 3 enable, 4 start-any,
            # 5 endf-any).  Full-column RegexResult stays the default.
            named = [
                (
                    "flags",
                    planes_of("mask")
                    + planes_of("fwd")
                    + planes_of("bwd")
                    + [en_plane]
                    + [planes_of("start_any")[0]]
                    + [planes_of("endf_any")[0]],
                ),
                ("masked_idsum", planes_of("masked_idsum")),
            ]
            for d in range(self.n_defs):
                named.append(
                    (
                        f"states{d}",
                        [
                            logs_per_def[d][:, j]
                            for j in range(self.circuits[d].sb)
                        ],
                    )
                )
            vals = unpack_groups(named, self.L)
        flags = vals["flags"]
        mask = flags & 1
        masked_chars_pre = vals.get("masked_characters_pre")
        if chars is None and masked_chars_pre is None:
            raise AssertionError(
                "tiled witness emission must decode masked chars from "
                "the post kernel (no string-major chars exist)"
            )
        chars_v = None if chars is None else chars.astype(jnp.uint8)
        after = jnp.stack(
            [vals[f"states{d}"] for d in range(self.n_defs)], axis=1
        )
        first = self._model_arrays["first_states"][None, :, None].astype(
            jnp.uint8
        )
        raw = jnp.concatenate(
            [jnp.broadcast_to(first, (B, self.n_defs, 1)), after], axis=2
        )
        if self._predummy:
            # post kernel already spliced dummy where enable is off
            # (column l+1 kept iff l+1 <= len iff en[l]; column 0 is the
            # first state, kept unconditionally — same as the where)
            states = raw
        else:
            posL1 = jnp.arange(self.L + 1, dtype=jnp.int32)
            in_range = posL1[None, None, :] <= lengths[:, None, None]
            dummy = self._model_arrays["dummy_states"][None, :, None].astype(
                jnp.uint8
            )
            states = jnp.where(in_range, raw, dummy)
        if fb is not None:
            # post kernel emitted the boundary log planes: no
            # gather, and match_ok is independent of the decode
            final = self._final_from_fb(fb, B)
        else:
            final = jnp.take_along_axis(
                raw,
                lengths[:, None, None]
                .repeat(self.n_defs, 1)
                .astype(jnp.int32),
                axis=2,
            )[:, :, 0].astype(jnp.int32)
        accepted = self._model_arrays["accept_mask"][
            jnp.arange(self.n_defs)[None, :], final
        ]
        has_dead = final == self._model_arrays["dead_states"][None, :]
        out = dict(
            states=states,
            all_substr_ids=vals["masked_idsum"],
            masked_characters=masked_chars_pre
            if masked_chars_pre is not None
            else mask * chars_v,
            flags=flags,
            mask=mask,
            accepted=accepted,
            has_dead=has_dead,
            match_ok=accepted.all(axis=1) & (~has_dead.any(axis=1)),
        )
        if B_orig != B:
            out = {k: v[:B_orig] for k, v in out.items()}
        return out

    def _finish_full(self, chars, lengths, B, B_orig, enable_bl,
                     planes_of, logs_per_def):
        """Assemble the full RegexResult column set (reference
        AssignedRegexResult parity, src/lib.rs:79-93)."""
        # 5. unpack: one grouped bit-expansion for everything
        named = [
            ("idsum", planes_of("idsum")),
            ("masked_idsum", planes_of("masked_idsum")),
            ("fwd", planes_of("fwd")),
            ("bwd", planes_of("bwd")),
            ("mask", planes_of("mask")),
        ]
        for d in range(self.n_defs):
            named.append(
                (
                    f"states{d}",
                    [
                        logs_per_def[d][:, j]
                        for j in range(self.circuits[d].sb)
                    ],
                )
            )
            named.append((f"ids{d}", planes_of(f"ids{d}")))
            named.append((f"start{d}", planes_of(f"start{d}")))
            named.append((f"endf{d}", planes_of(f"endf{d}")))
        vals = unpack_groups(named, self.L)

        enable = enable_bl.astype(self._val_dtype)
        chars_v = chars.astype(self._val_dtype) * enable
        fwd = vals["fwd"].astype(self._val_dtype)
        bwd = vals["bwd"].astype(self._val_dtype)
        mask = vals["mask"].astype(self._val_dtype)
        sum_dtype = self._val_dtype if self.nsum <= 8 else jnp.int32
        substr_id_sum = vals["idsum"].astype(sum_dtype)
        all_ids = vals["masked_idsum"].astype(sum_dtype)
        masked_chars = mask * chars_v

        states_list = []
        ids_list = []
        start_en_list = []
        end_en_list = []
        start_sum = None
        end_sum = None
        for d in range(self.n_defs):
            states_list.append(vals[f"states{d}"])  # int32 [B, self.L]
            ids_list.append(vals[f"ids{d}"].astype(self._val_dtype))
            st_v = vals[f"start{d}"].astype(self._val_dtype)
            ef_v = vals[f"endf{d}"].astype(self._val_dtype)
            start_en_list.append(st_v)
            end_en_list.append(ef_v)
            start_sum = st_v if start_sum is None else start_sum + st_v
            end_sum = ef_v if end_sum is None else end_sum + ef_v

        after = jnp.stack(states_list, axis=1)  # [B, self.n_defs, self.L]
        st_dtype = self._val_dtype if self.model.s_pad <= 255 else jnp.int32
        after = after.astype(st_dtype)
        first = self._model_arrays["first_states"][None, :, None].astype(st_dtype)
        raw = jnp.concatenate(
            [jnp.broadcast_to(first, (B, self.n_defs, 1)), after], axis=2
        )
        posL1 = jnp.arange(self.L + 1, dtype=jnp.int32)
        in_range = posL1[None, None, :] <= lengths[:, None, None]
        dummy = self._model_arrays["dummy_states"][None, :, None].astype(st_dtype)
        states = jnp.where(in_range, raw, dummy)

        final = jnp.take_along_axis(
            raw, lengths[:, None, None].repeat(self.n_defs, 1).astype(jnp.int32),
            axis=2,
        )[:, :, 0].astype(jnp.int32)
        accepted = self._model_arrays["accept_mask"][
            jnp.arange(self.n_defs)[None, :], final
        ]
        has_dead = final == self._model_arrays["dead_states"][None, :]

        zcol = jnp.zeros((B, 1), start_sum.dtype)
        is_start_sum = jnp.concatenate([start_sum, zcol], axis=1)
        is_end_sum = jnp.concatenate([zcol, end_sum], axis=1)

        out = dict(
            all_enable_flags=enable,
            all_characters=chars_v,
            all_substr_ids=all_ids,
            masked_characters=masked_chars,
            states=states,
            substr_ids_per_def=jnp.stack(ids_list, axis=1),
            start_enable=jnp.stack(start_en_list, axis=1),
            end_enable=jnp.stack(end_en_list, axis=1),
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
        if B_orig != B:
            out = {k: v[:B_orig] for k, v in out.items()}
        return out

    def __call__(self, chars, lengths):
        chars = jnp.asarray(
            chars, jnp.int32 if self._tiled else jnp.uint8
        )
        lengths = jnp.asarray(lengths, jnp.int32)
        out = self._run(chars, lengths)
        if self.columns in ("witness", "match"):
            return out  # emission dict (see constructor docstring)
        return RegexResult(**out)

    def scan_planes(self, bits_stack: jnp.ndarray, d: int = 0) -> jnp.ndarray:
        """Run just the sequential scan kernel for def ``d`` on a prepared
        plane stack [L_pad, KP, NWS, 128] (profiling hook).  KP is 8
        byte-bit planes when ``class_stage`` is off, or the concatenated
        per-def class planes when on — either way, feed the pack
        kernel's output: ``self._make_pack(NWS)(raw_quads(chars,
        self.L_pad).reshape(self.L_pad, 8, NWS, 128))``."""
        return self._make_scan(
            self.circuits[d], bits_stack.shape[2], cls_off=self._cls_off[d]
        )(bits_stack)

    def match_one(self, characters: bytes) -> RegexResult:
        L = self.model.max_chars_size
        buf = np.zeros((1, L), np.uint8)
        buf[0, : len(characters)] = bytearray(characters)
        if self._tiled:
            buf = tile_corpus(buf, self.L_pad)
        res = self(buf, np.array([len(characters)], np.int32))
        if isinstance(res, dict):
            return {k: np.asarray(v)[0] for k, v in res.items()}
        return res.map(lambda a: np.asarray(a)[0])
