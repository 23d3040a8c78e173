"""Bit-sliced (bitplane) witness pipeline — the high-throughput backend.

Thirty-two strings are packed into each int32 lane ("planes": bit ``i`` of
word ``w`` belongs to string ``w*32 + i``) and the whole witness pipeline
runs as boolean circuits on planes:

  1. **pack** (XLA): bytes ``[B, L]`` -> 8 byte-bit planes; the 32-way
     bit-pack reduction rides the MXU as two f32 matmuls per plane.
  2. **class stage** (XLA): the synthesized BDD circuit
     (:mod:`..compiler.bitslice`) turns byte-bit planes into one indicator
     plane per byte equivalence class — position-parallel, XLA-fused.
  3. **scan kernel** (Pallas): the only sequential stage. Per byte step the
     synthesized step circuit (~100-300 VPU bitops for email-scale DFAs,
     each op covering 32,768 strings) maps one-hot state planes through the
     class planes; log2-encoded state planes stream out. Replaces the
     reference's per-byte HashMap loop (src/lib.rs:804-823).
  4. **tag + mask FSMs** (XLA, packed): substr ids / start / end flags are
     pure functions of the (prev, next) state pair (src/lib.rs:825-888) —
     a synthesized pair circuit; the two set/reset/hold mask FSMs
     (src/lib.rs:598-714) run as Hillis-Steele log-scans over 1-bit
     affine maps, all in the packed domain.
  5. **unpack** (XLA): planes -> compact value-domain witness columns
     (uint8 states/ids/chars, 0/1 flags; ``ScanTraffic``'s ~6 B/byte
     model).

Outputs are bit-identical to :mod:`.reference` (tests/test_bitplane.py).
Supported models: every def's live state count and byte-class count must
synthesize to a bounded circuit (all email fixtures qualify); others fall
back to the split Pallas kernel or XLA backend.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler.bitslice import DefCircuits, synthesize_def
from ..models.compiled import CompiledRegexModel
from ..witness.result import RegexResult

LANE = 128
_BIT_IOTA = None


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


def pack_bits(bits_f32: jnp.ndarray) -> jnp.ndarray:
    """[..., NW, 32] {0,1} float32 -> [..., NW] int32 packed words.

    Two 16-wide f32 matmuls (exact: partial sums < 2^16) that XLA places on
    the MXU, then a shift-or combine.
    """
    pw = jnp.asarray(2.0 ** np.arange(16), jnp.float32)
    lo = bits_f32[..., :16] @ pw
    hi = bits_f32[..., 16:] @ pw
    return lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)


def pack_bytes(chars: jnp.ndarray, L_pad: int) -> List[jnp.ndarray]:
    """[B, L] uint8 -> list of 8 byte-bit planes [L_pad, NW] int32."""
    B, L = chars.shape
    NW = B // 32
    x = chars.astype(jnp.int32).T  # [L, B]
    if L_pad != L:
        x = jnp.pad(x, ((0, L_pad - L), (0, 0)))
    xt = x.reshape(L_pad, NW, 32)
    return [pack_bits(((xt >> j) & 1).astype(jnp.float32)) for j in range(8)]


def pack_bool(col: jnp.ndarray, L_pad: int) -> jnp.ndarray:
    """[B, L] bool/int -> one plane [L_pad, NW] int32."""
    B, L = col.shape
    NW = B // 32
    x = col.astype(jnp.int32).T
    if L_pad != L:
        x = jnp.pad(x, ((0, L_pad - L), (0, 0)))
    return pack_bits(x.reshape(L_pad, NW, 32).astype(jnp.float32))


def unpack_planes(planes: List[jnp.ndarray], L: int, out_dtype=jnp.uint8):
    """List of NB planes [L_pad, ...NW words] -> values [B, L] (bit j from
    planes[j])."""
    p0 = planes[0].reshape(planes[0].shape[0], -1)
    NW = p0.shape[-1]
    B = NW * 32
    bit_iota = jnp.arange(32, dtype=jnp.int32)
    acc = None
    for j, p in enumerate(planes):
        p = p.reshape(p.shape[0], -1)
        v = ((p[:L, :, None] >> bit_iota) & 1) << j
        acc = v if acc is None else acc | v
    return acc.reshape(L, B).T.astype(out_dtype)


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


def _fsm_log_scan(hold: jnp.ndarray, setp: jnp.ndarray, reverse: bool):
    """Inclusive scan of 1-bit affine maps x' = hold·x + set along axis 0.

    Maps compose (earlier-then-later) as (h1·h2, h2·s1 + s2); log2(L)
    rounds of compose-with-shifted-self. Returns the per-position value
    applied to initial state 0 (= the composed ``set`` bit).
    (Reference FSM semantics: src/lib.rs:598-714.)
    """
    L = hold.shape[0]
    a, b = hold, setp
    shift = 1
    while shift < L:
        if not reverse:
            a_prev = jnp.concatenate(
                [jnp.full((shift,) + a.shape[1:], -1, a.dtype), a[: L - shift]], 0
            )
            b_prev = jnp.concatenate(
                [jnp.zeros((shift,) + b.shape[1:], b.dtype), b[: L - shift]], 0
            )
        else:
            a_prev = jnp.concatenate(
                [a[shift:], jnp.full((shift,) + a.shape[1:], -1, a.dtype)], 0
            )
            b_prev = jnp.concatenate(
                [b[shift:], jnp.zeros((shift,) + b.shape[1:], b.dtype)], 0
            )
        a, b = a_prev & a, (a & b_prev) | b
        shift *= 2
    return b


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
    ):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        self.model = model
        self.interpret = interpret
        self.compact = compact
        n_defs = model.n_defs
        L = model.max_chars_size
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
            )
            if c.step_ops > max_step_ops:
                raise ValueError(
                    f"def {d}: step circuit {c.step_ops} ops > {max_step_ops}"
                )
            self.circuits.append(c)

        LC = min(lc, L)
        L_pad = _round_up(L, LC)
        self.L_pad = L_pad
        self.lc = LC
        self.nws_tile = nws_tile
        n_l = L_pad // LC

        # ----- per-def Pallas scan kernel -----
        def make_scan(circ: DefCircuits, NWS: int):
            k, sb = circ.k, circ.sb
            live = circ.live_states
            NT = min(nws_tile, NWS)
            while NWS % NT != 0:
                NT -= 1
            n_b = NWS // NT

            def kern(cls_ref, out_ref, st_scr):
                l = pl.program_id(1)

                @pl.when(l == 0)
                def _():
                    for j, s in enumerate(live):
                        st_scr[j] = jnp.full(
                            (NT, LANE),
                            -1 if s == circ.first_state else 0,
                            jnp.int32,
                        )

                def body(i, _):
                    env = {f"cls{c}": cls_ref[i, c] for c in range(k)}
                    env.update(
                        {f"st{s}": st_scr[j] for j, s in enumerate(live)}
                    )
                    out = circ.step_prog.run(env)
                    for j, s in enumerate(live):
                        st_scr[j] = out[f"nst{s}"]
                    for j in range(sb):
                        out_ref[i, j] = out[f"log{j}"]
                    return 0

                jax.lax.fori_loop(0, LC, body, 0)

            return pl.pallas_call(
                kern,
                grid=(n_b, n_l),
                in_specs=[
                    pl.BlockSpec(
                        (LC, k, NT, LANE),
                        lambda b, l: (l, 0, b, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (LC, sb, NT, LANE),
                    lambda b, l: (l, 0, b, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (L_pad, sb, NWS, LANE), jnp.int32
                ),
                scratch_shapes=[pltpu.VMEM((len(live), NT, LANE), jnp.int32)],
                interpret=interpret,
                compiler_params=None
                if interpret
                else pltpu.CompilerParams(
                    vmem_limit_bytes=int(
                        os.environ.get("H2R_VMEM_LIMIT", 100 * 1024 * 1024)
                    )
                ),
            )

        model_arrays = dict(
            accepted_states=jnp.asarray(model.accepted_states),
            dummy_states=jnp.asarray(model.dummy_states),
            dead_states=jnp.asarray(model.dead_states),
            first_states=jnp.asarray(model.first_states),
        )
        val_dtype = jnp.uint8 if compact else jnp.int32

        def run(chars, lengths):
            B, Lin = chars.shape
            assert Lin == L
            NW = B // 32
            NWS = NW // LANE

            # 1. pack byte bit-planes [8, L_pad, NW]
            byte_planes = pack_bytes(chars, L_pad)
            bp4 = [p.reshape(L_pad, NWS, LANE) for p in byte_planes]

            # enable plane (pos < length), packed
            pos = jnp.arange(L, dtype=jnp.int32)
            enable_bl = pos[None, :] < lengths[:, None]  # [B, L] bool
            en_plane = pack_bool(enable_bl, L_pad).reshape(L_pad, NWS, LANE)

            per_def = []
            ids_planes_sum = None
            start_any = None
            endf_any = None
            for d, circ in enumerate(self.circuits):
                # 2. class stage (XLA)
                env = {f"byte_bit{j}": bp4[j] for j in range(8)}
                cls_out = circ.class_prog.run(env)
                cls_stack = jnp.stack(
                    [cls_out[f"cls{c}"] for c in range(circ.k)], axis=1
                )  # [L_pad, k, NWS, LANE]

                # 3. scan kernel
                logs = make_scan(circ, NWS)(cls_stack)  # [L_pad, sb, NWS, LANE]

                # 4. tag (XLA packed): prev/next log planes
                first_bits = [
                    jnp.full(
                        (1, NWS, LANE),
                        -1 if (circ.first_state >> j) & 1 else 0,
                        jnp.int32,
                    )
                    for j in range(circ.sb)
                ]
                nxt = [logs[:, j] for j in range(circ.sb)]
                prv = [
                    jnp.concatenate([first_bits[j], logs[: L_pad - 1, j]], 0)
                    for j in range(circ.sb)
                ]
                env = {f"prev{j}": prv[j] for j in range(circ.sb)}
                env.update({f"next{j}": nxt[j] for j in range(circ.sb)})
                tag = circ.tag_prog.run(env)
                idp = [tag[f"id{j}"] & en_plane for j in range(idb)]
                stp = tag["is_start"] & en_plane
                efp = tag["is_end"] & en_plane

                per_def.append(dict(logs=nxt, ids=idp, start=stp, endf=efp))
                if ids_planes_sum is None:
                    ids_planes_sum = idp
                    start_any = stp
                    endf_any = efp
                else:
                    ids_planes_sum = plane_add(
                        ids_planes_sum, idp, idb + d.bit_length() + 1
                    )
                    start_any = start_any | stp
                    endf_any = endf_any | efp

            # 5. FSMs (packed). changed[i] = id_sum[i] != id_sum[i-1]
            nsum = len(ids_planes_sum)
            prev_sum = [
                jnp.concatenate(
                    [jnp.zeros((1, NWS, LANE), jnp.int32), p[: L_pad - 1]], 0
                )
                for p in ids_planes_sum
            ]
            changed = None
            for a, b in zip(ids_planes_sum, prev_sum):
                x = a ^ b
                changed = x if changed is None else (changed | x)
            prev_endf = jnp.concatenate(
                [jnp.zeros((1, NWS, LANE), jnp.int32), endf_any[: L_pad - 1]], 0
            )
            is_set = start_any & changed
            is_reset = ~start_any & prev_endf & changed
            hold = ~(is_set | is_reset)
            fwd_plane = _fsm_log_scan(hold, is_set, reverse=False)

            next_sum = [
                jnp.concatenate(
                    [p[1:], jnp.zeros((1, NWS, LANE), jnp.int32)], 0
                )
                for p in ids_planes_sum
            ]
            changed_b = None
            for a, b in zip(ids_planes_sum, next_sum):
                x = a ^ b
                changed_b = x if changed_b is None else (changed_b | x)
            next_start = jnp.concatenate(
                [start_any[1:], jnp.zeros((1, NWS, LANE), jnp.int32)], 0
            )
            # endf_any[j] IS is_end_sum[j+1] (unshifted flag at j)
            set_b = endf_any & changed_b
            reset_b = ~endf_any & next_start & changed_b
            hold_b = ~(set_b | reset_b)
            bwd_plane = _fsm_log_scan(hold_b, set_b, reverse=True)
            mask_plane = fwd_plane & bwd_plane

            # 6. unpack to value-domain columns
            enable = enable_bl.astype(val_dtype)
            chars_v = chars.astype(val_dtype) * enable
            fwd = unpack_planes([fwd_plane], L, val_dtype)
            bwd = unpack_planes([bwd_plane], L, val_dtype)
            mask = unpack_planes([mask_plane], L, val_dtype)
            sum_dtype = val_dtype if nsum <= 8 else jnp.int32
            substr_id_sum = unpack_planes(ids_planes_sum, L, sum_dtype)
            all_ids = unpack_planes(
                [p & mask_plane for p in ids_planes_sum], L, sum_dtype
            )
            masked_chars = mask * chars_v

            states_list = []
            ids_list = []
            start_en_list = []
            end_en_list = []
            start_sum = None
            end_sum = None
            for d, (circ, pd) in enumerate(zip(self.circuits, per_def)):
                after = unpack_planes(pd["logs"], L, jnp.int32)  # [B, L]
                states_list.append(after)
                ids_list.append(unpack_planes(pd["ids"], L, val_dtype))
                st_v = unpack_planes([pd["start"]], L, val_dtype)
                ef_v = unpack_planes([pd["endf"]], L, val_dtype)
                start_en_list.append(st_v)
                end_en_list.append(ef_v)
                start_sum = st_v if start_sum is None else start_sum + st_v
                end_sum = ef_v if end_sum is None else end_sum + ef_v

            after = jnp.stack(states_list, axis=1)  # [B, n_defs, L]
            first = model_arrays["first_states"][None, :, None]
            raw = jnp.concatenate(
                [jnp.broadcast_to(first, (B, n_defs, 1)), after], axis=2
            )
            posL1 = jnp.arange(L + 1, dtype=jnp.int32)
            in_range = posL1[None, None, :] <= lengths[:, None, None]
            dummy = model_arrays["dummy_states"][None, :, None]
            states = jnp.where(in_range, raw, dummy).astype(
                val_dtype if model.s_pad <= 255 else jnp.int32
            )

            final = jnp.take_along_axis(
                raw, lengths[:, None, None].repeat(n_defs, 1), axis=2
            )[:, :, 0]
            accepted = final == model_arrays["accepted_states"][None, :]
            has_dead = final == model_arrays["dead_states"][None, :]

            zcol = jnp.zeros((B, 1), start_sum.dtype)
            is_start_sum = jnp.concatenate([start_sum, zcol], axis=1)
            is_end_sum = jnp.concatenate([zcol, end_sum], axis=1)

            return dict(
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

        self.core = run  # unjitted — usable inside shard_map
        self._run = jax.jit(run)

    # B must be a multiple of 32*LANE for whole packed words; pad otherwise.
    def __call__(self, chars, lengths) -> RegexResult:
        chars = jnp.asarray(chars, jnp.uint8)
        lengths = jnp.asarray(lengths, jnp.int32)
        B = chars.shape[0]
        tile = 32 * LANE
        if B % tile != 0:
            pad = tile - B % tile
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
