"""Centralized, validated pipeline knobs (VERDICT r3 #7).

Every H2R_* environment knob the bitplane pipeline honors is read in ONE
place, validated as a SET (conflicting combinations are rejected loudly at
construction, not silently ignored deep in a kernel builder), and carried
as an immutable value object.  Constructor arguments override the
environment; the environment overrides defaults.

Knobs and their hardware provenance (docs/PERF.md):

  H2R_SCAN_UNROLL   int >=1     manual unroll of the scan recurrence
                                (probe60 r4: u4 fastest)
  H2R_FUSE_PACK     0/1         extract byte planes in the scan prologue
                                (probe43: slower; kept for future parts)
  H2R_CLASS_STAGE   0/1/onehot/binary  byte->class stage placement
  H2R_EN_PACK       0/1         enable plane computed in the pack kernel
                                (default ON — probe63: part of the 30%
                                pipeline win; auto-off under fuse_pack)
  H2R_QPACK         0/1         pack reads raw quads directly, skipping
                                the XLA raw_quads transpose (default ON —
                                probe63: -0.6 ms, the largest measured
                                stage at 10% HBM util; auto-off under
                                fuse_pack, and per-matcher when L != L_pad)
  H2R_EMIT          planes/bytes/direct/kdecode  witness emission tail
  H2R_WITNESS_BYTES legacy 0/1 alias for planes/bytes
  H2R_VMEM_LIMIT    bytes       Mosaic scoped-VMEM ceiling per kernel
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from typing import Optional, Union


_EMITS = ("planes", "bytes", "direct", "kdecode")


@dataclass(frozen=True)
class BitplaneKnobs:
    """Validated knob set for one BitplaneMatcher construction."""

    unroll: int = 1
    fuse_pack: bool = False
    class_stage: Union[bool, str] = "binary"  # False | "binary" | "onehot"
    en_pack: bool = True
    qpack: bool = True
    emit: Optional[str] = None  # None = mode-dependent default ("bytes")
    vmem_limit: int = 100 * 1024 * 1024

    # ------------------------------------------------------------------
    @classmethod
    def from_env(
        cls,
        *,
        unroll: Optional[int] = None,
        fuse_pack: Optional[bool] = None,
        class_stage: Optional[Union[bool, str]] = None,
        en_pack: Optional[bool] = None,
        qpack: Optional[bool] = None,
        emit: Optional[str] = None,
    ) -> "BitplaneKnobs":
        """Resolve knobs: explicit argument > environment > default.

        Raises ValueError on malformed values or contradictory sets.
        ``class_stage`` is auto-disabled under ``fuse_pack`` only when it
        was NOT explicitly requested (either via arg or env) — an explicit
        conflict is an error.
        """
        explicit_cs = class_stage is not None
        if unroll is None:
            unroll = int(os.environ.get("H2R_SCAN_UNROLL", 1))
        env_fp = os.environ.get("H2R_FUSE_PACK")
        if fuse_pack is None and env_fp is not None:
            fuse_pack = env_fp != "0"
        if fuse_pack is None:
            fuse_pack = False
        env_cs = os.environ.get("H2R_CLASS_STAGE")
        if class_stage is None and env_cs is not None:
            try:
                class_stage = {
                    "0": False,
                    "false": False,
                    "1": "onehot",
                    "onehot": "onehot",
                    "binary": "binary",
                }[env_cs.lower()]
            except KeyError:
                raise ValueError(
                    f"H2R_CLASS_STAGE={env_cs!r}: expected one of "
                    "0/false/1/onehot/binary"
                ) from None
            explicit_cs = True
        if class_stage is None:
            class_stage = "binary"
        if class_stage is True:
            class_stage = "onehot"
        # en_pack/qpack default ON (round-4 hardware A/B, probe_tpu63:
        # qpack+en_pack 2.21 ms vs 3.16 ms median for the witness
        # pipeline at B=32k x 1KB, bit-exact; match-only 1.22 vs 1.56).
        # Soft defaults: auto-disabled under fuse_pack unless explicitly
        # requested (then the conflict is an error, below).
        explicit_en = en_pack is not None or "H2R_EN_PACK" in os.environ
        explicit_qp = qpack is not None or "H2R_QPACK" in os.environ
        if en_pack is None:
            env_en = os.environ.get("H2R_EN_PACK")
            en_pack = env_en == "1" if env_en is not None else True
        if qpack is None:
            env_qp = os.environ.get("H2R_QPACK")
            qpack = env_qp == "1" if env_qp is not None else True
        if emit is None:
            emit = os.environ.get("H2R_EMIT")
            if emit is None:
                wb = os.environ.get("H2R_WITNESS_BYTES")
                if wb is not None:
                    emit = {"0": "planes", "1": "bytes"}.get(wb)
                    if emit is None:
                        raise ValueError(
                            f"H2R_WITNESS_BYTES={wb!r}: expected 0/1"
                        )
        if emit is not None:
            emit = emit.lower()
        vmem_limit = int(os.environ.get("H2R_VMEM_LIMIT", 100 * 1024 * 1024))

        knobs = cls(
            unroll=unroll,
            fuse_pack=fuse_pack,
            class_stage=class_stage,
            en_pack=en_pack,
            qpack=qpack,
            emit=emit,
            vmem_limit=vmem_limit,
        )
        return knobs._validate(
            explicit_cs=explicit_cs,
            explicit_en=explicit_en,
            explicit_qp=explicit_qp,
        )

    # ------------------------------------------------------------------
    def _validate(
        self,
        explicit_cs: bool,
        explicit_en: bool = True,
        explicit_qp: bool = True,
    ) -> "BitplaneKnobs":
        k = self
        if k.unroll < 1:
            raise ValueError(f"unroll={k.unroll}: must be >= 1")
        if k.emit is not None and k.emit not in _EMITS:
            raise ValueError(
                f"H2R_EMIT={k.emit!r}: expected planes/bytes/direct/kdecode"
            )
        if k.vmem_limit <= 0:
            raise ValueError(f"H2R_VMEM_LIMIT={k.vmem_limit}: must be > 0")
        if k.fuse_pack and k.class_stage:
            # mutually exclusive pack strategies: fuse_pack extracts byte
            # planes in the scan prologue, so there is no pack kernel to
            # host the class circuit
            if explicit_cs:
                raise ValueError(
                    "class_stage and fuse_pack are mutually exclusive "
                    "(in-scan plane extraction has no pack kernel for "
                    "the class circuit)"
                )
            k = replace(k, class_stage=False)
        if k.fuse_pack and k.en_pack:
            if explicit_en:
                raise ValueError(
                    "H2R_EN_PACK=1 and H2R_FUSE_PACK=1 conflict: fuse_pack "
                    "removes the pack kernel that would compute the enable "
                    "plane"
                )
            k = replace(k, en_pack=False)
        if k.fuse_pack and k.qpack:
            if explicit_qp:
                raise ValueError(
                    "H2R_QPACK=1 and H2R_FUSE_PACK=1 conflict: qpack is a "
                    "pack-kernel input layout and fuse_pack removes the "
                    "pack kernel"
                )
            k = replace(k, qpack=False)
        return k
