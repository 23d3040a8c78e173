"""ops/knobs.py: centralized knob resolution/validation (VERDICT r3 #7)
plus PAIRWISE knob-combination bit-exactness of the bitplane pipeline.

The r2 SLAB-capture bug and the r4 en_pack gather bug were both
knob-interaction defects; this file pins (a) that contradictory knob sets
are rejected loudly at construction and (b) that every pairwise
combination of the perf knobs produces bit-identical witness output in
interpret mode."""

import itertools

import numpy as np
import pytest

from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher
from halo2_regex_tpu.ops.knobs import BitplaneKnobs

from fixtures import CONFIGS


# ---------------------------------------------------------------------------
# resolution and validation
# ---------------------------------------------------------------------------


def test_defaults(monkeypatch):
    for k in ("H2R_SCAN_UNROLL", "H2R_FUSE_PACK", "H2R_CLASS_STAGE",
              "H2R_EN_PACK", "H2R_QPACK", "H2R_EMIT", "H2R_WITNESS_BYTES",
              "H2R_VMEM_LIMIT"):
        monkeypatch.delenv(k, raising=False)
    k = BitplaneKnobs.from_env()
    assert k.unroll == 1
    assert k.fuse_pack is False
    assert k.class_stage == "binary"
    # round-4 measured defaults (probe_tpu63: qpack+en_pack is the
    # fastest bit-exact witness configuration on hardware)
    assert k.en_pack is True
    assert k.qpack is True
    assert k.emit is None
    assert k.vmem_limit == 100 * 1024 * 1024


def test_env_resolution(monkeypatch):
    monkeypatch.setenv("H2R_SCAN_UNROLL", "4")
    monkeypatch.setenv("H2R_EN_PACK", "1")
    monkeypatch.setenv("H2R_EMIT", "KDECODE")
    monkeypatch.setenv("H2R_VMEM_LIMIT", "1048576")
    k = BitplaneKnobs.from_env()
    assert (k.unroll, k.en_pack, k.emit, k.vmem_limit) == (
        4, True, "kdecode", 1048576)


def test_args_override_env(monkeypatch):
    monkeypatch.setenv("H2R_SCAN_UNROLL", "4")
    monkeypatch.setenv("H2R_FUSE_PACK", "1")
    k = BitplaneKnobs.from_env(unroll=2, fuse_pack=False)
    assert k.unroll == 2
    assert k.fuse_pack is False


def test_legacy_witness_bytes_alias(monkeypatch):
    monkeypatch.delenv("H2R_EMIT", raising=False)
    monkeypatch.setenv("H2R_WITNESS_BYTES", "0")
    assert BitplaneKnobs.from_env().emit == "planes"
    monkeypatch.setenv("H2R_WITNESS_BYTES", "1")
    assert BitplaneKnobs.from_env().emit == "bytes"
    monkeypatch.setenv("H2R_WITNESS_BYTES", "2")
    with pytest.raises(ValueError, match="H2R_WITNESS_BYTES"):
        BitplaneKnobs.from_env()


@pytest.mark.parametrize(
    "env,val,msg",
    [
        ("H2R_EMIT", "fast", "H2R_EMIT"),
        ("H2R_CLASS_STAGE", "always", "H2R_CLASS_STAGE"),
        ("H2R_SCAN_UNROLL", "0", "unroll"),
        ("H2R_VMEM_LIMIT", "-1", "H2R_VMEM_LIMIT"),
    ],
)
def test_malformed_values_rejected(monkeypatch, env, val, msg):
    monkeypatch.setenv(env, val)
    with pytest.raises(ValueError, match=msg):
        BitplaneKnobs.from_env()


def test_explicit_conflicts_rejected(monkeypatch):
    monkeypatch.setenv("H2R_FUSE_PACK", "1")
    monkeypatch.setenv("H2R_EN_PACK", "1")
    with pytest.raises(ValueError, match="conflict"):
        BitplaneKnobs.from_env()
    monkeypatch.delenv("H2R_EN_PACK")
    monkeypatch.setenv("H2R_QPACK", "1")
    with pytest.raises(ValueError, match="conflict"):
        BitplaneKnobs.from_env()
    monkeypatch.delenv("H2R_QPACK")
    monkeypatch.setenv("H2R_CLASS_STAGE", "binary")
    with pytest.raises(ValueError, match="mutually exclusive"):
        BitplaneKnobs.from_env()


def test_fuse_pack_auto_disables_default_class_stage(monkeypatch):
    for k in ("H2R_CLASS_STAGE", "H2R_EN_PACK", "H2R_QPACK"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("H2R_FUSE_PACK", "1")
    k = BitplaneKnobs.from_env()
    assert k.fuse_pack is True
    assert k.class_stage is False  # auto-disabled, not an error


# ---------------------------------------------------------------------------
# pairwise knob-combination bit-exactness (interpret mode)
# ---------------------------------------------------------------------------

# knob -> env assignment; None = leave unset (default)
KNOB_VALUES = {
    "H2R_EMIT": [None, "kdecode", "planes"],
    "H2R_EN_PACK": [None, "1"],
    "H2R_QPACK": [None, "1"],
    "H2R_SCAN_UNROLL": [None, "4"],
    "H2R_CLASS_STAGE": [None, "0"],
}

# all pairs of non-default values across distinct knobs
_PAIRS = []
_names = list(KNOB_VALUES)
for a, b in itertools.combinations(_names, 2):
    for va in KNOB_VALUES[a][1:]:
        for vb in KNOB_VALUES[b][1:]:
            _PAIRS.append(((a, va), (b, vb)))


@pytest.fixture(scope="module")
def knob_model():
    return CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=64
    )


@pytest.fixture(scope="module")
def knob_inputs():
    rng = np.random.default_rng(42)
    B = 4096
    chars = rng.integers(0, 256, size=(B, 64)).astype(np.uint8)
    lengths = rng.integers(0, 65, size=(B,)).astype(np.int32)
    lengths[0] = 0
    lengths[1] = 64
    return chars, lengths


@pytest.fixture(scope="module")
def knob_baseline(knob_model, knob_inputs):
    import os

    for k in KNOB_VALUES:
        os.environ.pop(k, None)
    base = BitplaneMatcher(knob_model, columns="witness", interpret=True)
    chars, lengths = knob_inputs
    return {k: np.asarray(v) for k, v in base._run(chars, lengths).items()}


@pytest.mark.parametrize("pair", _PAIRS, ids=lambda p: f"{p[0][0]}={p[0][1]}/{p[1][0]}={p[1][1]}")
def test_pairwise_knob_bit_exact(
    monkeypatch, pair, knob_model, knob_inputs, knob_baseline
):
    for k in KNOB_VALUES:
        monkeypatch.delenv(k, raising=False)
    for k, v in pair:
        monkeypatch.setenv(k, v)
    try:
        m = BitplaneMatcher(knob_model, columns="witness", interpret=True)
    except ValueError:
        pytest.skip("combination rejected by validation (by design)")
    chars, lengths = knob_inputs
    out = m._run(chars, lengths)
    for k, ref in knob_baseline.items():
        np.testing.assert_array_equal(
            ref, np.asarray(out[k]), err_msg=f"{pair} field {k}"
        )
