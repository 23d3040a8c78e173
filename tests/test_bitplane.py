"""Bit-sliced (bitplane) backend vs the oracle.

The Pallas scan kernel runs in interpret mode on CPU; the XLA pack /
class / tag / FSM / unpack stages run as-is. The same pipeline compiles
for TPU (tools/probe_tpu20+.py, bench.py)."""

import numpy as np
import pytest

from halo2_regex_tpu.compiler.bitslice import (
    Builder,
    byte_set_expr,
    linearize,
    synthesize_def,
    verify_def_circuits,
)
from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops import reference as ref_ops
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher, _substr_pairs
from halo2_regex_tpu.ops.scan_jax import pack_batch
from halo2_regex_tpu.witness.result import RegexResult

from fixtures import CONFIGS

MAX_LEN = 64


@pytest.fixture(scope="module")
def model3():
    return CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]),
        max_chars_size=MAX_LEN,
    )


@pytest.fixture(scope="module")
def model12():
    cfgs = [
        DecomposedRegexConfig.from_json(CONFIGS["regex1"]),
        DecomposedRegexConfig.from_json(CONFIGS["regex2"]),
    ]
    return CompiledRegexModel.from_decomposed(cfgs, max_chars_size=MAX_LEN)


def assert_same(res, oracle):
    for name in oracle.field_names():
        x = np.asarray(getattr(res, name)).astype(np.int64)
        y = np.asarray(getattr(oracle, name)).astype(np.int64)
        np.testing.assert_array_equal(x, y, err_msg=f"field {name}")


# ---------------------------------------------------------------------------
# synthesis-level tests
# ---------------------------------------------------------------------------


def test_byte_set_expr_exhaustive():
    b = Builder()
    for vals in ([], [0], [255], list(range(48, 58)), [10, 13] + list(range(32, 127))):
        prog = linearize(b, {"f": byte_set_expr(b, vals)})
        bytes_all = np.arange(256)
        env = {
            f"byte_bit{j}": ((bytes_all >> j) & 1).astype(bool) for j in range(8)
        }
        got = prog.run(env)["f"]
        expect = np.isin(bytes_all, vals)
        np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("name", ["regex1", "regex2", "regex3"])
def test_synthesized_circuits_exhaustive(name):
    model = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS[name]), max_chars_size=MAX_LEN
    )
    idb = max(1, int(model.total_substrs).bit_length())
    for d in range(model.n_defs):
        c = synthesize_def(
            model.transition[d],
            int(model.first_states[d]),
            int(model.dead_states[d]),
            _substr_pairs(model, d),
            idb=idb,
        )
        verify_def_circuits(c, model.transition[d])
        # tag circuit vs the dense tables over every live (prev, next) pair
        live = c.live_states
        n = len(live)
        prev_idx = np.repeat(live, n)
        next_idx = np.tile(live, n)
        env = {
            f"prev{j}": ((prev_idx >> j) & 1).astype(bool) for j in range(c.sb)
        }
        env.update(
            {f"next{j}": ((next_idx >> j) & 1).astype(bool) for j in range(c.sb)}
        )
        out = c.tag_prog.run(env)
        gid = model.substr_id_table[d][prev_idx, next_idx]
        for j in range(idb):
            np.testing.assert_array_equal(
                out[f"id{j}"], ((gid >> j) & 1).astype(bool), err_msg=f"id{j}"
            )
        np.testing.assert_array_equal(
            out["is_start"], model.is_start_table[gid, prev_idx]
        )
        np.testing.assert_array_equal(
            out["is_end"], model.is_end_table[gid, next_idx]
        )


# ---------------------------------------------------------------------------
# end-to-end pipeline vs oracle (interpret-mode kernel)
# ---------------------------------------------------------------------------

STRINGS3 = [
    b"from:alice@gmail.com\r\n",
    b"dummy\r\nfrom:alice<alice@gmail.com>\r\n",
    b"from:alice<alicegmail.com>\r\n",
    b"",
    bytes([0, 1, 2]),
    b"from:bob@x.yz\r\n",
    b"from:alice<alice@gmail.com>",
    b"x" * MAX_LEN,  # full-length input
]


def test_bitplane_matches_oracle_regex3(model3):
    m = BitplaneMatcher(model3, interpret=True)
    chars, lengths = pack_batch(STRINGS3, MAX_LEN)
    res = m(chars, lengths)
    for i, s in enumerate(STRINGS3):
        oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
        assert_same(res.map(lambda a, i=i: np.asarray(a)[i]), oracle)


def test_bitplane_two_defs(model12):
    m = BitplaneMatcher(model12, interpret=True)
    strings = [
        b"email was meant for @y. Also for x.",
        b"email was meant for @yajk. Also for swq.",
        b"email was meant for @@",
        b"",
    ]
    chars, lengths = pack_batch(strings, MAX_LEN)
    res = m(chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model12.regex_defs, s, MAX_LEN)
        assert_same(res.map(lambda a, i=i: np.asarray(a)[i]), oracle)


def test_bitplane_fuzz(model3):
    rng = np.random.default_rng(42)
    m = BitplaneMatcher(model3, interpret=True)
    B = 16
    chars = np.zeros((B, MAX_LEN), np.uint8)
    lengths = np.zeros((B,), np.int32)
    pieces = [b"from:", b"@", b".", b"<", b">", b"\r\n", b"ab", b"x.y"]
    for i in range(B):
        n = int(rng.integers(0, 6))
        s = b"".join(
            pieces[int(j)] for j in rng.integers(0, len(pieces), size=n)
        )[:MAX_LEN]
        chars[i, : len(s)] = bytearray(s)
        lengths[i] = len(s)
    res = m(chars, lengths)
    for i in range(B):
        s = bytes(chars[i, : lengths[i]])
        oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
        assert_same(res.map(lambda a, i=i: np.asarray(a)[i]), oracle)


def test_bitplane_odd_length_model(model3):
    # L not a multiple of the kernel chunk exercises the L_pad path
    model = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=50
    )
    m = BitplaneMatcher(model, interpret=True, lc=16)
    s = b"from:alice@gmail.com\r\n"
    res = m.match_one(s)
    oracle = ref_ops.match_substrs(model.regex_defs, s, 50)
    assert_same(res, oracle)


def test_bitplane_noncompact_dtypes(model3):
    m = BitplaneMatcher(model3, interpret=True, compact=False)
    s = b"from:bob@x.yz\r\n"
    res = m.match_one(s)
    oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
    assert_same(res, oracle)


def test_bitplane_post_xla_variant(model12):
    """The non-kernel tag/FSM path (A/B fallback) stays bit-exact."""
    m = BitplaneMatcher(model12, interpret=True, post="xla")
    s = b"email was meant for @y. Also for x."
    res = m.match_one(s)
    oracle = ref_ops.match_substrs(model12.regex_defs, s, MAX_LEN)
    assert_same(res, oracle)


def test_bitplane_witness_columns_mode(model3):
    """The compact witness emission (columns='witness') agrees with the
    full RegexResult columns field by field."""
    full = BitplaneMatcher(model3, interpret=True)
    compact = BitplaneMatcher(model3, interpret=True, columns="witness")
    chars, lengths = pack_batch(STRINGS3, MAX_LEN)
    rf = full(chars, lengths)
    rc = compact(chars, lengths)
    np.testing.assert_array_equal(
        np.asarray(rc["states"]).astype(np.int64),
        np.asarray(rf.states).astype(np.int64),
    )
    np.testing.assert_array_equal(
        np.asarray(rc["all_substr_ids"]).astype(np.int64),
        np.asarray(rf.all_substr_ids).astype(np.int64),
    )
    np.testing.assert_array_equal(
        np.asarray(rc["masked_characters"]).astype(np.int64),
        np.asarray(rf.masked_characters).astype(np.int64),
    )
    np.testing.assert_array_equal(
        np.asarray(rc["match_ok"]), np.asarray(rf.match_ok)
    )
    flags = np.asarray(rc["flags"]).astype(np.int64)
    np.testing.assert_array_equal(flags & 1, np.asarray(rf.mask).astype(np.int64))
    np.testing.assert_array_equal(
        (flags >> 1) & 1, np.asarray(rf.fwd_mask).astype(np.int64)
    )
    np.testing.assert_array_equal(
        (flags >> 2) & 1, np.asarray(rf.bwd_mask).astype(np.int64)
    )
    np.testing.assert_array_equal(
        (flags >> 3) & 1, np.asarray(rf.all_enable_flags).astype(np.int64)
    )
    np.testing.assert_array_equal(
        (flags >> 4) & 1, np.asarray(rf.start_enable[:, 0]).astype(np.int64)
    )
    np.testing.assert_array_equal(
        (flags >> 5) & 1, np.asarray(rf.end_enable[:, 0]).astype(np.int64)
    )


# ---------------------------------------------------------------------------
# mid-tier (>32 live states) models: synthesis scales with DFA structure
# ---------------------------------------------------------------------------


def test_bitplane_midtier_118_states():
    """One-hot synthesis stays compact on structured ~100-state DFAs
    (live=118 -> ~506 step ops) and the kernel pipeline remains bit-exact
    — the 'beyond 32 states' tier needs no special decomposition."""
    words = [
        "confidential", "wire transfer", "bitcoin", "lottery winner",
        "prince", "inheritance", "click here now", "free gift card",
        "your parcel is waiting", "tax refund",
    ]
    cfg = DecomposedRegexConfig.from_json(
        {
            "max_byte_size": 64,
            "parts": [
                {"is_public": False, "regex_def": "x-spam:", "max_size": 8},
                {
                    "is_public": True,
                    "regex_def": "(" + "|".join(words) + ")",
                    "max_size": 32,
                },
                {"is_public": False, "regex_def": "\r\n", "max_size": 2},
            ],
        }
    )
    model = CompiledRegexModel.from_decomposed([cfg], max_chars_size=64)
    m = BitplaneMatcher(model, interpret=True, columns="witness")
    circ = m.circuits[0]
    assert len(circ.live_states) > 100
    assert circ.step_ops < 1024  # structure, not state count, sets the cost
    strings = [
        b"x-spam:wire transfer\r\n",
        b"x-spam:tax refund\r\n",
        b"x-spam:bitcoin\r\n",
        b"x-spam:nonsense\r\n",
        b"",
    ]
    chars, lengths = pack_batch(strings, 64)
    out = m._run(chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model.regex_defs, s, 64)
        np.testing.assert_array_equal(
            np.asarray(out["all_substr_ids"][i]).astype(np.int64),
            np.asarray(oracle.all_substr_ids[:64]).astype(np.int64),
        )
        np.testing.assert_array_equal(
            np.asarray(out["masked_characters"][i]).astype(np.int64),
            np.asarray(oracle.masked_characters[:64]).astype(np.int64),
        )
        assert bool(out["match_ok"][i]) == bool(oracle.match_ok)


def test_expand_witness_roundtrip(model3):
    """expand_witness(compact emission) reproduces the full RegexResult
    column set exactly — the compact set + raw input is sufficient
    witness data for the checker and serialization layers."""
    from halo2_regex_tpu.witness.checker import check_witness_batch
    from halo2_regex_tpu.witness.expand import expand_witness

    full = BitplaneMatcher(model3, interpret=True)
    compact = BitplaneMatcher(model3, interpret=True, columns="witness")
    chars, lengths = pack_batch(STRINGS3, MAX_LEN)
    rf = full(chars, lengths).to_numpy()
    rc = expand_witness(model3, compact._run(chars, lengths), chars)
    for name in RegexResult.field_names():
        np.testing.assert_array_equal(
            np.asarray(getattr(rc, name)).astype(np.int64),
            np.asarray(getattr(rf, name)).astype(np.int64),
            err_msg=name,
        )
    # and the expanded witness verifies against the constraint system
    ok = check_witness_batch(model3.regex_defs, rc)
    expect = np.asarray(rf.match_ok).astype(bool)
    np.testing.assert_array_equal(np.asarray(ok), expect)


def test_fused_scan_matches_per_def_kernels(model12):
    """The fused multi-def scan kernel's concatenated log stack equals the
    per-def kernels' outputs plane for plane (same plane stack in)."""
    import jax.numpy as jnp

    from halo2_regex_tpu.ops.bitplane import raw_quads

    # en_pack/qpack off: this test drives the internal pack/scan helpers
    # directly with the plain single-input pack signature
    m = BitplaneMatcher(model12, interpret=True, en_pack=False, qpack=False)
    B = 128
    rng = np.random.default_rng(7)
    chars = rng.integers(0, 256, size=(B, MAX_LEN)).astype(np.uint8)
    tile = 32 * 128
    pad = tile - B % tile
    chars_p = np.concatenate([chars, np.zeros((pad, MAX_LEN), np.uint8)])
    NWS = chars_p.shape[0] // 32 // 128
    R = raw_quads(jnp.asarray(chars_p), m.L_pad).reshape(m.L_pad, 8, NWS, 128)
    bits = m._make_pack(NWS)(R)
    fused = m._make_scan_fused(NWS)(bits)
    for d, circ in enumerate(m.circuits):
        per_def = m.scan_planes(bits, d)
        got = fused[:, m._sb_off[d] : m._sb_off[d] + circ.sb]
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(per_def), err_msg=f"def {d}"
        )


def test_kdecode_emission_bit_exact(monkeypatch):
    """H2R_EMIT=kdecode (round 3): the standalone decode kernel's field
    columns + masked chars are bit-identical to the XLA-decode bytes mode
    on random bytes/lengths at two NWS shapes (row-block map regression:
    the block index is b*NWS + nws, caught at NWS=1)."""
    import os

    import numpy as np

    from fixtures import CONFIGS
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.ops.bitplane import BitplaneMatcher

    model = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=64
    )
    rng = np.random.default_rng(5)
    for B in (4096, 8192):
        chars = rng.integers(0, 256, size=(B, 64)).astype(np.uint8)
        lengths = rng.integers(0, 65, size=(B,)).astype(np.int32)
        monkeypatch.delenv("H2R_EMIT", raising=False)
        base = BitplaneMatcher(model, columns="witness", interpret=True)
        assert base._emit == "bytes"
        ob = base(chars, lengths)
        monkeypatch.setenv("H2R_EMIT", "kdecode")
        kd = BitplaneMatcher(model, columns="witness", interpret=True)
        assert kd._emit == "kdecode"
        ok = kd(chars, lengths)
        for k in ob:
            np.testing.assert_array_equal(
                np.asarray(ob[k]), np.asarray(ok[k]), err_msg=f"B={B} {k}"
            )


def test_en_in_pack_bit_exact(monkeypatch):
    """H2R_EN_PACK=1: the pack kernel's enable plane reproduces the XLA
    path bit-exactly across emission modes (round 3 tail-cut option)."""
    import os

    import numpy as np

    from fixtures import CONFIGS
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.ops.bitplane import BitplaneMatcher

    model = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=64
    )
    rng = np.random.default_rng(11)
    B = 4096
    chars = rng.integers(0, 256, size=(B, 64)).astype(np.uint8)
    lengths = rng.integers(0, 65, size=(B,)).astype(np.int32)
    lengths[0] = 0
    monkeypatch.delenv("H2R_EN_PACK", raising=False)
    base = BitplaneMatcher(model, columns="witness", interpret=True)(
        chars, lengths
    )
    monkeypatch.setenv("H2R_EN_PACK", "1")
    for emit in ("bytes", "kdecode"):
        monkeypatch.setenv("H2R_EMIT", emit)
        out = BitplaneMatcher(model, columns="witness", interpret=True)(
            chars, lengths
        )
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(out[k]), err_msg=f"{emit} {k}"
            )


def test_qpack_fused_input_bit_exact(monkeypatch):
    """H2R_QPACK=1: the pack kernel reads [B, L] chars directly (raw_quads
    transpose fused in-kernel); combined with en-pack and kdecode the full
    candidate round-3 config stays bit-exact."""
    import numpy as np

    from fixtures import CONFIGS
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.ops.bitplane import BitplaneMatcher

    model = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=128
    )
    rng = np.random.default_rng(17)
    B = 4096
    chars = rng.integers(0, 256, size=(B, 128)).astype(np.uint8)
    lengths = rng.integers(0, 129, size=(B,)).astype(np.int32)
    for k in ("H2R_EMIT", "H2R_EN_PACK", "H2R_QPACK"):
        monkeypatch.delenv(k, raising=False)
    base = BitplaneMatcher(model, columns="witness", interpret=True)(
        chars, lengths
    )
    monkeypatch.setenv("H2R_QPACK", "1")
    monkeypatch.setenv("H2R_EN_PACK", "1")
    monkeypatch.setenv("H2R_EMIT", "kdecode")
    m = BitplaneMatcher(model, columns="witness", interpret=True)
    assert m._qpack
    out = m(chars, lengths)
    for k in base:
        np.testing.assert_array_equal(
            np.asarray(base[k]), np.asarray(out[k]), err_msg=k
        )


def test_match_only_mode():
    """columns="match": verdict-only pipeline (no witness decode) agrees
    with the full columns and feeds ScanJob counters (dict results)."""
    import numpy as np

    from fixtures import CONFIGS
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.ops.bitplane import BitplaneMatcher
    from halo2_regex_tpu.utils.trace import Counters

    model = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=64
    )
    rng = np.random.default_rng(3)
    B = 4096
    chars = rng.integers(0, 256, size=(B, 64)).astype(np.uint8)
    lengths = rng.integers(0, 65, size=(B,)).astype(np.int32)
    chars[5, :22] = np.frombuffer(b"from:alice@gmail.com\r\n", np.uint8)
    lengths[5] = 22
    full = BitplaneMatcher(model, interpret=True)(chars, lengths)
    m = BitplaneMatcher(model, columns="match", interpret=True)
    out = m(chars, lengths)
    assert set(out) == {"final_states", "accepted", "has_dead", "match_ok"}
    np.testing.assert_array_equal(
        np.asarray(out["match_ok"]), np.asarray(full.match_ok)
    )
    np.testing.assert_array_equal(
        np.asarray(out["accepted"]), np.asarray(full.accepted)
    )
    c = Counters().start()
    c.update(out, lengths)
    assert c.matched == int(np.asarray(full.match_ok).sum())
