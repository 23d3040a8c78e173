"""Witness tables and the constraint checker (MockProver equivalent)."""

import numpy as np
import pytest

from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops import reference as ref_ops
from halo2_regex_tpu.witness.checker import check_witness, verify
from halo2_regex_tpu.witness.tables import build_all_tables

from fixtures import CONFIGS

MAX_LEN = 64


@pytest.fixture(scope="module")
def model3():
    return CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=MAX_LEN
    )


@pytest.fixture(scope="module")
def model12():
    cfgs = [
        DecomposedRegexConfig.from_json(CONFIGS["regex1"]),
        DecomposedRegexConfig.from_json(CONFIGS["regex2"]),
    ]
    return CompiledRegexModel.from_decomposed(cfgs, max_chars_size=MAX_LEN)


def test_transition_table_shape_and_order(model3):
    """First row is the dummy row; remaining rows follow allstr file line
    order (table.rs:101-108); fixture regex3 has 1,960 transitions."""
    tables = build_all_tables(model3.regex_defs)
    trans, ends = tables[0]
    dummy = model3.regex_defs[0].allstr.largest_state_val + 1
    rows = trans.as_rows()
    assert rows[0] == (0, dummy, dummy, 0)
    assert len(rows) == 1 + len(model3.regex_defs[0].allstr.state_lookup)
    # line order: reconstruct from to_text and compare
    text_lines = model3.regex_defs[0].allstr.to_text().splitlines()[3:]
    for row, line in zip(rows[1:], text_lines):
        cur, nxt, char = map(int, line.split())
        assert row[:3] == (char, cur, nxt)


def test_endpoints_table(model3):
    tables = build_all_tables(model3.regex_defs)
    _, ends = tables[0]
    defs = model3.regex_defs[0]
    dummy = defs.allstr.largest_state_val + 1
    rows = ends.as_rows()
    assert rows[0] == (0, dummy, dummy)
    sub = defs.substrs[0]
    expected = [(1, s, dummy) for s in sub.start_states] + [
        (1, dummy, e) for e in sub.end_states
    ]
    assert rows[1:] == expected


def test_substr_id_offsets_across_defs(model12):
    """Global ids accumulate across defs (table.rs:61-66)."""
    tables = build_all_tables(model12.regex_defs)
    ids0 = {r[3] for r in tables[0][0].as_rows()} - {0}
    ids1 = {r[3] for r in tables[1][0].as_rows()} - {0}
    assert ids0 == {1}
    assert ids1 == {2}


@pytest.mark.parametrize(
    "s",
    [b"from:alice@gmail.com\r\n", b"dummy\r\nfrom:alice<alice@gmail.com>\r\n"],
)
def test_checker_accepts_valid_witness(model3, s):
    result = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
    assert verify(model3.regex_defs, result), check_witness(model3.regex_defs, result)[:5]


def test_checker_accepts_two_def_witness(model12):
    s = b"email was meant for @y. Also for x."
    result = ref_ops.match_substrs(model12.regex_defs, s, MAX_LEN)
    assert verify(model12.regex_defs, result)


@pytest.mark.parametrize(
    "s",
    [
        b"from:alice<alicegmail.com>\r\n",  # no @
        b"from:alice<alice@gmail.com>",  # no CRLF
        b"fromalice<alice@gmail.com>\r\n",  # no colon
    ],
)
def test_checker_rejects_invalid_inputs(model3, s):
    """The reference's negative tests: these witnesses must NOT verify
    (lib.rs:1372-1469)."""
    result = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
    assert not verify(model3.regex_defs, result)


def test_checker_rejects_tampered_states(model3):
    s = b"from:alice@gmail.com\r\n"
    result = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
    result.states[0, 3] += 1  # corrupt one state
    assert not verify(model3.regex_defs, result)


def test_checker_rejects_tampered_substr_id(model3):
    s = b"from:alice@gmail.com\r\n"
    result = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
    # claim a substring where there is none
    i = int(np.argmax(result.substr_ids_per_def[0] == 0))
    result.substr_ids_per_def[0, i] = 1
    assert not verify(model3.regex_defs, result)


def test_checker_rejects_tampered_enable(model3):
    s = b"from:alice@gmail.com\r\n"
    result = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
    result.all_enable_flags[0] = 0  # 0 -> 1 transition downstream
    assert not verify(model3.regex_defs, result)


def test_jax_witness_also_verifies(model3):
    from halo2_regex_tpu.ops.scan_jax import BatchMatcher

    res = BatchMatcher(model3).match_one(b"from:alice@gmail.com\r\n")
    assert verify(model3.regex_defs, res)


def test_witness_save_load_roundtrip(tmp_path, model3):
    import numpy as np

    from halo2_regex_tpu.witness.io import load_witness, save_witness

    s = b"from:alice@gmail.com\r\n"
    result = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
    path = tmp_path / "witness.npz"
    save_witness(path, model3.regex_defs, result)
    defs2, result2, tables = load_witness(path)
    for name in result.field_names():
        np.testing.assert_array_equal(
            np.asarray(getattr(result, name)), getattr(result2, name), err_msg=name
        )
    assert verify(defs2, result2)
    assert "t0_characters" in tables and "e0_start_states" in tables


def test_batch_checker_agrees_with_detailed(model3, model12):
    from halo2_regex_tpu.ops.scan_jax import BatchMatcher, pack_batch
    from halo2_regex_tpu.witness.checker import check_witness_batch

    strings = [
        b"from:alice@gmail.com\r\n",
        b"dummy\r\nfrom:alice<alice@gmail.com>\r\n",
        b"from:alice<alicegmail.com>\r\n",
        b"",
        b"fromalice<alice@gmail.com>\r\n",
    ]
    bm = BatchMatcher(model3)
    chars, lengths = pack_batch(strings, MAX_LEN)
    res = bm(chars, lengths)
    batch_ok = check_witness_batch(model3.regex_defs, res.to_numpy())
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
        assert batch_ok[i] == verify(model3.regex_defs, oracle), (i, s)


def test_batch_checker_catches_tampering(model3):
    s = b"from:alice@gmail.com\r\n"
    result = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
    from halo2_regex_tpu.witness.checker import check_witness_batch

    assert check_witness_batch(model3.regex_defs, result)[0]
    result.states[0, 3] += 1
    assert not check_witness_batch(model3.regex_defs, result)[0]


def test_checker_randomized_tamper_sweep(model3):
    """Any single-cell corruption of a valid witness's constrained columns
    must be caught by the checker (soundness property sweep)."""
    rng = np.random.default_rng(11)
    s = b"dummy\r\nfrom:alice<alice@gmail.com>\r\n"
    base = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
    assert verify(model3.regex_defs, base)
    import copy

    caught = 0
    total = 0
    for trial in range(40):
        r = copy.deepcopy(base)
        field = ["states", "substr_ids_per_def", "all_enable_flags"][trial % 3]
        arr = getattr(r, field)
        idx = tuple(int(rng.integers(0, d)) for d in arr.shape)
        # only corrupt within the enabled region where constraints bind
        pos = idx[-1]
        if pos >= len(s):
            continue
        old = arr[idx]
        arr[idx] = old + 1 + int(rng.integers(0, 3))
        total += 1
        if not verify(model3.regex_defs, r):
            caught += 1
    assert total > 10
    assert caught == total, f"checker missed {total - caught}/{total} tampers"
