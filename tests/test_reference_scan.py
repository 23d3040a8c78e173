"""Oracle scan tests using the reference's in-repo test oracles.

Inputs and expected (offset, substring, id) pairs are lifted from the
reference's MockProver tests (reference: src/lib.rs:1067-1469 and
examples/regex.rs:185-206 — SURVEY §8.5). Like those tests, the regex
definitions are regenerated from the decomposed JSON configs at test time,
so the whole compiler → defs → scan stack is integration-tested.
"""

import numpy as np
import pytest

from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models.defs import AllstrRegexDef, RegexDefs, SubstrRegexDef
from halo2_regex_tpu.ops import reference as ref_ops

from fixtures import CONFIGS, EXAMPLE_CONFIG

MAX_STRING_LEN = 1024  # lib.rs:930


def build_defs(config_dict) -> RegexDefs:
    cfg = DecomposedRegexConfig.from_json(config_dict)
    from halo2_regex_tpu.compiler.pipeline import dfa_to_regex_def_text

    nodes = cfg.compile_dfa()
    allstr = AllstrRegexDef.read_from_str(dfa_to_regex_def_text(nodes))
    substrs = [SubstrRegexDef.read_from_str(t) for t in cfg.substr_texts()]
    return RegexDefs(allstr=allstr, substrs=substrs)


@pytest.fixture(scope="module")
def defs12():
    return [build_defs(CONFIGS["regex1"]), build_defs(CONFIGS["regex2"])]


@pytest.fixture(scope="module")
def defs3():
    return [build_defs(CONFIGS["regex3"])]


def expected_masked(cases, mx=MAX_STRING_LEN):
    """Expected masked chars / substr ids from (offset, string, id) triples
    (lib.rs:1043-1059)."""
    chars = np.zeros(mx, dtype=np.int32)
    ids = np.zeros(mx, dtype=np.int32)
    for offset, s, sid in cases:
        for k, ch in enumerate(s.encode()):
            chars[offset + k] = ch
            ids[offset + k] = sid
    return chars, ids


def check(result, cases, mx=MAX_STRING_LEN):
    assert bool(result.match_ok)
    exp_chars, exp_ids = expected_masked(cases, mx)
    np.testing.assert_array_equal(result.masked_characters, exp_chars)
    np.testing.assert_array_equal(result.all_substr_ids, exp_ids)
    assert ref_ops.extract_substrings(result) == cases


def test_substr_pass1(defs12):
    """lib.rs:1067-1092."""
    s = b"email was meant for @y. Also for x."
    result = ref_ops.match_substrs(defs12, s, MAX_STRING_LEN)
    check(result, [(21, "y", 1), (33, "x", 2)])


def test_substr_pass2(defs12):
    """lib.rs:1094-1119."""
    s = b"email was meant for @yajk. Also for swq."
    result = ref_ops.match_substrs(defs12, s, MAX_STRING_LEN)
    check(result, [(21, "yajk", 1), (36, "swq", 2)])


def test_substr_fail1(defs12):
    """lib.rs:1121-1150: `@@` breaks regex1; the reference's prover fails."""
    s = b"email was meant for @@"
    result = ref_ops.match_substrs(defs12, s, MAX_STRING_LEN)
    assert not bool(result.match_ok)


def test_substr_pass3(defs3):
    """lib.rs:1316-1342."""
    s = b"from:alice@gmail.com\r\n"
    result = ref_ops.match_substrs(defs3, s, MAX_STRING_LEN)
    check(result, [(5, "alice@gmail.com", 1)])


def test_substr_pass4(defs3):
    """lib.rs:1344-1370: bracketed form."""
    s = b"dummy\r\nfrom:alice<alice@gmail.com>\r\n"
    result = ref_ops.match_substrs(defs3, s, MAX_STRING_LEN)
    check(result, [(18, "alice@gmail.com", 1)])


@pytest.mark.parametrize(
    "bad",
    [
        b"from:alice<alicegmail.com>\r\n",  # no @ (lib.rs:1372)
        b"from:alice<alice@gmail.com>",  # no CRLF (lib.rs:1405)
        b"fromalice<alice@gmail.com>\r\n",  # no colon (lib.rs:1438)
    ],
)
def test_substr_fail_regex3(defs3, bad):
    result = ref_ops.match_substrs(defs3, bad, MAX_STRING_LEN)
    assert not bool(result.match_ok)


def test_example_vitalik():
    """examples/regex.rs:185-206: MAX_STRING_LEN=128."""
    defs = [build_defs(EXAMPLE_CONFIG)]
    s = b"email was meant for @vitalik."
    result = ref_ops.match_substrs(defs, s, 128)
    assert bool(result.match_ok)
    exp_chars, exp_ids = expected_masked([(21, "vitalik", 1)], 128)
    np.testing.assert_array_equal(result.masked_characters, exp_chars)
    np.testing.assert_array_equal(result.all_substr_ids, exp_ids)


def test_state_rows_and_padding(defs3):
    """Padding semantics (lib.rs:404-418): final state at row len, dummy
    beyond; enable non-increasing."""
    s = b"from:alice@gmail.com\r\n"
    result = ref_ops.match_substrs(defs3, s, 64)
    d = defs3[0]
    dummy = d.allstr.largest_state_val + 1
    st = result.states[0]
    assert st[len(s)] == d.allstr.accepted_state_val
    assert (st[len(s) + 1 :] == dummy).all()
    en = result.all_enable_flags
    assert (np.diff(en) <= 0).all()
    assert en.sum() == len(s)


def test_dead_propagation(defs3):
    """Invalid transition propagates DEAD instead of panicking."""
    result = ref_ops.match_substrs(defs3, bytes([0, 1, 2]), 16)
    assert bool(result.has_dead[0])
    assert not bool(result.match_ok)
    dead = defs3[0].allstr.largest_state_val + 2
    assert result.states[0][3] == dead
