"""Text-table I/O parity with defs.rs."""

from halo2_regex_tpu.models.defs import AllstrRegexDef, SubstrRegexDef

from fixtures import reference_file

ALLSTR_SAMPLE = "0\n2\n23\n0 3 101\n1 2 46\n1 1 97\n"
SUBSTR_SAMPLE = "7\n0\n127\n23 \n1 \n1 1\n23 1\n"


def test_allstr_parse_fields():
    d = AllstrRegexDef.read_from_str(ALLSTR_SAMPLE)
    assert d.first_state_val == 0
    assert d.accepted_state_val == 2
    assert d.largest_state_val == 23
    # (char byte, cur) -> (line idx, next)  (defs.rs:100)
    assert d.state_lookup[(101, 0)] == (3, 3)
    assert d.state_lookup[(46, 1)] == (4, 2)
    assert d.state_lookup[(97, 1)] == (5, 1)


def test_allstr_roundtrip():
    d = AllstrRegexDef.read_from_str(ALLSTR_SAMPLE)
    assert d.to_text() == ALLSTR_SAMPLE


def test_substr_parse_fields():
    s = SubstrRegexDef.read_from_str(SUBSTR_SAMPLE)
    assert s.max_length == 7
    assert s.min_position == 0
    assert s.max_position == 127
    assert s.start_states == [23]
    assert s.end_states == [1]
    assert s.valid_state_transitions == {(1, 1), (23, 1)}


def test_substr_roundtrip():
    s = SubstrRegexDef.read_from_str(SUBSTR_SAMPLE)
    assert s.to_text() == SUBSTR_SAMPLE


def test_reference_fixture_roundtrip():
    """Parsing a reference fixture and re-serializing reproduces it."""
    text = reference_file("test_regexes/regex3_test_lookup.txt")
    if text is None:
        return
    d = AllstrRegexDef.read_from_str(text)
    assert d.to_text() == text
    sub = reference_file("test_regexes/substr3_test_lookup.txt")
    s = SubstrRegexDef.read_from_str(sub)
    assert s.to_text() == sub
