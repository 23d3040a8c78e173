"""Circom codegen parity tests (reference: src/vrm/circom.rs:74-111 smoke
test plus structural assertions on the emitted template)."""

import pytest

from halo2_regex_tpu.compiler.circom import gen_circom, gen_circom_allstr
from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig

from fixtures import EXAMPLE_CONFIG


@pytest.fixture(scope="module")
def config():
    return DecomposedRegexConfig.from_json(EXAMPLE_CONFIG)


def test_circom1_smoke(tmp_path, config):
    """Mirror of the reference's circom1_test (same decomposed config)."""
    out = tmp_path / "test1_regex.circom"
    text = gen_circom(config, out, "Test1Regex")
    assert out.read_text() == text
    assert text.startswith("pragma circom 2.1.5;")
    assert "template Test1Regex(msg_bytes)" in text


def test_state_recurrence_structure(config):
    nodes = config.compile_dfa()
    text = gen_circom_allstr(nodes, "T")
    n = len(nodes)
    # one-hot state vector per byte, state 0 as not-state_changed
    assert f"signal states[num_bytes+1][{n}];" in text
    assert "states[i+1][0] <== 1 - state_changed[i].out;" in text
    # init: state 0 hot
    assert "states[0][0] <== 1;" in text
    # the ^(94)->128 init-char feed
    assert "in[0]<==128;" in text
    # acceptance via MultiOR over the accept column
    from halo2_regex_tpu.compiler.pipeline import get_accepted_state

    acc = get_accepted_state(nodes)
    assert f"final_state_result.in[i] <== states[i][{acc}];" in text


def test_range_compression(config):
    """The lowercase a-z alternation must compress into LessThan pairs, not
    26 IsEqual gates (circom.js:114-156)."""
    nodes = config.compile_dfa()
    text = gen_circom_allstr(nodes, "T")
    assert "LessThan(8)" in text
    # 96 < in < 123 is the lowercase range
    assert "in[0] <== 96;" in text
    assert "in[1] <== 123;" in text


def test_reveal_logic(config):
    text = gen_circom(config, None, "T")
    assert "is_consecutive[msg_bytes][1] <== 1;" in text
    assert "signal output reveal0[msg_bytes];" in text
    assert "reveal0[i] <== in[i+1] * is_reveal0[i];" in text


def test_multi_accept_rejected():
    cfg = DecomposedRegexConfig.from_json(
        {
            "max_byte_size": 16,
            "parts": [{"is_public": False, "regex_def": "ab(c)?", "max_size": 3}],
        }
    )
    with pytest.raises(ValueError, match="accept"):
        gen_circom_allstr(cfg.compile_dfa(), "T")
