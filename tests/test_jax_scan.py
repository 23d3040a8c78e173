"""Bit-exactness of the XLA batched scan against the CPU oracle."""

import numpy as np
import pytest

from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops import reference as ref_ops
from halo2_regex_tpu.ops.scan_jax import BatchMatcher, pack_batch, prefix_transition_maps
from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig

from fixtures import CONFIGS, EXAMPLE_CONFIG

MAX_LEN = 64


@pytest.fixture(scope="module")
def model():
    cfgs = [
        DecomposedRegexConfig.from_json(CONFIGS["regex1"]),
        DecomposedRegexConfig.from_json(CONFIGS["regex2"]),
    ]
    return CompiledRegexModel.from_decomposed(cfgs, max_chars_size=MAX_LEN)


@pytest.fixture(scope="module")
def model3():
    return CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=MAX_LEN
    )


TEST_STRINGS_12 = [
    b"email was meant for @y. Also for x.",
    b"email was meant for @yajk. Also for swq.",
    b"email was meant for @@",
    b"",
    b"a",
]

TEST_STRINGS_3 = [
    b"from:alice@gmail.com\r\n",
    b"dummy\r\nfrom:alice<alice@gmail.com>\r\n",
    b"from:alice<alicegmail.com>\r\n",
    b"from:alice<alice@gmail.com>",
    b"fromalice<alice@gmail.com>\r\n",
    bytes([0, 1, 2]),
]


def assert_same(jax_res, oracle_res):
    for name in jax_res.field_names():
        a = np.asarray(getattr(jax_res, name)).astype(np.int64)
        b = np.asarray(getattr(oracle_res, name)).astype(np.int64)
        np.testing.assert_array_equal(a, b, err_msg=f"field {name}")


@pytest.mark.parametrize("s", TEST_STRINGS_12)
def test_batch_matcher_vs_oracle_12(model, s):
    matcher = BatchMatcher(model)
    jax_res = matcher.match_one(s)
    oracle = ref_ops.match_substrs(model.regex_defs, s, MAX_LEN)
    assert_same(jax_res, oracle)


@pytest.mark.parametrize("s", TEST_STRINGS_3)
def test_batch_matcher_vs_oracle_3(model3, s):
    matcher = BatchMatcher(model3)
    jax_res = matcher.match_one(s)
    oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
    assert_same(jax_res, oracle)


def test_batched_equals_oracle_rowwise(model3):
    matcher = BatchMatcher(model3)
    strings = TEST_STRINGS_3 + [b"from:bob@x.yz\r\n"]
    chars, lengths = pack_batch(strings, MAX_LEN)
    res = matcher(chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
        row = res.map(lambda a: np.asarray(a)[i])
        assert_same(row, oracle)


def test_fuzz_random_inputs(model):
    """Random strings over the fixture alphabet: batch scan == oracle."""
    rng = np.random.default_rng(0)
    alphabet = np.array(
        sorted(set(range(32, 127)) | {9, 10, 13}), dtype=np.uint8
    )
    strings = []
    base = b"email was meant for @q. Also for z."
    for _ in range(48):
        ln = int(rng.integers(0, MAX_LEN))
        s = bytearray(rng.choice(alphabet, size=ln))
        # bias half the cases toward near-matches
        if rng.random() < 0.5:
            k = int(rng.integers(0, len(base)))
            s = bytearray(base[:k]) + s[: MAX_LEN - k]
        strings.append(bytes(s[:MAX_LEN]))
    matcher = BatchMatcher(model)
    chars, lengths = pack_batch(strings, MAX_LEN)
    res = matcher(chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model.regex_defs, s, MAX_LEN)
        row = res.map(lambda a: np.asarray(a)[i])
        assert_same(row, oracle)


def test_prefix_transition_maps(model3):
    """Associative map-composition scan agrees with the sequential scan."""
    import jax.numpy as jnp

    s = b"dummy\r\nfrom:alice<alice@gmail.com>\r\n"
    chars = jnp.asarray(np.frombuffer(s, np.uint8).astype(np.int32))
    t = jnp.asarray(model3.transition[0])
    maps = prefix_transition_maps(t, chars)
    first = int(model3.first_states[0])
    states_via_maps = np.asarray(maps)[:, first]
    oracle_states, _ = ref_ops.derive_states(model3.regex_defs, s)
    np.testing.assert_array_equal(states_via_maps, np.asarray(oracle_states[0][1:]))


def test_model_save_load_roundtrip(tmp_path, model3):
    path = tmp_path / "model.npz"
    model3.save(path)
    loaded = CompiledRegexModel.load(path)
    np.testing.assert_array_equal(loaded.transition, model3.transition)
    np.testing.assert_array_equal(loaded.substr_id_table, model3.substr_id_table)
    np.testing.assert_array_equal(loaded.is_start_table, model3.is_start_table)
    s = b"from:alice@gmail.com\r\n"
    a = BatchMatcher(loaded).match_one(s)
    b = ref_ops.match_substrs(loaded.regex_defs, s, loaded.max_chars_size)
    assert_same(a, b)
