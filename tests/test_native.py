"""Native C++ engine vs the Python oracle."""

import numpy as np
import pytest

from halo2_regex_tpu import native
from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops import reference as ref_ops
from halo2_regex_tpu.ops.scan_jax import pack_batch

from fixtures import CONFIGS

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native engine"
)

MAX_LEN = 64


@pytest.fixture(scope="module")
def model12():
    cfgs = [
        DecomposedRegexConfig.from_json(CONFIGS["regex1"]),
        DecomposedRegexConfig.from_json(CONFIGS["regex2"]),
    ]
    return CompiledRegexModel.from_decomposed(cfgs, max_chars_size=MAX_LEN)


def test_native_matches_oracle(model12):
    strings = [
        b"email was meant for @y. Also for x.",
        b"email was meant for @@",
        b"",
        b"email was meant for @yajk. Also for swq.",
    ]
    chars, lengths = pack_batch(strings, MAX_LEN)
    out = native.match_substrs_native(model12, chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model12.regex_defs, s, MAX_LEN)
        for k in [
            "all_enable_flags", "all_characters", "all_substr_ids",
            "masked_characters", "states", "substr_ids_per_def",
            "substr_id_sum", "is_start_sum", "is_end_sum", "fwd_mask",
            "bwd_mask", "mask", "accepted", "has_dead",
        ]:
            np.testing.assert_array_equal(
                out[k][i], np.asarray(getattr(oracle, k)), err_msg=f"{k} row {i}"
            )
        assert bool(out["match_ok"][i]) == bool(oracle.match_ok)


def test_native_fuzz_vs_oracle(model12):
    rng = np.random.default_rng(7)
    alphabet = np.array(sorted(set(range(32, 127)) | {9, 10, 13}), np.uint8)
    strings = []
    base = b"email was meant for @abc. Also for de."
    for _ in range(64):
        ln = int(rng.integers(0, MAX_LEN))
        s = bytearray(rng.choice(alphabet, size=ln))
        if rng.random() < 0.5:
            k = int(rng.integers(0, len(base)))
            s = bytearray(base[:k]) + s[: MAX_LEN - k]
        strings.append(bytes(s[:MAX_LEN]))
    chars, lengths = pack_batch(strings, MAX_LEN)
    out = native.match_substrs_native(model12, chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model12.regex_defs, s, MAX_LEN)
        np.testing.assert_array_equal(out["mask"][i], oracle.mask, err_msg=f"row {i}")
        np.testing.assert_array_equal(
            out["all_substr_ids"][i], oracle.all_substr_ids, err_msg=f"row {i}"
        )
        assert bool(out["match_ok"][i]) == bool(oracle.match_ok)


def test_pack_lines():
    data = b"hello\nworld\n\nlonger-line-here"
    chars, lengths, truncated = native.pack_lines(data, 8)
    assert chars.shape == (4, 8)
    assert lengths.tolist() == [5, 5, 0, 8]
    assert truncated == 1
    assert bytes(chars[0][:5]) == b"hello"
    assert bytes(chars[3]) == b"longer-l"


def test_pack_lines_trailing_newline():
    chars, lengths, _ = native.pack_lines(b"a\nb\n", 4)
    assert chars.shape == (2, 4)
    assert lengths.tolist() == [1, 1]


def test_pack_lines_keep_newline_native():
    import numpy as np

    from halo2_regex_tpu import native

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    c, l, t = native.pack_lines(b"ab\ncd\nef", 8, keep_newline=True)
    assert l.tolist() == [3, 3, 2]
    assert bytes(c[0][:3]) == b"ab\n"
    assert bytes(c[1][:3]) == b"cd\n"
    assert bytes(c[2][:2]) == b"ef"
    # truncation counts the restored byte toward max_len
    c, l, t = native.pack_lines(b"abcd\nx\n", 4, keep_newline=True)
    assert t == 1 and l.tolist() == [4, 2]
