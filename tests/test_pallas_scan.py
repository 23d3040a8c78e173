"""Fused Pallas kernel vs the oracle (interpret mode on CPU; the same
kernel compiles for TPU — tools/probe_tpu*.py and bench.py exercise it on
hardware)."""

import numpy as np
import pytest

from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops import reference as ref_ops
from halo2_regex_tpu.ops.pallas_scan import PallasMatcher, build_packed_tables
from halo2_regex_tpu.ops.scan_jax import pack_batch

from fixtures import CONFIGS

MAX_LEN = 64


@pytest.fixture(scope="module")
def model3():
    return CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]),
        max_chars_size=MAX_LEN,
        state_pad_multiple=8,
    )


@pytest.fixture(scope="module")
def model12():
    cfgs = [
        DecomposedRegexConfig.from_json(CONFIGS["regex1"]),
        DecomposedRegexConfig.from_json(CONFIGS["regex2"]),
    ]
    return CompiledRegexModel.from_decomposed(cfgs, max_chars_size=MAX_LEN)


def assert_same(a, b):
    for name in a.field_names():
        x = np.asarray(getattr(a, name)).astype(np.int64)
        y = np.asarray(getattr(b, name)).astype(np.int64)
        np.testing.assert_array_equal(x, y, err_msg=f"field {name}")


def test_packed_tables_shape(model3):
    t = build_packed_tables(model3)
    assert t.shape == (1, 256, 4 * model3.s_pad)
    # next-state block must equal the transition table
    np.testing.assert_array_equal(t[0, :, : model3.s_pad], model3.transition[0])


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


def test_pallas_interpret_vs_oracle(model3):
    matcher = PallasMatcher(model3, batch_tile=8, interpret=True)
    chars, lengths = pack_batch(STRINGS3, MAX_LEN)
    res = matcher(chars, lengths)
    for i, s in enumerate(STRINGS3):
        oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
        row = res.map(lambda a: np.asarray(a)[i])
        assert_same(row, oracle)


def test_pallas_interpret_multi_def(model12):
    matcher = PallasMatcher(model12, batch_tile=8, interpret=True)
    strings = [
        b"email was meant for @y. Also for x.",
        b"email was meant for @yajk. Also for swq.",
        b"email was meant for @@",
        b"",
    ]
    chars, lengths = pack_batch(strings, MAX_LEN)
    res = matcher(chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model12.regex_defs, s, MAX_LEN)
        row = res.map(lambda a: np.asarray(a)[i])
        assert_same(row, oracle)


def test_pallas_batch_padding(model3):
    """Batch not divisible by the tile gets padded and truncated."""
    matcher = PallasMatcher(model3, batch_tile=8, interpret=True)
    strings = STRINGS3[:3]
    chars, lengths = pack_batch(strings, MAX_LEN)
    res = matcher(chars, lengths)
    assert np.asarray(res.match_ok).shape == (3,)
    oracle = ref_ops.match_substrs(model3.regex_defs, strings[0], MAX_LEN)
    row = res.map(lambda a: np.asarray(a)[0])
    assert_same(row, oracle)


def test_pallas_chunk_param_inert_in_batch_mode(model3):
    """grid_mode="batch" forces whole-L blocks; a chunk argument is inert."""
    matcher = PallasMatcher(model3, batch_tile=8, chunk=16, interpret=True)
    chars, lengths = pack_batch(STRINGS3, MAX_LEN)
    res = matcher(chars, lengths)
    for i, s in enumerate(STRINGS3):
        oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
        row = res.map(lambda a: np.asarray(a)[i])
        assert_same(row, oracle)


def test_pallas_class_compression_active(model3):
    """The email DFA's byte map must collapse to a small class count."""
    m = PallasMatcher(model3, batch_tile=8, interpret=True)
    use_classes, cls0, terms, ctab = m.class_info[0]
    assert use_classes
    assert ctab.shape[0] <= 32  # few equivalence classes
    # boundary representation reproduces the exact byte->class map
    from halo2_regex_tpu.ops.pallas_scan import build_packed_tables, byte_classes

    class_of, _ = byte_classes(build_packed_tables(m.model)[0])
    recon = np.full(256, cls0)
    for b_r, delta in terms:
        recon[b_r:] += delta
    np.testing.assert_array_equal(recon, class_of)


def test_pallas_take_along_extract_mode(model3):
    """The take_along fallback extraction is also bit-exact."""
    matcher = PallasMatcher(
        model3, batch_tile=8, chunk=16, interpret=True, extract="take_along"
    )
    chars, lengths = pack_batch(STRINGS3[:4], MAX_LEN)
    res = matcher(chars, lengths)
    for i, s in enumerate(STRINGS3[:4]):
        oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
        row = res.map(lambda a: np.asarray(a)[i])
        assert_same(row, oracle)


def test_pallas_chunked_mode_removed(model3):
    """grid_mode="chunked" was quarantined (Mosaic SIGABRT, r3): clear error."""
    with pytest.raises(ValueError, match="chunked"):
        PallasMatcher(model3, batch_tile=8, interpret=True, grid_mode="chunked")


def test_pallas_fused_defs_mode(model12):
    """Multi-def lane packing: one joint-class matmul serves all defs."""
    matcher = PallasMatcher(model12, batch_tile=8, interpret=True)
    assert matcher.fuse_defs, "two small defs should fuse"
    strings = [
        b"email was meant for @y. Also for x.",
        b"email was meant for @yajk. Also for swq.",
        b"email was meant for @@",
        b"",
    ]
    chars, lengths = pack_batch(strings, MAX_LEN)
    res = matcher(chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model12.regex_defs, s, MAX_LEN)
        row = res.map(lambda a: np.asarray(a)[i])
        assert_same(row, oracle)


def test_pallas_monolithic_mode(model3):
    """The monolithic (single fused kernel) mode stays bit-exact."""
    matcher = PallasMatcher(model3, batch_tile=8, interpret=True, mode="monolithic")
    chars, lengths = pack_batch(STRINGS3[:4], MAX_LEN)
    res = matcher(chars, lengths)
    for i, s in enumerate(STRINGS3[:4]):
        oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
        row = res.map(lambda a: np.asarray(a)[i])
        assert_same(row, oracle)


def test_pallas_split_mode_active_by_default(model3, model12):
    assert PallasMatcher(model3, batch_tile=8, interpret=True).mode == "split"
    m = PallasMatcher(model12, batch_tile=8, interpret=True)
    assert m.mode == "split"
    strings = [b"email was meant for @y. Also for x.", b""]
    chars, lengths = pack_batch(strings, MAX_LEN)
    res = m(chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model12.regex_defs, s, MAX_LEN)
        assert_same(res.map(lambda a: np.asarray(a)[i]), oracle)


def test_split_stride2_active(model3):
    m = PallasMatcher(model3, batch_tile=8, interpret=True)
    assert m.mode == "split" and m.scan_stride == 2


def test_split_stride1_many_classes():
    """A literal with many distinct bytes exceeds k^2<=256; the split scan
    falls back to stride 1 and stays bit-exact."""
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel

    cfg = DecomposedRegexConfig.from_json(
        {
            "max_byte_size": 48,
            "parts": [
                {"is_public": False, "regex_def": "abcdefghijklmnopqrstuv:", "max_size": 24},
                {"is_public": True, "regex_def": "(x|y|z)+", "max_size": 8},
                {"is_public": False, "regex_def": "!", "max_size": 1},
            ],
        }
    )
    model = CompiledRegexModel.from_decomposed(cfg, max_chars_size=48)
    m = PallasMatcher(model, batch_tile=8, interpret=True)
    assert m.mode == "split" and m.scan_stride == 1
    strings = [b"abcdefghijklmnopqrstuv:xyzx!", b"abcdef", b""]
    chars, lengths = pack_batch(strings, 48)
    res = m(chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model.regex_defs, s, 48)
        assert_same(res.map(lambda a: np.asarray(a)[i]), oracle)


@pytest.mark.parametrize("L", [50, 51, 1])
def test_pallas_odd_lengths(model3, L):
    """max_chars_size that doesn't divide the slab (or is odd/1) still
    works: SLAB shrinks and stride-2 disables as needed."""
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel

    from fixtures import CONFIGS

    model = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=L
    )
    m = PallasMatcher(model, batch_tile=8, interpret=True)
    strings = [b"from:a@b.cd\r\n"[:L], b"", b"x" * L]
    chars, lengths = pack_batch(strings, L)
    res = m(chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model.regex_defs, s, L)
        assert_same(res.map(lambda a: np.asarray(a)[i]), oracle)


def test_split_int8_tables(model3):
    """int8 one-hot matmul tables (offset -128, re-added post-matmul) are
    bit-exact on the split path."""
    m = PallasMatcher(
        model3, batch_tile=4, interpret=True, mode="split",
        table_dtype="int8",
    )
    chars, lengths = pack_batch(STRINGS3, MAX_LEN)
    res = m(chars, lengths)
    from halo2_regex_tpu.ops import reference as ref_ops

    for i, s in enumerate(STRINGS3):
        oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
        assert_same(res.map(lambda a, i=i: np.asarray(a)[i]), oracle)


def test_segmented_int8_hi_lo():
    """int8 tables on the segmented >256-state path (configs[3] shape)."""
    import os

    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.models.defs import AllstrRegexDef, RegexDefs
    from halo2_regex_tpu.ops import reference as ref_ops

    rng = np.random.default_rng(11)
    S, L = 300, 32
    allstr = AllstrRegexDef(
        first_state_val=0, accepted_state_val=1, largest_state_val=S - 1
    )
    line = 3
    for c in range(97, 101):
        for s in range(S):
            allstr.state_lookup[(c, s)] = (line, int(rng.integers(0, S)))
            line += 1
    model = CompiledRegexModel.from_defs(
        [RegexDefs(allstr=allstr, substrs=[])], max_chars_size=L
    )
    os.environ["H2R_SEGMENT"] = "16"
    try:
        m = PallasMatcher(
            model, batch_tile=4, interpret=True, grid_mode="segmented",
            table_dtype="int8",
        )
        strings = [
            rng.integers(97, 101, size=L).astype(np.uint8).tobytes()
            for _ in range(4)
        ]
        chars, lengths = pack_batch(strings, L)
        res = m(chars, lengths)
        for i, s in enumerate(strings):
            oracle = ref_ops.match_substrs(model.regex_defs, s, L)
            assert_same(res.map(lambda a, i=i: np.asarray(a)[i]), oracle)
    finally:
        del os.environ["H2R_SEGMENT"]


def test_segmented_split_matches_oracle(model3):
    """Segmented mode (1D grids, carries threaded through kernel inputs at
    the XLA level — the hardware-safe long-input form)."""
    import os

    os.environ["H2R_SEGMENT"] = "16"
    try:
        m = PallasMatcher(
            model3, batch_tile=4, interpret=True, grid_mode="segmented",
            mode="split",
        )
        assert m.grid_mode == "segmented" and m.segment == 16
        chars, lengths = pack_batch(STRINGS3, MAX_LEN)
        res = m(chars, lengths)
        for i, s in enumerate(STRINGS3):
            oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
            assert_same(res.map(lambda a, i=i: np.asarray(a)[i]), oracle)
    finally:
        del os.environ["H2R_SEGMENT"]


def test_segmented_non_pow2_segment_stays_exact(model3):
    """Regression (ADVICE r2): a non-power-of-two H2R_SEGMENT used to shrink
    the shared SLAB after the flat/split kernels closed over it, silently
    leaving tail positions unscanned in the DEFAULT (batch) matcher."""
    import os

    # 48 does not divide MAX_LEN=64, so LS collapses to 1: the old code then
    # shrank SLAB to 1 and the flat kernel covered 8 of 64 positions.
    os.environ["H2R_SEGMENT"] = "48"
    try:
        m = PallasMatcher(model3, batch_tile=8, interpret=True)
        chars, lengths = pack_batch(STRINGS3, MAX_LEN)
        res = m(chars, lengths)
        for i, s in enumerate(STRINGS3):
            oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
            assert_same(res.map(lambda a, i=i: np.asarray(a)[i]), oracle)
        # and the segmented matcher itself still tiles L correctly
        m2 = PallasMatcher(
            model3, batch_tile=4, interpret=True, grid_mode="segmented",
            mode="split",
        )
        res2 = m2(chars, lengths)
        for i, s in enumerate(STRINGS3):
            oracle = ref_ops.match_substrs(model3.regex_defs, s, MAX_LEN)
            assert_same(res2.map(lambda a, i=i: np.asarray(a)[i]), oracle)
    finally:
        del os.environ["H2R_SEGMENT"]


def test_segmented_two_defs(model12):
    import os

    os.environ["H2R_SEGMENT"] = "32"
    try:
        m = PallasMatcher(
            model12, batch_tile=4, interpret=True, grid_mode="segmented",
            mode="split",
        )
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
    finally:
        del os.environ["H2R_SEGMENT"]


def test_segmented_hi_lo_large_dfa():
    """>256-state model on the segmented path (the configs[3] shape,
    scaled down for interpret mode)."""
    import os

    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.models.defs import AllstrRegexDef, RegexDefs

    rng = np.random.default_rng(7)
    S = 300
    L = 64
    allstr = AllstrRegexDef(
        first_state_val=0, accepted_state_val=1, largest_state_val=S - 1
    )
    line = 3
    for c in range(97, 103):
        for s in range(S):
            allstr.state_lookup[(c, s)] = (line, int(rng.integers(0, S)))
            line += 1
    model = CompiledRegexModel.from_defs(
        [RegexDefs(allstr=allstr, substrs=[])], max_chars_size=L
    )
    os.environ["H2R_SEGMENT"] = "16"
    try:
        m = PallasMatcher(
            model, batch_tile=4, interpret=True, grid_mode="segmented",
        )
        assert m.hi_lo and m.grid_mode == "segmented"
        strings = [
            rng.integers(97, 103, size=L).astype(np.uint8).tobytes()
            for _ in range(4)
        ]
        chars, lengths = pack_batch(strings, L)
        res = m(chars, lengths)
        for i, s in enumerate(strings):
            oracle = ref_ops.match_substrs(model.regex_defs, s, L)
            assert_same(res.map(lambda a, i=i: np.asarray(a)[i]), oracle)
    finally:
        del os.environ["H2R_SEGMENT"]
