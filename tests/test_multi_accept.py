"""Multi-accept-state extension (opt-in; fixes the reference's optional-
tail footgun where only the first accepting DFA state is honored,
defs.rs:31-33)."""

import numpy as np
import pytest

from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops import reference as ref_ops
from halo2_regex_tpu.ops.bitplane import BitplaneMatcher
from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
from halo2_regex_tpu.ops.scan_jax import BatchMatcher, pack_batch

CFG = {
    "max_byte_size": 16,
    "parts": [{"is_public": False, "regex_def": "ab(c)?", "max_size": 3}],
}


@pytest.fixture(scope="module")
def cfg():
    return DecomposedRegexConfig.from_json(CFG)


def test_default_keeps_reference_semantics(cfg):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the drop IS this test's subject
        model = CompiledRegexModel.from_decomposed(cfg, max_chars_size=16)
    m = BatchMatcher(model)
    ok_ab = bool(m.match_one(b"ab").match_ok)
    ok_abc = bool(m.match_one(b"abc").match_ok)
    # reference records only the first accepting state: exactly one of the
    # two accepted forms survives
    assert ok_ab != ok_abc or (ok_ab and ok_abc) is False
    assert int(np.asarray(model.accept_mask).sum()) == 1


def test_multi_accept_accepts_both(cfg):
    model = CompiledRegexModel.from_decomposed(
        cfg, max_chars_size=16, multi_accept=True
    )
    assert int(np.asarray(model.accept_mask).sum()) == 2
    for backend in (
        BatchMatcher(model),
        PallasMatcher(model, batch_tile=4, interpret=True),
        BitplaneMatcher(model, interpret=True),
    ):
        assert bool(backend.match_one(b"ab").match_ok)
        assert bool(backend.match_one(b"abc").match_ok)
        assert not bool(backend.match_one(b"ac").match_ok)
        assert not bool(backend.match_one(b"abcc").match_ok)
    # oracle agrees (accept set flows through RegexDefs)
    oracle = ref_ops.match_substrs(model.regex_defs, b"ab", 16)
    assert bool(oracle.match_ok)
    oracle = ref_ops.match_substrs(model.regex_defs, b"abc", 16)
    assert bool(oracle.match_ok)


def test_multi_accept_round_trips_npz(tmp_path, cfg):
    model = CompiledRegexModel.from_decomposed(
        cfg, max_chars_size=16, multi_accept=True
    )
    path = tmp_path / "m.npz"
    model.save(path)
    loaded = CompiledRegexModel.load(path)
    np.testing.assert_array_equal(loaded.accept_mask, model.accept_mask)
    assert loaded.regex_defs[0].accept_states == model.regex_defs[0].accept_states
    assert bool(BatchMatcher(loaded).match_one(b"ab").match_ok)


def test_single_accept_compile_warns(cfg):
    """from_decomposed (the main compile API) warns when single-accept
    semantics silently drop accepting states (USER_GUIDE's promise)."""
    import warnings

    from halo2_regex_tpu.models.compiled import CompiledRegexModel

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        CompiledRegexModel.from_decomposed(cfg, max_chars_size=16)
    assert any("accepting states" in str(x.message) for x in w), [
        str(x.message) for x in w
    ]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        CompiledRegexModel.from_decomposed(
            cfg, max_chars_size=16, multi_accept=True
        )
    assert not any("accepting states" in str(x.message) for x in w)
