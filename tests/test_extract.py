"""Device-side run extraction vs the host decoder."""

import numpy as np
import pytest

from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops import reference as ref_ops
from halo2_regex_tpu.ops.extract import extract_runs, runs_to_python
from halo2_regex_tpu.ops.scan_jax import BatchMatcher, pack_batch

from fixtures import CONFIGS

MAX_LEN = 64


@pytest.fixture(scope="module")
def model12():
    cfgs = [
        DecomposedRegexConfig.from_json(CONFIGS["regex1"]),
        DecomposedRegexConfig.from_json(CONFIGS["regex2"]),
    ]
    return CompiledRegexModel.from_decomposed(cfgs, max_chars_size=MAX_LEN)


def test_extract_runs_matches_host_decoder(model12):
    import jax

    strings = [
        b"email was meant for @y. Also for x.",
        b"email was meant for @yajk. Also for swq.",
        b"email was meant for @@",
        b"",
    ]
    m = BatchMatcher(model12)
    chars, lengths = pack_batch(strings, MAX_LEN)
    res = m(chars, lengths)
    out = jax.jit(
        lambda a, c: extract_runs(a, c, max_runs=4, max_len=8)
    )(res.all_substr_ids, res.masked_characters)
    for i in range(len(strings)):
        row = res.map(lambda x: np.asarray(x)[i])
        expect = ref_ops.extract_substrings(row)
        got = runs_to_python(out, i)
        assert got == expect, (i, got, expect)
        assert int(out["n_runs"][i]) == len(expect)


def test_extract_runs_overflow_flagged(model12):
    import jax

    # synthetic id pattern with 6 runs but max_runs=2
    a = np.zeros((1, 16), np.int32)
    for j, p in enumerate([1, 4, 7, 9, 12, 14]):
        a[0, p] = 1
    c = (a * 65).astype(np.int32)
    out = jax.jit(lambda x, y: extract_runs(x, y, max_runs=2))(a, c)
    assert int(out["n_runs"][0]) == 6
    assert np.asarray(out["offsets"][0]).tolist() == [1, 4]
