"""Randomized conformance: generate random decomposed configs, compile,
and cross-check all scan backends on random inputs (including mutated
near-matches). Complements the fixture tests with breadth."""

import numpy as np
import pytest

from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops import reference as ref_ops
from halo2_regex_tpu.ops.scan_jax import BatchMatcher, pack_batch
from halo2_regex_tpu.witness.checker import verify

MAX_LEN = 48


def random_part(rng, public: bool):
    """A random toy-grammar part and a generator of matching strings."""
    choices = []
    # literal word
    word = "".join(rng.choice(list("abcxyz.@- ")) for _ in range(rng.integers(1, 6)))
    choices.append((word.replace("\\", ""), lambda w=word: w))
    # alternation-plus
    chars = rng.choice(list("abcdefg0123"), size=rng.integers(2, 5), replace=False)
    alt = "(" + "|".join(chars) + ")+"

    def gen_alt(chars=chars):
        n = rng.integers(1, 5)
        return "".join(rng.choice(chars) for _ in range(n))

    choices.append((alt, gen_alt))
    # optional group
    opt_word = "".join(rng.choice(list("qrs")) for _ in range(2))
    choices.append(
        ("(" + opt_word + ")?", lambda w=opt_word: w if rng.random() < 0.5 else "")
    )
    idx = int(rng.integers(0, len(choices)))
    if public:
        idx = 1  # public parts need guaranteed content: use the alternation
    return choices[idx]


def random_config(rng):
    n_parts = int(rng.integers(2, 5))
    public_idx = int(rng.integers(0, n_parts))
    parts = []
    gens = []
    for i in range(n_parts):
        regex, gen = random_part(rng, public=(i == public_idx))
        parts.append(
            {
                "is_public": i == public_idx,
                "regex_def": regex,
                "max_size": MAX_LEN,
            }
        )
        gens.append(gen)
    # terminal literal so the accept state is unique more often
    parts.append({"is_public": False, "regex_def": "!", "max_size": 1})
    gens.append(lambda: "!")
    return {"max_byte_size": MAX_LEN, "parts": parts}, gens


@pytest.mark.parametrize("seed", range(12))
def test_random_config_conformance(seed):
    rng = np.random.default_rng(seed)
    cfg_json, gens = random_config(rng)
    cfg = DecomposedRegexConfig.from_json(cfg_json)
    try:
        model = CompiledRegexModel.from_decomposed(cfg, max_chars_size=MAX_LEN)
    except Exception:
        pytest.skip("degenerate random config (e.g. empty-matching part)")

    # build matching strings + mutations
    strings = []
    for _ in range(6):
        s = "".join(g() for g in gens).encode()[:MAX_LEN]
        strings.append(s)
        if len(s) > 2:
            mut = bytearray(s)
            mut[int(rng.integers(0, len(s)))] ^= 0x15
            strings.append(bytes(mut))
    strings.append(b"")

    matcher = BatchMatcher(model)
    chars, lengths = pack_batch(strings, MAX_LEN)
    res = matcher(chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model.regex_defs, s, MAX_LEN)
        row = res.map(lambda a: np.asarray(a)[i])
        for name in row.field_names():
            np.testing.assert_array_equal(
                np.asarray(getattr(row, name)).astype(np.int64),
                np.asarray(getattr(oracle, name)).astype(np.int64),
                err_msg=f"seed {seed} row {i} field {name} input {s!r}",
            )
        # witnesses of accepted inputs must verify; the checker must also
        # agree with match_ok on rejects reachable without dead states
        if bool(oracle.match_ok):
            assert verify(model.regex_defs, oracle), (seed, i, s)


def test_native_agrees_on_random_configs():
    from halo2_regex_tpu import native

    if not native.available():
        pytest.skip("no native engine")
    rng = np.random.default_rng(99)
    cfg_json, gens = random_config(rng)
    cfg = DecomposedRegexConfig.from_json(cfg_json)
    try:
        model = CompiledRegexModel.from_decomposed(cfg, max_chars_size=MAX_LEN)
    except Exception:
        pytest.skip("degenerate random config")
    strings = [("".join(g() for g in gens)).encode()[:MAX_LEN] for _ in range(8)]
    chars, lengths = pack_batch(strings, MAX_LEN)
    out = native.match_substrs_native(model, chars, lengths)
    for i, s in enumerate(strings):
        oracle = ref_ops.match_substrs(model.regex_defs, s, MAX_LEN)
        np.testing.assert_array_equal(out["mask"][i], oracle.mask)
        np.testing.assert_array_equal(out["all_substr_ids"][i], oracle.all_substr_ids)
