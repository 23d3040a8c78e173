"""Model builders shared by the benchmark suite (fixture configs)."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from fixtures import CONFIGS  # noqa: E402

from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig  # noqa: E402
from halo2_regex_tpu.models.compiled import CompiledRegexModel  # noqa: E402


def regex1_model(max_chars_size=128):
    return CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex1"]),
        max_chars_size=max_chars_size,
    )


def combined_model(max_chars_size=1024):
    cfgs = [DecomposedRegexConfig.from_json(CONFIGS[k]) for k in
            ("regex1", "regex2", "regex3")]
    return CompiledRegexModel.from_decomposed(cfgs, max_chars_size=max_chars_size)
