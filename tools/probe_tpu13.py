"""TPU probe 13: capture the FULL Mosaic error for the slab kernel."""

import json
import sys
import traceback

sys.setrecursionlimit(100_000)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import numpy as np


def main():
    from fixtures import CONFIGS
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.ops.pallas_scan import PallasMatcher
    from halo2_regex_tpu.ops.scan_jax import pack_batch

    m3 = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=64
    )
    matcher = PallasMatcher(m3, batch_tile=128, slab=8)
    chars, lengths = pack_batch([b"from:alice@gmail.com\r\n"] * 128, 64)
    try:
        res = matcher(chars, lengths)
        print("OK", np.asarray(res.match_ok)[:2])
    except Exception:
        print(traceback.format_exc()[-6000:])


if __name__ == "__main__":
    main()
