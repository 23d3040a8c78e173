"""Pin the Parabix-style marker-stream prototype (tools/probe_tpu57_lib)
bit-exactly against Python ``re`` on CPU.

The prototype is the evidence base for the ROADMAP #6 (regex->bitstream
compilation) verdict, so its correctness must not depend on a hardware
probe run: match decisions for the restricted from-header form are
checked on adversarial corpora (valid headers, near-misses, mid-line
'from:', empty strings, headers not at end-of-string).
"""

import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import probe_tpu57_lib as mk  # noqa: E402
from halo2_regex_tpu.ops.bitplane import pack_bool, pack_bytes  # noqa: E402


def _corpus(rng, B, L):
    alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
    rows = []
    for i in range(B):
        name = rng.choice(alpha, size=int(rng.integers(1, 9))).tobytes()
        dom = rng.choice(alpha, size=int(rng.integers(1, 9))).tobytes()
        filler = rng.choice(alpha, size=int(rng.integers(0, 40))).tobytes()
        kind = i % 8
        if kind == 0:  # valid, mid-string line start
            s = filler + b"\r\nfrom:" + name + b"@" + dom + b"\r\n"
        elif kind == 1:  # valid at string start
            s = b"from:" + name + b"@" + dom + b"\r\n"
        elif kind == 2:  # missing end anchor (trailing bytes)
            s = b"\r\nfrom:" + name + b"@" + dom + b"\r\nx"
        elif kind == 3:  # 'from:' not at line start
            s = filler + b"xfrom:" + name + b"@" + dom + b"\r\n"
        elif kind == 4:  # no @
            s = b"\r\nfrom:" + name + dom + b"\r\n"
        elif kind == 5:  # empty name
            s = b"\r\nfrom:@" + dom + b"\r\n"
        elif kind == 6:  # junk
            s = filler
        else:  # empty / bare crlf
            s = b"" if i % 16 < 8 else b"\r\n"
        rows.append(s[:L])
    chars = np.zeros((B, L), np.uint8)
    lengths = np.zeros((B,), np.int32)
    for i, s in enumerate(rows):
        chars[i, : len(s)] = bytearray(s)
        lengths[i] = len(s)
    return chars, lengths


@pytest.mark.parametrize("seed", [0, 1])
def test_marker_match_reduced_vs_re(seed):
    B, L = 4096, 128  # one packed word group
    rng = np.random.default_rng(seed)
    chars, lengths = _corpus(rng, B, L)

    expect = np.array(
        [
            re.search(mk.PY_PATTERN, bytes(chars[i, : lengths[i]]), re.DOTALL)
            is not None
            for i in range(B)
        ]
    )
    exp_plane = np.asarray(
        pack_bool(jnp.asarray(expect[:, None].astype(np.uint8)), 1)
    )[0]

    planes8 = pack_bytes(jnp.asarray(chars), L)
    pos = np.arange(L)
    en_bl = pos[None, :] < lengths[:, None]
    en_plane = pack_bool(jnp.asarray(en_bl.astype(np.uint8)), L)
    en_next = np.concatenate([en_bl[:, 1:], np.zeros((B, 1), bool)], axis=1)
    end_plane = pack_bool(jnp.asarray((en_bl & ~en_next).astype(np.uint8)), L)

    out = np.asarray(
        jax.jit(
            lambda ps, en, end: mk.marker_match_reduced(
                [ps[j] for j in range(8)], en, end, jnp
            )
        )(jnp.stack(list(planes8)), en_plane, end_plane)
    )
    np.testing.assert_array_equal(out, exp_plane)
