"""input_layout="tiled" — the pretiled input contract (docs/ROADMAP.md
item 2: qpack's gap to its bandwidth floor is the inherently strided
read of [B, L] u8 columns; the tiled contract moves the layout change
into the host corpus loader and makes every device read contiguous).

Covers: tile_corpus layout equivalence vs the device raw_quads tiling,
bit-exact witness/match emission vs the standard [B, L] pipeline
(single- and multi-def, ragged lengths, batch padding), match_one, and
the constructor validation (full columns / non-bytes emission refuse
loudly)."""

import numpy as np
import pytest

from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models import zoo
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops.bitplane import (
    LANE,
    BitplaneMatcher,
    raw_quads,
    tile_corpus,
    tile_corpus_jax,
)

from fixtures import CONFIGS


def _corpus(rng, B, L, plant=b"from:alice@gmail.com\r\n"):
    chars = rng.integers(32, 127, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(0, L + 1, size=(B,)).astype(np.int32)
    for i in range(0, B, 7):
        chars[i, : len(plant)] = np.frombuffer(plant, np.uint8)
        lengths[i] = len(plant)
    return chars, lengths


def test_tile_corpus_matches_raw_quads_tiling():
    rng = np.random.default_rng(1)
    B, L = 32 * LANE, 64
    chars = rng.integers(0, 256, size=(B, L)).astype(np.uint8)
    tiled = tile_corpus(chars, L)
    rq = np.asarray(raw_quads(chars, L)).reshape(L, 8, -1, LANE)
    assert np.array_equal(tiled, rq.transpose(2, 1, 0, 3))
    # device-side helper agrees with the host packer
    assert np.array_equal(np.asarray(tile_corpus_jax(chars, L)), tiled)


def test_tile_corpus_pads_batch_and_length():
    rng = np.random.default_rng(2)
    chars = rng.integers(0, 256, size=(5, 16)).astype(np.uint8)
    tiled = tile_corpus(chars, 32)
    assert tiled.shape == (1, 8, 32, LANE)
    # strings beyond B and positions beyond L read as zero bytes
    full = np.zeros((32 * LANE, 32), np.uint8)
    full[:5, :16] = chars
    assert np.array_equal(tiled, tile_corpus(full, 32))


@pytest.mark.parametrize("columns", ["witness", "match"])
def test_tiled_bit_exact_email_model(columns):
    model = zoo.email_headers_model(max_chars_size=128, headers=("from",))
    rng = np.random.default_rng(3)
    chars, lengths = _corpus(rng, 96, 128)
    std = BitplaneMatcher(model, interpret=True, columns=columns)
    tl = BitplaneMatcher(
        model, interpret=True, columns=columns, input_layout="tiled"
    )
    r1 = std(chars, lengths)
    r2 = tl(tile_corpus(chars, tl.L_pad), lengths)
    assert set(r1) == set(r2)
    for k in r1:
        a, b = np.asarray(r1[k]), np.asarray(r2[k])
        assert a.shape == b.shape and a.dtype == b.dtype, k
        assert np.array_equal(a, b), k


def test_tiled_bit_exact_multi_def():
    model = CompiledRegexModel.from_decomposed(
        [
            DecomposedRegexConfig.from_json(CONFIGS["regex1"]),
            DecomposedRegexConfig.from_json(CONFIGS["regex2"]),
        ],
        max_chars_size=64,
    )
    rng = np.random.default_rng(4)
    chars, lengths = _corpus(
        rng, 64, model.max_chars_size, plant=b"email was meant for @y. Also for x."
    )
    std = BitplaneMatcher(model, interpret=True, columns="witness")
    tl = BitplaneMatcher(
        model, interpret=True, columns="witness", input_layout="tiled"
    )
    r1 = std(chars, lengths)
    r2 = tl(tile_corpus(chars, tl.L_pad), lengths)
    for k in r1:
        assert np.array_equal(np.asarray(r1[k]), np.asarray(r2[k])), k
    assert np.asarray(r1["match_ok"]).any()


def test_tiled_match_one():
    model = zoo.email_headers_model(max_chars_size=128, headers=("from",))
    tl = BitplaneMatcher(
        model, interpret=True, columns="witness", input_layout="tiled"
    )
    res = tl.match_one(b"from:alice@gmail.com\r\n")
    assert bool(res["match_ok"])
    got = bytes(res["masked_characters"][res["masked_characters"] != 0])
    assert got == b"alice@gmail.com"


def test_scanjob_adopts_tiled_matcher(tmp_path):
    from halo2_regex_tpu.utils.jobs import ScanJob

    model = zoo.email_headers_model(max_chars_size=64, headers=("from",))
    lines = []
    for i in range(37):
        lines.append(b"from:a%d@b.cd\r" % i)
        lines.append(b"nope %d" % i)
    corpus = tmp_path / "corpus.txt"
    corpus.write_bytes(b"\n".join(lines) + b"\n")

    std = BitplaneMatcher(model, interpret=True, columns="match")
    tl = BitplaneMatcher(
        model, interpret=True, columns="match", input_layout="tiled"
    )
    a = ScanJob(std, [str(corpus)], batch_size=16, keep_newline=True).run()
    b = ScanJob(tl, [str(corpus)], batch_size=16, keep_newline=True).run()
    assert a.strings == b.strings and a.matched == b.matched
    assert a.matched == 37


def test_cli_scan_tiled(tmp_path, capsys):
    import json as _json

    from halo2_regex_tpu.cli import main

    cfg = tmp_path / "regex1.json"
    cfg.write_text(_json.dumps(CONFIGS["regex1"]))
    model_path = tmp_path / "model.npz"
    assert main([
        "compile", str(cfg), "--max-chars-size", "64", "-o", str(model_path)
    ]) == 0
    corpus = tmp_path / "corpus.txt"
    corpus.write_bytes(
        b"\n".join([b"email was meant for @y.", b"nope"] * 9) + b"\n"
    )
    capsys.readouterr()
    outs = {}
    for layout in ("bl", "tiled"):
        rc = main([
            "scan", "--model", str(model_path), "--batch", "8",
            "--input-layout", layout, str(corpus),
        ])
        assert rc == 0
        outs[layout] = _json.loads(capsys.readouterr().out.splitlines()[-1])
    assert outs["bl"]["strings"] == outs["tiled"]["strings"] == 18
    assert outs["bl"]["matched"] == outs["tiled"]["matched"] == 9
    # tiled + --print-matches refuses loudly (full columns need [B, L])
    assert main([
        "scan", "--model", str(model_path), "--input-layout", "tiled",
        "--print-matches", str(corpus),
    ]) == 2


def test_tiled_rejects_unsupported_modes():
    model = zoo.email_headers_model(max_chars_size=128, headers=("from",))
    with pytest.raises(ValueError, match="tiled"):
        BitplaneMatcher(model, interpret=True, input_layout="tiled")
    with pytest.raises(ValueError, match="tiled"):
        BitplaneMatcher(
            model, interpret=True, columns="witness", post="xla",
            input_layout="tiled",
        )
    with pytest.raises(ValueError, match="emit"):
        BitplaneMatcher(
            model, interpret=True, columns="witness", emit="planes",
            input_layout="tiled",
        )
    with pytest.raises(ValueError, match="input_layout"):
        BitplaneMatcher(model, interpret=True, input_layout="rowmajor")
