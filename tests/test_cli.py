"""CLI end-to-end tests (the `vrm` CLI parity surface + device commands)."""

import json
import subprocess
import sys

import pytest

from halo2_regex_tpu.cli import main

from fixtures import CONFIGS, EXPECTED_SHA256, sha256_text


@pytest.fixture()
def config_path(tmp_path):
    p = tmp_path / "regex1.json"
    p.write_text(json.dumps(CONFIGS["regex1"]))
    return p


def test_gen_halo2_texts(tmp_path, config_path, capsys):
    allstr = tmp_path / "allstr.txt"
    rc = main([
        "gen-halo2-texts",
        "--decomposed-regex-path", str(config_path),
        "--allstr-file-path", str(allstr),
        "--substrs-dir-path", str(tmp_path / "subs"),
    ])
    assert rc == 0
    assert sha256_text(allstr.read_text()) == EXPECTED_SHA256["regex1_allstr"]
    assert sha256_text((tmp_path / "subs" / "substr0.txt").read_text()) == (
        EXPECTED_SHA256["substr1"]
    )


def test_gen_circom(tmp_path, config_path):
    out = tmp_path / "regex1.circom"
    rc = main([
        "gen-circom",
        "--decomposed-regex-path", str(config_path),
        "--circom-file-path", str(out),
        "--template-name", "Regex1",
    ])
    assert rc == 0
    text = out.read_text()
    assert "template Regex1(msg_bytes)" in text
    assert "final_state_result" in text
    assert "reveal0" in text


def test_compile_and_match(tmp_path, config_path, capsys):
    model_path = tmp_path / "model.npz"
    rc = main([
        "compile", str(config_path), "--max-chars-size", "64",
        "-o", str(model_path),
    ])
    assert rc == 0
    capsys.readouterr()
    rc = main([
        "match", "--model", str(model_path),
        "email was meant for @y. Also for x.",
        "email was meant for @@",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["status"] == "MATCH"
    assert lines[0]["substrings"][0] == {"offset": 21, "text": "y", "substr_id": 1}
    assert lines[1]["status"] == "NO-MATCH"


def test_match_strict_exit_code(tmp_path, config_path, capsys):
    model_path = tmp_path / "model.npz"
    main(["compile", str(config_path), "--max-chars-size", "64", "-o", str(model_path)])
    capsys.readouterr()
    rc = main(["match", "--model", str(model_path), "--strict", "bad input"])
    assert rc == 1


def test_match_lines_file(tmp_path, config_path, capsys):
    model_path = tmp_path / "model.npz"
    main(["compile", str(config_path), "--max-chars-size", "64", "-o", str(model_path)])
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("email was meant for @ab. Also for cd.\nnope\n")
    capsys.readouterr()
    rc = main([
        "match", "--model", str(model_path),
        "--input-file", str(corpus), "--lines",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    assert lines[0]["status"] == "MATCH"
    assert lines[1]["status"] == "NO-MATCH"


def test_explain(tmp_path, config_path, capsys):
    model_path = tmp_path / "model.npz"
    main(["compile", str(config_path), "--max-chars-size", "64", "-o", str(model_path)])
    capsys.readouterr()
    rc = main(["explain", "--model", str(model_path), "email was meant for @y. Also for x."])
    assert rc == 0
    out = capsys.readouterr().out
    assert "match_ok: True" in out
    assert "extracted: [(21, 'y', 1)" in out
