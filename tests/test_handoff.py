"""Prover hand-off artifact: golden-pinned row dump + external-style
verification (the analogue of the reference's keygen→prove→verify smoke
test, src/lib.rs:1152-1197, at the row/lookup level)."""

from pathlib import Path

import numpy as np
import pytest

from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
from halo2_regex_tpu.models.compiled import CompiledRegexModel
from halo2_regex_tpu.ops import reference as ref_ops
from halo2_regex_tpu.witness.handoff import (
    dump_prover_rows,
    load_prover_rows,
    verify_handoff,
)
from halo2_regex_tpu.witness.tables import build_all_tables

from fixtures import CONFIGS

GOLDEN = Path(__file__).parent / "golden" / "regex3_handoff.txt"
INPUT = b"from:alice@gmail.com\r\n"  # lib.rs:1316 test_substr_pass3


@pytest.fixture(scope="module")
def model3():
    return CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=64
    )


@pytest.fixture(scope="module")
def dump(model3):
    res = ref_ops.match_substrs(model3.regex_defs, INPUT, 64)
    assert bool(res.match_ok)
    return dump_prover_rows(
        model3.regex_defs,
        res,
        meta={
            "fixture": "regex3_test.json",
            "input": "from:alice@gmail.com\\r\\n",
            "max_chars_size": "64",
        },
    )


def test_golden_byte_identical(dump):
    """Regenerated dump matches the committed golden byte-for-byte —
    deterministic row orders (table.rs:102-108 line-index sort)."""
    assert dump == GOLDEN.read_text()


def test_external_verification_passes(dump):
    assert verify_handoff(load_prover_rows(dump)) == []


def test_round_trip_tables_and_advice(dump, model3):
    sections = load_prover_rows(dump)
    trans, ends = build_all_tables(model3.regex_defs)[0]
    assert sections["table transition def=0"].tolist() == [
        list(r) for r in trans.as_rows()
    ]
    assert sections["table endpoints def=0"].tolist() == [
        list(r) for r in ends.as_rows()
    ]
    res = ref_ops.match_substrs(model3.regex_defs, INPUT, 64)
    np.testing.assert_array_equal(
        sections["advice states def=0"], np.asarray(res.states)[0]
    )
    np.testing.assert_array_equal(
        sections["advice characters"], np.asarray(res.all_characters)
    )
    np.testing.assert_array_equal(
        sections["instance all_substr_ids"], np.asarray(res.all_substr_ids)
    )


def test_tampered_dump_is_caught(dump):
    """Flipping one assigned state must violate lookup (iii) — the checks
    are real, not vacuous."""
    sections = load_prover_rows(dump)
    states = sections["advice states def=0"].copy()
    states[3] = (states[3] + 1) % 20
    bad = dict(sections, **{"advice states def=0": states})
    assert any("lookup(iii)" in e for e in verify_handoff(bad))


def test_tampered_instance_is_caught(dump):
    sections = load_prover_rows(dump)
    mc = sections["instance masked_characters"].copy()
    # claim an extraction on a disabled row
    mc[-1] = 65
    bad = dict(sections, **{"instance masked_characters": mc})
    assert any("instance" in e for e in verify_handoff(bad))


def test_example_runs(tmp_path, capsys):
    import examples.prover_handoff as ex

    assert ex.main(str(tmp_path / "h.txt")) == 0
    outp = capsys.readouterr().out
    assert "hand-off verified" in outp and "123456" in outp


def test_cli_handoff(tmp_path, capsys):
    import json

    from halo2_regex_tpu.cli import main as cli_main

    cfg = {
        "max_byte_size": 64,
        "parts": [
            {"is_public": False, "regex_def": "id: ", "max_size": 4},
            {
                "is_public": True,
                "regex_def": "(0|1|2|3|4|5|6|7|8|9)+",
                "max_size": 8,
            },
        ],
    }
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(json.dumps(cfg))
    mp = tmp_path / "m.npz"
    assert (
        cli_main(
            ["compile", str(cfgp), "--max-chars-size", "64", "-o", str(mp)]
        )
        == 0
    )
    hp = tmp_path / "h.txt"
    assert (
        cli_main(["handoff", "--model", str(mp), "--output", str(hp), "id: 42"])
        == 0
    )
    out = capsys.readouterr().out
    assert "verification clean" in out
    from halo2_regex_tpu.witness.handoff import load_prover_rows

    sections = load_prover_rows(hp.read_text())
    assert "table transition def=0" in sections
    # non-matching input is refused without --allow-nonmatch
    assert (
        cli_main(["handoff", "--model", str(mp), "--output", str(hp), "nope"])
        == 1
    )


def test_cpp_external_verifier(tmp_path, dump):
    """A standalone C++ consumer (no Python package dependency) accepts the
    golden dump and rejects a tampered one — the external-prover smoke
    test in a second language."""
    import subprocess
    from pathlib import Path as P

    src = (
        P(__file__).parent.parent
        / "halo2_regex_tpu"
        / "native"
        / "handoff_check.cpp"
    )
    exe = tmp_path / "handoff_check"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-o", str(exe), str(src)], check=True
    )
    good = tmp_path / "good.txt"
    good.write_text(dump)
    r = subprocess.run([str(exe), str(good)], capture_output=True, text=True)
    assert r.returncode == 0 and "clean" in r.stdout

    lines = dump.splitlines()
    idx = lines.index("[advice states def=0]")
    lines[idx + 4] = str((int(lines[idx + 4]) + 1) % 20)
    bad = tmp_path / "bad.txt"
    bad.write_text("\n".join(lines) + "\n")
    r = subprocess.run([str(exe), str(bad)], capture_output=True, text=True)
    assert r.returncode == 1 and "lookup(iii)" in r.stderr


def test_malformed_dump_structural_errors(dump):
    """A truncated/hand-edited dump yields structured error entries, not a
    traceback (the verifier consumes untrusted text)."""
    sections = load_prover_rows(dump)
    # missing section
    bad = {k: v for k, v in sections.items() if k != "advice characters"}
    errs = verify_handoff(bad)
    assert errs and all("structure" in e for e in errs)
    # truncated states column
    import numpy as np

    bad2 = dict(sections)
    bad2["advice states def=0"] = sections["advice states def=0"][:-1]
    errs2 = verify_handoff(bad2)
    assert any("states has" in e for e in errs2)
