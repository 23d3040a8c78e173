"""Corpus loader tests."""

import numpy as np

from halo2_regex_tpu.utils.io import CorpusLoader, batch_iterator, pack_lines


def test_pack_lines_fallback_matches_native():
    data = b"alpha\nbeta\n\ngamma-longer-than-max\nd"
    chars, lengths, trunc = pack_lines(data, 8)
    assert lengths.tolist() == [5, 4, 0, 8, 1]
    assert trunc == 1
    assert bytes(chars[0][:5]) == b"alpha"
    assert bytes(chars[4][:1]) == b"d"


def test_batch_iterator_pads_final():
    chars = np.arange(50, dtype=np.uint8).reshape(10, 5)
    lengths = np.full(10, 5, np.int32)
    batches = list(batch_iterator(chars, lengths, 4))
    assert len(batches) == 3
    assert batches[2][0].shape == (4, 5)
    assert batches[2][1].tolist() == [5, 5, 0, 0]
    assert [b[2] for b in batches] == [4, 4, 2]


def test_corpus_loader_end_to_end(tmp_path):
    lines = [f"line-{i:04d}".encode() for i in range(103)]
    p1 = tmp_path / "a.txt"
    p2 = tmp_path / "b.txt"
    p1.write_bytes(b"\n".join(lines[:50]) + b"\n")
    p2.write_bytes(b"\n".join(lines[50:]) + b"\n")
    loader = CorpusLoader([str(p1), str(p2)], max_len=16, batch_size=16)
    seen = []
    for chars, lengths, n_valid in loader:
        for row, ln in zip(chars[:n_valid], lengths[:n_valid]):
            seen.append(bytes(row[:ln]))
    assert seen == lines


def test_corpus_loader_small_read_chunks(tmp_path):
    """Chunk boundaries mid-line must not lose or split lines."""
    lines = [b"x" * (i % 7 + 1) for i in range(37)]
    p = tmp_path / "c.txt"
    p.write_bytes(b"\n".join(lines) + b"\n")
    loader = CorpusLoader([str(p)], max_len=8, batch_size=8, read_chunk_bytes=13)
    seen = []
    for chars, lengths, n_valid in loader:
        for row, ln in zip(chars[:n_valid], lengths[:n_valid]):
            seen.append(bytes(row[:ln]))
    assert seen == lines


def test_corpus_loader_process_sharding(tmp_path):
    paths = []
    for i in range(4):
        p = tmp_path / f"f{i}.txt"
        p.write_bytes(f"file{i}\n".encode())
        paths.append(str(p))
    l0 = CorpusLoader(paths, 16, 4, process_index=0, process_count=2)
    l1 = CorpusLoader(paths, 16, 4, process_index=1, process_count=2)
    assert len(l0.paths) == 2 and len(l1.paths) == 2
    assert set(l0.paths) | set(l1.paths) == set(paths)


# ---------------------------------------------------------------------------
# Resumable scan jobs (utils/jobs.py)
# ---------------------------------------------------------------------------


def test_scan_job_checkpoint_resume(tmp_path):
    """Interrupted-then-resumed job reaches the same totals as one pass
    (at-least-once per chunk; counters/offsets survive the restart)."""
    import json

    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.ops.scan_jax import BatchMatcher
    from halo2_regex_tpu.utils.jobs import ScanJob

    from fixtures import CONFIGS

    model = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=32
    )
    matcher = BatchMatcher(model)

    lines = []
    for i in range(97):
        lines.append(b"from:a%d@b.cd\r" % i)  # \n added by join
        lines.append(b"nope %d" % i)
    corpus = tmp_path / "corpus.txt"
    corpus.write_bytes(b"\n".join(lines) + b"\n")

    # one-pass reference
    ref = ScanJob(matcher, [str(corpus)], batch_size=16).run()

    # interrupted run: tiny chunks, stop via an exception after 3 chunks
    ckpt = tmp_path / "job.json"
    calls = {"n": 0}

    class Stop(Exception):
        pass

    def bomb(res, chars, lengths, n_valid):
        calls["n"] += 1
        if calls["n"] == 3:
            raise Stop()

    job = ScanJob(
        matcher, [str(corpus)], checkpoint_path=str(ckpt),
        batch_size=16, chunk_bytes=256, on_batch=bomb,
    )
    try:
        job.run()
        raise AssertionError("expected interruption")
    except Stop:
        pass
    assert ckpt.exists()
    state = json.loads(ckpt.read_text())
    assert state["offset"] > 0 or state["file_idx"] > 0

    # resume to completion
    job2 = ScanJob(
        matcher, [str(corpus)], checkpoint_path=str(ckpt),
        batch_size=16, chunk_bytes=256,
    )
    out = job2.run()
    # at-least-once semantics: matched/strings can only exceed the
    # reference by whole re-done chunks, never undercount
    assert out.matched >= ref.matched
    assert out.strings >= ref.strings
    # every line matched in the reference is matched here (ratios equal on
    # the doubled work)
    assert out.matched * ref.strings == ref.matched * out.strings


def test_scan_job_oversize_line_not_split(tmp_path):
    """Regression (ADVICE r2): a line longer than chunk_bytes must be ONE
    truncated row, not several fragments (fragments could spuriously match
    and inflate strings/matched counters)."""
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.ops.scan_jax import BatchMatcher
    from halo2_regex_tpu.utils.jobs import ScanJob

    from fixtures import CONFIGS

    model = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=32
    )
    matcher = BatchMatcher(model)

    # a giant junk line whose TAIL, if split at chunk boundaries, would
    # start a fresh row that matches the from-header regex
    big = b"x" * 250 + b"from:a@b.cd\r"
    corpus = tmp_path / "corpus.txt"
    corpus.write_bytes(b"\n".join([b"from:ok@b.cd\r", big, b"nope"]) + b"\n")

    job = ScanJob(
        matcher, [str(corpus)], batch_size=8, chunk_bytes=64,
        keep_newline=True,
    )
    out = job.run()
    assert out.strings == 3  # one row per real line
    assert out.matched == 1  # only the first line; the big line is junk
    assert job.n_truncated == 1  # the big line, counted exactly once

    # identical totals with a chunk size that does not split anything
    ref = ScanJob(
        matcher, [str(corpus)], batch_size=8, keep_newline=True
    ).run()
    assert (out.strings, out.matched) == (ref.strings, ref.matched)


def test_pack_lines_keep_newline():
    # restores on-disk bytes: inner lines get their \n back, a final
    # unterminated line stays as-is (the email DFAs need the \r\n to
    # reach their accept state)
    c, l, t = pack_lines(b"ab\ncd\n", 8, keep_newline=True)
    assert l.tolist() == [3, 3]
    assert bytes(c[0][:3]) == b"ab\n" and bytes(c[1][:3]) == b"cd\n"
    c, l, t = pack_lines(b"ab\ncd", 8, keep_newline=True)
    assert l.tolist() == [3, 2] and bytes(c[1][:2]) == b"cd"
    c, l, t = pack_lines(b"abcdefgh\nx\n", 4, keep_newline=True)
    assert t == 1 and l.tolist() == [4, 2]


def test_corpus_loader_keep_newline_chunked(tmp_path):
    p = tmp_path / "x.txt"
    p.write_bytes(b"aaaa\nbb\ncccccc\ndd")
    rows = []
    loader = CorpusLoader(
        [str(p)], max_len=16, batch_size=2, read_chunk_bytes=7,
        keep_newline=True,
    )
    for ch, ln, nv in loader:
        for i in range(nv):
            rows.append(bytes(ch[i][: ln[i]]))
    assert rows == [b"aaaa\n", b"bb\n", b"cccccc\n", b"dd"]


def test_scan_job_prefetch_parity_and_errors(tmp_path):
    """Pipelined (prefetch) and unpipelined runs produce identical
    counters; reader-thread exceptions propagate to the caller."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.ops.scan_jax import BatchMatcher
    from halo2_regex_tpu.utils.jobs import ScanJob
    from fixtures import CONFIGS

    model = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=32
    )
    matcher = BatchMatcher(model)
    corpus = tmp_path / "c.txt"
    corpus.write_bytes(b"from:a@b.cd\r\nnope\nfrom:x@y.zw\r\n".replace(b"\\r", b"\r"))
    a = ScanJob(matcher, [str(corpus)], batch_size=4, prefetch=2).run()
    b = ScanJob(matcher, [str(corpus)], batch_size=4, prefetch=0).run()

    def stable(c):
        return {k: v for k, v in c.snapshot().items() if k != "wall_seconds"}

    assert stable(a) == stable(b)

    import pytest

    bad = ScanJob(matcher, [str(corpus), str(tmp_path / "missing.txt")],
                  batch_size=4, prefetch=2)
    with pytest.raises(FileNotFoundError):
        bad.run()


def test_scan_job_device_expand_parity(tmp_path):
    """device_expand (raw upload + on-device gather) produces identical
    counters and match results to the host-packed path."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from halo2_regex_tpu.compiler.decomposed import DecomposedRegexConfig
    from halo2_regex_tpu.models.compiled import CompiledRegexModel
    from halo2_regex_tpu.ops.scan_jax import BatchMatcher
    from halo2_regex_tpu.utils.jobs import ScanJob
    from fixtures import CONFIGS

    model = CompiledRegexModel.from_decomposed(
        DecomposedRegexConfig.from_json(CONFIGS["regex3"]), max_chars_size=32
    )
    matcher = BatchMatcher(model)
    corpus = tmp_path / "c.txt"
    lines = [b"from:a@b.cd\r", b"nope", b"from:x@y.zw\r", b""] * 7
    corpus.write_bytes(b"\n".join(lines) + b"\n")

    inputs = {"host": [], "dev": []}

    def collect(key):
        def cb(res, chars, lengths, n_valid):
            import numpy as np

            for i in range(n_valid):
                inputs[key].append(
                    (bytes(np.asarray(chars)[i][: lengths[i]]),
                     bool(np.asarray(res.match_ok)[i]))
                )

        return cb

    a = ScanJob(matcher, [str(corpus)], batch_size=8, keep_newline=True,
                device_expand=False, on_batch=collect("host"),
                chunk_bytes=64).run()
    b = ScanJob(matcher, [str(corpus)], batch_size=8, keep_newline=True,
                device_expand=True, on_batch=collect("dev"),
                chunk_bytes=64).run()

    def stable(c):
        return {k: v for k, v in c.snapshot().items() if k != "wall_seconds"}

    assert stable(a) == stable(b)
    assert inputs["host"] == inputs["dev"]
    assert any(ok for _, ok in inputs["host"])
