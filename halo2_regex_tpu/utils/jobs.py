"""Resumable corpus-scan jobs: checkpoint/restart for long-running scans.

The reference has no runtime checkpointing (SURVEY §5.4: its text tables
are the only serialization layer).  For production corpus scanning this
module adds chunk-granular at-least-once resume: a job walks its corpus
files in fixed byte chunks (cut at newline boundaries), streams each
chunk's padded batches through a matcher, and persists
``(file index, byte offset, counters)`` as JSON after every chunk.  On
restart the job seeks straight to the recorded offset — work since the
last checkpoint is redone, never skipped.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import numpy as np

from .io import batch_iterator, flat_line_index, pack_lines
from .trace import Counters


@dataclass
class JobState:
    file_idx: int = 0
    offset: int = 0
    n_truncated: int = 0
    counters: dict = field(default_factory=dict)

    @classmethod
    def load(cls, path) -> "JobState":
        with open(path) as f:
            return cls(**json.load(f))

    def save(self, path) -> None:
        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            json.dump(self.__dict__, f)
        os.replace(tmp, path)  # atomic on POSIX


class ScanJob:
    """Checkpointable scan over newline-delimited corpus files.

    Args:
      matcher: any batched matcher (``ops.best_matcher``).
      paths: corpus files (processed in sorted order).
      checkpoint_path: JSON state file; absent -> fresh start.
      batch_size / max_len: batch shape (max_len defaults to the model's).
      chunk_bytes: checkpoint granularity.
      on_batch: optional callback ``(result, chars, lengths, n_valid)``.
    """

    def __init__(
        self,
        matcher,
        paths: Sequence[str],
        checkpoint_path: Optional[str] = None,
        batch_size: int = 1024,
        max_len: Optional[int] = None,
        chunk_bytes: int = 64 << 20,
        on_batch: Optional[Callable] = None,
        keep_newline: bool = False,
        prefetch: int = 2,
        device_expand: Optional[bool] = None,
    ):
        self.matcher = matcher
        self.paths: List[str] = sorted(paths)
        self.checkpoint_path = checkpoint_path
        self.batch_size = batch_size
        self.max_len = max_len or matcher.model.max_chars_size
        self.chunk_bytes = chunk_bytes
        self.on_batch = on_batch
        self.keep_newline = keep_newline
        # chunks read+packed ahead of the device by a worker thread (the
        # ctypes packer releases the GIL); 0 disables pipelining.
        self.prefetch = prefetch
        # device_expand: upload each chunk's RAW bytes once and gather the
        # padded [B, max_len] rows ON DEVICE (ops.scan_jax.expand_rows) —
        # nominally cuts host->device traffic by the padding inflation
        # (max_len/avg_line_len, ~5x for 1 KB pads over email lines).
        # Default OFF: on the relay-attached chip it measured SLOWER (165 s
        # vs 103 s over a 512 MB corpus — the tunnel compresses the zero
        # padding away, so raw upload saves nothing while the gather adds
        # device work). Opt in on hardware with an uncompressed
        # host<->device link.
        self.device_expand = bool(device_expand)
        self.n_truncated = 0  # total truncated lines after run()

    def _raw_chunks(self, state: JobState):
        """Yield (file_idx, end_offset, data bytes) per corpus chunk (cut
        at newline boundaries), starting from the checkpointed position."""
        for file_idx in range(state.file_idx, len(self.paths)):
            path = self.paths[file_idx]
            offset = state.offset if file_idx == state.file_idx else 0
            size = os.path.getsize(path)
            with open(path, "rb") as f:
                while offset < size:
                    f.seek(offset)
                    data = f.read(self.chunk_bytes)
                    at_eof = offset + len(data) >= size
                    if at_eof:
                        consumed = len(data)
                    else:
                        cut = data.rfind(b"\n")
                        if cut < 0:
                            # A single line longer than the chunk. Never
                            # split it mid-line (fragments could spuriously
                            # match and inflate counters, ADVICE r2): keep
                            # its first max_len+1 bytes (enough for
                            # pack_lines/flat_line_index to truncate and
                            # count it exactly once) and skip forward to
                            # its newline.
                            keep = self.max_len + 1
                            head = data[:keep]
                            consumed = len(data)
                            while True:
                                more = f.read(self.chunk_bytes)
                                if not more:
                                    break
                                nl = more.find(b"\n")
                                take = len(more) if nl < 0 else nl + 1
                                if len(head) < keep:
                                    head += more[: min(take, keep - len(head))]
                                consumed += take
                                if nl >= 0:
                                    break
                            data = head
                        else:
                            data = data[: cut + 1]
                            consumed = cut + 1
                    offset += consumed
                    yield file_idx, offset, data

    def _packed_chunks(self, state: JobState):
        """Host-packed form: (file_idx, end_offset, chars, lengths, trunc)."""
        for file_idx, end_offset, data in self._raw_chunks(state):
            chars, lengths, trunc = pack_lines(
                data, self.max_len, self.keep_newline
            )
            yield file_idx, end_offset, chars, lengths, trunc

    def _indexed_chunks(self, state: JobState):
        """Device-expand form: (file_idx, end_offset, data, starts,
        lengths, trunc) — rows indexed, bytes left in place."""
        for file_idx, end_offset, data in self._raw_chunks(state):
            starts, lengths, trunc = flat_line_index(
                data, self.max_len, self.keep_newline
            )
            yield file_idx, end_offset, data, starts, lengths, trunc

    def run(self) -> Counters:
        state = JobState()
        if self.checkpoint_path and os.path.exists(self.checkpoint_path):
            state = JobState.load(self.checkpoint_path)
        counters = Counters(**state.counters).start()

        if self.device_expand:
            return self._run_device_expand(state, counters)
        chunks = self._packed_chunks(state)
        if self.prefetch:
            # read+pack the NEXT chunk(s) while the device scans this one.
            # Crash safety is unchanged: the checkpoint only advances when
            # a chunk's batches have all been consumed, so prefetched but
            # unprocessed chunks are simply re-read on restart.
            chunks = _prefetched(chunks, self.prefetch)
        # input_layout="tiled" matchers take the pretiled quad-word
        # buffer (ops.bitplane.tile_corpus): pack on the host during
        # collation — this is the corpus-controlled caller the tiled
        # contract exists for (docs/ROADMAP.md item 2).
        tiled = getattr(self.matcher, "input_layout", "bl") == "tiled"
        if tiled and self.batch_size < 32768:
            import sys

            print(
                f"warning: tiled input is a throughput-regime contract "
                f"(B>=32768); batch_size={self.batch_size} underfills "
                f"the pack grid and measures slower than the standard "
                f"layout (docs/PERF.md round 5)",
                file=sys.stderr,
            )
        for file_idx, end_offset, chars, lengths, trunc in chunks:
            state.n_truncated += trunc
            for bchars, blens, n_valid in batch_iterator(
                chars, lengths, self.batch_size
            ):
                if tiled:
                    from ..ops.bitplane import tile_corpus

                    bchars = tile_corpus(
                        np.asarray(bchars), self.matcher.L_pad
                    )
                res = self.matcher(bchars, blens)
                counters.update(res, blens, n_valid)
                if self.on_batch is not None:
                    self.on_batch(res, bchars, blens, n_valid)
            state.file_idx = file_idx
            state.offset = end_offset
            state.counters = counters.snapshot()
            if self.checkpoint_path:
                state.save(self.checkpoint_path)
        self.n_truncated = state.n_truncated
        counters.finish()
        return counters

    def _run_device_expand(self, state: JobState, counters: Counters):
        import jax
        import jax.numpy as jnp

        from ..ops.scan_jax import expand_rows

        expand = jax.jit(expand_rows, static_argnums=3)
        # fixed upload shape -> one jit signature across chunks; +max_len
        # headroom so a final row's gather window stays in bounds
        pad_to = self.chunk_bytes + self.max_len
        buf = np.zeros((pad_to,), np.uint8)
        B = self.batch_size
        bs = np.zeros((B,), np.int64)
        bl = np.zeros((B,), np.int32)

        chunks = self._indexed_chunks(state)
        if self.prefetch:
            chunks = _prefetched(chunks, self.prefetch)
        for file_idx, end_offset, data, starts, lengths, trunc in chunks:
            state.n_truncated += trunc
            buf[: len(data)] = np.frombuffer(data, np.uint8)
            buf[len(data) :] = 0
            flat = jnp.asarray(buf)  # ONE raw upload per chunk
            n = len(starts)
            for b0 in range(0, n, B):
                n_valid = min(B, n - b0)
                bs[:n_valid] = starts[b0 : b0 + n_valid]
                bs[n_valid:] = 0
                bl[:n_valid] = lengths[b0 : b0 + n_valid]
                bl[n_valid:] = 0
                blens = jnp.asarray(bl)
                bchars = expand(flat, jnp.asarray(bs), blens, self.max_len)
                if getattr(self.matcher, "input_layout", "bl") == "tiled":
                    # rows were expanded on-device: tile there too (an
                    # XLA transpose — correct, but the host-packed path
                    # above is the one that avoids the transpose cost)
                    from ..ops.bitplane import tile_corpus_jax

                    bchars = tile_corpus_jax(bchars, self.matcher.L_pad)
                res = self.matcher(bchars, blens)
                counters.update(res, bl, n_valid)
                if self.on_batch is not None:
                    self.on_batch(res, bchars, bl, n_valid)
            state.file_idx = file_idx
            state.offset = end_offset
            state.counters = counters.snapshot()
            if self.checkpoint_path:
                state.save(self.checkpoint_path)
        self.n_truncated = state.n_truncated
        counters.finish()
        return counters


def _prefetched(gen, depth: int):
    """Drain ``gen`` in a daemon thread into a bounded queue (pipeline
    IO+packing with consumption); exceptions propagate to the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    _END = object()

    def worker():
        try:
            for item in gen:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # propagate into the consuming thread
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
