"""Multi-host SPMD corpus-scan launcher.

Run the same command on every host of a TPU pod slice (one process per
host); `jax.distributed` wires the hosts together and the global mesh
spans every chip (BASELINE configs[4]):

    python -m halo2_regex_tpu.parallel.launch \
        --model model.npz --corpus 'shard-*.txt' \
        [--coordinator host0:1234 --num-processes N --process-id i]

On cloud TPU VMs the coordinator args are auto-detected from the TPU
environment and can be omitted. Each process loads its round-robin share
of the corpus files (utils.io.CorpusLoader process sharding), feeds its
per-host slice of the global data-parallel batch, and the match-count
statistics psum-reduce across the slice; process 0 prints them.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--corpus", nargs="+", required=True)
    ap.add_argument("--batch-per-host", type=int, default=1024)
    ap.add_argument("--coordinator")
    ap.add_argument("--num-processes", type=int)
    ap.add_argument("--process-id", type=int)
    args = ap.parse_args(argv)

    from .mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax

    from ..models.compiled import CompiledRegexModel
    from ..ops.scan_jax import _match_core, _model_arrays
    from ..utils.io import CorpusLoader
    from ..utils.trace import Counters
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .mesh import DATA_AXIS, make_mesh, replicated

    model = CompiledRegexModel.load(args.model)
    mesh = make_mesh()  # all global devices on the data axis
    arrays = {
        k: jax.device_put(v, replicated(mesh)) for k, v in _model_arrays(model).items()
    }
    n_defs = model.n_defs

    @jax.jit
    def step(chars, lengths):
        out = _match_core(arrays, n_defs, chars, lengths)
        return dict(
            n_matched=out["match_ok"].sum(),
            bytes_scanned=lengths.sum(),
            n_dead=out["has_dead"].any(axis=1).sum(),
        )

    paths = sorted(p for pat in args.corpus for p in glob.glob(pat))
    loader = CorpusLoader(
        paths,
        max_len=model.max_chars_size,
        batch_size=args.batch_per_host,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    totals = {"n_matched": 0, "bytes_scanned": 0, "n_dead": 0, "strings": 0}
    t0 = time.time()
    for chars, lengths, n_valid in loader:
        # each host contributes its local slice of the global batch
        gchars = jax.make_array_from_process_local_data(sharding, chars)
        glens = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(DATA_AXIS)), lengths
        )
        stats = step(gchars, glens)
        totals["n_matched"] += int(stats["n_matched"])
        totals["bytes_scanned"] += int(stats["bytes_scanned"])
        totals["n_dead"] += int(stats["n_dead"])
        totals["strings"] += n_valid * jax.process_count()
    if jax.process_index() == 0:
        dt = time.time() - t0
        totals["wall_seconds"] = round(dt, 3)
        totals["bytes_per_sec"] = (
            round(totals["bytes_scanned"] / dt, 1) if dt else 0.0
        )
        print(json.dumps(totals))
    return 0


if __name__ == "__main__":
    sys.exit(main())
