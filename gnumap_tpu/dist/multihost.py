"""Multi-host execution: the reference's MPI layer, TPU-native.

Reference analog (SURVEY.md §3.5, [PAPER-parallel]): ``mpirun -np R gnumap``
— each rank loads the genome, maps its 1/R of the reads, coverage arrays
``MPI_Reduce`` to rank 0, SAM chunks gathered and merged at rank 0.

TPU-native re-design:

  * process groups come from ``jax.distributed.initialize()`` (the
    coordination service; Gloo/DCN between hosts, ICI within a slice);
  * reads partition by BATCH stride: host h maps global batches
    h, h + R, h + 2R, ... — no read-file splitting step, every host streams
    the same files and keeps only its stride (the per-host read-file-offset
    scheme of VERDICT.md next-#4);
  * the coverage/tally merge is an XLA ``all_gather`` of the float64 BIT
    PATTERN (uint32 view — no arithmetic on the wire) followed by a
    host-ordered summation at every host: bit-reproducible regardless of
    reduction topology, and byte-identical to a single-process run whenever
    the per-position weight sums are exactly representable (the
    deterministic MPI_Reduce analog);
  * SAM shards are written per host with per-batch byte offsets and merged
    by GLOBAL batch index at host 0 over the shared filesystem (the
    reference's per-thread-buffer merge, rank-0 gather).

CI: tests/test_multihost.py runs two ``jax.distributed`` CPU processes on
localhost and asserts SAM + SGR byte-identical to the single-process run.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Iterator, List, Tuple

import numpy as np


def initialize(coordinator: str, num_hosts: int, host_id: int) -> None:
    """jax.distributed process-group init (call before any device use)."""
    import jax
    jax.distributed.initialize(coordinator, num_processes=num_hosts,
                               process_id=host_id)


def strided(batches: Iterable, num_hosts: int, host_id: int) -> Iterator:
    """Host h's read partition: global batches h, h+R, h+2R, ..."""
    for i, b in enumerate(batches):
        if i % num_hosts == host_id:
            yield b


def allreduce_f64(local: np.ndarray) -> np.ndarray:
    """Deterministic cross-host float64 sum (the MPI_Reduce analog).

    all_gather of the uint32 bit view (exact), then an explicitly
    host-ordered summation — every host computes the identical result.
    """
    from jax.experimental import multihost_utils
    shape = local.shape
    bits = np.ascontiguousarray(local, dtype=np.float64).reshape(-1)
    bits = bits.view(np.uint32)[None]
    g = np.asarray(multihost_utils.process_allgather(bits))
    parts = np.ascontiguousarray(g.reshape(g.shape[0], -1)).view(np.float64)
    out = parts[0].copy()
    for r in range(1, parts.shape[0]):
        out += parts[r]
    return out.reshape(shape)


def barrier(name: str) -> None:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def shard_paths(output: str, host_id: int) -> Tuple[str, str]:
    return (f"{output}.sam.host{host_id}",
            f"{output}.sam.host{host_id}.idx")


def write_shard_index(idx_path: str, spans: List[Tuple[int, int, int]]
                      ) -> None:
    """spans: (global_batch, byte_start, byte_end) per mapped batch."""
    with open(idx_path, "w") as f:
        for row in spans:
            f.write(json.dumps(row) + "\n")


def merge_sam_shards(output: str, num_hosts: int, header: str) -> None:
    """Host-0 merge: interleave per-batch shard chunks by GLOBAL batch
    index, producing the same record order as a single-process run."""
    chunks = []   # (global_batch, host, start, end)
    for h in range(num_hosts):
        body, idx = shard_paths(output, h)
        with open(idx) as f:
            for line in f:
                g, s, e = json.loads(line)
                chunks.append((g, h, s, e))
    chunks.sort()
    handles = [open(shard_paths(output, h)[0], "rb")
               for h in range(num_hosts)]
    try:
        with open(output + ".sam", "wb") as out:
            out.write(header.encode())
            for g, h, s, e in chunks:
                handles[h].seek(s)
                out.write(handles[h].read(e - s))
    finally:
        for f in handles:
            f.close()
    for h in range(num_hosts):
        body, idx = shard_paths(output, h)
        os.remove(body)
        os.remove(idx)
