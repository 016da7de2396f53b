#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric (BASELINE.json:2): reads aligned/sec/chip, 100bp reads vs an
E.coli-scale reference, plus DP cell-updates/sec.

Baseline provenance: the reference C++ GNUMAP binary was unavailable (the
reference mount is empty — SURVEY.md §0) and BASELINE.json records no
published numbers ("published": {}).  vs_baseline is therefore measured
against this machine's host-CPU run of the same pipeline (XLA:CPU, jnp DP
path) — the recorded stand-in for the single-core C++ baseline.  The CPU
number is cached in /tmp between runs of the same round.

Usage:  python bench.py [--reads N] [--no-baseline] [--cpu-baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

CACHE = "/tmp/gnumap_bench_cpu_baseline.json"
BENCH_READS_CPU = 512


# BASELINE.json:7-11 workload ladder (config 5, the multi-host whole-genome
# run, needs real multi-chip hardware — its sharded program is validated on
# a faked mesh by tests/test_dist.py and __graft_entry__.dryrun_multichip)
CONFIGS = {
    1: dict(name="phiX 10k x 36bp exact-seed",
            genome_len=5_386, n_reads=10_000, read_len=36, mer=8, jump=4,
            max_read_len=40, repeat_frac=0.0, bisulfite=False),
    2: dict(name="E.coli-scale 100bp probabilistic NW",
            genome_len=4_641_652, n_reads=16_384, read_len=100, mer=12,
            jump=5, max_read_len=104, repeat_frac=0.0, bisulfite=False),
    3: dict(name="chr21-scale multi-map posterior",
            genome_len=46_709_983, n_reads=16_384, read_len=100, mer=13,
            jump=5, max_read_len=104, repeat_frac=0.02, bisulfite=False),
    4: dict(name="chr21-scale bisulfite",
            genome_len=46_709_983, n_reads=16_384, read_len=100, mer=16,
            jump=5, max_read_len=104, repeat_frac=0.0, bisulfite=True),
}


def build_workload(n_reads, genome_len, batch_size, config=2):
    from gnumap_tpu.config import MapperConfig
    from gnumap_tpu.index import builder
    from gnumap_tpu.io import fastq as io_fastq
    from gnumap_tpu.core import packing
    from gnumap_tpu.utils import sim

    c = CONFIGS[config]
    genome_len = genome_len or c["genome_len"]
    n_reads = n_reads or c["n_reads"]
    cfg = MapperConfig(mer_size=c["mer"], seed_jump=c["jump"],
                       batch_size=batch_size,
                       max_read_len=c["max_read_len"], max_candidates=32,
                       max_hits_per_seed=8, sam_out=False, sgr_out=False,
                       bisulfite=c["bisulfite"])
    genome = sim.random_genome(genome_len, seed=0,
                               repeat_frac=c["repeat_frac"])
    gen = builder.Genome.from_contigs([("ref_sim", genome)])
    idx = (builder.build_bs_index(gen, cfg) if c["bisulfite"]
           else builder.build_index(gen, cfg))
    reads = sim.simulate_reads(genome, n_reads, c["read_len"], seed=7,
                               sub_rate=0.01, contig="ref_sim",
                               bisulfite=c["bisulfite"])
    recs = []
    for r in reads:
        codes = packing.encode(r.seq)
        q = np.frombuffer(r.qual.encode(), np.uint8).astype(np.int32) - 33
        # pwm stays lazy (None): built on device from the (qual, code)
        # table, like the real FASTQ path
        recs.append(io_fastq.ReadRecord(r.name, codes, None,
                                        q.astype(np.int16)))
    return cfg, gen, idx, recs


def run_pipeline(cfg, gen, idx, recs, align_impl, depth=3):
    import jax
    from collections import deque
    from gnumap_tpu.io import fastq as io_fastq
    from gnumap_tpu.pipeline import mapper as pl

    m = pl.TpuMapper(gen, idx, cfg, align_impl=align_impl)
    batches = list(io_fastq.batch_reads(iter(recs), cfg))
    # warmup/compile on the first batch — must include a full host fetch:
    # the axon tunnel defers real execution + remote program load until the
    # first device_get (block_until_ready alone does not wait)
    m.map_batch(batches[0])
    stats = pl.BatchStats()
    t0 = time.perf_counter()
    n_hits = 0
    n_correct = n_primary = 0
    # keep `depth` batches in flight so device round-trips (the axon
    # tunnel's fixed RTT) overlap host finishing — the map_stream
    # double-buffer, deepened
    q = deque()

    def account(batch, hits_per_read):
        """Self-checking accuracy: reads carry their truth in the name."""
        nonlocal n_hits, n_correct, n_primary
        from gnumap_tpu.utils.sim import parse_truth
        for i, hits in enumerate(hits_per_read):
            n_hits += len(hits)
            if not hits:
                continue
            n_primary += 1
            _, tpos, tstrand = parse_truth(batch.names[i])
            best = max(hits, key=lambda h: h.weight)
            if abs(best.pos - tpos) <= 3 and best.strand == tstrand:
                n_correct += 1

    for b in batches:
        q.append((b, m.submit(b)))
        if len(q) > depth:
            pb, pf = q.popleft()
            account(pb, m.finish(pb, pf, stats))
    while q:
        pb, pf = q.popleft()
        account(pb, m.finish(pb, pf, stats))
    dt = time.perf_counter() - t0
    acc = n_correct / max(n_primary, 1)
    return dt, stats, n_hits, acc


def cpu_baseline(n_reads, config=2):
    """Measured in a subprocess so the TPU process stays clean."""
    cache = f"{CACHE}.{config}"
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    code = subprocess.run(
        [sys.executable, __file__, "--cpu-baseline",
         "--reads", str(n_reads), "--config", str(config)],
        capture_output=True, text=True, timeout=3000)
    if code.returncode != 0:
        sys.stderr.write(code.stderr[-2000:])
        return None
    with open(cache) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=2, choices=sorted(CONFIGS),
                    help="BASELINE.json workload ladder entry")
    ap.add_argument("--reads", type=int, default=0,
                    help="override the config's read count")
    ap.add_argument("--genome-len", type=int, default=0,
                    help="override the config's genome length")
    ap.add_argument("--batch-size", type=int, default=4096)
    ap.add_argument("--depth", type=int, default=3,
                    help="batches kept in flight (pipeline depth)")
    ap.add_argument("--no-baseline", action="store_true")
    ap.add_argument("--cpu-baseline", action="store_true")
    args = ap.parse_args()

    if args.cpu_baseline:
        import jax
        jax.config.update("jax_platforms", "cpu")
        n = min(args.reads or BENCH_READS_CPU, BENCH_READS_CPU)
        cfg, gen, idx, recs = build_workload(n, args.genome_len,
                                             min(args.batch_size, 256),
                                             config=args.config)
        dt, stats, _, _ = run_pipeline(cfg, gen, idx, recs, "jnp")
        out = {"cpu_reads_per_s": stats.n_reads / dt,
               "reads": stats.n_reads, "seconds": dt}
        with open(f"{CACHE}.{args.config}", "w") as f:
            json.dump(out, f)
        sys.stderr.write(f"cpu baseline: {out}\n")
        return

    import jax
    from gnumap_tpu.utils import jaxcache
    jaxcache.enable()
    backend = jax.default_backend()
    impl = "pallas" if backend == "tpu" else "jnp"
    cfg, gen, idx, recs = build_workload(args.reads, args.genome_len,
                                         args.batch_size,
                                         config=args.config)
    dt, stats, n_hits, acc = run_pipeline(cfg, gen, idx, recs, impl,
                                          depth=args.depth)
    reads_per_s = stats.n_reads / dt
    cells_per_s = stats.dp_cells / max(stats.device_s, 1e-9)

    vs_baseline = None
    if not args.no_baseline:
        base = cpu_baseline(args.reads or 512, config=args.config)
        if base:
            vs_baseline = reads_per_s / base["cpu_reads_per_s"]

    print(json.dumps({
        "metric": f"reads aligned/sec/chip "
                  f"({CONFIGS[args.config]['name']})",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "backend": backend, "align_impl": impl,
        "reads": stats.n_reads, "mapped": stats.n_mapped,
        "accuracy": round(acc, 4), "multi_mapped": stats.n_multi,
        "dp_cells_per_s_device": round(cells_per_s / 1e9, 3),
        "dp_unit": "Gcells/s",
        "device_s": round(stats.device_s, 3),
        "host_s": round(stats.host_s, 3),
        "wall_s": round(dt, 3),
        "baseline_provenance": "host-CPU jnp pipeline (C++ reference "
                               "unavailable: empty mount)",
    }))


if __name__ == "__main__":
    main()
