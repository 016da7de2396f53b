"""Segmented (position-partitioned) genome: the union posterior must equal
mapping against the concatenated genome (frozen-semantics invariance)."""

import numpy as np

from gnumap_tpu.dist import segments
from gnumap_tpu.index import builder
from gnumap_tpu.io import fastq as io_fastq
from gnumap_tpu.pipeline import mapper as pl
from gnumap_tpu.utils import sim

from conftest import records_from_sim


def test_segmented_equals_whole(small_cfg):
    gA = sim.random_genome(2500, seed=41)
    gB = sim.random_genome(2500, seed=42)
    # plant a shared repeat so some reads multi-map ACROSS segments
    gB = gB[:800] + gA[300:420] + gB[920:]
    contigs = [("cA", gA), ("cB", gB)]

    whole_gen = builder.Genome.from_contigs(contigs)
    whole_idx = builder.build_index(whole_gen, small_cfg)
    whole = pl.TpuMapper(whole_gen, whole_idx, small_cfg)

    seg = segments.SegmentedMapper([[("cA", gA)], [("cB", gB)]], small_cfg)

    reads = (sim.simulate_reads(gA, 20, 36, seed=43, sub_rate=0.0,
                                contig="cA")
             + sim.simulate_reads(gB, 20, 36, seed=44, sub_rate=0.0,
                                  contig="cB"))
    recs = records_from_sim(reads, small_cfg)
    batch = next(io_fastq.batch_reads(iter(recs), small_cfg))

    whole_hits = whole.map_batch(batch)
    seg_hits = seg.map_batch(batch)

    saw_cross = False
    for b in range(batch.n):
        wh, sh = whole_hits[b], seg_hits[b]
        assert len(wh) == len(sh), batch.names[b]
        # compare as (contig, offset, strand, score, weight) sets
        wset = sorted((whole_gen.names[int(whole_gen.locate(h.pos)[0])],
                       int(whole_gen.locate(h.pos)[1]), h.strand, h.score,
                       round(h.weight, 10), h.cigar) for h in wh)
        sset = sorted(seg.locate(h) + (h.strand, h.score,
                                       round(h.weight, 10), h.cigar)
                      for h in sh)
        assert wset == sset, batch.names[b]
        if len({h.segment for h in sh}) > 1:
            saw_cross = True
    assert saw_cross, "expected cross-segment multi-mapped reads"


def test_split_contigs():
    contigs = [("a", "A" * 100), ("b", "C" * 100), ("c", "G" * 100)]
    groups = segments.split_contigs(contigs, max_bases=150)
    assert [len(g) for g in groups] == [1, 1, 1]
    groups = segments.split_contigs(contigs, max_bases=250)
    assert [[n for n, _ in g] for g in groups] == [["a", "b"], ["c"]]


def test_global_segmented_equals_whole(small_cfg):
    """GlobalSegmentedMapper returns GLOBAL-coordinate hits identical to
    the unsegmented mapper (union posterior, frozen dedupe/sort)."""
    gA = sim.random_genome(2500, seed=41)
    gB = sim.random_genome(2500, seed=42)
    gB = gB[:800] + gA[300:420] + gB[920:]   # cross-segment repeat
    contigs = [("cA", gA), ("cB", gB)]

    whole_gen = builder.Genome.from_contigs(contigs)
    whole_idx = builder.build_index(whole_gen, small_cfg)
    whole = pl.TpuMapper(whole_gen, whole_idx, small_cfg)
    seg = segments.GlobalSegmentedMapper(whole_gen, small_cfg,
                                         n_segments=2)
    assert seg.n_segments == 2

    reads = (sim.simulate_reads(gA, 20, 36, seed=43, sub_rate=0.0,
                                contig="cA")
             + sim.simulate_reads(gB, 20, 36, seed=44, sub_rate=0.0,
                                  contig="cB"))
    recs = records_from_sim(reads, small_cfg)
    batch = next(io_fastq.batch_reads(iter(recs), small_cfg))

    whole_hits = whole.map_batch(batch)
    stats = pl.BatchStats()
    seg_hits = seg.finish(batch, seg.submit(batch), stats)
    assert stats.n_reads == batch.n

    saw_cross = False
    for b in range(batch.n):
        wh, sh = whole_hits[b], seg_hits[b]
        assert [(h.pos, h.strand, h.score, round(h.weight, 12), h.cigar,
                 h.ref_len) for h in wh] == \
               [(h.pos, h.strand, h.score, round(h.weight, 12), h.cigar,
                 h.ref_len) for h in sh], batch.names[b]
        seg_ids = {0 if h.pos < seg.bases[1] else 1 for h in sh}
        if len(seg_ids) > 1:
            saw_cross = True
    assert saw_cross, "expected cross-segment multi-mapped reads"


def test_segmented_cli_matches_unsegmented(tmp_path):
    """One CLI command with --segments N produces byte-identical SAM/SGR
    (minus the @PG command line) to the unsegmented run."""
    import json as _json
    from gnumap_tpu.cli import main as cli

    gA = sim.random_genome(6000, seed=51)
    gB = sim.random_genome(6000, seed=52)
    sim.write_fasta(str(tmp_path / "g.fa"), [("cA", gA), ("cB", gB)])
    reads = (sim.simulate_reads(gA, 40, 36, seed=53, contig="cA")
             + sim.simulate_reads(gB, 40, 36, seed=54, contig="cB"))
    sim.write_fastq(str(tmp_path / "r.fq"), reads)

    common = ["-g", str(tmp_path / "g.fa"), str(tmp_path / "r.fq"),
              "-m", "8", "-j", "4", "-L", "40", "-B", "32"]
    assert cli.main(["-o", str(tmp_path / "whole")] + common) == 0
    assert cli.main(["-o", str(tmp_path / "segd"), "--segments", "2"]
                    + common) == 0

    def body(p):
        return [l for l in open(p) if not l.startswith("@PG")]

    assert body(tmp_path / "whole.sam") == body(tmp_path / "segd.sam")
    assert (tmp_path / "whole.sgr").read_text() == \
           (tmp_path / "segd.sgr").read_text()
