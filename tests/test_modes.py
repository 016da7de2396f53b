"""Mode coverage: bisulfite (GNUMAP-bs, config 4) and SNP calling
(GNUMAP-SNP) — end to end, pipeline vs oracle."""

import numpy as np
import pytest

from gnumap_tpu.config import MapperConfig
from gnumap_tpu.core import packing
from gnumap_tpu.index import builder
from gnumap_tpu.io import fastq as io_fastq
from gnumap_tpu.oracle import oracle
from gnumap_tpu.pipeline import mapper as pl
from gnumap_tpu.posterior import snp
from gnumap_tpu.utils import sim

from conftest import records_from_sim


def _bisulfite_convert(seq: str, strand: str, rate: float, rng) -> str:
    """Simulate bisulfite conversion of the fragment's + strand: C->T at
    unmethylated sites.  For '-' reads the read sees the converted
    complement, i.e. G->A relative to the fragment."""
    out = []
    for ch in seq:
        if strand == "+" and ch == "C" and rng.random() < rate:
            out.append("T")
        elif strand == "-" and ch == "G" and rng.random() < rate:
            out.append("A")
        else:
            out.append(ch)
    return "".join(out)


@pytest.fixture(scope="module")
def bs_setup():
    cfg = MapperConfig(mer_size=8, seed_jump=2, batch_size=32,
                       max_read_len=40, align_score_ratio=0.75,
                       bisulfite=True)
    genome = sim.random_genome(4000, seed=21)
    gen = builder.Genome.from_contigs([("bs", genome)])
    idx = builder.build_bs_index(gen, cfg)
    return cfg, genome, gen, idx


def test_bisulfite_reads_map(bs_setup):
    """Heavily converted reads (60% C->T) still map at their true loci in
    bisulfite mode — and the same reads fail in normal mode."""
    cfg, genome, gen, idx = bs_setup
    rng = np.random.default_rng(5)
    g = packing.encode(genome)
    m = pl.TpuMapper(gen, idx, cfg)
    cfg_norm = MapperConfig(**{**cfg.__dict__, "bisulfite": False})
    m_norm = pl.TpuMapper(gen, builder.build_index(gen, cfg_norm), cfg_norm)
    reads = []
    truths = []
    for i in range(24):
        pos = int(rng.integers(0, 4000 - 36))
        frag = packing.decode(g[pos:pos + 36])
        conv = _bisulfite_convert(frag, "+", 0.6, rng)
        reads.append(sim.SimRead(f"bs_{i}_bs_{pos}_+", conv, "I" * 36,
                                 pos, "+"))
        truths.append(pos)
    recs = records_from_sim(reads, cfg)
    batch = next(io_fastq.batch_reads(iter(recs), cfg))
    hits_bs = m.map_batch(batch)
    hits_norm = m_norm.map_batch(batch)
    mapped_bs = sum(1 for h in hits_bs if h)
    mapped_norm = sum(1 for h in hits_norm if h)
    assert mapped_bs >= 20, f"bisulfite mode mapped only {mapped_bs}/24"
    assert mapped_norm < mapped_bs / 2, \
        f"normal mode should reject converted reads ({mapped_norm})"
    for b, hits in enumerate(hits_bs):
        if hits:
            best = max(hits, key=lambda h: h.weight)
            assert abs(best.pos - truths[b]) <= 2


def test_bisulfite_minus_strand(bs_setup):
    """Reverse-strand converted reads map via the asymmetric minus matrix."""
    cfg, genome, gen, idx = bs_setup
    rng = np.random.default_rng(6)
    g = packing.encode(genome)
    m = pl.TpuMapper(gen, idx, cfg)
    reads = []
    for i in range(12):
        pos = int(rng.integers(0, 4000 - 36))
        # a minus-strand read carries the minus strand's own C->T
        # conversions, which in plus-strand coordinates are G->A; the read
        # itself is the revcomp of that converted fragment
        frag = packing.decode(g[pos:pos + 36])
        conv = _bisulfite_convert(frag, "-", 0.6, rng)
        read_seq = packing.decode(packing.revcomp(packing.encode(conv)))
        reads.append(sim.SimRead(f"bsm_{i}_bs_{pos}_-", read_seq, "I" * 36,
                                 pos, "-"))
    recs = records_from_sim(reads, cfg)
    batch = next(io_fastq.batch_reads(iter(recs), cfg))
    n_ok = 0
    for b, hits in enumerate(m.map_batch(batch)):
        if hits:
            best = max(hits, key=lambda h: h.weight)
            if best.strand == "-" and abs(best.pos - reads[b].true_pos) <= 2:
                n_ok += 1
    assert n_ok >= 9, f"only {n_ok}/12 minus-strand converted reads mapped"


def test_bisulfite_collapsed_seeding_sparse_seeds():
    """At realistic seed sparsity (mer 12, jump 5) heavily converted reads
    still map ~fully: the collapsed-alphabet index is what makes the seeds
    conversion-proof (plain exact seeding fails here)."""
    cfg = MapperConfig(mer_size=12, seed_jump=5, batch_size=64,
                       max_read_len=104, align_score_ratio=0.75,
                       bisulfite=True)
    genome = sim.random_genome(200_000, seed=77)
    gen = builder.Genome.from_contigs([("bsl", genome)])
    m = pl.TpuMapper(gen, builder.build_bs_index(gen, cfg), cfg)
    reads = sim.simulate_reads(genome, 64, 100, seed=3, sub_rate=0.005,
                               contig="bsl", bisulfite=True,
                               methylation_rate=0.1)
    recs = records_from_sim(reads, cfg)
    batch = next(io_fastq.batch_reads(iter(recs), cfg))
    n_ok = 0
    for b, hits in enumerate(m.map_batch(batch)):
        if hits:
            best = max(hits, key=lambda h: h.weight)
            if (abs(best.pos - reads[b].true_pos) <= 2
                    and best.strand == reads[b].true_strand):
                n_ok += 1
    assert n_ok >= 62, f"collapsed seeding mapped only {n_ok}/64"


def test_bisulfite_pipeline_matches_oracle(bs_setup):
    cfg, genome, gen, idx = bs_setup
    ogen = oracle.OracleGenome.from_contigs([("bs", genome)])
    oidx = oracle.build_oracle_bs_indexes(ogen, cfg)
    rng = np.random.default_rng(7)
    g = packing.encode(genome)
    m = pl.TpuMapper(gen, idx, cfg)
    reads = []
    for i in range(16):
        pos = int(rng.integers(0, 4000 - 36))
        conv = _bisulfite_convert(packing.decode(g[pos:pos + 36]), "+",
                                  0.4, rng)
        reads.append(sim.SimRead(f"bso_{i}_bs_{pos}_+", conv, "I" * 36,
                                 pos, "+"))
    recs = records_from_sim(reads, cfg)
    batch = next(io_fastq.batch_reads(iter(recs), cfg))
    for b, phits in enumerate(m.map_batch(batch)):
        L = int(batch.lens[b])
        ohits = oracle.map_read(batch.codes[b, :L], batch.pwm_q[b, :L],
                                ogen, oidx, cfg)
        assert len(ohits) == len(phits)
        for oh, ph in zip(ohits, phits):
            assert (oh.strand, oh.pos, oh.score, oh.cigar) == \
                (ph.strand, ph.pos, ph.score, ph.cigar)


def test_snp_detection():
    """Reads carrying a homozygous variant produce a significant SNP call
    at exactly that site (GNUMAP-SNP semantics)."""
    cfg = MapperConfig(mer_size=8, seed_jump=2, batch_size=64,
                       max_read_len=40, align_score_ratio=0.8,
                       snp_mode=True)
    genome = sim.random_genome(3000, seed=33)
    gen = builder.Genome.from_contigs([("snp", genome)])
    idx = builder.build_index(gen, cfg)
    m = pl.TpuMapper(gen, idx, cfg)
    g = packing.encode(genome)
    site = 1500
    alt = int((g[site] + 2) % 4)
    sample = g.copy()
    sample[site] = alt
    rng = np.random.default_rng(8)
    reads = []
    for i in range(60):
        pos = int(rng.integers(site - 30, site - 5))
        frag = sample[pos:pos + 36]
        reads.append(sim.SimRead(f"s_{i}_snp_{pos}_+",
                                 packing.decode(frag), "I" * 36, pos, "+"))
    recs = records_from_sim(reads, cfg)
    res = pl.map_stream(m, io_fastq.batch_reads(iter(recs), cfg),
                        collect_sam=False)
    assert res.tallies is not None
    pos_called, alts, pvals = snp.call_snps(gen.codes, res.coverage,
                                            res.tallies)
    assert site in pos_called.tolist(), \
        f"SNP at {site} not called; called={pos_called.tolist()[:10]}"
    k = pos_called.tolist().index(site)
    assert alts[k] == alt
    # no spurious calls away from the site
    spurious = [p for p in pos_called.tolist() if abs(p - site) > 0]
    assert len(spurious) <= 2
