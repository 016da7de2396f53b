"""Position-partitioned genome segments — the reference's genome-partitioned
MPI mode at the segment level (SURVEY.md §3.5), and the path to genomes
beyond the int32 position limit (full human genome, BASELINE.json config 5).

Each segment is an independent (genome, CSR index) pair small enough for
int32 positions.  A read batch maps against every segment (on one host) or
against the local host's segment (multi-host; each host holds 1/R of the
genome and all reads — exactly the reference's RAM-bound MPI layout).
Retained hits are then merged per read and the posterior weights
renormalized over the union: w_i = s_i / sum over ALL segments' retained
loci — the same frozen semantics as a single unsegmented genome, because
retention thresholds depend only on the read, never on the genome.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from gnumap_tpu.config import MapperConfig
from gnumap_tpu.index import builder
from gnumap_tpu.io.fastq import ReadBatch
from gnumap_tpu.pipeline import mapper as pl


@dataclasses.dataclass
class SegmentHit:
    segment: int
    strand: str
    pos: int            # segment-local global offset
    score: int
    weight: float
    cigar: str
    ref_len: int


def merge_segment_hits(per_segment: Sequence[List[List[pl.ReadHit]]]
                       ) -> List[List[SegmentHit]]:
    """Union per-read hits from S segments and renormalize weights over the
    union (scores are comparable across segments — same read, same scoring).
    Output order: (segment, pos, strand) ascending [FROZEN]."""
    n_reads = len(per_segment[0])
    out: List[List[SegmentHit]] = []
    for b in range(n_reads):
        hits: List[SegmentHit] = []
        for s, seg_hits in enumerate(per_segment):
            for h in seg_hits[b]:
                hits.append(SegmentHit(s, h.strand, h.pos, h.score, 0.0,
                                       h.cigar, h.ref_len))
        total = float(sum(h.score for h in hits))
        for h in hits:
            h.weight = h.score / total if total else 0.0
        hits.sort(key=lambda h: (h.segment, h.pos,
                                 0 if h.strand == "+" else 1))
        out.append(hits)
    return out


class SegmentedMapper:
    """Map against a genome split into contig groups (each < 2^31 bases)."""

    def __init__(self, contig_groups: Sequence[Sequence[Tuple[str, str]]],
                 cfg: MapperConfig, align_impl: str = "jnp"):
        self.cfg = cfg
        self.mappers: List[pl.TpuMapper] = []
        for group in contig_groups:
            genome = builder.Genome.from_contigs(list(group))
            index = (builder.build_bs_index(genome, cfg) if cfg.bisulfite
                     else builder.build_index(genome, cfg))
            self.mappers.append(pl.TpuMapper(genome, index, cfg,
                                             align_impl=align_impl))

    @property
    def n_segments(self) -> int:
        return len(self.mappers)

    def map_batch(self, batch: ReadBatch,
                  stats: pl.BatchStats | None = None
                  ) -> List[List[SegmentHit]]:
        per_segment = [m.map_batch(batch, stats) for m in self.mappers]
        return merge_segment_hits(per_segment)

    def locate(self, hit: SegmentHit) -> Tuple[str, int]:
        """Segment-local offset -> (contig name, contig-local offset)."""
        gen = self.mappers[hit.segment].genome
        ci, off = gen.locate(hit.pos)
        return gen.names[int(ci)], int(off)

    def accumulate_coverage(self, hits_per_read, coverages=None):
        """Per-segment coverage arrays (create on first use)."""
        if coverages is None:
            coverages = [np.zeros(len(m.genome.codes)) for m in self.mappers]
        for hits in hits_per_read:
            for h in hits:
                coverages[h.segment][h.pos:h.pos + h.ref_len] += h.weight
        return coverages


def split_contigs(contigs: Sequence[Tuple[str, str]],
                  max_bases: int = (1 << 31) - (1 << 20)
                  ) -> List[List[Tuple[str, str]]]:
    """Greedy partition of contigs into segments under the int32 limit."""
    groups: List[List[Tuple[str, str]]] = [[]]
    size = 0
    for name, seq in contigs:
        if len(seq) > max_bases:
            raise ValueError(f"contig {name} alone exceeds the segment "
                             f"limit ({len(seq)} > {max_bases})")
        if size + len(seq) > max_bases and groups[-1]:
            groups.append([])
            size = 0
        groups[-1].append((name, seq))
        size += len(seq)
    return groups
