"""Determinism: repeated runs must be byte-identical (threaded finisher and
batched native paths included) — SURVEY.md §5 race-detection analog."""

import numpy as np

from gnumap_tpu.index import builder
from gnumap_tpu.io import fastq as io_fastq
from gnumap_tpu.pipeline import mapper as pl
from gnumap_tpu.utils import sim

from conftest import records_from_sim


def test_repeat_runs_identical(small_cfg, phix_genome, phix_reads):
    gen = builder.Genome.from_contigs([("phiX_sim", phix_genome)])
    idx = builder.build_index(gen, small_cfg)
    m = pl.TpuMapper(gen, idx, small_cfg)

    def run():
        recs = records_from_sim(phix_reads, small_cfg)
        res = pl.map_stream(m, io_fastq.batch_reads(iter(recs), small_cfg))
        return res

    a, b = run(), run()
    np.testing.assert_array_equal(a.coverage, b.coverage)
    assert a.sam_lines == b.sam_lines
