"""Kill/restart recovery check (SURVEY.md §5 "Failure detection"): an
interrupted, checkpointed run resumed from disk must produce exactly the
same merged coverage and SAM stream as an uninterrupted run."""

import numpy as np
import pytest

from gnumap_tpu.index import builder
from gnumap_tpu.io import fastq as io_fastq, sam as sam_io
from gnumap_tpu.pipeline import mapper as pl
from gnumap_tpu.utils import sim

from conftest import records_from_sim


class Boom(Exception):
    pass


@pytest.fixture(scope="module")
def setup(small_cfg, phix_genome):
    gen = builder.Genome.from_contigs([("phiX_sim", phix_genome)])
    idx = builder.build_index(gen, small_cfg)
    reads = sim.simulate_reads(phix_genome, 160, 36, seed=9, sub_rate=0.02,
                               contig="phiX_sim")
    m = pl.TpuMapper(gen, idx, small_cfg)
    return small_cfg, gen, m, reads


def _batches(reads, cfg):
    return io_fastq.batch_reads(iter(records_from_sim(reads, cfg)), cfg)


def test_resume_equals_uninterrupted(setup, tmp_path):
    cfg, gen, m, reads = setup

    # uninterrupted reference run
    with open(tmp_path / "ref.sam", "w") as f:
        sam_io.write_header(f, gen.names, gen.lengths, cmd="x")
        ref = pl.map_stream(m, _batches(reads, cfg), collect_sam=False,
                            sam_file=f)

    # interrupted run: crash after batch 3 (checkpoint_every=2)
    ck = str(tmp_path / "ck.npz")
    def boom(idx, stats):
        if idx >= 3:
            raise Boom()
    with open(tmp_path / "out.sam", "w+") as f:
        sam_io.write_header(f, gen.names, gen.lengths, cmd="x")
        with pytest.raises(Boom):
            pl.map_stream(m, _batches(reads, cfg), collect_sam=False,
                          sam_file=f, checkpoint_path=ck,
                          checkpoint_every=2, batch_callback=boom)

    # restart from checkpoint, run to completion
    with open(tmp_path / "out.sam", "r+") as f:
        f.seek(0, 2)
        res = pl.map_stream(m, _batches(reads, cfg), collect_sam=False,
                            sam_file=f, checkpoint_path=ck,
                            checkpoint_every=2)

    np.testing.assert_allclose(res.coverage, ref.coverage, rtol=0, atol=0)
    ref_sam = (tmp_path / "ref.sam").read_text()
    out_sam = (tmp_path / "out.sam").read_text()
    assert out_sam == ref_sam
    assert res.stats.n_reads == ref.stats.n_reads
    assert res.stats.n_mapped == ref.stats.n_mapped


def test_checkpoint_roundtrip(tmp_path):
    from gnumap_tpu.pipeline import checkpoint as ck
    st = ck.StreamState(7, np.arange(10, dtype=np.float64),
                        np.ones((10, 4)), pl.BatchStats(n_reads=99), 1234)
    path = str(tmp_path / "s.npz")
    ck.save(path, st)
    got = ck.load(path)
    assert got.batches_done == 7 and got.sam_offset == 1234
    assert got.stats.n_reads == 99
    np.testing.assert_array_equal(got.coverage, st.coverage)
    np.testing.assert_array_equal(got.tallies, st.tallies)
    assert ck.load(str(tmp_path / "missing.npz")) is None
