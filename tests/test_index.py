"""Index layer: CSR build correctness, persistence, k-mer-range sharding."""

import numpy as np

from gnumap_tpu.config import MapperConfig
from gnumap_tpu.core import packing
from gnumap_tpu.index import builder, store
from gnumap_tpu.utils import sim


def test_csr_index_counts_and_order(small_cfg):
    g = sim.random_genome(3000, seed=1)
    gen = builder.Genome.from_contigs([("a", g)])
    idx = builder.build_index(gen, small_cfg)
    kmers, valid = packing.kmer_codes(gen.codes, small_cfg.mer_size)
    # every valid position appears exactly once, in its right bucket,
    # ascending within the bucket
    total = int(valid.sum())
    assert len(idx.positions) == total
    for km in np.unique(kmers[valid])[:50]:
        lst = idx.lookup(int(km))
        assert (np.diff(lst) > 0).all() or len(lst) <= 1
        for p in lst:
            assert kmers[p] == km and valid[p]


def test_index_excludes_contig_spanning_kmers(small_cfg):
    g1, g2 = sim.random_genome(500, seed=2), sim.random_genome(500, seed=3)
    gen = builder.Genome.from_contigs([("a", g1), ("b", g2)])
    idx = builder.build_index(gen, small_cfg)
    # no indexed position may cross the contig-1/spacer boundary
    boundary = 500
    m = small_cfg.mer_size
    bad = [p for p in idx.positions
           if boundary - m < p < boundary + builder.SPACER_N]
    assert bad == []


def test_locate_vectorized():
    gen = builder.Genome.from_contigs([("a", "ACGT" * 100),
                                       ("b", "TTTT" * 50)])
    idx_arr, off = gen.locate([0, 399, 400 + builder.SPACER_N])
    assert idx_arr.tolist() == [0, 0, 1]
    assert off.tolist() == [0, 399, 0]


def test_store_roundtrip(tmp_path, small_cfg):
    g = sim.random_genome(2000, seed=4)
    # include Ns in the genome
    g = g[:500] + "N" * 20 + g[520:]
    gen = builder.Genome.from_contigs([("c1", g[:1000]), ("c2", g[1000:])])
    idx = builder.build_index(gen, small_cfg)
    path = str(tmp_path / "idx.npz")
    store.save_index(path, gen, idx)
    gen2, idx2 = store.load_index(path)
    assert np.array_equal(gen.codes, gen2.codes)
    assert gen.names == gen2.names
    assert np.array_equal(gen.starts, gen2.starts)
    assert idx.mer_size == idx2.mer_size
    assert np.array_equal(idx.bucket_start, idx2.bucket_start)
    assert np.array_equal(idx.positions, idx2.positions)


def test_shard_index_partition(small_cfg):
    g = sim.random_genome(5000, seed=5)
    gen = builder.Genome.from_contigs([("a", g)])
    idx = builder.build_index(gen, small_cfg)
    for S in (2, 4):
        shards = store.shard_index(idx, S)
        Q = idx.n_buckets // S
        total = 0
        for s, sh in enumerate(shards):
            total += len(sh.positions)
            # shard s must reproduce global lookups for its k-mer range
            for km in range(s * Q, min(s * Q + 500, (s + 1) * Q), 97):
                assert list(sh.lookup(km - s * Q)) == list(idx.lookup(km))
        assert total == len(idx.positions)
