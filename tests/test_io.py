"""IO layer: parsers, adaptor trimming, SAM/SGR formatting."""

import numpy as np

from gnumap_tpu.config import MapperConfig, SCORE_ONE
from gnumap_tpu.core import packing
from gnumap_tpu.io import fastq as io_fastq, sam as sam_io


def test_fastq_roundtrip(tmp_path):
    path = tmp_path / "r.fastq"
    path.write_text("@a\nACGT\n+\nIIII\n@b desc\nNNTT\n+\n!!II\n")
    cfg = MapperConfig()
    recs = list(io_fastq.iter_fastq(str(path), cfg))
    assert [r.name for r in recs] == ["a", "b"]
    assert packing.decode(recs[0].codes) == "ACGT"
    assert recs[1].codes[0] == 4 and recs[1].quals[0] == 0
    assert recs[0].quals[0] == 40


def test_prb_reader(tmp_path):
    path = tmp_path / "s_1_prb.txt"
    path.write_text("10 0 0 0\t0 10 0 0\t0 0 0 10\n")
    cfg = MapperConfig()
    recs = list(io_fastq.iter_prb(str(path), cfg))
    assert len(recs) == 1
    assert packing.decode(recs[0].codes) == "ACT"
    assert recs[0].pwm_q[0].argmax() == 0


def test_int_reader(tmp_path):
    path = tmp_path / "s_1_int.txt"
    # lane tile x y metadata then 2 cycles
    path.write_text("1\t42\t100\t200\t900 10 5 2\t3 7 800 11\n")
    cfg = MapperConfig()
    recs = list(io_fastq.iter_int(str(path), cfg))
    assert len(recs) == 1
    assert packing.decode(recs[0].codes) == "AG"


def test_adaptor_trim():
    adaptor = packing.encode("AGATCGGAAG")
    read = packing.encode("ACGTACGTACGTAGATCGGAAG")
    quals = np.full(len(read), 30, np.int16)
    c, q = io_fastq.trim_adaptor(read, quals, adaptor)
    assert packing.decode(c) == "ACGTACGTACGT"
    # partial adaptor at the very end (>= min_overlap)
    read2 = packing.encode("ACGTACGTACGTACGTAGAT")
    c2, _ = io_fastq.trim_adaptor(read2, np.full(20, 30, np.int16), adaptor)
    assert packing.decode(c2) == "ACGTACGTACGTACGT"
    # no adaptor -> untouched
    read3 = packing.encode("ACGTACGTACGT")
    c3, _ = io_fastq.trim_adaptor(read3, np.full(12, 30, np.int16), adaptor)
    assert len(c3) == 12


def test_adaptor_trim_batch_matches_per_record():
    rng = np.random.default_rng(7)
    adaptor = packing.encode("AGATCGGAAGAGC")
    B, L = 32, 48
    codes = np.full((B, L), 4, np.int8)
    quals = np.zeros((B, L), np.int16)
    lens = np.zeros(B, np.int32)
    per_record = []
    for i in range(B):
        n = int(rng.integers(10, L + 1))
        r = rng.integers(0, 5, n).astype(np.int8)
        if i % 3 == 0:  # plant adaptor (sometimes mutated) at a random spot
            p = int(rng.integers(4, max(5, n - 4)))
            a = adaptor[:n - p].copy()
            if i % 6 == 0 and len(a) > 9:
                a[rng.integers(0, len(a))] = int(rng.integers(0, 4))
            r[p:p + len(a)] = a
        q = rng.integers(2, 41, n).astype(np.int16)
        codes[i, :n], quals[i, :n], lens[i] = r, q, n
        tc, tq = io_fastq.trim_adaptor(r, q, adaptor)
        per_record.append((tc, tq))
    batch = io_fastq.ReadBatch([str(i) for i in range(B)], codes, None,
                               lens, quals, B)
    out = io_fastq.trim_adaptor_batch(batch, adaptor)
    for i in range(B):
        n = int(out.lens[i])
        assert n == len(per_record[i][0]), i
        assert np.array_equal(out.codes[i, :n], per_record[i][0])
        assert np.array_equal(out.quals[i, :n], per_record[i][1])
        assert np.all(out.codes[i, n:] == 4) and np.all(out.quals[i, n:] == 0)


def test_truncation_warning(tmp_path, caplog):
    import logging
    path = tmp_path / "long.fastq"
    path.write_text("@a\n" + "A" * 50 + "\n+\n" + "I" * 50 + "\n")
    cfg = MapperConfig(max_read_len=32, batch_size=4)
    with caplog.at_level(logging.WARNING, logger="gnumap_tpu.io"):
        batches = list(io_fastq.batch_reads(io_fastq.iter_fastq(str(path),
                                                                cfg), cfg))
    assert batches[0].lens[0] == 32
    assert any("truncat" in r.message for r in caplog.records)


def test_sort_sam_external_merge(tmp_path):
    # force multiple spill runs with a tiny mem_records and check the order
    # (and tie order) matches a plain stable in-memory sort
    rng = np.random.default_rng(11)
    path = tmp_path / "x.sam"
    names = ["c1", "c2"]
    recs = []
    with open(path, "w") as f:
        sam_io.write_header(f, names, [500, 400])
        for i in range(97):
            rn = names[int(rng.integers(0, 2))]
            pos = int(rng.integers(1, 20))  # small range -> many ties
            line = f"r{i}\t0\t{rn}\t{pos}\t60\t5M\t*\t0\t0\tACGTA\tIIIII\n"
            recs.append(((names.index(rn), pos), line))
            f.write(line)
        f.write(sam_io.unmapped_record("u0", "ACGT", "IIII"))
    sam_io.sort_sam_file(str(path), names, mem_records=10)
    recs.sort(key=lambda kv: kv[0])
    got = [l for l in open(path) if not l.startswith("@")]
    assert got[:-1] == [l for _, l in recs]
    assert got[-1].split("\t")[0] == "u0"
    hd = [l for l in open(path) if l.startswith("@HD")][0]
    assert "SO:coordinate" in hd


def test_mapq_and_record_format():
    assert sam_io.mapq_from_weight(1.0) == 60
    assert sam_io.mapq_from_weight(0.5) == 3
    assert 0 <= sam_io.mapq_from_weight(0.99) <= 60
    rec = sam_io.record("q", 16, "chr1", 99, 60, "10M", "ACGTACGTAC",
                        "IIIIIIIIII", 10 * SCORE_ONE, 0.75)
    f = rec.rstrip("\n").split("\t")
    assert f[0] == "q" and f[1] == "16" and f[3] == "100"
    assert f[5] == "10M"
    assert "XP:f:0.750000" in rec and "AS:i:" in rec


def test_unmapped_record():
    rec = sam_io.unmapped_record("q", "ACGT", "IIII")
    f = rec.rstrip("\n").split("\t")
    assert f[1] == "4" and f[2] == "*" and f[5] == "*"
