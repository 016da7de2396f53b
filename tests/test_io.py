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
