"""Config 5 (BASELINE.json:11): whole-genome mapping PAST the int32 limit.

One CLI command maps a synthetic > 2^31-base genome: the driver segments it
into two contig-aligned int32-indexed halves (dist/segments.py
GlobalSegmentedMapper), composes each with the faked multi-device
reads x index mesh, and writes SAM/SGR in global coordinates.  Reads carry
their truth in the name, so mapping is self-checking.

This is the heavyweight test of the suite (~2 GB FASTA on disk, per-segment
CSR builds over ~1.07 Gbp each); everything else stays small.
"""

import os

import numpy as np
import pytest

from gnumap_tpu.config import MapperConfig
from gnumap_tpu.dist import segments
from gnumap_tpu.index import builder

INT32_MAX = 2 ** 31 - 1
CONTIG_LEN = 1_074_000_000      # two of these + spacers > 2^31


def _write_big_fasta(path, rngs):
    """Two ~1.07 Gbp random contigs, written in 1 MB FASTA lines."""
    chars = np.frombuffer(b"ACGT", np.uint8)
    contig_codes = []
    with open(path, "wb") as f:
        for name, rng in rngs:
            codes = rng.integers(0, 4, CONTIG_LEN, dtype=np.int8)
            contig_codes.append(codes)
            f.write(b">" + name + b"\n")
            buf = chars[codes]
            step = 1 << 20
            for off in range(0, len(buf), step):
                f.write(buf[off:off + step].tobytes())
                f.write(b"\n")
    return contig_codes


def _write_reads(path, contig_codes, names, n_per_contig, read_len, rng):
    chars = np.frombuffer(b"ACGT", np.uint8)
    with open(path, "wb") as f:
        for name, codes in zip(names, contig_codes):
            G = len(codes)
            for i in range(n_per_contig):
                pos = int(rng.integers(0, G - read_len))
                frag = codes[pos:pos + read_len]
                rid = f"sim_{i}_{name.decode()}_{pos}_+".encode()
                f.write(b"@" + rid + b"\n")
                f.write(chars[frag].tobytes() + b"\n+\n")
                f.write(b"I" * read_len + b"\n")


@pytest.mark.slow
def test_cli_maps_genome_past_int32(tmp_path):
    from gnumap_tpu.cli import main as cli
    from gnumap_tpu.utils.sim import parse_truth

    fa = str(tmp_path / "big.fa")
    fq = str(tmp_path / "r.fq")
    contig_codes = _write_big_fasta(
        fa, [(b"cbig1", np.random.default_rng(61)),
             (b"cbig2", np.random.default_rng(62))])
    _write_reads(fq, contig_codes, [b"cbig1", b"cbig2"], 64, 100,
                 np.random.default_rng(63))
    total = 2 * (CONTIG_LEN + builder.SPACER_N)
    assert total > INT32_MAX
    del contig_codes

    out = str(tmp_path / "big")
    # 2 reads-shards x 2 index-shards on the faked CPU mesh, composed with
    # the automatic 2-way genome segmentation
    rc = cli.main(["-g", fa, "-o", out, fq, "-m", "14", "-j", "5",
                   "-L", "104", "-B", "64", "-k", "16", "-q", "32",
                   "-c", "2", "--index-shards", "2", "--no-sgr"])
    assert rc == 0
    os.remove(fa)

    n_mapped = n_correct = 0
    starts = {}
    with open(out + ".sam") as f:
        for line in f:
            if line.startswith("@SQ"):
                fields = dict(kv.split(":", 1)
                              for kv in line.rstrip().split("\t")[1:])
                starts[fields["SN"]] = int(fields["LN"])
                continue
            if line.startswith("@"):
                continue
            qname, flag, rname, pos = line.split("\t")[:4]
            if rname == "*":
                continue
            if int(flag) & 256:
                continue                     # secondary
            n_mapped += 1
            tname, tpos, _ = parse_truth(qname)
            if rname == tname and abs(int(pos) - 1 - tpos) <= 3:
                n_correct += 1
    assert starts == {"cbig1": CONTIG_LEN, "cbig2": CONTIG_LEN}
    assert n_mapped >= 120                  # 128 reads, subs-free
    assert n_correct == n_mapped


def test_segment_bounds_past_int32():
    """Pure-metadata check of the auto split (no giant arrays)."""
    g = builder.Genome(
        codes=np.zeros(0, np.int8),          # bounds only use starts/names
        names=["c1", "c2", "c3"],
        starts=np.array([0, 1_100_000_064, 2_000_000_128], np.int64),
        lengths=np.array([1_100_000_000, 899_999_936, 500_000_000],
                         np.int64))
    # fake total via a codes-length stand-in
    class _G:
        codes = range(2_500_000_192)         # len() only
        names = g.names
        starts = g.starts
        lengths = g.lengths
    bounds = segments.segment_bounds(_G)
    sizes = []
    ends = list(_G.starts[1:]) + [len(_G.codes)]
    for lo, hi in bounds:
        sizes.append(ends[hi - 1] - _G.starts[lo])
    assert len(bounds) >= 2
    assert all(s <= segments.SEG_LIMIT for s in sizes)
    assert bounds[0][0] == 0 and bounds[-1][1] == 3
