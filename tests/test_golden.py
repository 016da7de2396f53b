"""Golden-output regression (SURVEY.md §4.5): the committed phiX workload
must reproduce byte-identical SAM/SGR/SGREX.  Any diff is a review event —
either a bug or an intentional frozen-semantics change (then regenerate via
the command in tests/golden/README)."""

import hashlib
import os

from gnumap_tpu.cli import main as cli

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "tests", "golden")


def _sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _golden_shas():
    out = {}
    with open(os.path.join(GOLDEN, "SHA256SUMS")) as f:
        for line in f:
            h, p = line.split()
            out[os.path.basename(p)] = h
    return out


def test_phix_golden_outputs(tmp_path):
    rc = cli.main([
        "-g", os.path.join(ROOT, "testdata", "phix_sim.fa"),
        "-o", str(tmp_path / "phix"), "-m", "8", "-j", "4", "-B", "128",
        "-L", "40", "--snp",
        os.path.join(ROOT, "testdata", "phix_sim_200.fastq")])
    assert rc == 0
    golden = _golden_shas()
    for ext in ("sam", "sgr", "sgrex"):
        got = _sha(str(tmp_path / f"phix.{ext}"))
        # SAM embeds the command line in @PG; compare body only
        if ext == "sam":
            with open(tmp_path / "phix.sam") as f:
                body = "".join(l for l in f if not l.startswith("@PG"))
            with open(os.path.join(GOLDEN, "phix.sam")) as f:
                gbody = "".join(l for l in f if not l.startswith("@PG"))
            assert body == gbody
        else:
            assert got == golden[f"phix.{ext}"], ext
