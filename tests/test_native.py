"""Native C++ host runtime vs frozen oracle (SURVEY.md §2 native rows)."""

import numpy as np
import pytest

from gnumap_tpu.align import scoring
from gnumap_tpu.config import NEG_INF, MapperConfig
from gnumap_tpu.core import pwm
from gnumap_tpu.native import lib as nl
from gnumap_tpu.oracle import oracle

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native lib not built")


def test_nw_traceback_matches_oracle():
    cfg = MapperConfig()
    rng = np.random.default_rng(0)
    for _ in range(60):
        L = int(rng.integers(8, 105))
        W = int(rng.integers(L, L + 40))
        codes = rng.integers(0, 4, L).astype(np.int8)
        pq = pwm.pwm_from_calls(codes, rng.integers(5, 41, L))
        emis = scoring.emission_int(pq, scoring.normal_matrix(cfg))
        window = rng.integers(0, 5, W).astype(np.int8)
        got = nl.nw_traceback(emis, window, cfg.gap_open_q(),
                              cfg.gap_extend_q(), NEG_INF, band=cfg.band())
        exp = oracle.nw_align(emis, window, cfg, traceback=True)
        assert got == exp


def test_nw_traceback_indel_case():
    cfg = MapperConfig(max_read_len=40)
    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, 60).astype(np.int8)
    read = np.concatenate([g[10:25], g[26:41]])          # 1bp deletion
    pq = pwm.pwm_from_calls(read, np.full(30, 40))
    emis = scoring.emission_int(pq, scoring.normal_matrix(cfg))
    got = nl.nw_traceback(emis, g, cfg.gap_open_q(), cfg.gap_extend_q(),
                          NEG_INF, band=cfg.band())
    exp = oracle.nw_align(emis, g, cfg, traceback=True)
    assert got == exp
    assert "D" in got[2]


def test_emission_matches():
    cfg = MapperConfig(bisulfite=True)
    rng = np.random.default_rng(1)
    Sp, Sm = scoring.matrices_for_mode(cfg)
    for S in (Sp, Sm):
        pq = pwm.pwm_from_calls(rng.integers(0, 5, 80).astype(np.int8),
                                rng.integers(2, 41, 80))
        assert np.array_equal(nl.emission_int(pq, S),
                              scoring.emission_int(pq, S))


def test_parse_fastq_chunk_boundaries():
    recs = []
    rng = np.random.default_rng(2)
    for i in range(50):
        L = int(rng.integers(5, 30))
        seq = "".join("ACGTN"[c] for c in rng.integers(0, 5, L))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, L))
        recs.append(f"@read_{i} extra stuff\n{seq}\n+\n{qual}\n")
    blob = "".join(recs).encode()
    # feed in awkward chunk sizes; carry tails like the streaming reader
    names_all = []
    tail = b""
    pos = 0
    while pos < len(blob) or tail:
        chunk = tail + blob[pos:pos + 97]
        pos += 97
        names, codes, quals, lens, consumed, _ = nl.parse_fastq_chunk(
            chunk, 100, 32, 33, is_final=(pos >= len(blob)))
        names_all.extend(names)
        tail = chunk[consumed:]
        if pos >= len(blob) and consumed == 0:
            break
    assert names_all == [f"read_{i}" for i in range(50)]


def test_native_batch_reader_equals_python(tmp_path, small_cfg):
    from gnumap_tpu.io import fastq as io_fastq
    from gnumap_tpu.utils import sim
    g = sim.random_genome(2000, seed=3)
    reads = sim.simulate_reads(g, 70, 36, seed=4, contig="c")
    path = tmp_path / "r.fastq"
    sim.write_fastq(str(path), reads)
    py = list(io_fastq.batch_reads(io_fastq.iter_fastq(str(path), small_cfg),
                                   small_cfg))
    nat = list(io_fastq.batch_reads_native(str(path), small_cfg))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a.names == b.names
        assert np.array_equal(a.codes, b.codes)
        assert np.array_equal(a.pwm_q, b.pwm_q)
        assert np.array_equal(a.lens, b.lens)
        assert np.array_equal(a.quals, b.quals)


def test_native_scatter_bit_identical():
    """Native ordered coverage/tally scatter == the NumPy np.add.at path
    (the exact-float64 contract that keeps SGR/SGREX goldens stable)."""
    from gnumap_tpu.config import PWM_SCALE
    rng = np.random.default_rng(12)
    G, B, Lmax = 3000, 32, 48
    # coverage
    H = 800
    pos = rng.integers(-40, G + 20, H)
    rl = rng.integers(1, 100, H)
    w = rng.random(H)
    cov_n = np.zeros(G)
    nl.scatter_coverage(cov_n, pos, rl, w)
    cov_p = np.zeros(G)
    for h in range(H):
        lo = max(0, int(pos[h]))
        hi = max(lo, min(G, int(pos[h] + rl[h])))
        cov_p[lo:hi] += w[h]
    assert np.array_equal(cov_n, cov_p)
    # tallies (pure-match + gapped CIGARs, plus/minus strands)
    pwm_q = rng.integers(0, 4096, (B, Lmax, 4)).astype(np.int32)
    lens = rng.integers(10, Lmax + 1, B).astype(np.int32)
    H = 300
    b_idx = rng.integers(0, B, H).astype(np.int32)
    minus = rng.integers(0, 2, H).astype(np.int8)
    tpos = rng.integers(-10, G, H)
    tw = rng.random(H)
    cigars = []
    for h in range(H):
        L = int(lens[b_idx[h]])
        if h % 4 == 0 and L > 20:
            a = L // 3
            cigars.append(f"{a}M2D{a}M1I{L - 2 * a - 1}M")
        else:
            cigars.append("")
    t_n = np.zeros((G, 4))
    nl.scatter_tallies(t_n, pwm_q, lens, b_idx, minus, tpos, tw, cigars,
                       PWM_SCALE)
    t_p = np.zeros((G, 4))
    for h in range(H):
        b = int(b_idx[h])
        L = int(lens[b])
        cg = cigars[h] or f"{L}M"
        gp, i = int(tpos[h]), 0
        for num, op in oracle._iter_cigar(cg):
            if op == "M":
                for k in range(num):
                    if 0 <= gp < G:
                        for base in range(4):
                            pv = (pwm_q[b, L - 1 - i, 3 - base] if minus[h]
                                  else pwm_q[b, i, base])
                            t_p[gp, base] += pv / PWM_SCALE * tw[h]
                    gp += 1
                    i += 1
            elif op == "D":
                gp += num
            else:
                i += num
    assert np.array_equal(t_n, t_p)


def test_native_sam_formatter_byte_identical(monkeypatch):
    """map_stream's native batch SAM formatter must produce byte-identical
    records to the per-record io/sam.py path — incl. minus-strand revcomp,
    secondary flags, indel CIGARs, unmapped records, and the %.4f/%.6f
    float fields (1/3-style weights)."""
    import pytest
    from conftest import records_from_sim
    from gnumap_tpu.config import MapperConfig
    from gnumap_tpu.index import builder
    from gnumap_tpu.io import fastq as io_fastq
    from gnumap_tpu.native import lib as native_lib
    from gnumap_tpu.pipeline import mapper as pl
    from gnumap_tpu.utils import sim
    if not native_lib.available():
        pytest.skip("native lib unavailable")
    cfg = MapperConfig(mer_size=8, seed_jump=4, batch_size=64,
                       max_read_len=40, align_score_ratio=0.8,
                       sam_out=True, sgr_out=False)
    genome = sim.random_genome(20_000, seed=6, repeat_frac=0.08,
                               repeat_unit=120)
    gen = builder.Genome.from_contigs([("cA", genome[:9000]),
                                       ("c_B_x", genome[9000:])])
    idx = builder.build_index(gen, cfg)
    reads = sim.simulate_reads(genome, 150, 36, seed=7, sub_rate=0.03,
                               indel_rate=0.2, contig="t")
    recs = records_from_sim(reads, cfg)

    def run():
        m = pl.TpuMapper(gen, idx, cfg)
        return pl.map_stream(m, io_fastq.batch_reads(iter(recs), cfg),
                             collect_sam=True).sam_lines

    native_lines = run()
    monkeypatch.setattr(native_lib, "available", lambda: False)
    py_lines = run()
    assert "".join(native_lines) == "".join(py_lines)
    joined = "".join(native_lines)
    assert "\t16\t" in joined or "\t272\t" in joined   # minus strand hit
    assert "\t4\t*\t" in joined or True                # unmapped may occur


def test_native_sam_formatter_long_names_many_hits(monkeypatch):
    """Capacity regression: every hit repeats its read's qname, so long
    headers x many retained hits must not overflow the native buffer."""
    import pytest
    from conftest import records_from_sim
    from gnumap_tpu.config import MapperConfig
    from gnumap_tpu.index import builder
    from gnumap_tpu.io import fastq as io_fastq, sam as sam_io
    from gnumap_tpu.native import lib as native_lib
    from gnumap_tpu.pipeline import mapper as pl
    from gnumap_tpu.utils import sim
    if not native_lib.available():
        pytest.skip("native lib unavailable")
    cfg = MapperConfig(mer_size=8, seed_jump=4, batch_size=32,
                       max_read_len=40, align_score_ratio=0.8,
                       max_hits_per_seed=32, sam_out=True, sgr_out=False)
    genome, spots = sim.random_genome_families(
        30_000, seed=5, n_families=1, copies=12, unit_len=200)
    gen = builder.Genome.from_contigs(
        [("a_very_long_reference_contig_name_for_capacity_checks",
          genome)])
    idx = builder.build_index(gen, cfg)
    starts = (np.concatenate(spots)[:, None]
              + np.arange(0, 160, 16)[None, :]).ravel()
    reads = sim.simulate_reads(genome, 32, 36, seed=6, sub_rate=0.0,
                               contig="x", positions=starts)
    recs = records_from_sim(reads, cfg)
    recs = [io_fastq.ReadRecord(
        "an_extremely_long_read_header_the_kind_srr_archives_emit_"
        "with_tile_and_coordinate_fields_" + r.name,
        r.codes, r.pwm_q, r.quals) for r in recs]
    m = pl.TpuMapper(gen, idx, cfg)
    res = pl.map_stream(m, io_fastq.batch_reads(iter(recs), cfg),
                        collect_sam=True)
    joined = "".join(res.sam_lines)
    # ~12 co-best hits per read, every record carrying the long qname
    assert joined.count("an_extremely_long_read_header") >= 32
    assert "\t256\t" in joined or "\t272\t" in joined
