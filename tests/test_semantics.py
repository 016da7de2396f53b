"""Targeted frozen-semantics tests (oracle docstring contract)."""

import numpy as np

from gnumap_tpu.config import MapperConfig, NEG_INF, SCORE_ONE
from gnumap_tpu.core import packing, pwm
from gnumap_tpu.align import scoring
from gnumap_tpu.oracle import oracle


def test_threshold_exact_boundary():
    cfg = MapperConfig(align_score_ratio=0.9)
    for ms in (100, 1000, 262144, 26214400, 4 * 10 ** 7):
        thr = cfg.threshold_for(ms)
        # exact integer ceil of a*ms with a quantized to 2^-32
        aq = cfg.ratio_q()
        assert thr == -((-aq * ms) // (1 << 32))
        assert (thr - 1) * (1 << 32) < aq * ms <= thr * (1 << 32)


def test_retention_is_inclusive():
    """score == threshold is retained (>=, frozen)."""
    cfg = MapperConfig(mer_size=4, seed_jump=2, max_read_len=16,
                       align_score_ratio=1.0)
    # a perfect-confidence read (ratio 1.0 keeps only max-score alignments)
    g = "ACGTTGCAATCGGCTA" * 4
    gen = oracle.OracleGenome.from_contigs([("g", g)])
    idx = oracle.build_oracle_index(gen, cfg)
    codes = packing.encode(g[8:24])
    pq = pwm.pwm_from_calls(codes, np.full(16, 40))
    hits = oracle.map_read(codes, pq, gen, idx, cfg)
    # max attainable uses the same PWM-weighted emission, so the true locus
    # meets the threshold exactly and must be retained
    assert hits and any(h.pos == 8 for h in hits)


def test_traceback_state_preference():
    """On score ties the traceback prefers M > Ix > Iy (frozen): a region
    where match and gap paths tie must yield an all-M cigar."""
    cfg = MapperConfig(max_read_len=12, gap_slack=4)
    codes = packing.encode("AAAAAAAAAAAA")
    pq = pwm.pwm_from_calls(codes, np.full(12, 40))
    emis = scoring.emission_int(pq, scoring.normal_matrix(cfg))
    window = packing.encode("AAAAAAAAAAAAAAAAAAAA")  # homopolymer: many ties
    sc, p, cigar, rl = oracle.nw_align(emis, window, cfg, traceback=True)
    assert cigar == "12M" and p == 0  # smallest j on ties


def test_candidate_order_and_cap():
    cfg = MapperConfig(mer_size=4, seed_jump=1, max_candidates=4,
                       max_hits_per_seed=64, max_read_len=12)
    g = "ACGTACGTACGT" * 8  # highly repetitive
    gen = oracle.OracleGenome.from_contigs([("g", g)])
    idx = oracle.build_oracle_index(gen, cfg)
    codes = packing.encode("ACGTACGTACGT")
    cands = oracle.candidates_for(codes, idx, cfg)
    assert len(cands) == 4
    assert cands == sorted(cands)           # ascending, first C kept


def test_hot_seed_skipped():
    cfg = MapperConfig(mer_size=4, seed_jump=1, max_hits_per_seed=2,
                       max_read_len=12)
    g = "AAAA" * 50 + "GCGCTTAGCTA"
    gen = oracle.OracleGenome.from_contigs([("g", g)])
    idx = oracle.build_oracle_index(gen, cfg)
    codes = packing.encode("AAAAAAAA")     # every seed is hot -> no cands
    assert oracle.candidates_for(codes, idx, cfg) == []


def test_neg_inf_headroom():
    """NEG_INF plus worst-case legal terms must stay inside int32."""
    cfg = MapperConfig(max_read_len=160)
    worst = NEG_INF - cfg.gap_open_q() - 160 * cfg.gap_extend_q() \
        + NEG_INF  # e + diag when both are floor values
    assert worst > np.iinfo(np.int32).min
    best = 160 * SCORE_ONE + 256 * cfg.gap_extend_q()
    assert best < np.iinfo(np.int32).max
