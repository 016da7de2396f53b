"""Aligner tests: oracle NW properties + jnp batch kernels vs oracle
(bit-identical integer scores, padding invariance).  SURVEY.md §4.2."""

import numpy as np

from gnumap_tpu.align import nw_ref, scoring
from gnumap_tpu.config import MapperConfig, SCORE_ONE
from gnumap_tpu.core import packing, pwm
from gnumap_tpu.oracle import oracle


def _mk_case(rng, L, W, cfg):
    codes = rng.integers(0, 4, L).astype(np.int8)
    quals = rng.integers(5, 41, L)
    pq = pwm.pwm_from_calls(codes, quals)
    S = scoring.normal_matrix(cfg)
    emis = scoring.emission_int(pq, S)
    window = rng.integers(0, 5, W).astype(np.int8)
    return emis, window


def test_oracle_perfect_match_score():
    cfg = MapperConfig(gap_slack=4, max_read_len=20)
    codes = packing.encode("ACGTACGTACGTACGTACGT")
    pq = pwm.pwm_from_calls(codes, np.full(20, 40))
    S = scoring.normal_matrix(cfg)
    emis = scoring.emission_int(pq, S)
    window = np.concatenate([np.full(4, 4, np.int8), codes,
                             np.full(4, 4, np.int8)])
    sc, pos, cigar, ref_len = oracle.nw_align(emis, window, cfg,
                                              traceback=True)
    assert cigar == "20M" and pos == 4 and ref_len == 20
    # Q40 -> p=0.9999: score just below 20 * SCORE_ONE
    assert 0.99 * 20 * SCORE_ONE < sc <= 20 * SCORE_ONE


def test_oracle_detects_indel():
    cfg = MapperConfig(gap_slack=4, max_read_len=30)
    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, 40).astype(np.int8)
    read = np.concatenate([g[4:16], g[17:31]])       # 1bp deletion
    pq = pwm.pwm_from_calls(read, np.full(len(read), 40))
    emis = scoring.emission_int(pq, scoring.normal_matrix(cfg))
    sc, pos, cigar, _ = oracle.nw_align(emis, g, cfg, traceback=True)
    # deletion placement may slide when flanking bases coincide; the shape
    # (26 aligned bases, one 1bp deletion) is what matters
    import re
    mm = re.fullmatch(r"(\d+)M1D(\d+)M", cigar)
    assert mm and int(mm.group(1)) + int(mm.group(2)) == 26 and pos == 4


def test_oracle_insertion_cigar():
    cfg = MapperConfig(gap_slack=4, max_read_len=30)
    rng = np.random.default_rng(1)
    g = rng.integers(0, 4, 40).astype(np.int8)
    read = np.concatenate([g[4:16], np.array([(g[16] + 2) % 4], np.int8),
                           g[16:28]])                # 1bp insertion
    pq = pwm.pwm_from_calls(read, np.full(len(read), 40))
    emis = scoring.emission_int(pq, scoring.normal_matrix(cfg))
    sc, pos, cigar, _ = oracle.nw_align(emis, g, cfg, traceback=True)
    assert cigar in ("12M1I12M", "13M1I11M")  # insertion placement may tie
    assert pos == 4


def test_nw_scores_matches_oracle_random():
    cfg = MapperConfig()
    rng = np.random.default_rng(3)
    P, L, W = 16, 24, 40
    emis = np.zeros((P, L, 5), np.int32)
    wins = np.zeros((P, W), np.int32)
    expect = np.zeros(P, np.int64)
    for p in range(P):
        e, w = _mk_case(rng, L, W, cfg)
        emis[p], wins[p] = e, w
        expect[p] = oracle.nw_align(e, w, cfg)
    got = np.asarray(nw_ref.nw_scores(
        emis, wins, np.full(P, L, np.int32),
        open_q=cfg.gap_open_q(), ext_q=cfg.gap_extend_q(),
        band=cfg.band()))
    assert np.array_equal(got, expect)


def test_nw_scores_padding_invariance():
    """Scores must be identical when reads are padded with zero-emission rows
    and free gap transitions (frozen padding semantics)."""
    cfg = MapperConfig()
    rng = np.random.default_rng(4)
    P, L, W = 8, 20, 64
    Lpad = 48
    emis = np.zeros((P, Lpad, 5), np.int32)
    wins = np.zeros((P, W), np.int32)
    expect = np.zeros(P, np.int64)
    for p in range(P):
        e, w = _mk_case(rng, L, W, cfg)
        emis[p, :L] = e
        wins[p] = w
        expect[p] = oracle.nw_align(e, w, cfg)
    got = np.asarray(nw_ref.nw_scores(
        emis, wins, np.full(P, L, np.int32),
        open_q=cfg.gap_open_q(), ext_q=cfg.gap_extend_q(),
        band=cfg.band()))
    assert np.array_equal(got, expect)


def test_nw_scores_multi_matches_pairs():
    cfg = MapperConfig()
    rng = np.random.default_rng(5)
    B, C, L, W = 4, 3, 24, 40
    emis = np.zeros((B, L, 5), np.int32)
    wins = np.zeros((B, C, W), np.int32)
    for b in range(B):
        e, _ = _mk_case(rng, L, W, cfg)
        emis[b] = e
        for c in range(C):
            wins[b, c] = rng.integers(0, 5, W)
    lens = np.full(B, L, np.int32)
    multi = np.asarray(nw_ref.nw_scores_multi(
        emis, wins, lens, cfg.gap_open_q(), cfg.gap_extend_q(),
        band=cfg.band()))
    for b in range(B):
        for c in range(C):
            assert multi[b, c] == oracle.nw_align(emis[b], wins[b, c], cfg)


def test_zero_length_read_scores_zero():
    cfg = MapperConfig()
    emis = np.zeros((2, 10, 5), np.int32)
    wins = np.zeros((2, 20), np.int32)
    got = np.asarray(nw_ref.nw_scores(
        emis, wins, np.zeros(2, np.int32),
        open_q=cfg.gap_open_q(), ext_q=cfg.gap_extend_q(),
        band=cfg.band()))
    assert np.array_equal(got, [0, 0])
