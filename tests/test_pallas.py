"""Pallas NW kernel tests.

The kernel's DP semantics are frozen by oracle.nw_align and already covered
on CPU by tests/test_align.py (nw_ref).  Full Pallas-vs-oracle equality runs:

  * on real TPU hardware (tests below auto-skip on CPU; run on a TPU host or
    see bench.py which asserts kernel-vs-jnp equality every benchmark run);
  * in CPU interpret mode (fast on a true CPU backend; conftest pins CPU).

The always-on CPU tests here cover the XLA-side preprocessing: 4-bit genome
packing, the frozen window rule, and sentinel handling.
"""

import numpy as np
import pytest

import jax

from gnumap_tpu.align import nw_pallas, scoring
from gnumap_tpu.config import NEG_INF, MapperConfig
from gnumap_tpu.core import pwm
from gnumap_tpu.oracle import oracle

SENT = nw_pallas.SENTINEL

on_tpu = jax.default_backend() == "tpu"


def test_pack_4bit_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, 1000).astype(np.int8)
    w = nw_pallas.pack_4bit(codes)
    got = [(int(w[i // 8]) >> ((i % 8) * 4)) & 0xF for i in range(1000)]
    assert got == list(codes)


def test_window_rule_alignment():
    cfg = MapperConfig(max_read_len=104)
    assert cfg.window_width() % nw_pallas.BASES_PER_WORD == 0
    # floor behavior incl. negatives
    assert cfg.window_start(-3) <= -3 - cfg.gap_slack
    assert cfg.window_start(-3) % 8 == 0
    assert cfg.window_start(100) == ((100 - cfg.gap_slack) // 8) * 8


def test_pad_genome_words_content():
    cfg = MapperConfig(max_read_len=16, gap_slack=4)
    W = cfg.window_width()
    g = np.array([0, 1, 2, 3] * 10, np.int8)
    words = nw_pallas.pad_genome_words(g, W)
    # position p of the original genome lives at padded offset p + W
    for p in [0, 5, 17, 39]:
        off = p + W
        code = (int(words[off // 8]) >> ((off % 8) * 4)) & 0xF
        assert code == g[p]
    # left pad is all N
    for off in range(W):
        assert (int(words[off // 8]) >> ((off % 8) * 4)) & 0xF == 4


def _setup(rng, B2, C, L, G, cfg):
    genome = rng.integers(0, 5, G).astype(np.int8)
    emis = np.zeros((B2, L, 5), np.int32)
    lens = rng.integers(L // 2, L + 1, B2).astype(np.int32)
    for b in range(B2):
        lb = lens[b]
        codes = rng.integers(0, 4, lb).astype(np.int8)
        pq = pwm.pwm_from_calls(codes, rng.integers(5, 41, lb))
        emis[b, :lb] = scoring.emission_int(pq, scoring.normal_matrix(cfg))
    W = cfg.window_width()
    cands = np.full((B2, C), SENT, np.int32)
    for b in range(B2):
        k = rng.integers(0, C + 1)
        cands[b, :k] = np.sort(rng.integers(-L // 2, G - 1, k))
    return genome, emis, cands, lens, W


def _check_vs_oracle(cfg, L, C, B2, G, seed, interpret):
    rng = np.random.default_rng(seed)
    genome, emis, cands, lens, W = _setup(rng, B2, C, L, G, cfg)
    gwords = nw_pallas.pad_genome_words(genome, W)
    emis_t = np.ascontiguousarray(emis.transpose(0, 2, 1))
    got = np.asarray(nw_pallas.nw_scores_pallas(
        emis_t, cands, lens, gwords, L=L, W=W, slack=cfg.gap_slack,
        open_q=cfg.gap_open_q(), ext_q=cfg.gap_extend_q(),
        interpret=interpret))
    for b in range(B2):
        lb = int(lens[b])
        for c in range(C):
            if cands[b, c] == SENT:
                assert got[b, c] == NEG_INF
                continue
            ws = int(cfg.window_start(int(cands[b, c])))
            window = np.full(W, 4, np.int8)
            lo, hi = max(ws, 0), min(ws + W, G)
            if hi > lo:
                window[lo - ws:hi - ws] = genome[lo:hi]
            expect = oracle.nw_align(emis[b, :lb], window, cfg)
            assert got[b, c] == expect, (b, c, got[b, c], expect)


@pytest.mark.skipif(not on_tpu, reason="requires TPU (kernel compile)")
def test_pallas_matches_oracle_tpu():
    # gap_slack=16 -> band() is None: the full-width kernel is the
    # production path only for unbanded configs ([FROZEN v4])
    _check_vs_oracle(MapperConfig(max_read_len=32, gap_slack=16), L=32,
                     C=16, B2=12, G=800, seed=42, interpret=False)


def test_pallas_matches_oracle_interpret():
    _check_vs_oracle(MapperConfig(max_read_len=16, gap_slack=16), L=16,
                     C=8, B2=4, G=200, seed=3, interpret=True)


def test_pallas_matches_oracle_interpret_bigger():
    _check_vs_oracle(MapperConfig(max_read_len=24, gap_slack=16), L=24,
                     C=16, B2=10, G=600, seed=11, interpret=True)


# ---------------------------------------------------------------------------
# [FROZEN v3] banded kernel (nw_scores_banded): in-kernel window DMA +
# diagonal-band state, vs the banded oracle
# ---------------------------------------------------------------------------

def _check_banded_vs_oracle(cfg, L, C, B2, G, seed, interpret, rpt=8):
    rng = np.random.default_rng(seed)
    genome, emis, cands, lens, W = _setup(rng, B2, C, L, G, cfg)
    gwords = nw_pallas.pad_genome_words(genome, W)
    emis_t = np.ascontiguousarray(emis.transpose(0, 2, 1))
    boff, bw = cfg.band()
    got = np.asarray(nw_pallas.nw_scores_banded(
        emis_t, cands, lens, gwords, L=L, W=W, slack=cfg.gap_slack,
        boff=boff, bw=bw, open_q=cfg.gap_open_q(), ext_q=cfg.gap_extend_q(),
        interpret=interpret, rpt=rpt))
    for b in range(B2):
        lb = int(lens[b])
        for c in range(C):
            if cands[b, c] == SENT:
                assert got[b, c] == NEG_INF
                continue
            ws = int(cfg.window_start(int(cands[b, c])))
            window = np.full(W, 4, np.int8)
            lo, hi = max(ws, 0), min(ws + W, G)
            if hi > lo:
                window[lo - ws:hi - ws] = genome[lo:hi]
            expect = oracle.nw_align(emis[b, :lb], window, cfg)
            assert got[b, c] == expect, (b, c, got[b, c], expect)


def test_banded_matches_oracle_interpret():
    _check_banded_vs_oracle(MapperConfig(max_read_len=16), L=16, C=8, B2=4,
                            G=200, seed=3, interpret=True)


def test_banded_matches_oracle_interpret_long():
    # L=104 exercises real band clipping (W=128 > band start spread)
    _check_banded_vs_oracle(MapperConfig(max_read_len=104), L=104, C=4,
                            B2=6, G=2500, seed=11, interpret=True)


def test_banded_matches_nw_ref_banded():
    # jnp path with band must agree with the kernel cell-for-cell
    cfg = MapperConfig(max_read_len=48)
    rng = np.random.default_rng(9)
    genome, emis, cands, lens, W = _setup(rng, 10, 8, 48, 900, cfg)
    gwords = nw_pallas.pad_genome_words(genome, W)
    emis_t = np.ascontiguousarray(emis.transpose(0, 2, 1))
    got = np.asarray(nw_pallas.nw_scores_banded(
        emis_t, cands, lens, gwords, L=48, W=W, slack=cfg.gap_slack,
        boff=cfg.band()[0], bw=cfg.band()[1], open_q=cfg.gap_open_q(),
        ext_q=cfg.gap_extend_q(), interpret=True, rpt=8))
    from gnumap_tpu.align import nw_ref
    wins = np.zeros((10, 8, W), np.int32)
    for b in range(10):
        for c in range(8):
            cd = 0 if cands[b, c] == SENT else int(cands[b, c])
            ws = int(cfg.window_start(cd))
            window = np.full(W, 4, np.int8)
            lo, hi = max(ws, 0), min(ws + W, len(genome))
            if hi > lo:
                window[lo - ws:hi - ws] = genome[lo:hi]
            wins[b, c] = window
    ref = np.asarray(nw_ref.nw_scores_multi(
        emis, wins, lens, cfg.gap_open_q(), cfg.gap_extend_q(),
        band=cfg.band()))
    valid = cands != SENT
    assert np.array_equal(got[valid], ref[valid])


@pytest.mark.skipif(not on_tpu, reason="requires TPU (kernel compile)")
def test_banded_matches_oracle_tpu():
    _check_banded_vs_oracle(MapperConfig(max_read_len=32), L=32, C=16,
                            B2=12, G=800, seed=42, interpret=False)
