"""pallas_band_unroll=2 must be bit-identical to unroll=1 (the extra pad
row past odd maxlen is frozen-free: opn = ext = endf = 0)."""

import numpy as np

from gnumap_tpu.align import nw_pallas, scoring
from gnumap_tpu.config import MapperConfig
from gnumap_tpu.core import pwm as pwm_mod
from gnumap_tpu.utils import sim
from gnumap_tpu.core import packing


def _scores(unroll, lens_pattern, peel=True):
    cfg = MapperConfig(max_read_len=48, align_score_ratio=0.8)
    L, W = cfg.max_read_len, cfg.window_width()
    rng = np.random.default_rng(99)
    g = packing.encode(sim.random_genome(4000, seed=2))
    G = len(g)
    S = scoring.normal_matrix(cfg)
    B, C = 32, 8
    emis = np.zeros((B, L, 5), np.int32)
    cands = np.full((B, C), 2 ** 31 - 1, np.int32)
    lens = np.array([lens_pattern[i % len(lens_pattern)]
                     for i in range(B)], np.int32)
    for b in range(B):
        Lr = int(lens[b])
        pos = int(rng.integers(0, G - L - 4))
        frag = g[pos:pos + Lr].copy()
        err = rng.random(Lr) < 0.05
        frag = np.where(err, (frag + 1) % 4, frag).astype(np.int8)
        pq = np.zeros((L, 4), np.int32)
        pq[:Lr] = pwm_mod.pwm_from_calls(frag, rng.integers(10, 41, Lr))
        emis[b, :Lr] = scoring.emission_int(pq[:Lr], S)
        cands[b, 0] = pos
        cands[b, 1] = int(rng.integers(0, G - L))
    cands = np.sort(cands, axis=1)
    gwords = nw_pallas.pad_genome_words(g, W)
    emis_t = np.ascontiguousarray(emis.transpose(0, 2, 1))
    boff, bw = cfg.band()
    return np.asarray(nw_pallas.nw_scores_banded(
        emis_t, cands, lens, gwords, L=L, W=W, slack=cfg.gap_slack,
        boff=boff, bw=bw, open_q=cfg.gap_open_q(), ext_q=cfg.gap_extend_q(),
        interpret=True, rpt=32, unroll=unroll, peel=peel))


def test_unroll2_bit_identical_even_lens():
    a = _scores(1, [48, 40])
    b = _scores(2, [48, 40])
    assert np.array_equal(a, b)


def test_unroll2_bit_identical_odd_maxlen():
    # group maxlen 47 (odd) exercises the extra trailing pad row
    a = _scores(1, [47, 31, 45, 33])
    b = _scores(2, [47, 31, 45, 33])
    assert np.array_equal(a, b)


def test_peel_bit_identical():
    """Loop peeling (boundary-free body rows) must not change any score,
    including short reads whose maxlen ends inside the head region."""
    for pat in ([48, 40], [47, 31, 45, 33], [9, 48], [12]):
        a = _scores(1, pat, peel=True)
        b = _scores(1, pat, peel=False)
        assert np.array_equal(a, b), pat
