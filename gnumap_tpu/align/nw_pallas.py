"""Pallas TPU kernel for the probabilistic NW hot loop (SURVEY.md §7 M2).

Design (TPU-native, not a translation of the reference's per-cell C++ loop —
``ScoredSeq::align``, SURVEY.md §3.3):

  * Inter-task parallelism: each grid tile processes RPT=8 read-strands x
    TPC=8 candidate loci = 64 sublanes of DP state; M/Ix/Iy live in VMEM
    scratch as (64, Wp lanes) int32, lane j = DP column j+1.  Sublane
    s = 8*c + r is candidate slot c of read r (candidate-major), so a
    read's per-row scalars broadcast to its sublanes with ONE tile-style
    ``pltpu.repeat`` of an (8, 1) column.  Column 0 (the leading-insertion
    ramp) is carried as a (64, 1) vector.  The row loop over read positions
    is sequential; every VPU op updates all 64 x Wp cells at once — 8
    vregs of work per op, amortizing the loop's scalar overhead.
  * Per-(read, row) data — the 5 emission values and the row's gap-open /
    gap-extend (zeroed on pad rows = the frozen free-pad semantics) — is
    pre-laid-out host/XLA-side as an (Lp, 8, 8)-lane array so the kernel
    fetches it with one dynamic-row vector load per row; no SMEM scalar
    reads in the inner loop.
  * The in-row gap chain (Iy) is the frozen prefix-max unrolling computed
    as a lanewise log-doubling cummax (pltpu.roll + masked max).
  * Genome windows are gathered by XLA as 4-bit-packed int32 words (8
    bases/word, N-preserving) — 8x fewer gather elements than per-base
    windows — then nibble-unpacked by fused elementwise XLA ops into an
    int8 code array streamed to the kernel.  Window starts are
    floor-aligned to 8 bases [FROZEN window rule, mirrored by
    oracle.map_read]: ws = floor((cand - slack) / 8) * 8,
    width W = max_read_len + 2*slack + 8.
  * Candidates arrive sorted ascending with SENTINEL (int32 max) padding;
    tiles whose 64 slots are all sentinels are skipped via a precomputed
    per-tile flag — compute scales with real candidate count, not the
    static cap.

Scores are bit-identical to oracle.nw_align / nw_ref.nw_scores (int32
fixed-point; property-tested in tests/test_pallas.py, CPU interpret mode and
real TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnumap_tpu.config import NEG_INF

SUBLANES = 64       # read-strands x candidate slots per grid tile
RPT = 8             # default read-strands per tile (tunable; x TPC = 64)
SENTINEL = 2 ** 31 - 1
BASES_PER_WORD = 8  # 4-bit packing


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def window_width(max_read_len: int, slack: int) -> int:
    """FROZEN window rule (see module docstring)."""
    return max_read_len + 2 * slack + BASES_PER_WORD


def window_start(cand, slack: int):
    """Floor-aligned window start; works on ints and arrays."""
    return ((cand - slack) // BASES_PER_WORD) * BASES_PER_WORD


def pack_4bit(codes: np.ndarray) -> np.ndarray:
    """int8 base codes (0..4) -> int32 words, 8 codes per word, little-end
    nibble order (code j in bits 4j..4j+3)."""
    codes = np.asarray(codes, dtype=np.uint32) & 0xF
    pad = (-len(codes)) % BASES_PER_WORD
    if pad:
        codes = np.concatenate([codes, np.full(pad, 4, np.uint32)])
    w = codes.reshape(-1, BASES_PER_WORD)
    shifts = (np.arange(BASES_PER_WORD, dtype=np.uint32) * 4)[None, :]
    return (w << shifts).sum(axis=1, dtype=np.uint32).view(np.int32)


def pad_genome_words(g_codes: np.ndarray, W: int) -> np.ndarray:
    """4-bit pack the genome with W Ns on the left and W + Wp Ns on the
    right so every window word index is in range."""
    Wp = _round_up(W, 128)
    pad_l = np.full(W, 4, np.int8)
    pad_r = np.full(W + Wp, 4, np.int8)
    return pack_4bit(np.concatenate([pad_l, np.asarray(g_codes, np.int8),
                                     pad_r]))


def _shift_right_fill(x, fill):
    """lane j of result <- lane j-1 of x; lane 0 <- fill (scalar/column)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= 1, pltpu.roll(x, 1, 1), fill)


def _cummax_lanes(x, wp):
    """Inclusive prefix max along the lane axis (log-doubling)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sh = 1
    while sh < wp:
        x = jnp.maximum(x, jnp.where(lane >= sh, pltpu.roll(x, sh, 1),
                                     NEG_INF))
        sh *= 2
    return x


def _bcast_col(col, tpc):
    """(rpt, 1) per-read column -> (64, 1): sublane tpc*c + r gets read r's
    value (tile-style sublane repeat matches the candidate-major layout)."""
    return pltpu.repeat(col, tpc, axis=0)


def _nw_kernel(skip_ref, rows_ref, win8_ref, out_ref,
               m_ref, ix_ref, iy_ref, *,
               L: int, W: int, Wp: int, open_q: int, ext_q: int,
               rpt: int):
    """One tile: rpt reads x tpc candidate slots (rpt*tpc = 64).

    skip_ref: SMEM (1, 1, 1, 1)       1 = all slots sentinel, skip tile
    rows_ref: VMEM (1, Lp, rpt, 8)    per-(row, read): lanes 0..4 emission,
                                      lane 5 gap-open_i, lane 6 gap-ext_i
    win8_ref: VMEM (1, 1, 64, Wp) int8 window codes (5 = masked/N-pad)
    out_ref:  VMEM (1, 1, 1, 64)      scores, sublane order s = tpc*c + r
    m/ix/iy:  VMEM (64, Wp) int32 scratch — DP state, lane j = column j+1
    """
    S = SUBLANES
    tpc = S // rpt

    @pl.when(skip_ref[0, 0, 0, 0] == 1)
    def _():
        out_ref[0, 0, 0, :] = jnp.full((S,), NEG_INF, dtype=jnp.int32)

    @pl.when(skip_ref[0, 0, 0, 0] == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, Wp), 1)
        win = win8_ref[0, 0].astype(jnp.int32)
        win = jnp.where(lane < W, win, 5)

        m_ref[:, :] = jnp.zeros((S, Wp), jnp.int32)        # M[0][j] = 0
        ix_ref[:, :] = jnp.full((S, Wp), NEG_INF, jnp.int32)
        iy_ref[:, :] = jnp.full((S, Wp), NEG_INF, jnp.int32)

        def row(i, carry):
            m0, ix0 = carry                      # (S, 1) column-0 state
            slab = rows_ref[0, i]                # (rpt, 8)
            opn = _bcast_col(slab[:, 5:6], tpc)  # (S, 1)
            ext = _bcast_col(slab[:, 6:7], tpc)
            e = jnp.full((S, Wp), NEG_INF, dtype=jnp.int32)
            for v in range(5):
                e = jnp.where(win == v, _bcast_col(slab[:, v:v + 1], tpc),
                              e)
            M, Ix, Iy = m_ref[:, :], ix_ref[:, :], iy_ref[:, :]
            prev_best = jnp.maximum(jnp.maximum(M, Ix), Iy)
            diag = _shift_right_fill(prev_best, jnp.maximum(m0, ix0))
            M_new = jnp.maximum(e + diag, NEG_INF)
            Ix_new = jnp.maximum(jnp.maximum(M - opn, Ix - ext), NEG_INF)
            # Iy[col] = max_{k<=col-1}(M[k] + k*ext) - open - (col-1)*ext,
            # col = lane+1; column 0's M is NEG_INF for every row i >= 1.
            pm = _cummax_lanes(M_new + (lane + 1) * ext_q, Wp)
            Iy_new = jnp.maximum(
                _shift_right_fill(pm, NEG_INF) - open_q - lane * ext_q,
                NEG_INF)
            m_ref[:, :] = M_new
            ix_ref[:, :] = Ix_new
            iy_ref[:, :] = Iy_new
            ix0_new = jnp.maximum(
                jnp.maximum(m0 - opn, ix0 - ext), NEG_INF)
            m0_new = jnp.full((S, 1), NEG_INF, jnp.int32)
            return m0_new, ix0_new

        _, ix0_fin = jax.lax.fori_loop(
            0, L, row,
            (jnp.zeros((S, 1), jnp.int32),
             jnp.full((S, 1), NEG_INF, jnp.int32)))
        fin = jnp.maximum(m_ref[:, :], ix_ref[:, :])
        fin = jnp.where(lane < W, fin, NEG_INF)
        out_ref[0, 0, 0, :] = jnp.maximum(
            jnp.max(fin, axis=1), ix0_fin[:, 0]).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("L", "W", "slack", "open_q", "ext_q",
                                    "interpret", "rpt"))
def nw_scores_pallas(emis_t: jax.Array, cands: jax.Array, lens: jax.Array,
                     genome_words: jax.Array, *, L: int, W: int, slack: int,
                     open_q: int, ext_q: int,
                     interpret: bool = False, rpt: int = RPT) -> jax.Array:
    """Scores for every (read-strand, candidate) pair.

    emis_t:       int32[B2, 5, L]  emission tables, code-major
    cands:        int32[B2, C]     sorted candidate anchors, SENTINEL-padded
    lens:         int32[B2]        true read lengths
    genome_words: int32[Gw]        4-bit packed genome from pad_genome_words
    returns:      int32[B2, C]     alignment scores (NEG_INF at sentinels)
    """
    B2, C = cands.shape
    TPC = SUBLANES // rpt
    RPT_ = rpt
    assert SUBLANES % rpt == 0
    assert C % TPC == 0, "max_candidates must be a multiple of 64/rpt"
    assert W % BASES_PER_WORD == 0
    Wp = _round_up(W, 128)
    Lp = _round_up(L, 8)
    Gw = genome_words.shape[0]
    # pad the read axis to a multiple of rpt
    B2p = _round_up(B2, RPT_)
    if B2p != B2:
        emis_t = jnp.pad(emis_t, ((0, B2p - B2), (0, 0), (0, 0)))
        cands = jnp.pad(cands, ((0, B2p - B2), (0, 0)),
                        constant_values=SENTINEL)
        lens = jnp.pad(lens, (0, B2p - B2))
    G8 = B2p // RPT_
    nt = C // TPC
    nw = Wp // BASES_PER_WORD

    # --- per-(row, read) data slab: emission lanes 0..4, opn 5, ext 6 ---
    rows = jnp.zeros((B2p, Lp, 8), dtype=jnp.int32)
    rows = rows.at[:, :L, :5].set(jnp.transpose(emis_t, (0, 2, 1)))
    in_read = (jnp.arange(Lp, dtype=jnp.int32)[None, :]
               < lens[:, None])                       # (B2p, Lp)
    rows = rows.at[:, :, 5].set(jnp.where(in_read, open_q, 0))
    rows = rows.at[:, :, 6].set(jnp.where(in_read, ext_q, 0))
    rows = rows.reshape(G8, RPT_, Lp, 8).transpose(0, 2, 1, 3)

    # --- windows: word gather + nibble unpack, candidate-major sublanes ---
    safe = jnp.where(cands == SENTINEL, 0, cands)
    wstart = (window_start(safe, slack) + W) // BASES_PER_WORD
    widx = wstart[:, :, None] + jnp.arange(nw, dtype=jnp.int32)
    words = genome_words[jnp.clip(widx, 0, Gw - 1)]            # (B2p, C, nw)
    rep = jnp.repeat(words, BASES_PER_WORD, axis=2)            # (B2p, C, Wp)
    sub = (jnp.arange(Wp, dtype=jnp.int32) % BASES_PER_WORD) * 4
    win8 = ((rep >> sub) & 0xF).astype(jnp.int8)
    # sentinel slots: poison with code 5 so they can never score > NEG_INF
    win8 = jnp.where((cands == SENTINEL)[:, :, None], jnp.int8(5), win8)
    # (B2p, C, Wp) -> (G8, rpt, nt, TPC, Wp) -> (G8, nt, TPC, rpt, Wp)
    win8 = win8.reshape(G8, RPT_, nt, TPC, Wp).transpose(0, 2, 3, 1, 4)
    win8 = win8.reshape(G8, nt, SUBLANES, Wp)

    # --- per-tile skip flags ---
    tile_valid = (cands != SENTINEL).reshape(G8, RPT_, nt, TPC)
    skip = jnp.logical_not(tile_valid.any(axis=(1, 3))).astype(jnp.int32)
    skip = skip.reshape(G8, nt, 1, 1)

    kernel = functools.partial(
        _nw_kernel, L=L, W=W, Wp=Wp, open_q=open_q, ext_q=ext_q, rpt=rpt)
    scores = pl.pallas_call(
        kernel,
        grid=(G8, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Lp, RPT_, 8), lambda g, t: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUBLANES, Wp), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, SUBLANES),
                               lambda g, t: (g, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G8, nt, 1, SUBLANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, Wp), jnp.int32),
            pltpu.VMEM((SUBLANES, Wp), jnp.int32),
            pltpu.VMEM((SUBLANES, Wp), jnp.int32),
        ],
        interpret=interpret,
    )(skip, rows, win8)
    # (G8, nt, 1, TPC*rpt) -> sublane s = tpc-major: s = tpc*c + r
    scores = scores.reshape(G8, nt, TPC, RPT_).transpose(0, 3, 1, 2)
    scores = scores.reshape(B2p, C)[:B2]
    return jnp.where(cands[:B2] != SENTINEL, scores, NEG_INF)
