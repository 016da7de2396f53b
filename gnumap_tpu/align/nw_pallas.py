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
ROWGATHER_MAX = 1 << 26   # see pipeline.mapper.ROWGATHER_MAX


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
    """4-bit pack the genome with W Ns on the left and W + Wp + 64 Ns on
    the right (total padded to a 64-base multiple) so every window word
    index — including the banded path's whole-row fetches of 8-word rows
    (_gather_windows) — is in range."""
    Wp = _round_up(W, 128)
    n = W + len(g_codes) + W + Wp + 64
    pad_l = np.full(W, 4, np.int8)
    pad_r = np.full(W + Wp + 64 + (-n) % 64, 4, np.int8)
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
               rpt: int, S: int):
    """One tile: rpt reads x tpc candidate slots (rpt*tpc = 64).

    skip_ref: SMEM (1, 1, 1, 1)       1 = all slots sentinel, skip tile
    rows_ref: VMEM (1, Lp, rpt, 8)    per-(row, read): lanes 0..4 emission,
                                      lane 5 gap-open_i, lane 6 gap-ext_i
    win8_ref: VMEM (1, 1, 64, Wp) int8 window codes (5 = masked/N-pad)
    out_ref:  VMEM (1, 1, 1, 64)      scores, sublane order s = tpc*c + r
    m/ix/iy:  VMEM (S, Wp) int32 scratch — DP state, lane j = column j+1
    """
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


# ---------------------------------------------------------------------------
# Banded scoring kernel ([FROZEN v4] band, config.MapperConfig.band)
#
# Design (vs the full-width kernel above):
#   * Diagonal-band state: DP lane b holds column c = i + b - boff at read
#     row i, so the matrix "slides" one column per row.  The diagonal
#     predecessor becomes a SAME-LANE read (no roll), Ix shifts one lane
#     left, and the in-row Iy prefix-max ramp is lane-local because the
#     (i - boff) column offset cancels out of the frozen unrolling.
#   * n_seg = 128 // bw candidates per 128-lane register (3 at the
#     default slack=8, bw=42): lanes [s*bw, (s+1)*bw) are independent
#     bw-lane band segments of n_seg candidate loci of the same read
#     (sublane = read), so every VPU op advances n_seg problems at once.
#     Segment isolation = lane_local (= lane mod bw, precomputed iota)
#     masks on the shift/cummax ops; lanes >= n_seg*bw compute garbage
#     that is sliced away before the per-segment score reduce.
#   * Genome windows are fetched by an XLA ROW gather + word realignment
#     (see _gather_windows): whole aligned 8-word rows are gathered (cost
#     on TPU scales with gather rows, measured ~13x cheaper than the
#     per-element word gather that cost 2x the DP kernel itself at
#     config-2 shapes), then the o = start%8 word phase is resolved by an
#     8-way one-hot select of static shifted slices — pure fused
#     elementwise work, no serial gather.
#   * End-row capture: the score max(M[len], Ix[len], ix0[len]) is latched
#     at each read's true last row (lane 7 end flag), replacing the frozen
#     free-pad-row draining (band coords keep moving on pad rows, so the
#     old "read the final row" trick no longer holds values in place).
#   * Out-of-window / column-0 lanes poison their emission with DEEP
#     (2x NEG_INF) so the NEG_INF floor makes them EXACTLY NEG_INF —
#     bit-identical to the banded oracle where those cells don't exist.
#
# Scores are bit-identical to the [FROZEN v3] banded oracle.nw_align /
# nw_ref.nw_scores(band=...) (tests/test_pallas.py, bench kernel_bitcheck).
# ---------------------------------------------------------------------------

DEEP = -(1 << 30)   # emission poison: DEEP + any diag < NEG_INF, floored


def _gather_windows(cands, valid, genome_words, W, Wroll, slack):
    """(B2p, C) candidate anchors -> (B2p, C, Wroll) int8 window codes.

    Row gather + phase realignment: gathers whole 8-word rows of the
    4-bit-packed genome (TPU gather cost scales with row count), then
    selects the o = word-offset%8 phase with an 8-way one-hot over static
    shifted slices, and nibble-unpacks.  Sentinel slots poison to code 5.

    HUGE genomes (> 2^26 words, i.e. > ~0.5 Gbp per segment) take a plain
    element gather instead: TPU tiles an (n, 8) int32 image as (8, 128),
    a 16x HBM blowup (same hazard as pipeline.mapper.csr_hits).
    """
    nw = Wroll // BASES_PER_WORD
    wsw = (window_start(jnp.where(valid, cands, 0), slack) + W) \
        // BASES_PER_WORD
    if genome_words.shape[0] > ROWGATHER_MAX:
        widx = wsw[:, :, None] + jnp.arange(nw, dtype=jnp.int32)
        win_words = genome_words[jnp.clip(widx, 0,
                                          genome_words.shape[0] - 1)]
    else:
        nfetch = -(-(7 + nw) // 8)               # rows covering o+nw words
        words2d = genome_words[
            : (genome_words.shape[0] // 8) * 8].reshape(-1, 8)
        nrows = words2d.shape[0]
        r0 = wsw // 8
        o = wsw % 8
        rows3 = words2d[jnp.clip(
            r0[:, :, None] + jnp.arange(nfetch, dtype=jnp.int32),
            0, nrows - 1)]                        # (B2p, C, nfetch, 8)
        flat = rows3.reshape(*cands.shape, nfetch * 8)
        win_words = flat[..., 0:nw]
        for k in range(1, 8):
            win_words = jnp.where((o == k)[:, :, None],
                                  flat[..., k:k + nw], win_words)
    rep = jnp.repeat(win_words, BASES_PER_WORD, axis=2)   # (B2p, C, Wroll)
    sub = (jnp.arange(Wroll, dtype=jnp.int32) % BASES_PER_WORD) * 4
    win8 = ((rep >> sub) & 0xF).astype(jnp.int8)
    return jnp.where(valid[:, :, None], win8, jnp.int8(5))


def _nw_band_kernel(meta_ref, rows_ref, win_ref, out_ref,
                    m_ref, ix_ref, iy_ref, cap_ref, *,
                    L: int, W: int, Wroll: int, boff: int, bw: int,
                    n_seg: int, open_q: int, ext_q: int, S: int,
                    unroll: int = 1, peel: bool = True,
                    state_carry: bool = False):
    """One tile: S reads x n_seg candidate slots, bw-lane band per slot.

    meta_ref: SMEM (1, 1, 1, 2) int32    [skip, max_len_of_read_group]
    rows_ref: VMEM (1, Lp, S, 8) int32   lanes 0..4 emission, 5 open_i,
                                         6 ext_i, 7 end-row flag
    win_ref:  VMEM (1, 1, n_seg*S, Wroll) int8  full windows, slot a*S + r
                                         (code 5 = sentinel poison)
    out_ref:  VMEM (1, 1, S, 128) int32  end captures (reduce per bw)
    m/ix/iy/cap: VMEM (S, 128) int32
    """
    skip = meta_ref[0, 0, 0, 0]

    @pl.when(skip == 1)
    def _():
        out_ref[0, 0] = jnp.full((S, 128), NEG_INF, jnp.int32)

    @pl.when(skip == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
        lane_local = lane % bw                  # dead lanes >= n_seg*bw
        col_base = lane_local - boff            # col = col_base + i
        ramp1 = lane_local * ext_q
        ramp2 = open_q + (lane_local - 1) * ext_q
        shifts = []
        sh = 1
        while sh < bw:
            shifts.append(sh)
            sh *= 2
        cum_masks = [(lane_local >= sh, sh) for sh in shifts]
        ge1 = lane_local >= 1
        le_bm2 = lane_local <= bw - 2
        maxlen = meta_ref[0, 0, 0, 1]

        # M[0][c] = 0 for window columns c in [0, W]; lanes whose row-0
        # column is outside that range must start at exactly NEG_INF or
        # row 1's Ix would inherit -open at columns the oracle doesn't have
        m_ref[:, :] = jnp.where((col_base >= 0) & (col_base <= W),
                                jnp.int32(0), jnp.int32(NEG_INF))
        ix_ref[:, :] = jnp.full((S, 128), NEG_INF, jnp.int32)
        iy_ref[:, :] = jnp.full((S, 128), NEG_INF, jnp.int32)
        cap_ref[:, :] = jnp.full((S, 128), NEG_INF, jnp.int32)

        # int32 window codes: Mosaic's lane rotate is 32-bit only.
        # All n_seg segments' 4-bit codes PACK into one int32 plane
        # (lane of wp holds seg s's code in bits 4s..4s+3, each segment
        # pre-rolled to its own phase), so the per-row carry needs ONE
        # roll instead of n_seg — the kernel is permute-unit bound
        # (~13 rolls/row reproduce the measured 22.8 us/tile), and this
        # trades 2 rolls/row for 6 cheap ALU shift/mask ops.
        win_all = win_ref[0, 0].astype(jnp.int32)
        wp0 = pltpu.roll(win_all[0:S], boff % Wroll, 1)
        for s in range(1, n_seg):
            wp0 = wp0 | (pltpu.roll(win_all[s * S:(s + 1) * S],
                                    (s * bw + boff) % Wroll, 1) << (4 * s))

        def one_row_c(k, m0, ix0, M, Ix, Iy, cap, wp, edge=True):
            """DP row k+1 on VALUE state; wp is the packed window plane
            pre-rolled for this row.  Returns (m0', ix0', M', Ix', Iy',
            cap').

            ``edge=False`` (loop peel): rows boff+2 .. W+boff-bw+1 can
            touch neither window boundary (col < 1 needs i <= boff at
            some band lane; col > W needs i >= W+boff-bw+2) nor column 1
            (col == 1 needs i <= boff+1), so the boundary poison and the
            column-1 diag select drop from the body loop — bit-identical
            by construction, A/B-checked in tests/test_band_unroll.py."""
            i = k + 1
            slab = rows_ref[0, k]                # (S, 8)
            opn = slab[:, 5:6]
            ext = slab[:, 6:7]
            endf = slab[:, 7:8] > 0
            wpl = wp[:, :128]
            win = (wpl >> (4 * (n_seg - 1))) & 15
            for s in range(n_seg - 2, -1, -1):
                win = jnp.where(lane < (s + 1) * bw, (wpl >> (4 * s)) & 15,
                                win)
            if edge:
                col = col_base + i
                win = jnp.where((col < 1) | (col > W), 5, win)
            e = jnp.full((S, 128), DEEP, jnp.int32)
            for v in range(5):
                e = jnp.where(win == v, slab[:, v:v + 1], e)
            diag = jnp.maximum(jnp.maximum(M, Ix), Iy)
            if edge:
                diag = jnp.where(col == 1, jnp.maximum(m0, ix0), diag)
            M_new = jnp.maximum(e + diag, NEG_INF)
            t = jnp.maximum(M - opn, Ix - ext)
            Ix_new = jnp.maximum(
                jnp.where(le_bm2, pltpu.roll(t, 127, 1), NEG_INF), NEG_INF)
            pm = M_new + ramp1
            for mask, sh in cum_masks:
                pm = jnp.maximum(pm, jnp.where(mask, pltpu.roll(pm, sh, 1),
                                               NEG_INF))
            Iy_new = jnp.maximum(
                jnp.where(ge1, pltpu.roll(pm, 1, 1), NEG_INF) - ramp2,
                NEG_INF)
            ix0_new = jnp.maximum(
                jnp.maximum(m0 - opn, ix0 - ext), NEG_INF)
            fin = jnp.maximum(jnp.maximum(M_new, Ix_new), ix0_new)
            cap_new = jnp.where(endf, fin, cap)
            m0_new = jnp.full((S, 1), NEG_INF, jnp.int32)
            return m0_new, ix0_new, M_new, Ix_new, Iy_new, cap_new

        def one_row(k, m0, ix0, wp, edge=True):
            """Ref-state wrapper around one_row_c (scratch VMEM mode)."""
            m0n, ix0n, M_new, Ix_new, Iy_new, cap_new = one_row_c(
                k, m0, ix0, m_ref[:, :], ix_ref[:, :], iy_ref[:, :],
                cap_ref[:, :], wp, edge)
            m_ref[:, :] = M_new
            ix_ref[:, :] = Ix_new
            iy_ref[:, :] = Iy_new
            cap_ref[:, :] = cap_new
            return m0n, ix0n

        if unroll == 2:
            # two DP rows per fori iteration (peel does not apply here:
            # every row keeps the full edge logic): halves the loop's
            # fixed costs (dynamic slab indexing, bookkeeping, carry
            # shuffle);
            # row 2k+1 beyond maxlen is a frozen-free pad row (opn = ext
            # = endf = 0), so running it never changes the captured
            # scores, and Lp is even so the slab read stays in range
            def row2(k2, carry):
                wp, m0, ix0 = carry
                m0, ix0 = one_row(2 * k2, m0, ix0, wp)
                m0, ix0 = one_row(2 * k2 + 1, m0, ix0,
                                  pltpu.roll(wp, Wroll - 1, 1))
                return (pltpu.roll(wp, Wroll - 2, 1), m0, ix0)

            jax.lax.fori_loop(
                0, (maxlen + 1) // 2, row2,
                (wp0, jnp.zeros((S, 1), jnp.int32),
                 jnp.full((S, 1), NEG_INF, jnp.int32)))
        elif state_carry:
            # DP state rides the fori carry as VALUES instead of VMEM
            # scratch refs: the ref form moves ~6 x 64 KB of scratch
            # traffic per row; carrying values lets Mosaic register-
            # allocate / software-pipeline the state (A/B measured via
            # kernel_bench --carries; bit-identical either way)
            def row_edge_c(k, carry):
                st = one_row_c(k, *carry[1:], carry[0], edge=True)
                return (pltpu.roll(carry[0], Wroll - 1, 1),) + st

            def row_body_c(k, carry):
                st = one_row_c(k, *carry[1:], carry[0], edge=False)
                return (pltpu.roll(carry[0], Wroll - 1, 1),) + st

            carry = (wp0,) + (
                jnp.zeros((S, 1), jnp.int32),
                jnp.full((S, 1), NEG_INF, jnp.int32),
                jnp.where((col_base >= 0) & (col_base <= W),
                          jnp.int32(0), jnp.int32(NEG_INF)),
                jnp.full((S, 128), NEG_INF, jnp.int32),
                jnp.full((S, 128), NEG_INF, jnp.int32),
                jnp.full((S, 128), NEG_INF, jnp.int32))
            if peel:
                b1 = jnp.minimum(maxlen, boff + 1)
                b2 = jnp.maximum(b1, jnp.minimum(maxlen,
                                                 W + boff - bw + 1))
                carry = jax.lax.fori_loop(0, b1, row_edge_c, carry)
                carry = jax.lax.fori_loop(b1, b2, row_body_c, carry)
                carry = jax.lax.fori_loop(b2, maxlen, row_edge_c, carry)
            else:
                carry = jax.lax.fori_loop(0, maxlen, row_edge_c, carry)
            cap_ref[:, :] = carry[-1]
        else:
            def row_edge(k, carry):
                wp, m0, ix0 = carry
                m0, ix0 = one_row(k, m0, ix0, wp, edge=True)
                return (pltpu.roll(wp, Wroll - 1, 1), m0, ix0)

            def row_body(k, carry):
                wp, m0, ix0 = carry
                m0, ix0 = one_row(k, m0, ix0, wp, edge=False)
                return (pltpu.roll(wp, Wroll - 1, 1), m0, ix0)

            carry = (wp0, jnp.zeros((S, 1), jnp.int32),
                     jnp.full((S, 1), NEG_INF, jnp.int32))
            if peel:
                b1 = jnp.minimum(maxlen, boff + 1)
                b2 = jnp.maximum(b1, jnp.minimum(maxlen,
                                                 W + boff - bw + 1))
                carry = jax.lax.fori_loop(0, b1, row_edge, carry)
                carry = jax.lax.fori_loop(b1, b2, row_body, carry)
                jax.lax.fori_loop(b2, maxlen, row_edge, carry)
            else:
                jax.lax.fori_loop(0, maxlen, row_edge, carry)
        out_ref[0, 0] = cap_ref[:, :]


@functools.partial(jax.jit,
                   static_argnames=("L", "W", "slack", "boff", "bw",
                                    "open_q", "ext_q", "interpret", "rpt",
                                    "unroll", "peel", "state_carry"))
def nw_scores_banded(emis_t: jax.Array, cands: jax.Array, lens: jax.Array,
                     genome_words: jax.Array, *, L: int, W: int, slack: int,
                     boff: int, open_q: int, ext_q: int, bw: int = 64,
                     interpret: bool = False, rpt: int = 128,
                     unroll: int = 1, peel: bool = True,
                     state_carry: bool = False) -> jax.Array:
    """Banded scores for every (read-strand, candidate) pair ([FROZEN v4]).

    emis_t:       int32[B2, 5, L]  emission tables, code-major
    cands:        int32[B2, C]     sorted candidate anchors, SENTINEL-padded
    lens:         int32[B2]        true read lengths
    genome_words: int32[Gw]        4-bit packed genome from pad_genome_words
    (boff, bw):   the [FROZEN v4] band (MapperConfig.band)
    returns:      int32[B2, C]     alignment scores (NEG_INF at sentinels)
    """
    B2, C = cands.shape
    S = rpt
    n_seg = 128 // bw
    assert n_seg >= 1
    Wroll = _round_up(W, 128)
    Lp = _round_up(L, 8)
    B2p = _round_up(B2, S)
    if B2p != B2:
        emis_t = jnp.pad(emis_t, ((0, B2p - B2), (0, 0), (0, 0)))
        cands = jnp.pad(cands, ((0, B2p - B2), (0, 0)),
                        constant_values=SENTINEL)
        lens = jnp.pad(lens, (0, B2p - B2))
    Gb = B2p // S
    # pad the candidate axis to a multiple of n_seg segments per tile
    Cp = _round_up(C, n_seg)
    cands_p = (jnp.pad(cands, ((0, 0), (0, Cp - C)),
                       constant_values=SENTINEL) if Cp != C else cands)
    nt = Cp // n_seg

    rows = jnp.zeros((B2p, Lp, 8), dtype=jnp.int32)
    rows = rows.at[:, :L, :5].set(jnp.transpose(emis_t, (0, 2, 1)))
    ar = jnp.arange(Lp, dtype=jnp.int32)[None, :]
    in_read = ar < lens[:, None]
    rows = rows.at[:, :, 5].set(jnp.where(in_read, open_q, 0))
    rows = rows.at[:, :, 6].set(jnp.where(in_read, ext_q, 0))
    rows = rows.at[:, :, 7].set((ar == lens[:, None] - 1).astype(jnp.int32))
    rows = rows.reshape(Gb, S, Lp, 8).transpose(0, 2, 1, 3)

    valid = cands_p != SENTINEL
    win8 = _gather_windows(cands_p, valid, genome_words, W, Wroll, slack)
    win8 = win8.reshape(Gb, S, nt, n_seg, Wroll).transpose(0, 2, 3, 1, 4)
    win8 = win8.reshape(Gb, nt, n_seg * S, Wroll)

    skip = jnp.logical_not(
        valid.reshape(Gb, S, nt, n_seg).any(axis=(1, 3))).astype(jnp.int32)
    maxlen = jnp.max(lens.reshape(Gb, S), axis=1).astype(jnp.int32)
    meta = jnp.stack([skip, jnp.broadcast_to(maxlen[:, None], (Gb, nt))],
                     axis=2).reshape(Gb, nt, 1, 2)

    kernel = functools.partial(
        _nw_band_kernel, L=L, W=W, Wroll=Wroll, boff=boff, bw=bw,
        n_seg=n_seg, open_q=open_q, ext_q=ext_q, S=S, unroll=unroll,
        peel=peel, state_carry=state_carry)
    out = pl.pallas_call(
        kernel,
        grid=(Gb, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 2), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Lp, S, 8), lambda g, t: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_seg * S, Wroll),
                         lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, S, 128), lambda g, t: (g, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gb, nt, S, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((S, 128), jnp.int32),
            pltpu.VMEM((S, 128), jnp.int32),
            pltpu.VMEM((S, 128), jnp.int32),
            pltpu.VMEM((S, 128), jnp.int32),
        ],
        interpret=interpret,
    )(meta, rows, win8)
    # (Gb, nt, S, 128) -> max over each bw-lane segment -> (B2p, Cp)
    scores = jnp.max(
        out[..., :n_seg * bw].reshape(Gb, nt, S, n_seg, bw), axis=4)
    scores = scores.transpose(0, 2, 1, 3).reshape(B2p, Cp)[:B2, :C]
    return jnp.where(cands[:B2] != SENTINEL, scores, NEG_INF)



# ---------------------------------------------------------------------------
# [FROZEN v6] Pure-diagonal detection — the traceback split.
#
# The overwhelming majority of retained hits align gap-free (CIGAR <len>M);
# re-running the full direction-bit DP + backwalk for them was ~75% of the
# r4 judge's measured kernel time together with seeding.  This kernel is a
# trimmed banded FORWARD pass (no direction bits, no backwalk, ~1/11 of the
# scoring kernel's tile count at headline shapes: one hit per sublane
# instead of reads x candidates) that PROVES a hit pure so the expensive
# traceback kernel only runs on the compacted gap-bearing remainder.
#
# Exactness argument (the skip must be bit-identical to oracle.nw_align's
# frozen tie-breaking, tests/test_devtb.py):
#   * In diagonal-band coordinates a LANE is a DIAGONAL, so the gapless
#     diagonal prefix sum gl costs one add per row:
#     gl_r[ll] = sum_{r'<=r} e[r', col_base(ll) + r'].
#   * At the end row, fin cells equal to the score are all M cells when
#     open_q > 0 and ext_q > 0 (Ix trails by >= min(open, ext); the
#     column-0 ramp ix0 = -(open + (len-1) ext) < 0 < score).  The
#     oracle's end choice (smallest column, M preferred over Ix) is
#     therefore the smallest lane ll with capM[ll] == score.
#   * If gl[end_ll] == score, then M[r] along that lane equals the
#     diagonal prefix at EVERY row (M[r] >= D_r always; at the end they
#     are equal, and M[r-1] >= D_{r-1} = M[r] - e_r = diag-chain value
#     forces equality down the chain), so the backwalk's M-preferred tie
#     rule (m_dir == 0 whenever the diagonal M ties the running max)
#     follows the diagonal exactly: CIGAR <len>M, jfin = end_ll - boff.
#   * Otherwise the hit is NOT skipped — no claim is made, the traceback
#     kernel computes it as before.
# ---------------------------------------------------------------------------


def _nw_band_pure_kernel(meta_ref, rows_ref, win_ref,
                         capm_o, capix_o, capgl_o,
                         m_ref, ix_ref, iy_ref, gl_ref, *,
                         L: int, W: int, Wroll: int, boff: int, bw: int,
                         open_q: int, ext_q: int, S: int):
    """One tile: S retained hits, one per sublane, bw-lane band each
    (lanes >= bw are ghost segments whose values never reach lanes < bw —
    the same % bw masks as the scoring kernel isolate them).

    meta_ref: SMEM (1, 1, 1, 2) int32   [skip, max_len_of_hit_group]
    rows_ref: VMEM (1, Lp, S, 8) int32  lanes 0..4 emission, 5 open_i,
                                        6 ext_i, 7 end-row flag
    win_ref:  VMEM (1, 1, S, Wroll) int8 window codes (5 = poison)
    cap*_o:   VMEM (1, 1, S, 128) int32 end-row captures of M / Ix / gl
    """
    skip = meta_ref[0, 0, 0, 0]

    @pl.when(skip == 1)
    def _():
        capm_o[0, 0] = jnp.full((S, 128), NEG_INF, jnp.int32)
        capix_o[0, 0] = jnp.full((S, 128), NEG_INF, jnp.int32)
        capgl_o[0, 0] = jnp.full((S, 128), NEG_INF, jnp.int32)

    @pl.when(skip == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
        lane_local = lane % bw
        col_base = lane_local - boff
        ramp1 = lane_local * ext_q
        ramp2 = open_q + (lane_local - 1) * ext_q
        shifts = []
        sh = 1
        while sh < bw:
            shifts.append(sh)
            sh *= 2
        cum_masks = [(lane_local >= s_, s_) for s_ in shifts]
        ge1 = lane_local >= 1
        le_bm2 = lane_local <= bw - 2
        maxlen = meta_ref[0, 0, 0, 1]

        m_ref[:, :] = jnp.where((col_base >= 0) & (col_base <= W),
                                jnp.int32(0), jnp.int32(NEG_INF))
        ix_ref[:, :] = jnp.full((S, 128), NEG_INF, jnp.int32)
        iy_ref[:, :] = jnp.full((S, 128), NEG_INF, jnp.int32)
        gl_ref[:, :] = jnp.zeros((S, 128), jnp.int32)
        capm_o[0, 0] = jnp.full((S, 128), NEG_INF, jnp.int32)
        capix_o[0, 0] = jnp.full((S, 128), NEG_INF, jnp.int32)
        capgl_o[0, 0] = jnp.full((S, 128), NEG_INF, jnp.int32)
        wr0 = pltpu.roll(win_ref[0, 0].astype(jnp.int32), boff % Wroll, 1)

        def row(k, carry):
            wr, m0, ix0 = carry
            i = k + 1
            slab = rows_ref[0, k]
            opn = slab[:, 5:6]
            ext = slab[:, 6:7]
            endf = slab[:, 7:8] > 0
            col = col_base + i
            win = jnp.where((col < 1) | (col > W), 5, wr[:, :128])
            e = jnp.full((S, 128), DEEP, jnp.int32)
            for v in range(5):
                e = jnp.where(win == v, slab[:, v:v + 1], e)
            M, Ix, Iy = m_ref[:, :], ix_ref[:, :], iy_ref[:, :]
            diag = jnp.maximum(jnp.maximum(M, Ix), Iy)
            diag = jnp.where(col == 1, jnp.maximum(m0, ix0), diag)
            M_new = jnp.maximum(e + diag, NEG_INF)
            gl_new = jnp.maximum(gl_ref[:, :] + e, NEG_INF)
            t = jnp.maximum(M - opn, Ix - ext)
            Ix_new = jnp.maximum(
                jnp.where(le_bm2, pltpu.roll(t, 127, 1), NEG_INF), NEG_INF)
            pm = M_new + ramp1
            for mask, s_ in cum_masks:
                pm = jnp.maximum(pm, jnp.where(mask, pltpu.roll(pm, s_, 1),
                                               NEG_INF))
            Iy_new = jnp.maximum(
                jnp.where(ge1, pltpu.roll(pm, 1, 1), NEG_INF) - ramp2,
                NEG_INF)
            m_ref[:, :] = M_new
            ix_ref[:, :] = Ix_new
            iy_ref[:, :] = Iy_new
            gl_ref[:, :] = gl_new
            ix0_new = jnp.maximum(
                jnp.maximum(m0 - opn, ix0 - ext), NEG_INF)
            capm_o[0, 0] = jnp.where(endf, M_new, capm_o[0, 0])
            capix_o[0, 0] = jnp.where(endf, Ix_new, capix_o[0, 0])
            capgl_o[0, 0] = jnp.where(endf, gl_new, capgl_o[0, 0])
            return (pltpu.roll(wr, Wroll - 1, 1),
                    jnp.full((S, 1), NEG_INF, jnp.int32), ix0_new)

        jax.lax.fori_loop(0, maxlen, row,
                          (wr0, jnp.zeros((S, 1), jnp.int32),
                           jnp.full((S, 1), NEG_INF, jnp.int32)))


@functools.partial(jax.jit,
                   static_argnames=("L", "W", "slack", "boff", "bw",
                                    "open_q", "ext_q", "interpret",
                                    "sublanes"))
def nw_pure_banded(emis_t: jax.Array, cands: jax.Array, lens: jax.Array,
                   scores: jax.Array, genome_words: jax.Array, *, L: int,
                   W: int, slack: int, boff: int, bw: int, open_q: int,
                   ext_q: int, interpret: bool = False,
                   sublanes: int = 128):
    """[FROZEN v6] (pure bool[H], jfin int32[H]) for H retained hits:
    pure[h] proves the frozen backwalk emits all-M with first aligned
    window column jfin[h] (see the section comment for the exactness
    argument).  Callers MUST gate on open_q > 0 and ext_q > 0 and on the
    banded config (cfg.band() is not None).

    emis_t: int32[H, 5, L]; cands: int32[H] (SENTINEL = empty);
    lens: int32[H]; scores: int32[H] (the scoring kernel's results).
    """
    H = cands.shape[0]
    assert W % BASES_PER_WORD == 0
    Wroll = _round_up(W, 128)
    Lp = _round_up(L, 8)
    S = sublanes
    Hp = _round_up(H, S)
    if Hp != H:
        emis_t = jnp.pad(emis_t, ((0, Hp - H), (0, 0), (0, 0)))
        cands = jnp.pad(cands, (0, Hp - H), constant_values=SENTINEL)
        lens = jnp.pad(lens, (0, Hp - H))
    nt = Hp // S
    lens_k = jnp.where(cands == SENTINEL, 0, lens)

    rows = jnp.zeros((Hp, Lp, 8), dtype=jnp.int32)
    rows = rows.at[:, :L, :5].set(jnp.transpose(emis_t, (0, 2, 1)))
    ar = jnp.arange(Lp, dtype=jnp.int32)[None, :]
    in_read = ar < lens_k[:, None]
    rows = rows.at[:, :, 5].set(jnp.where(in_read, open_q, 0))
    rows = rows.at[:, :, 6].set(jnp.where(in_read, ext_q, 0))
    rows = rows.at[:, :, 7].set(
        (ar == lens_k[:, None] - 1).astype(jnp.int32))
    rows = rows.reshape(nt, S, Lp, 8).transpose(0, 2, 1, 3)

    valid = cands != SENTINEL
    win8 = _gather_windows(cands[:, None], valid[:, None], genome_words,
                           W, Wroll, slack).reshape(Hp, Wroll)
    win8 = win8.reshape(nt, 1, S, Wroll)

    tile_valid = valid.reshape(nt, S)
    skip = jnp.logical_not(tile_valid.any(axis=1)).astype(jnp.int32)
    maxlen = jnp.max(lens_k.reshape(nt, S), axis=1).astype(jnp.int32)
    meta = jnp.stack([skip, maxlen], axis=1).reshape(nt, 1, 1, 2)

    kernel = functools.partial(
        _nw_band_pure_kernel, L=L, W=W, Wroll=Wroll, boff=boff, bw=bw,
        open_q=open_q, ext_q=ext_q, S=S)
    capm, capix, capgl = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 2), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Lp, S, 8), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Wroll), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, S, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, 1, S, 128), jnp.int32),
            jax.ShapeDtypeStruct((nt, 1, S, 128), jnp.int32),
            jax.ShapeDtypeStruct((nt, 1, S, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, 128), jnp.int32),
            pltpu.VMEM((S, 128), jnp.int32),
            pltpu.VMEM((S, 128), jnp.int32),
            pltpu.VMEM((S, 128), jnp.int32),
        ],
        interpret=interpret,
    )(meta, rows, win8)
    capm = capm.reshape(Hp, 128)[:H]
    capix = capix.reshape(Hp, 128)[:H]
    capgl = capgl.reshape(Hp, 128)[:H]

    ll = jnp.arange(128, dtype=jnp.int32)[None, :]
    fin = jnp.maximum(capm, capix)
    eq = (fin == scores[:, None]) & (ll < bw)
    BIG = jnp.int32(1 << 30)
    end_ll = jnp.min(jnp.where(eq, ll, BIG), axis=1)
    found = end_ll < BIG
    safe_ll = jnp.where(found, end_ll, 0)[:, None]
    cm_at = jnp.take_along_axis(capm, safe_ll, axis=1)[:, 0]
    ci_at = jnp.take_along_axis(capix, safe_ll, axis=1)[:, 0]
    cg_at = jnp.take_along_axis(capgl, safe_ll, axis=1)[:, 0]
    pure = (found & (cm_at >= ci_at) & (cg_at == scores)
            & (cands[:H] != SENTINEL) & (scores > 0))
    jfin = jnp.where(pure, end_ll - boff, 0)
    return pure, jfin


# ---------------------------------------------------------------------------
# Device-side traceback (SURVEY.md §7 "rescoring winners" — the second pass
# over retained loci, now on-device instead of the native C++ host finisher)
# ---------------------------------------------------------------------------

def tb_sublanes_for(L: int, W: int, max_sublanes: int = 128,
                    budget: int = 4 << 20) -> int:
    """Largest traceback tile (power of two <= max_sublanes) whose per-tile
    VMEM footprint — dominated by the (Lp, S, Wp) int8 direction scratch —
    fits the budget (scoped VMEM is ~16M; leave room for the full-grid
    output buffers the compiler also keeps resident)."""
    Wp = _round_up(W, 128)
    Lp = _round_up(L, 8)
    Lpp = _round_up(Lp, 128)
    S = max(32, max_sublanes)
    while S > 32:
        per_tile = (Lp * S * Wp          # dir int8
                    + 5 * S * Wp * 4     # M/Ix/Iy/endM/endIx
                    + Lp * S * 8 * 4     # rows block
                    + S * Wp             # win8
                    + S * Lpp * 2        # ops block
                    + S * 4)
        if per_tile <= budget:
            break
        S //= 2
    return S


def decode_ops(ops_row: np.ndarray, length: int):
    """Host-side decode of one hit's kernel ops row -> (cigar, ref_len).

    ops_row[i] = (n_deletions_after_consuming_read_base_i+1 << 1) | op_bit
    for i in [0, length); op_bit 1 = I, 0 = M.  Forward CIGAR is
    c_1 D^{d_1} c_2 D^{d_2} ... c_len (no leading/trailing D by
    construction — the walk starts/ends on a consume)."""
    row = ops_row[:length]
    d = row >> 1
    opb = row & 1
    n_ins = int(opb.sum())
    n_del = int(d.sum())
    if n_ins == 0 and n_del == 0:
        return f"{length}M", length
    parts = []
    run_op, run_n = None, 0
    for i in range(length):
        op = "I" if opb[i] else "M"
        if op == run_op:
            run_n += 1
        else:
            if run_n:
                parts.append(f"{run_n}{run_op}")
            run_op, run_n = op, 1
        if d[i]:
            parts.append(f"{run_n}{run_op}")
            parts.append(f"{int(d[i])}D")
            run_op, run_n = None, 0
    if run_n:
        parts.append(f"{run_n}{run_op}")
    return "".join(parts), (length - n_ins) + n_del

def _cummax_lanes_fill(x, wp, fill):
    """Inclusive prefix max along lanes with arbitrary fill (log-doubling)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sh = 1
    while sh < wp:
        x = jnp.maximum(x, jnp.where(lane >= sh, pltpu.roll(x, sh, 1), fill))
        sh *= 2
    return x


def _extract_lane(x, lane_col, fill):
    """Per-sublane lane extraction: out[s, 0] = x[s, lane_col[s, 0]].

    Vectorized one-hot + row max; lane_col < 0 -> fill."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    v = jnp.max(jnp.where(lane == lane_col, x, fill), axis=1, keepdims=True)
    return jnp.where(lane_col >= 0, v, fill)


def _nw_tb_kernel(skip_ref, rows_ref, win8_ref, ops_ref, jfin_ref,
                  m_ref, ix_ref, iy_ref, endm_ref, endix_ref, dir_ref, *,
                  L: int, W: int, Wp: int, Lp: int, Lpp: int,
                  open_q: int, ext_q: int, S: int, band=None):
    """One tile: 64 retained hits, one per sublane.

    Phase 1 (forward): the same frozen DP as _nw_kernel, additionally
    storing 4 direction bits per cell (row-major in int8 VMEM scratch) and
    capturing the M/Ix rows + the column-0 Ix ramp at each hit's true last
    read row (lane 7 of the rows slab flags it), because the oracle's
    traceback starts at the *unpadded* final row (oracle.nw_align).

    Phase 2 (backwalk): all 64 hits walk back in lockstep, one global DP
    row per iteration — every active row consumes exactly one read base, so
    hit h is active exactly on rows len_h..1.  In-row deletion runs (state
    Iy) resolve in O(1) vector ops via a prefix-max over the stored
    iy-"open" bits; per-hit dynamic lane reads are one-hot selections.

    dir bits per cell (row i, lane j-1 = column j):
      bits 0..1: M's diagonal predecessor argmax (0=M 1=Ix 2=Iy, pref order)
      bit  2:    Ix came from M (1) or Ix (0) above
      bit  3:    Iy came from M (1, gap-open) or Iy (0, extend) at the left
    Output per (hit, row i): (n_deletions_after_consume_i << 1) | (1 if the
    consume was I else 0); j_final = window column of the first aligned
    genome base (oracle's pos_in_window).
    """
    @pl.when(skip_ref[0, 0, 0, 0] == 1)
    def _():
        ops_ref[0] = jnp.zeros((S, Lpp), jnp.int16)
        jfin_ref[0, 0, 0, :] = jnp.zeros((S,), jnp.int32)

    @pl.when(skip_ref[0, 0, 0, 0] == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, Wp), 1)
        win = win8_ref[0, 0].astype(jnp.int32)
        win = jnp.where(lane < W, win, 5)

        m_ref[:, :] = jnp.zeros((S, Wp), jnp.int32)
        ix_ref[:, :] = jnp.full((S, Wp), NEG_INF, jnp.int32)
        iy_ref[:, :] = jnp.full((S, Wp), NEG_INF, jnp.int32)
        endm_ref[:, :] = jnp.full((S, Wp), NEG_INF, jnp.int32)
        endix_ref[:, :] = jnp.full((S, Wp), NEG_INF, jnp.int32)

        # ---- phase 1: forward fill + direction bits ----
        def row(i, carry):
            m0, ix0, ix0e = carry                # (S, 1) column-0 state
            slab = rows_ref[0, i]                # (S, 8)
            opn = slab[:, 5:6]
            ext = slab[:, 6:7]
            endf = slab[:, 7:8] > 0
            e = jnp.full((S, Wp), NEG_INF, dtype=jnp.int32)
            for v in range(5):
                e = jnp.where(win == v, slab[:, v:v + 1], e)
            M, Ix, Iy = m_ref[:, :], ix_ref[:, :], iy_ref[:, :]
            m_sh = _shift_right_fill(M, m0)
            ix_sh = _shift_right_fill(Ix, ix0)
            prev_best = jnp.maximum(jnp.maximum(M, Ix), Iy)
            diag = _shift_right_fill(prev_best, jnp.maximum(m0, ix0))
            m_dir = jnp.where(m_sh == diag, 0,
                              jnp.where(ix_sh == diag, 1, 2))
            ix_bit = ((M - opn) >= (Ix - ext)).astype(jnp.int32)
            M_new = jnp.maximum(e + diag, NEG_INF)
            # [FROZEN v3] band mask (config.MapperConfig.band): M masked
            # before the Iy prefix chain, Ix/Iy after; direction bits are
            # derived from the masked values so the backwalk sees exactly
            # the banded oracle's arrays.
            if band is not None:
                boff, bw = band
                off_b = ((lane + 1 < (i + 1) - boff)
                         | (lane + 1 > (i + 1) - boff + bw - 1))
                M_new = jnp.where(off_b, NEG_INF, M_new)
            Ix_new = jnp.maximum(jnp.maximum(M - opn, Ix - ext), NEG_INF)
            pm = _cummax_lanes(M_new + (lane + 1) * ext_q, Wp)
            Iy_new = jnp.maximum(
                _shift_right_fill(pm, NEG_INF) - open_q - lane * ext_q,
                NEG_INF)
            if band is not None:
                Ix_new = jnp.where(off_b, NEG_INF, Ix_new)
                Iy_new = jnp.where(off_b, NEG_INF, Iy_new)
            iy_bit = ((_shift_right_fill(M_new, NEG_INF) - open_q)
                      >= (_shift_right_fill(Iy_new, NEG_INF) - ext_q)
                      ).astype(jnp.int32)
            dir_ref[i] = (m_dir | (ix_bit << 2) | (iy_bit << 3)
                          ).astype(jnp.int8)
            m_ref[:, :] = M_new
            ix_ref[:, :] = Ix_new
            iy_ref[:, :] = Iy_new
            endm_ref[:, :] = jnp.where(endf, M_new, endm_ref[:, :])
            endix_ref[:, :] = jnp.where(endf, Ix_new, endix_ref[:, :])
            ix0_new = jnp.maximum(
                jnp.maximum(m0 - opn, ix0 - ext), NEG_INF)
            ix0e = jnp.where(endf, ix0_new, ix0e)
            m0_new = jnp.full((S, 1), NEG_INF, jnp.int32)
            return m0_new, ix0_new, ix0e

        neg1 = jnp.full((S, 1), NEG_INF, jnp.int32)
        _, _, ix0e = jax.lax.fori_loop(
            0, Lp, row, (jnp.zeros((S, 1), jnp.int32), neg1, neg1))

        # ---- end cell: smallest column on ties, M preferred over Ix ----
        BIG = jnp.int32(2 ** 30)
        endm = endm_ref[:, :]
        endix = endix_ref[:, :]
        fin = jnp.maximum(endm, endix)
        fin = jnp.where(lane < W, fin, NEG_INF)
        best_l = jnp.max(fin, axis=1, keepdims=True)           # (S, 1)
        end_lane = jnp.min(jnp.where(fin == best_l, lane, BIG),
                           axis=1, keepdims=True)
        at0 = ix0e >= best_l            # column 0 wins ties (smallest j)
        j0 = jnp.where(at0, 0, end_lane + 1)
        endm_at = _extract_lane(endm, end_lane, NEG_INF)
        st0 = jnp.where(at0, 1, jnp.where(endm_at >= _extract_lane(
            endix, end_lane, NEG_INF), 0, 1))

        # ---- phase 2: lockstep backwalk, one global row per step ----
        ops_ref[0] = jnp.zeros((S, Lpp), jnp.int16)
        lane_l = jax.lax.broadcasted_iota(jnp.int32, (S, Lpp), 1)

        def back(t, carry):
            j, st, started = carry               # (S, 1) int32
            r = Lp - t                           # DP row index (Lp..1)
            slab = rows_ref[0, r - 1]
            endf = slab[:, 7:8] > 0
            init = endf & (started == 0)
            j = jnp.where(init, j0, j)
            st = jnp.where(init, st0, st)
            started = jnp.where(endf, 1, started)
            active = started == 1
            d32 = dir_ref[r - 1].astype(jnp.int32)
            iyb = (d32 >> 3) & 1
            # deletion-run resolution: nearest "open" bit at or left of j-1
            vset = jnp.where(iyb == 1, lane, -1)
            last_set = _cummax_lanes_fill(vset, Wp, -1)
            c_lane = _extract_lane(last_set, j - 1, -1)
            is_iy = active & (st == 2)
            d_cnt = jnp.where(is_iy, j - c_lane, 0)
            j = jnp.where(is_iy, c_lane, j)
            st = jnp.where(is_iy, 0, st)
            # consume this row (st is now M or Ix for all active hits)
            jl = j - 1
            mext = _extract_lane(d32 & 3, jl, 0)
            ixe = _extract_lane((d32 >> 2) & 1, jl, 0)
            is_m = active & (st == 0)
            is_i = active & (st == 1)
            op_bit = jnp.where(is_i, 1, 0)
            st = jnp.where(is_m, mext,
                           jnp.where(is_i,
                                     jnp.where(j == 0, 1,
                                               jnp.where(ixe == 1, 0, 1)),
                                     st))
            j = jnp.where(is_m, j - 1, j)
            val = jnp.where(active, (d_cnt << 1) | op_bit, 0)
            ops_ref[0] = ops_ref[0] + jnp.where(
                lane_l == r - 1, val, 0).astype(jnp.int16)
            return j, st, started

        zc = jnp.zeros((S, 1), jnp.int32)
        j_fin, _, _ = jax.lax.fori_loop(0, Lp, back, (zc, zc, zc))
        jfin_ref[0, 0, 0, :] = j_fin[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("L", "W", "slack", "open_q", "ext_q",
                                    "interpret", "sublanes", "band"))
def nw_traceback_pallas(emis_t: jax.Array, cands: jax.Array, lens: jax.Array,
                        genome_words: jax.Array, *, L: int, W: int,
                        slack: int, open_q: int, ext_q: int,
                        interpret: bool = False, sublanes: int = SUBLANES,
                        band=None):
    """Exact traceback for H retained hits (one DP + backwalk each).

    emis_t: int32[H, 5, L]   emission table of the hit's read-strand
    cands:  int32[H]         candidate anchors (SENTINEL = empty slot)
    lens:   int32[H]         true read lengths
    returns (ops int16[H, Lp], j_final int32[H]):
      ops[h, i] = (n_deletions_after_row_i+1 << 1) | (1 if row i+1 was an
      insertion else 0) for DP rows 1..len; j_final = oracle pos_in_window.
    Bit-identical to oracle.nw_align(traceback=True) on retained (score>0)
    hits — property-tested in tests/test_devtb.py.
    """
    H = cands.shape[0]
    assert W % BASES_PER_WORD == 0
    Wp = _round_up(W, 128)
    Lp = _round_up(L, 8)
    Lpp = _round_up(Lp, 128)
    Gw = genome_words.shape[0]
    sublanes = tb_sublanes_for(L, W, sublanes)
    Hp = _round_up(H, sublanes)
    if Hp != H:
        emis_t = jnp.pad(emis_t, ((0, Hp - H), (0, 0), (0, 0)))
        cands = jnp.pad(cands, (0, Hp - H), constant_values=SENTINEL)
        lens = jnp.pad(lens, (0, Hp - H))
    nt = Hp // sublanes
    nw = Wp // BASES_PER_WORD
    # sentinel slots never start a backwalk (no end-row flag)
    lens = jnp.where(cands == SENTINEL, 0, lens)

    # rows slab: lanes 0..4 emission, 5 opn, 6 ext, 7 end-row flag
    rows = jnp.zeros((Hp, Lp, 8), dtype=jnp.int32)
    rows = rows.at[:, :L, :5].set(jnp.transpose(emis_t, (0, 2, 1)))
    ar = jnp.arange(Lp, dtype=jnp.int32)[None, :]
    in_read = ar < lens[:, None]
    rows = rows.at[:, :, 5].set(jnp.where(in_read, open_q, 0))
    rows = rows.at[:, :, 6].set(jnp.where(in_read, ext_q, 0))
    rows = rows.at[:, :, 7].set((ar == lens[:, None] - 1).astype(jnp.int32))
    rows = rows.reshape(nt, sublanes, Lp, 8).transpose(0, 2, 1, 3)

    safe = jnp.where(cands == SENTINEL, 0, cands)
    wstart = (window_start(safe, slack) + W) // BASES_PER_WORD
    widx = wstart[:, None] + jnp.arange(nw, dtype=jnp.int32)
    words = genome_words[jnp.clip(widx, 0, Gw - 1)]            # (Hp, nw)
    rep = jnp.repeat(words, BASES_PER_WORD, axis=1)            # (Hp, Wp)
    sub = (jnp.arange(Wp, dtype=jnp.int32) % BASES_PER_WORD) * 4
    win8 = ((rep >> sub) & 0xF).astype(jnp.int8)
    win8 = jnp.where((cands == SENTINEL)[:, None], jnp.int8(5), win8)
    win8 = win8.reshape(nt, 1, sublanes, Wp)

    tile_valid = (cands != SENTINEL).reshape(nt, sublanes)
    skip = jnp.logical_not(tile_valid.any(axis=1)).astype(jnp.int32)
    skip = skip.reshape(nt, 1, 1, 1)

    kernel = functools.partial(
        _nw_tb_kernel, L=L, W=W, Wp=Wp, Lp=Lp, Lpp=Lpp,
        open_q=open_q, ext_q=ext_q, S=sublanes, band=band)
    ops, jfin = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Lp, sublanes, 8), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sublanes, Wp), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, sublanes, Lpp), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, sublanes), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, sublanes, Lpp), jnp.int16),
            jax.ShapeDtypeStruct((nt, 1, 1, sublanes), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((sublanes, Wp), jnp.int32),
            pltpu.VMEM((sublanes, Wp), jnp.int32),
            pltpu.VMEM((sublanes, Wp), jnp.int32),
            pltpu.VMEM((sublanes, Wp), jnp.int32),
            pltpu.VMEM((sublanes, Wp), jnp.int32),
            pltpu.VMEM((Lp, sublanes, Wp), jnp.int8),
        ],
        interpret=interpret,
    )(skip, rows, win8)
    ops = ops.reshape(Hp, Lpp)[:H, :Lp]
    jfin = jfin.reshape(Hp)[:H]
    return ops, jfin


@functools.partial(jax.jit,
                   static_argnames=("L", "W", "slack", "open_q", "ext_q",
                                    "interpret", "rpt", "sublanes"))
def nw_scores_pallas(emis_t: jax.Array, cands: jax.Array, lens: jax.Array,
                     genome_words: jax.Array, *, L: int, W: int, slack: int,
                     open_q: int, ext_q: int,
                     interpret: bool = False, rpt: int = RPT,
                     sublanes: int = SUBLANES) -> jax.Array:
    """Scores for every (read-strand, candidate) pair.

    emis_t:       int32[B2, 5, L]  emission tables, code-major
    cands:        int32[B2, C]     sorted candidate anchors, SENTINEL-padded
    lens:         int32[B2]        true read lengths
    genome_words: int32[Gw]        4-bit packed genome from pad_genome_words
    returns:      int32[B2, C]     alignment scores (NEG_INF at sentinels)
    """
    B2, C = cands.shape
    TPC = sublanes // rpt
    RPT_ = rpt
    assert sublanes % rpt == 0
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
    win8 = win8.reshape(G8, nt, sublanes, Wp)

    # --- per-tile skip flags ---
    tile_valid = (cands != SENTINEL).reshape(G8, RPT_, nt, TPC)
    skip = jnp.logical_not(tile_valid.any(axis=(1, 3))).astype(jnp.int32)
    skip = skip.reshape(G8, nt, 1, 1)

    kernel = functools.partial(
        _nw_kernel, L=L, W=W, Wp=Wp, open_q=open_q, ext_q=ext_q, rpt=rpt,
        S=sublanes)
    scores = pl.pallas_call(
        kernel,
        grid=(G8, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Lp, RPT_, 8), lambda g, t: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sublanes, Wp), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, sublanes),
                               lambda g, t: (g, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G8, nt, 1, sublanes), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((sublanes, Wp), jnp.int32),
            pltpu.VMEM((sublanes, Wp), jnp.int32),
            pltpu.VMEM((sublanes, Wp), jnp.int32),
        ],
        interpret=interpret,
    )(skip, rows, win8)
    # (G8, nt, 1, TPC*rpt) -> sublane s = tpc-major: s = tpc*c + r
    scores = scores.reshape(G8, nt, TPC, RPT_).transpose(0, 3, 1, 2)
    scores = scores.reshape(B2p, C)[:B2]
    return jnp.where(cands[:B2] != SENTINEL, scores, NEG_INF)
