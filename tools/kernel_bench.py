#!/usr/bin/env python
"""Banded-DP kernel microbenchmark: times nw_scores_banded alone at
config-2-like shapes, A/B-ing kernel variants (currently the row-loop
unroll).  Prints one JSON line per variant.

The axon tunnel's block_until_ready does not wait, so each timing fetches
a scalar reduction of the scores (4-byte transfer) to force execution.

Usage:  python tools/kernel_bench.py [--b2 4096] [--cands 32] [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b2", type=int, default=4096,
                    help="read-strand rows")
    ap.add_argument("--cands", type=int, default=32)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--genome-len", type=int, default=4_000_000)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--unrolls", default="1,2")
    ap.add_argument("--peels", default="1",
                    help="comma list of 0/1: A/B the boundary loop peel")
    ap.add_argument("--rpts", default="128",
                    help="comma list of reads-per-tile values")
    ap.add_argument("--carries", default="0",
                    help="comma list of 0/1: DP state in VMEM scratch (0) "
                         "vs fori carry values (1)")
    ap.add_argument("--fill", type=float, default=1.0,
                    help="fraction of candidate slots that are real")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gnumap_tpu.align import nw_pallas, scoring
    from gnumap_tpu.config import MapperConfig
    from gnumap_tpu.core import pwm as pwm_mod, packing
    from gnumap_tpu.utils import sim

    interpret = jax.default_backend() == "cpu"
    cfg = MapperConfig(max_read_len=((args.read_len + 7) // 8) * 8)
    L, W = cfg.max_read_len, cfg.window_width()
    boff, bw = cfg.band()
    rng = np.random.default_rng(1)
    g = packing.encode(sim.random_genome(args.genome_len, seed=0))
    G = len(g)
    S = scoring.normal_matrix(cfg)
    B2, C = args.b2, args.cands
    emis = np.zeros((B2, L, 5), np.int32)
    cands = np.full((B2, C), 2 ** 31 - 1, np.int32)
    lens = np.full(B2, args.read_len, np.int32)
    n_real = max(1, int(C * args.fill))
    for b in range(B2):
        frag = g[int(rng.integers(0, G - L - 4)):][:args.read_len].copy()
        err = rng.random(args.read_len) < 0.02
        frag = np.where(err, (frag + 1) % 4, frag).astype(np.int8)
        pq = np.zeros((L, 4), np.int32)
        pq[:args.read_len] = pwm_mod.pwm_from_calls(
            frag, rng.integers(10, 41, args.read_len))
        emis[b, :args.read_len] = scoring.emission_int(
            pq[:args.read_len], S)
        cands[b, :n_real] = rng.integers(0, G - L, n_real)
    cands = np.sort(cands, axis=1)
    gwords = jnp.asarray(nw_pallas.pad_genome_words(g, W))
    emis_t = jnp.asarray(np.ascontiguousarray(emis.transpose(0, 2, 1)))
    cands_j = jnp.asarray(cands)
    lens_j = jnp.asarray(lens)

    n_cells = B2 * n_real * L * W          # nominal (LxW per candidate)

    # the unroll==2 kernel branch has no peel variant: normalize so the
    # A/B never reports two identical kernels as different rows
    variants = list(dict.fromkeys(
        (int(u), bool(int(p)) if int(u) == 1 else True, int(r),
         bool(int(c)) if int(u) == 1 else False)
        for u in args.unrolls.split(",")
        for p in args.peels.split(",")
        for r in args.rpts.split(",")
        for c in args.carries.split(",")))
    for unroll, peel, rpt, state_carry in variants:
        @jax.jit
        def probe():
            s = nw_pallas.nw_scores_banded(
                emis_t, cands_j, lens_j, gwords, L=L, W=W,
                slack=cfg.gap_slack, boff=boff, bw=bw,
                open_q=cfg.gap_open_q(), ext_q=cfg.gap_extend_q(),
                interpret=interpret, unroll=unroll, peel=peel, rpt=rpt,
                state_carry=state_carry)
            return jnp.sum(jnp.where(s > -(1 << 28), s, 0))

        t0 = time.perf_counter()
        chk = int(np.asarray(probe()))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.iters):
            t = time.perf_counter()
            np.asarray(probe())
            best = min(best, time.perf_counter() - t)
        print(json.dumps({
            "unroll": unroll, "peel": peel, "rpt": rpt,
            "state_carry": state_carry, "b2": B2,
            "cands_real": n_real,
            "best_s": round(best, 4),
            "gcells_nominal_per_s": round(n_cells / best / 1e9, 2),
            "gcells_banded_per_s": round(
                B2 * n_real * args.read_len * bw / best / 1e9, 2),
            "compile_s": round(compile_s, 1), "checksum": chk}),
            flush=True)


if __name__ == "__main__":
    main()
