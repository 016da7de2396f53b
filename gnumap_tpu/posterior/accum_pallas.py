"""Pallas TPU kernel: serial span read-modify-write accumulation into a
device-resident genome array (coverage ``(G/128, 128)`` f32 or tallies
``(G, 4)`` f32).

Why it exists: XLA's scatter-add lowers to a serialized per-update-row
loop on TPU (~18 us/row — measured ~30 s/batch for the SNP tally scatter
at chr21 scale, first r4 attempt), so [FROZEN v5] device accumulation
instead precomputes DENSE span-wide per-hit delta windows with pure
elementwise XLA (pipeline.mapper.device_accumulate) and this kernel
applies them with explicit DMA round-trips:

    for each hit h (serial, deterministic order = hit-slot order):
        buf  <- arr[rows(h)]            (HBM -> VMEM DMA)
        buf  += delta[h]
        arr[rows(h)] <- buf             (VMEM -> HBM DMA)

Span starts are 128-position aligned (the pos%128 residue is folded into
the delta layout by the caller) and the slice always addresses the
LEADING dimension — coverage is laid out (G/128, 128) so a 128-aligned
span of positions is a contiguous block of whole rows, and tallies
(G, 4) slice whole 128-row groups; Mosaic can prove both against the
memref tiling, and the DMA engine moves whole tiles.

Overlapping spans (multi-map pileups on the same locus) stay exact
because every RMW completes before the next begins; the TPU grid is
sequential, so cross-chunk ordering holds too.  Cost is ~2 DMA latencies
per hit — tens of ms per 16k-hit batch, ~300x the XLA scatter path.

Reference analog: the mutex-guarded coverage accumulation of the
reference's worker threads (SURVEY.md §3.1 "scatter-add weights into
coverage arrays (mutex/atomic)"), re-designed as a deterministic
device-side kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 16384    # max hits per pallas_call (bounds the SMEM base table)


def _rmw_kernel(base_ref, nreal_ref, delta_ref, arr_ref, out_ref,
                buf, sem_in, sem_out, *, ch: int, nrows: int, rowmul: int):
    """Grid step g applies hits [g*ch, (g+1)*ch) serially.

    base_ref:  SMEM (nchunks, ch) span starts in 128-POSITION UNITS
    nreal_ref: SMEM (1, 1) number of real hits
    delta_ref: VMEM (ch, nrows, W) delta windows
    out_ref:   ANY (R, W) aliased accumulator — rows
               [rowmul*units, rowmul*units + nrows) are RMW'd
    buf:       VMEM (nrows, W) scratch
    """
    g = pl.program_id(0)

    def body(i, carry):
        h = g * ch + i

        @pl.when(h < nreal_ref[0, 0])
        def _():
            b = base_ref[g, i] * rowmul
            dst = out_ref.at[pl.ds(b, nrows), :]
            cp = pltpu.make_async_copy(dst, buf, sem_in)
            cp.start()
            cp.wait()
            buf[...] = buf[...] + delta_ref[i]
            cp2 = pltpu.make_async_copy(buf, dst, sem_out)
            cp2.start()
            cp2.wait()
        return carry

    jax.lax.fori_loop(0, ch, body, 0)


def apply_deltas(arr, base_units, deltas, n_real, *, rowmul: int = 1,
                 ch: int = 256, interpret: bool = False):
    """arr rows [u(h), u(h)+nrows) += deltas[h] for h in [0, n_real),
    where u(h) = base_units[h] * rowmul.  Both accumulator layouts keep
    the LANE dimension at 128 (Mosaic's compiler crashes on narrow-lane
    memrefs like (G, 4) — probed on v5e):

      coverage: arr (Gpad//128, 128) — position p at [p//128, p%128];
                deltas (H, span//128, 128); rowmul = 1.
      tallies:  arr (Gpad*4//128, 128) — (position p, base b) at flat
                index 4p+b, i.e. [(4p+b)//128, (4p+b)%128]; a
                128-position span is exactly 4 rows per unit;
                deltas (H, span//32, 128) (the row-major (span, 4)
                reshape); rowmul = 4.

    base_units are 128-position span starts (callers fold the pos%128
    residue into the delta layout), any order (serial, exact).  Hits
    beyond n_real are skipped; lists larger than SEG chain through
    multiple sequential kernel calls (the base table lives in SMEM)."""
    H = base_units.shape[0]
    for lo in range(0, H, SEG):
        arr = _apply_deltas_seg(
            arr, base_units[lo:lo + SEG], deltas[lo:lo + SEG],
            jnp.maximum(jnp.asarray(n_real, jnp.int32) - lo, 0),
            rowmul=rowmul, ch=ch, interpret=interpret)
    return arr


@functools.partial(jax.jit,
                   static_argnames=("rowmul", "ch", "interpret"))
def _apply_deltas_seg(arr: jax.Array, base_units: jax.Array,
                      deltas: jax.Array, n_real: jax.Array, *,
                      rowmul: int = 1, ch: int = 256,
                      interpret: bool = False) -> jax.Array:
    H = base_units.shape[0]
    base = base_units
    assert deltas.ndim == 3 and arr.ndim == 2
    nrows, W = deltas.shape[1], deltas.shape[2]
    assert arr.shape[1] == W == 128
    Hp = ((H + ch - 1) // ch) * ch
    if Hp != H:
        base = jnp.pad(base, (0, Hp - H))
        deltas = jnp.pad(deltas, ((0, Hp - H), (0, 0), (0, 0)))
    grid = (Hp // ch,)
    base2d = base.reshape(Hp // ch, ch)
    kernel = functools.partial(_rmw_kernel, ch=ch, nrows=nrows,
                               rowmul=rowmul)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ch, nrows, W), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(arr.shape, arr.dtype),
        scratch_shapes=[pltpu.VMEM((nrows, W), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(base2d, jnp.reshape(n_real, (1, 1)).astype(jnp.int32), deltas, arr)
