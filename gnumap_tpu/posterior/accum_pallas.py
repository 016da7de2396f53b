"""Pallas TPU kernel: serial span read-modify-write accumulation into a
device-resident genome array (coverage ``(1, G)`` f32 or tallies
``(G, 4)`` f32).

Why it exists: XLA's scatter-add lowers to a serialized per-update-row
loop on TPU (~18 us/row — measured ~30 s/batch for the SNP tally scatter
at chr21 scale, first r4 attempt), so [FROZEN v5] device accumulation
instead precomputes DENSE 128-wide per-hit delta windows with pure
elementwise XLA (pipeline.mapper.device_accumulate) and this kernel
applies them with explicit DMA round-trips:

    for each hit h (serial, deterministic order = hit-slot order):
        buf  <- arr[base_h : base_h + 128]        (HBM -> VMEM DMA)
        buf  += delta[h]
        arr[base_h : base_h + 128] <- buf         (VMEM -> HBM DMA)

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

SPAN = 128          # delta-window width (== mapper window width budget)


def _rmw_kernel(base_ref, nreal_ref, delta_ref, arr_ref, out_ref,
                buf, sem_in, sem_out, *, ch: int, width: int, span: int):
    """Grid step g applies hits [g*ch, (g+1)*ch) serially.

    base_ref:  SMEM (ch,)   span starts in 128-POSITION UNITS (Mosaic
                            must prove the HBM slice offset divisible by
                            the (.,128) tiling, so the kernel multiplies
                            an integer unit count by 128)
    nreal_ref: SMEM (1,)    number of real hits (tail chunks partially run)
    delta_ref: VMEM (ch, span) or (ch, span, width) delta windows
    out_ref:   ANY  (1, G) or (G, width) — aliased accumulator, RMW'd
    buf:       VMEM (1, span) or (span, width) scratch
    """
    g = pl.program_id(0)

    def body(i, carry):
        h = g * ch + i

        @pl.when(h < nreal_ref[0])
        def _():
            b = base_ref[i] * 128
            if width == 1:
                dst = out_ref.at[:, pl.ds(b, span)]
                add = delta_ref[i][None, :]
            else:
                dst = out_ref.at[pl.ds(b, span), :]
                add = delta_ref[i]
            cp = pltpu.make_async_copy(dst, buf, sem_in)
            cp.start()
            cp.wait()
            buf[...] = buf[...] + add
            cp2 = pltpu.make_async_copy(buf, dst, sem_out)
            cp2.start()
            cp2.wait()
        return carry

    jax.lax.fori_loop(0, ch, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("ch", "interpret"))
def apply_deltas(arr: jax.Array, base_units: jax.Array, deltas: jax.Array,
                 n_real: jax.Array, *, ch: int = 256,
                 interpret: bool = False) -> jax.Array:
    """arr[128*base_units[h] : ... + span] += deltas[h], h in [0, n_real).

    arr:        (1, G) f32 (coverage) or (G, width) f32 (tallies);
                donated / aliased in place.  G must be a multiple of 128
                and every span must fit: 128*base_units + span <= G.
    base_units: int32[H] span starts in 128-position units (callers fold
                the pos%128 residue into the delta layout), any order
                (serial, exact).
    deltas:     f32[H, span] or f32[H, span, width]; span % 128 == 0.
    n_real:     int32[] — hits beyond it are skipped (padding).
    """
    H = base_units.shape[0]
    base = base_units
    width = 1 if deltas.ndim == 2 else deltas.shape[2]
    span = deltas.shape[1]
    Hp = ((H + ch - 1) // ch) * ch
    if Hp != H:
        base = jnp.pad(base, (0, Hp - H))
        pad = ((0, Hp - H), (0, 0)) if width == 1 else \
            ((0, Hp - H), (0, 0), (0, 0))
        deltas = jnp.pad(deltas, pad)
    grid = (Hp // ch,)
    if width == 1:
        delta_spec = pl.BlockSpec((ch, span), lambda g: (g, 0),
                                  memory_space=pltpu.VMEM)
        buf = pltpu.VMEM((1, span), jnp.float32)
    else:
        delta_spec = pl.BlockSpec((ch, span, width), lambda g: (g, 0, 0),
                                  memory_space=pltpu.VMEM)
        buf = pltpu.VMEM((span, width), jnp.float32)
    kernel = functools.partial(_rmw_kernel, ch=ch, width=width, span=span)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ch,), lambda g: (g,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            delta_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(arr.shape, arr.dtype),
        scratch_shapes=[buf,
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(base, jnp.reshape(n_real, (1,)).astype(jnp.int32), deltas, arr)
