"""Pallas row-gather kernel: per-row HBM->VMEM DMAs driven by prefetched ids.

This is the bounded round-4 attempt at the CompGCN aggregation ceiling
(docs/PERF_ANALYSIS.md §4): the encoder's 8 gather/scatter mega-fusions run
at ~4x the pure-stream floor, which the ledger attributes to the intrinsic
HBM granularity of random 800 B rows (hidden 200 x f32).  The aggregation
decomposes as  gather(x[src]) -> msg = op(., rel) -> sorted segment-sum;
the segment-sum Pallas kernel already only TIES XLA (kernels/segsum.py),
so the gather primitive is the only term a blocked/CSR-tiled kernel could
still win.  This kernel measures the alternative memory-system path:
explicit per-row async DMAs (16 in flight) issued against a scalar id
list, versus XLA's fused gather.  benchmarks/gather_bench.py runs the A/B
at the exact encoder shapes; see the ledger for the verdict.

Layout note: Mosaic rejects (1, H) VMEM DMA destinations (sublane tiling
is 8), so rows are padded to a 1024-float (4 KB tile) DMA unit —
round_up(h, 1024) — and both the table and the output are addressed FLAT
(1-D), where a tile-aligned slice is a legal DMA target.  The pad inflates
moved bytes by ~5.1x over the 800 B row at H=200 — charged against the
kernel in the benchmark's GB/s accounting.

Reference counterpart: the torch_scatter gathers inside
/root/reference/models/messagepassing.py:37-117.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from complexhyperbolickge_tpu.ops.math import round_up

NSEM = 16  # DMAs in flight per grid step


def _gather_kernel(ids_ref, x_ref, out_ref, sem, *, chunk: int, hp: int):
    c = pl.program_id(0)
    base = c * chunk

    def row_dma(r):
        # one padded row: HBM -> the flat VMEM output block; slot-rotated
        # semaphores keep NSEM copies in flight
        src = ids_ref[base + r] * hp
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(src, hp)],
            out_ref.at[pl.ds(r * hp, hp)],
            sem.at[r % NSEM],
        )

    for r in range(NSEM):  # warm-up window (static unroll)
        row_dma(r).start()

    def body(r, carry):
        @pl.when(r + NSEM < chunk)
        def _():
            row_dma(r + NSEM).start()

        row_dma(r).wait()
        return carry

    jax.lax.fori_loop(0, chunk, body, None)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def pallas_row_gather(ids, x, *, chunk: int = 512, interpret: bool = False):
    """out[i] = x[ids[i]] (rows lane-padded) via explicit per-row DMAs.

    ids: (E,) int32, E % chunk == 0 (pad with any valid id); x: (N, H).
    Returns (E, HP) with HP = round_up(H, 128); columns H: are zero pad.
    """
    e = ids.shape[0]
    n, h = x.shape
    assert e % chunk == 0, (e, chunk)
    # Mosaic rejected both (1, H)-row VMEM DMA destinations (sublane tiling
    # 8) and 256-float 1-D slices (1-D VMEM tiling is 1024): the hardware's
    # minimum efficient DMA unit is a full (8, 128) tile = 4 KB.  Rows are
    # therefore padded to 1024 floats — 5.1x the useful 800 B — purely so
    # the per-row-DMA ISSUE RATE is measurable at all; the pad itself is
    # the granularity verdict.
    hp = round_up(h, 1024)
    xp = x if hp == h else jnp.zeros((n, hp), x.dtype).at[:, :h].set(x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # x stays in HBM
        out_specs=pl.BlockSpec((chunk * hp,), lambda c, ids: (c,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, chunk=chunk, hp=hp),
        out_shape=jax.ShapeDtypeStruct((e * hp,), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids, xp.reshape(-1))
    return out.reshape(e, hp)
