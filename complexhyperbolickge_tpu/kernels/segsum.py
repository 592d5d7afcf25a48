"""Sorted segment-sum as one-hot MXU matmuls (Pallas TPU).

The GNN encoder's hot op is `segment_sum(messages (E, H), dst, N)` — a
row-scatter-add, which TPUs execute far from speed-of-light (measured
~5-7 ms for E=174k, H=200 on v5e; the pure stream cost of the operands is
~0.2 ms).  With edges SORTED by destination, each output node-tile of Tn
rows owns a contiguous edge range, and the scatter becomes, per (node tile,
edge chunk):

    partial (Tn, H) += onehot(local_dst) (Tn, Te)  @  messages (Te, H)

— an MXU matmul instead of a scatter.  Edge chunks are Te-aligned; edges in
a boundary chunk that belong to a neighboring node tile contribute zero
rows of the one-hot, so alignment overlap is exact (each edge lands in
exactly one node tile's one-hot).

The backward of segment_sum is a row gather (d_messages = d_out[dst]),
which XLA handles well — wired via jax.custom_vjp (closure-captured
statics; nondiff_argnums breaks MLIR lowering under jit(scan) on this jax).

Grid iteration: (node_tiles, max_chunks); per node tile i the chunk count
varies, so out-of-range chunks clamp their block index and are masked off
with pl.when.  Chunk ranges arrive via scalar prefetch (SMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from complexhyperbolickge_tpu.ops.math import round_up


def _segsum_kernel(start_blk_ref, n_blk_ref, dst_ref, msg_ref, out_ref, *,
                   tn: int, te: int):
    i = pl.program_id(0)  # node tile
    j = pl.program_id(1)  # edge chunk within the tile's range

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j < n_blk_ref[i])
    def _():
        lo = i * tn
        local = dst_ref[:] - lo  # (1, Te) int32; outside [0, tn) -> no row
        rows = jax.lax.broadcasted_iota(jnp.int32, (tn, te), 0)
        onehot = jnp.where(rows == local, 1.0, 0.0).astype(jnp.float32)
        out_ref[:] += jax.lax.dot_general(
            onehot, msg_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "tn", "te", "max_blk",
                                    "interpret"))
def _sorted_segment_sum_fwd(msgs, dst, start_blk, n_blk, *, num_segments: int,
                            tn: int, te: int, max_blk: int, interpret: bool):
    e, h = msgs.shape
    ep = round_up(e, te)
    hp = round_up(h, 128)
    np_seg = round_up(num_segments, tn)
    if (ep, hp) != (e, h):
        m = jnp.zeros((ep, hp), msgs.dtype).at[:e, :h].set(msgs)
    else:
        m = msgs
    # pad ids with num_segments (outside every tile's local range after the
    # last real tile... NOT true when num_segments % tn == 0 and pad rows
    # alias tile np_seg//tn; use np_seg (>= any real node id + 1) — padded
    # ids then fall outside [lo, lo+tn) of every REAL tile except possibly
    # the last pad tile, whose rows are sliced off the result anyway.
    d = jnp.full((ep,), np_seg, jnp.int32).at[:e].set(dst.astype(jnp.int32))

    n_tiles = np_seg // tn

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, max_blk),
        in_specs=[
            pl.BlockSpec(
                (1, te),
                lambda i, j, sb, nb: (0, jnp.minimum(sb[i] + j, ep // te - 1)),
            ),
            pl.BlockSpec(
                (te, hp),
                lambda i, j, sb, nb: (jnp.minimum(sb[i] + j, ep // te - 1), 0),
            ),
        ],
        out_specs=pl.BlockSpec((tn, hp), lambda i, j, sb, nb: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, tn=tn, te=te),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_seg, hp), jnp.float32),
        interpret=interpret,
    )(start_blk, n_blk, d.reshape(1, ep), m)
    return out[:num_segments, :h]


def make_sorted_segment_sum(dst_sorted: np.ndarray, num_segments: int,
                            tn: int = 256, te: int = 512,
                            interpret: bool = False):
    """Build a segment-sum closure for a FIXED sorted destination vector
    (the full-graph GNN case: the edge structure is static across steps).

    Returns fn(msgs (E, H) f32) -> (num_segments, H) f32, differentiable
    (custom VJP: d_msgs = d_out[dst]).
    """
    dst_sorted = np.asarray(dst_sorted, dtype=np.int32)
    assert (np.diff(dst_sorted) >= 0).all(), "dst must be sorted"
    e = dst_sorted.shape[0]
    ep = round_up(e, te)
    np_seg = round_up(num_segments, tn)
    n_tiles = np_seg // tn

    # per node tile: first and last edge-chunk index overlapping its range
    d_pad = np.full((ep,), np_seg, np.int32)
    d_pad[:e] = dst_sorted
    tile_of_edge = d_pad // tn  # (ep,)
    start_edge = np.searchsorted(tile_of_edge, np.arange(n_tiles), "left")
    end_edge = np.searchsorted(tile_of_edge, np.arange(n_tiles), "right")
    start_blk = (start_edge // te).astype(np.int32)
    end_blk = (np.maximum(end_edge - 1, start_edge) // te).astype(np.int32)
    n_blk = np.where(end_edge > start_edge, end_blk - start_blk + 1, 0)
    n_blk = n_blk.astype(np.int32)

    sb = jnp.asarray(start_blk)
    nb = jnp.asarray(n_blk)
    dstj = jnp.asarray(dst_sorted)
    max_blk = int(n_blk.max()) if n_blk.size else 1

    @jax.custom_vjp
    def seg_sum(msgs):
        return _sorted_segment_sum_fwd(
            msgs, dstj, sb, nb, num_segments=num_segments, tn=tn, te=te,
            max_blk=max(max_blk, 1), interpret=interpret,
        )

    def fwd(msgs):
        return seg_sum(msgs), None

    def bwd(_, g):
        return (g[dstj],)

    seg_sum.defvjp(fwd, bwd)
    return seg_sum
