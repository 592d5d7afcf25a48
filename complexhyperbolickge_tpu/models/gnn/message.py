"""Message-passing primitives: segment reductions and degree norms.

TPU-native replacement for the reference's torch_scatter-backed
micro-framework (models/messagepassing.py:14-116).  Differences by design:

  * scatter/gather become jax.ops.segment_* with STATIC segment counts
    (lowering to one scatter-add HLO — no dynamic shapes).
  * edge dropout is an edge-weight MASK, not edge removal (reference
    gnnbase.py:47-76 physically drops rows): dropped edges simply carry
    weight 0 through the degree norms and message aggregation, keeping every
    shape static across steps so the train step compiles once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(src, index, num_segments: int, indices_are_sorted: bool = False):
    """indices_are_sorted=True enables XLA's sorted-scatter fast path
    (measured 1.33x on v5e at full-graph scale, E=174k x H=200).  The
    full-graph encoder sorts each edge half by receiving node at model
    construction (models.py) so aggregations can pass the flag; a Pallas
    one-hot-matmul segment-sum was also built (kernels/segsum.py) but at
    exact (HIGHEST) precision it only ties XLA's sorted scatter, so XLA
    keeps the job."""
    return jax.ops.segment_sum(src, index, num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_max(src, index, num_segments: int):
    return jax.ops.segment_max(src, index, num_segments=num_segments)


def segment_mean(src, index, num_segments: int):
    s = segment_sum(src, index, num_segments)
    cnt = segment_sum(jnp.ones((src.shape[0], 1), src.dtype), index, num_segments)
    return s / jnp.maximum(cnt, 1.0)


def compute_norm(head, edge_weight, num_ent: int,
                 indices_are_sorted: bool = False):
    """Per-edge 1/deg(head) norm (reference messagepassing.py:80-90).

    head: (E,) receiving-node index; edge_weight: (E,) 0/1 mask (or weights).
    """
    deg = segment_sum(edge_weight, head, num_ent,
                      indices_are_sorted=indices_are_sorted)
    deg_inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-30), 0.0)
    return deg_inv[head] * edge_weight


def segment_sum_sorted_halves(src, index, num_segments: int):
    """Segment-sum where BOTH halves of `index` are independently sorted
    (the full-graph [forward; inverse] edge layout): two sorted-scatter
    fast-path sums instead of one unsorted scatter."""
    h = index.shape[0] // 2
    return segment_sum(src[:h], index[:h], num_segments,
                       indices_are_sorted=True) + segment_sum(
        src[h:], index[h:], num_segments, indices_are_sorted=True)


def compute_norm_sorted_halves(head, edge_weight, num_ent: int):
    """compute_norm for the half-sorted full-graph layout."""
    deg = segment_sum_sorted_halves(edge_weight, head, num_ent)
    deg_inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-30), 0.0)
    return deg_inv[head] * edge_weight


def compute_symmetric_norm(head, tail, edge_weight, num_ent: int,
                           normalize_to_1: bool = True,
                           head_sorted_halves: bool = False):
    """Symmetric (1/sqrt(deg_i deg_j)) norm with optional re-normalization so
    each node's incoming weights sum to deg/(deg+1)
    (reference messagepassing.py:92-108)."""
    hsum = segment_sum_sorted_halves if head_sorted_halves else segment_sum
    deg = (
        hsum(edge_weight, head, num_ent)
        + segment_sum(edge_weight, tail, num_ent)
        + 1.0
    )
    deg_inv = 1.0 / jnp.sqrt(deg)  # deg >= 1, no inf handling needed
    norm = deg_inv[head] * edge_weight * deg_inv[tail]
    if normalize_to_1:
        sum_norm = hsum(norm, head, num_ent) + 1.0 / deg
        norm = norm / sum_norm[head]
    return norm


def edge_dropout_mask(key, n_edges: int, rate: float, dtype=jnp.float32):
    """Bernoulli keep-mask over edges (reference drops edges physically via
    nn.Dropout on a ones-vector, gnnbase.py:51-53 — keep prob 1 - rate)."""
    if key is None or rate <= 0.0:
        return jnp.ones((n_edges,), dtype)
    return jax.random.bernoulli(key, 1.0 - rate, (n_edges,)).astype(dtype)


def dropout(key, x, rate: float):
    """Inverted dropout (torch semantics: scale kept values by 1/(1-p))."""
    if key is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
