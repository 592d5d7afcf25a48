"""Sorted segment-sum Pallas kernel (kernels/segsum.py) vs jax.ops.segment_sum.

Status: a verified building block.  On v5e at exact (HIGHEST) precision it
only ties XLA's sorted-scatter fast path (4.96 vs 5.04 ms at E=174k, H=200),
so the GNN encoder uses XLA segment_sum with indices_are_sorted=True over
per-half-sorted edges instead (models/gnn/models.py); the kernel is kept as
the starting point for a bf16-message variant (1.2x) if that trade ever
becomes worth it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.kernels.segsum import make_sorted_segment_sum


@pytest.mark.parametrize("e,n,h,tn,te", [
    (1000, 300, 40, 64, 128),
    (5000, 777, 200, 256, 512),
    (10, 5, 3, 8, 128),       # tiny, heavy padding
    (512, 256, 128, 256, 512),  # n divisible by tn (pad-id aliasing guard)
])
def test_sorted_segsum_matches_xla(e, n, h, tn, te):
    rng = np.random.default_rng(0)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    msgs = jnp.asarray(rng.normal(size=(e, h)).astype(np.float32))
    f = make_sorted_segment_sum(dst, n, tn=tn, te=te, interpret=True)
    ref = jax.ops.segment_sum(msgs, jnp.asarray(dst), num_segments=n)
    np.testing.assert_allclose(np.asarray(f(msgs)), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_sorted_segsum_gradient():
    rng = np.random.default_rng(1)
    e, n, h = 700, 90, 32
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    msgs = jnp.asarray(rng.normal(size=(e, h)).astype(np.float32))
    f = make_sorted_segment_sum(dst, n, tn=64, te=128, interpret=True)
    g = jax.grad(lambda m: jnp.sum(f(m) ** 2))(msgs)
    gref = jax.grad(
        lambda m: jnp.sum(
            jax.ops.segment_sum(m, jnp.asarray(dst), num_segments=n) ** 2
        )
    )(msgs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                               atol=1e-4, rtol=1e-4)


def test_sorted_segsum_rejects_unsorted():
    dst = np.array([3, 1, 2], dtype=np.int32)
    with pytest.raises(AssertionError):
        make_sorted_segment_sum(dst, 5)


def test_sorted_halves_helpers_match_unsorted():
    """The encoder's per-half-sorted layout helpers (message.py) must equal
    plain segment_sum / compute_norm on the same data."""
    from complexhyperbolickge_tpu.models.gnn import message as M

    rng = np.random.default_rng(2)
    e, n, h = 400, 50, 8
    h1 = np.sort(rng.integers(0, n, e // 2))
    h2 = np.sort(rng.integers(0, n, e // 2))
    head = jnp.asarray(np.concatenate([h1, h2]).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(e, h)).astype(np.float32))
    w = jnp.asarray((rng.random(e) > 0.3).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(M.segment_sum_sorted_halves(vals, head, n)),
        np.asarray(M.segment_sum(vals, head, n)), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(M.compute_norm_sorted_halves(head, w, n)),
        np.asarray(M.compute_norm(head, w, n)), rtol=1e-6, atol=1e-6)
