"""Embedding regularizers.

Reference: optimizers/regularizers.py — F2 (:21), L2 (:32), N3 (:45, the
Lacroix et al. nuclear-3-norm).  Each takes the model's factor tuple
(head/rel/tail embeddings or complex magnitudes) and returns a scalar.

`weights` masks padded batch rows (the reference normalizes by the true
batch size, factors[0].shape[0]).  A factor wrapped in `models.base.NoMask`
is always summed unmasked — the explicit marker for factors with no batch
dim (BaseC's full entity table, complex.py:54; the CE path's, reference
models/base.py:190-193), which shape inference alone cannot distinguish
from a batch when n_entities == batch_size.
"""

from __future__ import annotations

import jax.numpy as jnp

from complexhyperbolickge_tpu.models.base import NoMask  # noqa: F401 (re-export)


def _masked_sum(v, weights):
    """Sum v over all axes, zeroing padded batch rows when shapes allow."""
    if weights is not None and v.ndim >= 1 and v.shape[0] == weights.shape[0]:
        w = weights.reshape(weights.shape[0], *([1] * (v.ndim - 1)))
        v = v * w
    return jnp.sum(v)


def _terms(factors, weights):
    """(array, weights-or-None) per factor; NoMask factors are never masked."""
    return [(f.value, None) if isinstance(f, NoMask) else (f, weights)
            for f in factors]


def f2(factors, weight, batch_count, weights=None):
    total = 0.0
    for f, w in _terms(factors, weights):
        total += weight * _masked_sum(f**2, w)
    return total / batch_count


def l2(factors, weight, batch_count, weights=None):
    if weight <= 0:
        return jnp.asarray(0.0)
    total = 0.0
    for f, w in _terms(factors, weights):
        total += weight * _masked_sum(f**2, w)
    return total


def n3(factors, weight, batch_count, weights=None):
    total = 0.0
    for f, w in _terms(factors, weights):
        total += weight * _masked_sum(jnp.abs(f) ** 3, w)
    return total / batch_count


_REGISTRY = {"F2": f2, "L2": l2, "N3": n3}


def get_regularizer(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown regularizer {name!r}; available: {sorted(_REGISTRY)}")
