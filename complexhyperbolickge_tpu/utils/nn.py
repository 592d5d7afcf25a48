"""Small functional NN blocks.

Parity targets: reference models/mlp.py (plain MLP with kaiming init + relu)
and models/monotonic.py (abs-weight monotonic linear/MLP — only referenced
by the reference's commented-out score calibration, models/base.py:52, kept
for API completeness).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.ops.math import pinned_mm


class MLP:
    """Plain MLP (reference models/mlp.py:4-21)."""

    def __init__(self, d_in, d_hidden, d_out, num_layers=2):
        self.dims = [d_in] + [d_hidden] * (num_layers - 1) + [d_out]

    def init(self, key):
        keys = jax.random.split(key, len(self.dims) - 1)
        return [
            {
                "w": jax.random.normal(k, (self.dims[i], self.dims[i + 1]))
                * math.sqrt(2.0 / self.dims[i]),
                "b": jnp.zeros((self.dims[i + 1],)),
            }
            for i, k in enumerate(keys)
        ]

    def apply(self, params, x):
        for i, p in enumerate(params):
            x = pinned_mm(x, p["w"]) + p["b"]
            if i < len(params) - 1:
                x = jax.nn.relu(x)
        return x


class MonotonicMLP:
    """Monotonic MLP via absolute weights (reference models/monotonic.py:8-53)."""

    def __init__(self, d_in, d_out, d_hidden):
        self.dims = [d_in, d_hidden, d_out]

    def init(self, key):
        out = []
        for i, k in enumerate(jax.random.split(key, 2)):
            fan_in = self.dims[i]
            bound = 1.0 / math.sqrt(fan_in)
            kw, kb = jax.random.split(k)
            out.append({
                "w": jax.random.uniform(kw, (self.dims[i], self.dims[i + 1]),
                                        minval=-bound, maxval=bound),
                "b": jax.random.uniform(kb, (self.dims[i + 1],),
                                        minval=-bound, maxval=bound),
            })
        return out

    def apply(self, params, x):
        for i, p in enumerate(params):
            x = pinned_mm(x, jnp.abs(p["w"])) + p["b"]
            if i < len(params) - 1:
                x = jax.nn.relu(x)
        return x
