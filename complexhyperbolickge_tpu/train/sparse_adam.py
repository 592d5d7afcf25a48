"""Row-sparse (lazy) Adam — torch.optim.SparseAdam semantics.

The reference exposes SparseAdam as an optimizer choice (run.py:48).  Torch's
SparseAdam only updates rows that received gradient this step: untouched
rows keep their moments un-decayed and receive no parameter update (bias
correction still uses the single GLOBAL step count — see below).  Dense Adam
is NOT equivalent (it decays every row's momentum every step, which keeps
stale momentum pushing rows that weren't sampled).

TPU-native formulation: gradients here are dense arrays whose untouched rows
are exactly zero (scatter-add of embedding gathers), so "touched" is
row-wise any(|g| > 0); the update is fully vectorized with no dynamic shapes:

    touched   = any(g != 0, axis=-1)                 [rows of 2D params]
    m         = where(touched, b1*m + (1-b1)*g, m)
    v         = where(touched, b2*v + (1-b2)*g^2, v)
    update    = where(touched, -lr * m_hat / (sqrt(v_hat) + eps), 0)

Bias correction uses the GLOBAL step count, matching torch SparseAdam
(its state['step'] increments every optimizer step regardless of which rows
were touched).  1-D/0-D parameters use element-wise touched masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class SparseAdamState(NamedTuple):
    mu: optax.Updates
    nu: optax.Updates
    step: jnp.ndarray


def sparse_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8) -> optax.GradientTransformation:
    def init(params):
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        return SparseAdamState(mu, nu, jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        del params
        t = state.step + 1

        def row_touched(g):
            if g.ndim >= 2:
                m = jnp.any(g != 0, axis=tuple(range(1, g.ndim)))
            else:
                m = g != 0
            return m.astype(g.dtype)

        def bcast(m, g):
            return m.reshape(m.shape + (1,) * (g.ndim - m.ndim))

        def upd_mu(m, g):
            w = bcast(row_touched(g), g)
            return m * (1 - w * (1 - b1)) + w * (1 - b1) * g

        def upd_nu(v, g):
            w = bcast(row_touched(g), g)
            return v * (1 - w * (1 - b2)) + w * (1 - b2) * g * g

        mu = jax.tree.map(upd_mu, state.mu, grads)
        nu = jax.tree.map(upd_nu, state.nu, grads)

        def step_fn(m, v, g):
            # torch form: step_size = lr*sqrt(bc2)/bc1; denom = sqrt(v) + eps
            tf = t.astype(g.dtype)
            bc1 = 1.0 - jnp.asarray(b1, g.dtype) ** tf
            bc2 = 1.0 - jnp.asarray(b2, g.dtype) ** tf
            w = bcast(row_touched(g), g)
            return -(learning_rate * jnp.sqrt(bc2) / bc1) * w * m / (jnp.sqrt(v) + eps)

        updates = jax.tree.map(step_fn, mu, nu, grads)
        return updates, SparseAdamState(mu, nu, t)

    return optax.GradientTransformation(init, update)
