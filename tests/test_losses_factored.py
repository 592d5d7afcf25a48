"""Factored losses vs their explicit dense forms.

The reference-parity tests (test_train_parity.py) pin CE/BCE/signed-CE
against the executed torch reference at one realistic shape; these property
tests pin the FACTORED implementations (train/losses.py) against the
straightforward dense formulas over random shapes, label widths, smoothing
values, and padded entity columns — so a future refactor cannot drift in a
corner the parity fixture doesn't reach.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train import losses as L


def _setup(n_ent, b, seed, pad_to=None):
    cfg = ModelConfig(n_entities=n_ent, n_relations=6, rank=5, multi_c=True,
                      bias="learn", dtype="float64")
    model = get_model("FFTRotH")(cfg)
    rng = np.random.default_rng(seed)
    params = {
        k: jnp.asarray(rng.normal(0, 0.3, size=shape), dtype=jnp.float64)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    if pad_to is not None:
        from complexhyperbolickge_tpu.parallel import pad_entity_tree

        params = pad_entity_tree(params, n_ent, pad_to)
    batch = jnp.asarray(np.stack(
        [rng.integers(0, n_ent, b), rng.integers(0, 6, b),
         rng.integers(0, n_ent, b)], 1).astype(np.int32))
    weights = jnp.asarray(
        (rng.random(b) > 0.2).astype(np.float64))  # some masked rows
    return model, params, batch, weights, rng


def _dense_bce(model, params, batch, weights, label_idx, n_ent, eps):
    """The pre-factoring scatter form, verbatim semantics."""
    preds = model.score_all(params, batch[:, :2])
    valid = None
    if preds.shape[-1] != n_ent:
        valid = (jnp.arange(preds.shape[-1]) < n_ent)[None, :]
    y = L.dense_labels(label_idx, n_ent, preds.dtype)
    if valid is not None:
        y = jnp.pad(y, ((0, 0), (0, preds.shape[-1] - n_ent)))
    if eps:
        y = (1.0 - eps) * y + eps / n_ent
    log_p = jnp.maximum(jax.nn.log_sigmoid(preds), -100.0)
    log_1mp = jnp.maximum(jax.nn.log_sigmoid(-preds), -100.0)
    per = -(y * log_p + (1 - y) * log_1mp)
    if valid is not None:
        per = jnp.where(valid, per, 0.0)
    return jnp.sum(weights[:, None] * per) / (jnp.sum(weights) * n_ent)


def _dense_ce(model, params, batch, weights, n_ent, eps):
    preds = model.score_all(params, batch[:, :2])
    valid = None
    if preds.shape[-1] != n_ent:
        valid = (jnp.arange(preds.shape[-1]) < n_ent)[None, :]
        preds = jnp.where(valid, preds, -1e30)
    logp = jax.nn.log_softmax(preds, axis=-1)
    nll = -jnp.take_along_axis(logp, batch[:, 2:3], axis=1)[:, 0]
    if eps:
        if valid is None:
            smooth = jnp.mean(-logp, axis=-1)
        else:
            smooth = jnp.sum(jnp.where(valid, -logp, 0.0), axis=-1) / n_ent
        nll = (1 - eps) * nll + eps * smooth
    return jnp.sum(weights * nll) / jnp.sum(weights)


def _dense_signed_ce(model, params, batch, weights, n_ent):
    preds = model.score_all(params, batch[:, :2])
    valid = None
    n = preds.shape[-1]
    if n != n_ent:
        valid = (jnp.arange(n) < n_ent)[None, :]
        n = n_ent
    log_prob = jax.nn.log_sigmoid(-preds)
    if valid is not None:
        log_prob = jnp.where(valid, log_prob, 0.0)
    tails = batch[:, 2]
    gold = jnp.take_along_axis(preds, tails[:, None], axis=1)
    bump = jax.nn.log_sigmoid(gold) - jax.nn.log_sigmoid(-gold)
    log_prob = log_prob + jnp.zeros_like(log_prob).at[
        jnp.arange(preds.shape[0])[:, None], tails[:, None]
    ].add(bump)
    return -jnp.sum(weights[:, None] * log_prob) / (jnp.sum(weights) * n)


@pytest.mark.parametrize("seed,n_ent,b,lw,eps,pad_to", [
    (0, 50, 16, 4, 0.1, None),
    (1, 97, 8, 7, 0.0, None),
    (2, 49, 12, 3, 0.3, 56),   # padded entity columns (mesh shapes)
    (3, 63, 16, 5, 0.1, 64),
])
def test_bce_factored_equals_dense(seed, n_ent, b, lw, eps, pad_to):
    model, params, batch, weights, rng = _setup(n_ent, b, seed, pad_to)
    lab = rng.integers(0, n_ent, (b, lw)).astype(np.int32)
    # dedup rows (the label_pack contract) and pad some slots
    for row in lab:
        seen = set()
        for j, v in enumerate(row):
            if int(v) in seen:
                row[j] = n_ent
            seen.add(int(v))
    lab[:, -1] = n_ent
    labels = jnp.asarray(lab)
    got, _ = L.bce_loss(model, params, batch, weights, labels, n_ent,
                        eps if eps else None)
    want = _dense_bce(model, params, batch, weights, labels, n_ent, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


@pytest.mark.parametrize("seed,n_ent,b,eps,pad_to", [
    (0, 50, 16, 0.1, None),
    (1, 97, 8, 0.0, None),
    (2, 49, 12, 0.3, 56),
    (3, 63, 16, 0.1, 64),
])
def test_ce_factored_equals_dense(seed, n_ent, b, eps, pad_to):
    model, params, batch, weights, _ = _setup(n_ent, b, seed, pad_to)
    got, _ = L.cross_entropy_loss(model, params, batch, weights,
                                  eps if eps else None, n_entities=n_ent)
    want = _dense_ce(model, params, batch, weights, n_ent, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


@pytest.mark.parametrize("seed,n_ent,b,pad_to", [
    (0, 50, 16, None),
    (2, 49, 12, 56),
])
def test_signed_ce_factored_equals_dense(seed, n_ent, b, pad_to):
    model, params, batch, weights, _ = _setup(n_ent, b, seed, pad_to)
    got, _ = L.signed_logsigmoid_ce_loss(model, params, batch, weights,
                                         n_entities=n_ent)
    want = _dense_signed_ce(model, params, batch, weights, n_ent)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_bce_factored_gradients_match_dense():
    """Gradients through the factored BCE equal the dense-scatter form's —
    the label gather's scatter-add VJP must distribute exactly like the
    multi-hot multiply's."""
    from complexhyperbolickge_tpu.data.dataset import dedup_filter_rows

    model, params, batch, weights, rng = _setup(50, 16, 7)
    lab = rng.integers(0, 50, (16, 4)).astype(np.int32)
    lab[:, -1] = 50
    # the label-pack contract: rows are dedup'd (a duplicate would be
    # counted twice by the gather but once by the multi-hot scatter)
    labels = jnp.asarray(dedup_filter_rows(lab, 50))

    g1 = jax.grad(
        lambda p: L.bce_loss(model, p, batch, weights, labels, 50, 0.1)[0]
    )(params)
    g2 = jax.grad(
        lambda p: _dense_bce(model, p, batch, weights, labels, 50, 0.1)
    )(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-10, atol=1e-14, err_msg=k)
