"""NaN discipline in evaluation: diverged params must fail LOUDLY.

The rank is `1 + #{score >= target}` — a sum of boolean comparisons, finite
by construction — so NaN scores would otherwise make every comparison False
and return rank 1 for every query: a validation MRR of 1.0 that silently
checkpoints the diverged params as the best model.  The reference instead
asserts on the score matrix itself (models/base.py:259-260).  These tests
pin the propagated form of that discipline: get_ranking checks params
finiteness host-side (one fused dispatch, backend-uniform), and every
ranker additionally poisons its output with `target * 0.0` — a
value-independent term that turns a non-finite gold score into a NaN rank
WITHOUT adding a second consumer of the score matrix (a full-matrix
isfinite reduce made XLA duplicate the score fusion with different
reassociation, flipping exact score ties between the sharded and dense
backends — measured on this very suite).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.evaluate import get_ranking, make_best_ranker

N_ENT = 41  # odd: the sharded case exercises the entity-padding path


@pytest.fixture(scope="module")
def data():
    return synthetic_kg(n_entities=N_ENT, n_relations=3, n_train=150,
                        n_valid=24, n_test=24, seed=5)


def _model_and_params(data, name="FFTRotH"):
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=5,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model(name)(cfg)
    rng = np.random.default_rng(2)
    params = {
        k: jnp.asarray(rng.uniform(-0.4, 0.4, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    return model, params


def _poison(params, backend):
    """A single NaN entity row trips the host-side params check on every
    backend; the whole-table variant ALSO makes every gold target NaN,
    exercising the in-program target*0 poison path."""
    if backend == "dense":
        return {**params, "entity": params["entity"].at[3, :].set(jnp.nan)}
    return {**params, "entity": jnp.full_like(params["entity"], jnp.nan)}


@pytest.mark.parametrize("backend", ["dense", "pallas"])
def test_nan_params_raise_in_eval(data, backend):
    model, params = _model_and_params(data)
    pack = data.eval_pack("valid", "rhs")
    rank_fn = make_best_ranker(model, 8, backend=backend)
    # sanity: finite params rank fine
    out = get_ranking(model, params, pack, batch_size=8, rank_fn=rank_fn)
    assert np.isfinite(out).all() and (out >= 1).all()
    with pytest.raises(FloatingPointError):
        get_ranking(model, _poison(params, backend), pack, batch_size=8,
                    rank_fn=rank_fn)


def test_nan_params_raise_in_predict(data):
    """Serving: top_k over NaN scores returns arbitrary ids — the predictor
    must refuse NaN params instead of serving garbage."""
    from complexhyperbolickge_tpu.train.evaluate import make_predictor

    model, params = _model_and_params(data)
    predict = make_predictor(model, k=5)
    q = jnp.asarray(data.eval_pack("valid", "rhs").queries[:4, :2])
    ids, vals = predict(params, q)
    assert np.isfinite(np.asarray(vals)).all()
    with pytest.raises(FloatingPointError):
        predict(_poison(params, "dense"), q)


@pytest.mark.parametrize("backend", ["dense", "pallas"])
def test_rank_poison_direct(data, backend):
    """The in-program target*0 poison itself, not the host-side params gate:
    calling the compiled rank program DIRECTLY (as the sharded eval loop and
    any external embedding of the rankers would) with a NaN entity table
    must yield NaN ranks — deleting the poison terms would return rank 1
    everywhere (every comparison False) and this is the only test that
    would catch it."""
    model, params = _model_and_params(data)
    pack = data.eval_pack("valid", "rhs")
    rank_fn = make_best_ranker(model, 8, backend=backend)
    bad = _poison(params, "pallas")  # whole-table NaN: every target is NaN
    ranks = np.asarray(rank_fn(bad, jnp.asarray(pack.queries[:8]),
                               jnp.asarray(pack.filter_idx[:8])))
    assert np.isnan(ranks).all(), ranks


def test_get_ranking_nonfinite_rank_backstop(data):
    """get_ranking's host-side isfinite(out) check must catch a rank
    program that emits NaN even when params are finite (the poison's
    delivery channel)."""
    model, params = _model_and_params(data)
    pack = data.eval_pack("valid", "rhs")

    def nan_rank_fn(p, qb, fb):
        return jnp.full((qb.shape[0],), jnp.nan)

    with pytest.raises(FloatingPointError, match="non-finite ranks"):
        get_ranking(model, params, pack, batch_size=8, rank_fn=nan_rank_fn)


def test_predict_refuses_nan_scores_with_finite_params(data):
    """Finite params can still overflow to NaN scores inside score_all
    (inf - inf) at serving time; the predictor must refuse to serve the
    arbitrary ids top_k returns over NaNs."""
    from types import SimpleNamespace

    from complexhyperbolickge_tpu.train.evaluate import make_predictor

    class _OverflowModel:
        cfg = SimpleNamespace(n_entities=N_ENT)

        def score_all(self, params, queries, cache=None):
            return jnp.full((queries.shape[0], N_ENT), jnp.nan)

    predict = make_predictor(_OverflowModel(), k=5)
    finite_params = {"entity": jnp.ones((N_ENT, 4))}
    q = jnp.zeros((3, 2), dtype=jnp.int32)
    with pytest.raises(FloatingPointError, match="top-k"):
        predict(finite_params, q)


def test_finite_cache_does_not_pin_params(data):
    """The finiteness cache must hold only WEAK refs: a superseded epoch's
    params pytree (GBs of entity table at production scale) must be
    collectable while cached."""
    import gc
    import weakref

    from complexhyperbolickge_tpu.train.evaluate import _check_params_finite

    model, params = _model_and_params(data)
    probe = weakref.ref(params["entity"])
    _check_params_finite(params)
    _check_params_finite(params)  # second call: the cached-verdict path
    del params
    gc.collect()
    assert probe() is None, "finite-cache retains a strong ref to params"


@pytest.mark.parametrize("backend", ["dense", "pallas"])
def test_nan_params_raise_in_sharded_eval(data, backend):
    from complexhyperbolickge_tpu.parallel import make_mesh
    from complexhyperbolickge_tpu.parallel.ranking import (
        make_best_sharded_ranker,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    model, params = _model_and_params(data)
    mesh = make_mesh((2, 4))
    rank_fn = make_best_sharded_ranker(model, mesh, N_ENT, backend=backend)
    pack = data.eval_pack("valid", "rhs")
    out = get_ranking(model, params, pack, batch_size=8, rank_fn=rank_fn)
    assert np.isfinite(out).all() and (out >= 1).all()
    with pytest.raises(FloatingPointError):
        get_ranking(model, _poison(params, backend), pack, batch_size=8,
                    rank_fn=rank_fn)
