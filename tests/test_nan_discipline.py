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
