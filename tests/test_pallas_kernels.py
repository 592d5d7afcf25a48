"""Pallas fused-ranking kernel vs the dense XLA filtered ranker.

Runs in interpreter mode on CPU (the kernel itself is exercised on real TPU
by bench.py / the driver's compile check).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import synthetic_kg
from complexhyperbolickge_tpu.kernels import make_pallas_ranker
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.evaluate import get_ranking

N_ENT = 200


@pytest.fixture(scope="module", params=["learn", "none"])
def setup(request):
    data = synthetic_kg(n_entities=N_ENT, n_relations=5, n_train=500,
                        n_valid=50, n_test=64, seed=4)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=9,
                      multi_c=True, bias=request.param, dtype="float32")
    model = get_model("FFTRotH")(cfg)
    rng = np.random.default_rng(12)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    return data, model, params


@pytest.mark.parametrize("direction", ["rhs", "lhs"])
def test_pallas_ranker_matches_dense(setup, direction):
    data, model, params = setup
    pack = data.eval_pack("test", direction)
    dense = get_ranking(model, params, pack, batch_size=64)

    ranker = make_pallas_ranker(model, batch_size=64, interpret=True)
    ranks = np.asarray(
        ranker(params, jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx))
    )
    np.testing.assert_array_equal(ranks, dense)


@pytest.mark.parametrize("name", ["RotH", "AttH", "IsoH", "RotLH", "HyboNet"])
@pytest.mark.parametrize("direction", ["rhs", "lhs"])
def test_pallas_hyp_ranker_matches_dense(name, direction):
    from complexhyperbolickge_tpu.kernels import make_pallas_hyp_ranker

    data = synthetic_kg(n_entities=N_ENT, n_relations=5, n_train=500,
                        n_valid=50, n_test=64, seed=8)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model(name)(cfg)
    rng = np.random.default_rng(13)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    pack = data.eval_pack("test", direction)
    dense = get_ranking(model, params, pack, batch_size=64)
    ranker = make_pallas_hyp_ranker(model, 64, interpret=True)
    ranks = np.asarray(
        ranker(params, jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx))
    )
    np.testing.assert_array_equal(ranks, dense)


def test_pallas_ranker_pads_entities(setup):
    """n_entities=200 is not a multiple of tile_n=512 — padded rows must stay
    masked (counts unaffected)."""
    data, model, params = setup
    pack = data.eval_pack("test", "rhs")
    ranker = make_pallas_ranker(model, batch_size=64, interpret=True)
    r = np.asarray(
        ranker(params, jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx))
    )
    assert (r >= 1).all() and (r <= N_ENT).all()
