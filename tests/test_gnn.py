"""GNN encoder-decoder tests.

The reference GNN path cannot execute in this image (torch_scatter /
torch_geometric absent — reference models/__init__.py:5-7), so these tests
validate the degree-norm formulas against independent numpy implementations
of the reference math (messagepassing.py:80-108) and exercise full
training/eval behaviorally for all three GNN models.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import epoch_batches, synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.models.gnn import message as M
from complexhyperbolickge_tpu.train.evaluate import avg_both, compute_metrics
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer


class _Args:
    hidden_dim = 8
    layers = 2
    edge_dropout = 0.2
    dropout = 0.1
    opn = "mult"
    interaction = "distmult"
    basis = 0


@pytest.fixture(scope="module")
def data():
    return synthetic_kg(n_entities=40, n_relations=4, n_train=300, n_valid=40,
                        n_test=40, seed=5)


def _build(data, name, **args_over):
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype="float32")
    args = _Args()
    for k, v in args_over.items():
        setattr(args, k, v)
    model = get_model(name)(cfg, args, data)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


# ------------------------------ norm formulas --------------------------------


def test_compute_norm_matches_reference_formula(rng):
    e, n = 50, 12
    head = rng.integers(0, n, e)
    w = (rng.random(e) > 0.3).astype(np.float64)
    ours = np.asarray(M.compute_norm(jnp.asarray(head), jnp.asarray(w), n))
    deg = np.zeros(n)
    np.add.at(deg, head, w)
    deg_inv = np.where(deg > 0, 1 / np.where(deg > 0, deg, 1), 0.0)
    np.testing.assert_allclose(ours, deg_inv[head] * w, atol=1e-12)


def test_compute_symmetric_norm_matches_reference_formula(rng):
    e, n = 50, 12
    head = rng.integers(0, n, e)
    tail = rng.integers(0, n, e)
    w = np.ones(e)
    ours = np.asarray(M.compute_symmetric_norm(
        jnp.asarray(head), jnp.asarray(tail), jnp.asarray(w), n))
    deg = np.zeros(n)
    np.add.at(deg, head, w)
    np.add.at(deg, tail, w)
    deg += 1
    dinv = deg**-0.5
    norm = dinv[head] * w * dinv[tail]
    s = np.zeros(n)
    np.add.at(s, head, norm)
    sum_norm = s + 1 / deg
    np.testing.assert_allclose(ours, norm / sum_norm[head], rtol=1e-6)


def test_symmetric_norm_sums_to_deg_fraction():
    """After normalize_to_1 each node's incoming norms sum to deg/(deg+1)
    (the remaining 1/(deg+1) mass goes to the self loop)."""
    head = jnp.asarray([0, 0, 1, 2, 2, 2])
    tail = jnp.asarray([1, 2, 0, 0, 1, 1])
    w = jnp.ones(6)
    norm = M.compute_symmetric_norm(head, tail, w, 4)
    sums = np.asarray(M.segment_sum(norm, head, 4))
    degs = np.array([2, 1, 3, 0])
    np.testing.assert_allclose(sums[:3], degs[:3] / (degs[:3] + 1), rtol=1e-5)


# ------------------------------- end-to-end -----------------------------------


@pytest.mark.parametrize("name", ["CompGCN", "PoincareGCN", "LorentzGCN"])
def test_gnn_trains_and_descends(data, name):
    model, params = _build(data, name)
    n_ent, n_rel, _ = data.get_shape()
    tcfg = TrainConfig(learning_rate=0.01, batch_size=64, neg_sample_size=0,
                       loss="crossentropy", optimizer="Adam")
    trainer = Trainer(model, tcfg, n_ent, n_rel)
    opt_state = trainer.tx.init(params)
    ex = data.get_examples("train")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(3):
        b, w, _ = epoch_batches(ex, 64, rng)
        key, ek = jax.random.split(key)
        params, opt_state, loss = trainer.run_epoch(params, opt_state, b, w, ek)
        losses.append(loss)
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0]
    for p in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(p)).all()


@pytest.mark.parametrize("name,kw", [
    ("CompGCN", {"interaction": "transe", "opn": "add"}),
    ("CompGCN", {"basis": 3}),
    ("PoincareGCN", {"layers": 1}),
])
def test_gnn_variants_smoke(data, name, kw):
    model, params = _build(data, name, **kw)
    n_ent, n_rel, _ = data.get_shape()
    tcfg = TrainConfig(learning_rate=0.01, batch_size=64, neg_sample_size=5)
    trainer = Trainer(model, tcfg, n_ent, n_rel)
    opt_state = trainer.tx.init(params)
    b, w, _ = epoch_batches(data.get_examples("train"), 64,
                            np.random.default_rng(0))
    _, _, loss = trainer.run_epoch(params, opt_state, b, w, jax.random.PRNGKey(2))
    assert np.isfinite(loss)


@pytest.mark.parametrize("name", ["CompGCN", "PoincareGCN", "LorentzGCN"])
def test_gnn_eval_metrics(data, name):
    model, params = _build(data, name)
    metrics = avg_both(compute_metrics(model, params, data, "test", 32))
    assert 0.0 < metrics["MRR"] <= 1.0
    assert metrics["MR"] >= 1.0


def test_edge_dropout_changes_encoding(data):
    model, params = _build(data, "CompGCN")
    x0, _ = model.encode(params)
    x1, _ = model.encode(params, key=jax.random.PRNGKey(3), training=True)
    x2, _ = model.encode(params, key=jax.random.PRNGKey(4), training=True)
    assert not np.allclose(np.asarray(x0), np.asarray(x1))
    assert not np.allclose(np.asarray(x1), np.asarray(x2))
    # eval-mode encode is deterministic
    x3, _ = model.encode(params)
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x3))


def test_lorentz_full_graph_types_are_per_edge(data):
    """Regression: LorentzConv's in/out type swap must be applied PER EDGE
    (raw type t <-> t + n_rel/2).  The old code indexed the OTHER half's
    etype slice, which silently paired messages with arbitrary other edges'
    relation transforms once the halves got per-half sort orders — making
    the encoding depend on tie-breaking among equal receiving nodes.  The
    encoder must be invariant to the within-group edge order."""
    model, params = _build(data, "LorentzGCN")
    x0, _ = model.encode(params)

    eh = np.asarray(model.edge_head)
    et_ = np.asarray(model.edge_tail)
    rng = np.random.default_rng(0)
    sec = rng.permutation(len(eh))
    # still sorted by receiving node (the sorted-scatter fast path's
    # contract) but with a different order among equal nodes
    model._perm_fwd = jnp.asarray(np.lexsort((sec, eh)))
    model._perm_inv = jnp.asarray(np.lexsort((sec, et_)))
    x1, _ = model.encode(params)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                               atol=1e-5, rtol=1e-4)


# --------------------- reference-default init parity --------------------------


def test_gnn_init_honors_model_dtype(data):
    """Conv initializers draw in f32 but the pytree must honor cfg.dtype —
    f64 parity runs silently carried f32-precision encoder weights for a
    round (and bf16 runs promoted back to f32 after the first matmul)."""
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype="float64")
    model = get_model("CompGCN")(cfg, _Args(), data)
    params = model.init(jax.random.PRNGKey(0))
    bad = [l.dtype for l in jax.tree.leaves(params["gnn"])
           if l.dtype != jnp.float64]
    assert not bad, bad


def test_untouched_fresh_embeddings_keep_torch_default_init(data):
    """Embeddings the reference creates AFTER its base init and never
    re-initializes keep torch's nn.Embedding default N(0,1), NOT the
    init_size=1e-3 scale: AttE's context_vec (euclidean.py:150-157 re-inits
    only rot/ref), CompGCN's basis coeffs+vectors (euclideangnn.py:115-120),
    and the multi_c curvature embeddings (poincaregnn.py:474,
    lorentzgnn.py:243).  A std ratio test at 1e-3 vs 1.0 cannot flake."""
    n_ent, n_rel, _ = data.get_shape()

    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype="float32")
    atte = get_model("AttE")(cfg)
    p = atte.init(jax.random.PRNGKey(0))
    assert 0.5 < float(jnp.std(p["context_vec"])) < 2.0
    assert float(jnp.std(p["rel"])) < 0.1  # base rel stays init_size-scaled

    gnn = get_model("CompGCN")(cfg, _Args(), data)
    basis = get_model("CompGCN")(cfg, type("A", (_Args,), {"basis": 4})(), data)
    pb = basis.init(jax.random.PRNGKey(0))
    assert 0.5 < float(jnp.std(pb["rel"])) < 2.0
    assert 0.5 < float(jnp.std(pb["rel_basis"])) < 2.0
    pg = gnn.init(jax.random.PRNGKey(0))
    assert float(jnp.std(pg["rel"])) < 0.1  # non-basis rel is base-init

    for name in ("PoincareGCN", "LorentzGCN"):
        m = get_model(name)(cfg, _Args(), data)
        pm = m.init(jax.random.PRNGKey(0))
        assert 0.5 < float(jnp.std(pm["c_layer"])) < 2.0, name
    single = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                         multi_c=False, dtype="float32")
    m1 = get_model("PoincareGCN")(single, _Args(), data)
    p1 = m1.init(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(p1["c_layer"]), 0.0)


def test_compgcn_between_layer_dropout(data):
    """CompGCN applies feature dropout on x BETWEEN conv layers when
    training (reference messagepassing.py:208-215, enabled at
    euclideangnn.py:108) — missing for a round.  Toggle drop_in_between on
    the same model/key: the training encode must change; eval encode must
    not.  Hyperbolic GNNs keep it off (reference default False)."""
    model, params = _build(data, "CompGCN", edge_dropout=0.0, dropout=0.5)
    assert model.drop_in_between is True
    key = jax.random.PRNGKey(3)
    x1, _ = model.encode(params, key=key, training=True)
    model.drop_in_between = False
    x2, _ = model.encode(params, key=key, training=True)
    model.drop_in_between = True
    assert not np.allclose(np.asarray(x1), np.asarray(x2))
    # eval path ignores it entirely
    e1, _ = model.encode(params)
    model.drop_in_between = False
    e2, _ = model.encode(params)
    model.drop_in_between = True
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    hyp, hp = _build(data, "PoincareGCN", edge_dropout=0.0, dropout=0.5)
    assert hyp.drop_in_between is False
