"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that (a) data-parallel training over a sharded batch produces the
same numbers as single-device execution, (b) the entity-sharded shard_map
ranker reproduces the dense filtered ranking exactly, and (c) both hold at
an ODD entity count — the realistic case (WN18RR 40,943; FB237 14,541;
YAGO3-10 123,182 = 2*61,591 — none divisible by a multi-device model axis),
handled by zero-padding the entity tables (parallel/mesh.py::pad_entity_tree)
with pad rows masked out of scores/losses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import epoch_batches, synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.parallel import (
    make_mesh,
    make_sharded_ranker,
    padded_rows,
    shard_epoch_arrays,
    shard_params,
    unpad_entity_tree,
)
from complexhyperbolickge_tpu.train.evaluate import get_ranking, make_ranker
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

# deliberately ODD: no model-axis size divides it, so every mesh test below
# exercises the entity-row padding path end to end
N_ENT = 49


def _unpad(tree, mesh):
    return unpad_entity_tree(
        tree, N_ENT, padded_rows(N_ENT, mesh.shape["model"])
    )


@pytest.fixture(scope="module")
def data():
    return synthetic_kg(n_entities=N_ENT, n_relations=4, n_train=256,
                        n_valid=32, n_test=32, seed=3)


@pytest.fixture(scope="module")
def setup(data):
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=5,
                      multi_c=True, dtype="float32")
    model = get_model("FFTRotH")(cfg)
    # well-spread weights so eval scores have no near-ties (rank comparisons
    # are exact-equality-sensitive; fresh 1e-3 init leaves scores ~identical)
    rng = np.random.default_rng(9)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    return model, params


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_pad_unpad_keep_row_coincident_bystanders():
    """pad/unpad_entity_tree must key by NAME, not shape alone: a rel table
    with exactly padded_rows(n_ent) rows (e.g. 63 entities + 32 raw
    relations -> 64-row rel under a 2-wide model axis) must survive the
    checkpoint-canonicalization round trip untruncated, in both the params
    dict and a mirrored optimizer-moment tree."""
    from complexhyperbolickge_tpu.parallel import pad_entity_tree

    np_ = padded_rows(63, 2)
    assert np_ == 64
    params = {
        "entity": jnp.ones((63, 4)),
        "bh": jnp.ones((63, 1)),
        "bt": jnp.ones((63, 1)),
        "rel": jnp.arange(64 * 4, dtype=jnp.float32).reshape(64, 4),
    }
    moments = {"mu": jax.tree.map(jnp.zeros_like, params)}

    padded = pad_entity_tree(params, 63, np_)
    assert padded["entity"].shape[0] == 64
    assert padded["rel"].shape == (64, 4)  # untouched by the pad

    un = unpad_entity_tree(padded, 63, np_)
    assert un["entity"].shape[0] == 63
    assert un["bh"].shape[0] == 63 and un["bt"].shape[0] == 63
    np.testing.assert_array_equal(un["rel"], params["rel"])  # NOT sliced

    un_m = unpad_entity_tree(pad_entity_tree(moments, 63, np_), 63, np_)
    assert un_m["mu"]["entity"].shape[0] == 63
    assert un_m["mu"]["rel"].shape == (64, 4)


def test_synthetic_kg_entities_exceeding_default_train_size():
    """synthetic_kg guarantees every entity id appears in train, so it must
    grow n_train when n_entities exceeds it (--synthetic_entities 4096 with
    the default n_train crashed here before the guard)."""
    big = synthetic_kg(n_entities=4096, n_relations=5)
    n_ent, n_rel, _ = big.get_shape()
    assert n_ent == 4096 and big.get_examples("train").shape[0] >= 4096


def test_dp_training_matches_single_device(data, setup):
    model, params = setup
    n_ent, n_rel, _ = data.get_shape()
    tcfg = TrainConfig(learning_rate=0.05, batch_size=64, neg_sample_size=8)
    trainer = Trainer(model, tcfg, n_ent, n_rel)
    opt_state = trainer.tx.init(params)

    ex = data.get_examples("train")
    b, w, _ = epoch_batches(ex, tcfg.batch_size, np.random.default_rng(0))
    key = jax.random.PRNGKey(42)

    p1, o1, loss1 = trainer.run_epoch(
        jax.tree.map(jnp.copy, params), trainer.tx.init(params), b, w, key
    )

    mesh = make_mesh((8, 1))
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    sb, sw, _ = shard_epoch_arrays(mesh, jnp.asarray(b), jnp.asarray(w))
    p2, o2, loss2 = trainer.run_epoch(sp, trainer.tx.init(sp), sb, sw, key)

    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (4, 2)])
def test_sharded_ranker_matches_dense(data, setup, mesh_shape):
    model, params = setup
    mesh = make_mesh(mesh_shape)
    pack = data.eval_pack("test", "rhs")

    dense_ranks = get_ranking(model, params, pack, batch_size=16)

    # N_ENT=49 divides none of the model-axis sizes: the ranker pads + masks
    ranker = make_sharded_ranker(model, mesh, N_ENT)
    sp = shard_params(params, mesh)
    ranks = []
    bs = 16
    for i in range(0, len(pack.queries), bs):
        q = jnp.asarray(pack.queries[i : i + bs])
        f = jnp.asarray(pack.filter_idx[i : i + bs])
        ranks.append(np.asarray(ranker(sp, q, f)))
    np.testing.assert_array_equal(np.concatenate(ranks), dense_ranks)


def test_sharded_ranker_accepts_unpadded_params(data, setup):
    """The ranker must also take CANONICAL (unpadded) params — the final
    best-checkpoint reload path — and pad internally."""
    model, params = setup
    mesh = make_mesh((2, 4))
    pack = data.eval_pack("test", "rhs")
    dense_ranks = get_ranking(model, params, pack, batch_size=16)
    ranker = make_sharded_ranker(model, mesh, N_ENT)
    r = np.asarray(ranker(params, jnp.asarray(pack.queries),
                          jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense_ranks)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_model_axis_training_matches_single_device(data, setup, mesh_shape):
    """Training with the entity table ROW-SHARDED over 'model' (the tp/sp
    axis) must match single-device training: GSPMD keeps the scanned epoch +
    optimizer state correct under sharded gathers/scatter-adds.  At the odd
    N_ENT the tables are zero-padded; the padded rows must stay zero and the
    real rows must match the unpadded run exactly."""
    model, params = setup
    n_ent, n_rel, _ = data.get_shape()
    tcfg = TrainConfig(learning_rate=0.05, batch_size=64, neg_sample_size=8)
    trainer = Trainer(model, tcfg, n_ent, n_rel)

    ex = data.get_examples("train")
    b, w, _ = epoch_batches(ex, tcfg.batch_size, np.random.default_rng(0))
    key = jax.random.PRNGKey(42)

    p1, _, loss1 = trainer.run_epoch(
        jax.tree.map(jnp.copy, params), trainer.tx.init(params), b, w, key
    )

    mesh = make_mesh(mesh_shape)
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    assert sp["entity"].sharding.spec[0] == "model"  # really row-sharded
    assert sp["entity"].shape[0] == padded_rows(N_ENT, mesh_shape[1])
    sb, sw, _ = shard_epoch_arrays(mesh, jnp.asarray(b), jnp.asarray(w))
    p2, _, loss2 = trainer.run_epoch(sp, trainer.tx.init(sp), sb, sw, key)

    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    # pad rows must remain exactly zero (no gradient may reach them)
    for k in ("entity", "bh", "bt"):
        assert not np.asarray(p2[k][N_ENT:]).any(), k
    p2 = _unpad(p2, mesh)
    for (k, a), (_, c) in zip(sorted(p1.items()), sorted(p2.items())):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=1e-6, err_msg=k
        )


def test_pool_mode_training_on_mesh_matches_single_device(data, setup):
    """neg_mode='pool' under a (4,2) mesh (row-sharded entity table): the
    P-row pool gather becomes a GSPMD collective; results must match
    single-device execution."""
    model, params = setup
    n_ent, n_rel, _ = data.get_shape()
    tcfg = TrainConfig(learning_rate=0.05, batch_size=64, neg_sample_size=8,
                       neg_mode="pool", neg_pool_size=16)
    trainer = Trainer(model, tcfg, n_ent, n_rel)

    ex = data.get_examples("train")
    b, w, _ = epoch_batches(ex, tcfg.batch_size, np.random.default_rng(0))
    key = jax.random.PRNGKey(42)

    p1, _, loss1 = trainer.run_epoch(
        jax.tree.map(jnp.copy, params), trainer.tx.init(params), b, w, key
    )
    mesh = make_mesh((4, 2))
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    sb, sw, _ = shard_epoch_arrays(mesh, jnp.asarray(b), jnp.asarray(w))
    p2, _, loss2 = trainer.run_epoch(sp, trainer.tx.init(sp), sb, sw, key)

    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    p2 = _unpad(p2, mesh)
    for (k, a), (_, c) in zip(sorted(p1.items()), sorted(p2.items())):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=1e-6, err_msg=k
        )


def test_crossentropy_training_on_mesh_matches_single_device(data, setup):
    """All-entity CE on a (2,4) mesh with a PADDED entity table: score_all
    emits pad columns which the loss must mask (train/losses.py::
    _pad_col_mask) — loss and updated real rows must match single-device.
    SGD: under CE the per-row head bias cancels in softmax, so bh's gradient
    is pure rounding noise — Adam would amplify differently-rounded noise to
    full ±lr steps (the repo-wide trajectory-parity rule)."""
    model, params = setup
    n_ent, n_rel, _ = data.get_shape()
    tcfg = TrainConfig(learning_rate=0.001, batch_size=64, neg_sample_size=0,
                       loss="crossentropy", smoothing=0.1, optimizer="SGD")
    trainer = Trainer(model, tcfg, n_ent, n_rel)

    ex = data.get_examples("train")
    b, w, _ = epoch_batches(ex, tcfg.batch_size, np.random.default_rng(0))
    key = jax.random.PRNGKey(42)

    p1, _, loss1 = trainer.run_epoch(
        jax.tree.map(jnp.copy, params), trainer.tx.init(params), b, w, key
    )
    mesh = make_mesh((2, 4))
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    sb, sw, _ = shard_epoch_arrays(mesh, jnp.asarray(b), jnp.asarray(w))
    p2, _, loss2 = trainer.run_epoch(sp, trainer.tx.init(sp), sb, sw, key)

    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    for k in ("entity", "bh", "bt"):
        assert not np.asarray(p2[k][N_ENT:]).any(), k
    p2 = _unpad(p2, mesh)
    for (k, a), (_, c) in zip(sorted(p1.items()), sorted(p2.items())):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-5, atol=2e-6, err_msg=k
        )


def _gnn_args(**kw):
    class _Args:
        hidden_dim = 8
        layers = 2
        edge_dropout = 0.0
        dropout = 0.0
        opn = "mult"
        interaction = "distmult"
        basis = 0

    for k, v in kw.items():
        setattr(_Args, k, v)
    return _Args()


@pytest.mark.parametrize("name,kw", [
    ("CompGCN", {}),
    ("CompGCN", {"interaction": "transe", "opn": "add"}),
    ("PoincareGCN", {"layers": 1}),
    ("LorentzGCN", {"layers": 1}),
])
def test_sharded_gnn_ranker_matches_dense(data, name, kw):
    """Entity-sharded GNN eval (encoder replicated, ENCODED table row-sharded
    over 'model') must reproduce the dense cached-encoder ranking exactly —
    at the odd N_ENT, on a (2,4) mesh."""
    from complexhyperbolickge_tpu.parallel import make_sharded_gnn_ranker

    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype="float32")
    model = get_model(name)(cfg, _gnn_args(**kw), data)
    # spread weights so ranks have no float ties (fresh init leaves scores
    # nearly identical; rank comparisons are exact-equality-sensitive)
    rng = np.random.default_rng(11)
    params = jax.tree.map(
        lambda x: jnp.asarray(
            rng.uniform(-0.5, 0.5, size=x.shape), dtype=x.dtype
        ) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        model.init(jax.random.PRNGKey(0)),
    )
    pack = data.eval_pack("test", "rhs")

    dense_ranks = get_ranking(model, params, pack, batch_size=16)

    mesh = make_mesh((2, 4))
    ranker = make_sharded_gnn_ranker(model, mesh, n_ent)
    r = np.asarray(ranker(params, jnp.asarray(pack.queries),
                          jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense_ranks)

    # whole-split scan form (the production get_ranking path)
    qb = jnp.asarray(pack.queries[:32].reshape(2, 16, 3))
    fb = jnp.asarray(pack.filter_idx[:32].reshape(2, 16, -1))
    rm = np.asarray(ranker.rank_many(params, qb, fb)).reshape(-1)
    np.testing.assert_array_equal(rm, dense_ranks[:32])


@pytest.mark.parametrize("bias,gamma", [("none", 0.0), ("constant", 0.7)])
def test_sharded_gnn_ranker_other_bias_modes(data, bias, gamma):
    """bias='none'/'constant' branches of the sharded GNN ranker (no learned
    tail-bias row to shard; constant gamma adds on the tile side)."""
    from complexhyperbolickge_tpu.parallel import make_sharded_gnn_ranker

    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, bias=bias, gamma=gamma, dtype="float32")
    model = get_model("CompGCN")(cfg, _gnn_args(), data)
    rng = np.random.default_rng(29)
    params = jax.tree.map(
        lambda x: jnp.asarray(
            rng.uniform(-0.5, 0.5, size=x.shape), dtype=x.dtype
        ) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        model.init(jax.random.PRNGKey(0)),
    )
    pack = data.eval_pack("test", "rhs")
    dense_ranks = get_ranking(model, params, pack, batch_size=16)

    ranker = make_sharded_gnn_ranker(model, make_mesh((2, 4)), n_ent)
    r = np.asarray(ranker(params, jnp.asarray(pack.queries),
                          jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense_ranks)


def test_bce_training_on_mesh_matches_single_device(data, setup):
    """BCE (label-pack) training on a (2,4) mesh with a PADDED entity table:
    the factored label-gather loss masks pad columns out of its dense term
    and pad label ids out of its gather (train/losses.py::bce_loss) — loss
    and updated real rows must match single-device.  Labels ride
    shard_epoch_arrays' third slot (batch dim on 'data').  SGD for the
    repo-wide trajectory-parity rule."""
    model, params = setup
    n_ent, n_rel, _ = data.get_shape()
    tcfg = TrainConfig(learning_rate=0.001, batch_size=64, neg_sample_size=0,
                       loss="binarycrossentropy", smoothing=0.1,
                       optimizer="SGD")
    trainer = Trainer(model, tcfg, n_ent, n_rel)

    rows, lab = data.label_pack("train")
    b, w, lab_b = epoch_batches(rows, tcfg.batch_size,
                                np.random.default_rng(0), labels=lab)
    key = jax.random.PRNGKey(42)

    p1, _, loss1 = trainer.run_epoch(
        jax.tree.map(jnp.copy, params), trainer.tx.init(params), b, w, key,
        labels=lab_b,
    )
    mesh = make_mesh((2, 4))
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    sb, sw, slab = shard_epoch_arrays(mesh, jnp.asarray(b), jnp.asarray(w),
                                      jnp.asarray(lab_b))
    p2, _, loss2 = trainer.run_epoch(sp, trainer.tx.init(sp), sb, sw, key,
                                     labels=slab)

    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    for k in ("entity", "bh", "bt"):
        assert not np.asarray(p2[k][N_ENT:]).any(), k
    p2 = _unpad(p2, mesh)
    for (k, a), (_, c) in zip(sorted(p1.items()), sorted(p2.items())):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-5, atol=2e-6, err_msg=k
        )


def test_signed_ce_training_on_mesh_matches_single_device(data, setup):
    """The labelless binarycrossentropy branch (signed_logsigmoid_ce_loss) on
    a (4,2) mesh: pad columns are zeroed out of log_prob and the target bump
    scatters at real indices only — must match single-device."""
    model, params = setup
    n_ent, n_rel, _ = data.get_shape()
    tcfg = TrainConfig(learning_rate=0.001, batch_size=64, neg_sample_size=0,
                       loss="binarycrossentropy", optimizer="SGD")
    trainer = Trainer(model, tcfg, n_ent, n_rel)

    ex = data.get_examples("train")
    b, w, _ = epoch_batches(ex, tcfg.batch_size, np.random.default_rng(0))
    key = jax.random.PRNGKey(42)

    p1, _, loss1 = trainer.run_epoch(
        jax.tree.map(jnp.copy, params), trainer.tx.init(params), b, w, key
    )
    mesh = make_mesh((4, 2))
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    sb, sw, _ = shard_epoch_arrays(mesh, jnp.asarray(b), jnp.asarray(w))
    p2, _, loss2 = trainer.run_epoch(sp, trainer.tx.init(sp), sb, sw, key)

    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    for k in ("entity", "bh", "bt"):
        assert not np.asarray(p2[k][N_ENT:]).any(), k
    p2 = _unpad(p2, mesh)
    for (k, a), (_, c) in zip(sorted(p1.items()), sorted(p2.items())):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-5, atol=2e-6, err_msg=k
        )


def _gnn_mesh_vs_single(dtype):
    """One CompGCN epoch single-device vs a (4,2) mesh; returns both pytrees.

    Uses its own 48-entity KG (divisible by the model axis, so the tables
    row-shard with NO pad rows — the pure GSPMD-parity baseline; the padded
    odd-count case is test_gnn_odd_entities_row_shards below)."""
    data48 = synthetic_kg(n_entities=48, n_relations=4, n_train=256,
                          n_valid=32, n_test=32, seed=3)
    n_ent, n_rel, _ = data48.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype=dtype)

    class _Args:
        hidden_dim = 8
        layers = 2
        edge_dropout = 0.0  # dropout keys must line up; keep it deterministic
        dropout = 0.0
        opn = "mult"
        interaction = "distmult"
        basis = 0

    model = get_model("CompGCN")(cfg, _Args(), data48)
    params = model.init(jax.random.PRNGKey(0))
    tcfg = TrainConfig(learning_rate=0.05, batch_size=64, neg_sample_size=8)
    trainer = Trainer(model, tcfg, n_ent, n_rel)

    ex = data48.get_examples("train")
    b, w, _ = epoch_batches(ex, tcfg.batch_size, np.random.default_rng(0))
    key = jax.random.PRNGKey(42)

    p1, _, loss1 = trainer.run_epoch(
        jax.tree.map(jnp.copy, params), trainer.tx.init(params), b, w, key
    )
    mesh = make_mesh((4, 2))
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh, pad=False)
    sb, sw, _ = shard_epoch_arrays(mesh, jnp.asarray(b), jnp.asarray(w))
    p2, _, loss2 = trainer.run_epoch(sp, trainer.tx.init(sp), sb, sw, key)
    return p1, loss1, p2, loss2


def test_gnn_training_on_mesh_matches_single_device():
    """CompGCN (full-graph encoder: segment-sum message passing) trained on a
    (4,2) mesh with sharded params/batches must match single-device training —
    GSPMD must handle the encoder's gathers/segment-sums over the row-sharded
    entity table.  (The CLI permits --mesh for GNN models; this is the test
    behind that.)

    Band provenance (root-caused r04): the f32 single-vs-mesh residual is
    PURE GSPMD reassociation — the f64 variant below matches bitwise.  The
    worst leaf is the layer-0 bn_bias gradient (a batch-dim sum whose psum
    order differs on the mesh), measured 1.29e-5 after one epoch.  The old
    1e-5 band only ever passed because pre-4759fc1 the BN params initialized
    in f64 under the x64 test env (masking exactly that leaf); 4759fc1 made
    the encoder honestly f32 and exposed the true residual.  3e-5 = measured
    drift with ~2x headroom; tightening it requires fixing reduction order
    under GSPMD, which XLA does not expose."""
    p1, loss1, p2, loss2 = _gnn_mesh_vs_single("float32")
    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=3e-5)


def test_gnn_training_on_mesh_matches_single_device_f64_exact():
    """The f64 leg of the same comparison must be (near-)bitwise: any real
    logic divergence between the sharded and single-device GNN training step
    shows up here at full magnitude, while f32 reassociation noise vanishes.
    This is the strong guarantee behind the f32 test's 3e-5 band."""
    p1, loss1, p2, loss2 = _gnn_mesh_vs_single("double")
    np.testing.assert_allclose(loss1, loss2, rtol=0, atol=1e-12)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-12)


def _gnn_odd_mesh_vs_single(data, dtype):
    """One CompGCN epoch at odd N_ENT=49: single-device unpadded vs a (4,2)
    mesh with DEFAULT shard_params (entity tables zero-padded to 52 and
    row-SHARDED over 'model'; the encoder masks pad rows out of its BN
    statistics).  Returns (p1, loss1, padded p2, loss2, mesh)."""
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype=dtype)

    class _Args:
        hidden_dim = 8
        layers = 1
        edge_dropout = 0.0
        dropout = 0.0
        opn = "mult"
        interaction = "distmult"
        basis = 0

    model = get_model("CompGCN")(cfg, _Args(), data)
    params = model.init(jax.random.PRNGKey(0))
    tcfg = TrainConfig(learning_rate=0.05, batch_size=64, neg_sample_size=8)
    trainer = Trainer(model, tcfg, n_ent, n_rel)

    ex = data.get_examples("train")
    b, w, _ = epoch_batches(ex, tcfg.batch_size, np.random.default_rng(0))
    key = jax.random.PRNGKey(42)

    p1, _, loss1 = trainer.run_epoch(
        jax.tree.map(jnp.copy, params), trainer.tx.init(params), b, w, key
    )
    mesh = make_mesh((4, 2))
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    assert sp["entity"].shape[0] == padded_rows(N_ENT, 2)  # padded
    assert sp["entity"].sharding.spec[0] == "model"  # and row-SHARDED
    sb, sw, _ = shard_epoch_arrays(mesh, jnp.asarray(b), jnp.asarray(w))
    p2, _, loss2 = trainer.run_epoch(sp, trainer.tx.init(sp), sb, sw, key)
    return p1, loss1, p2, loss2, mesh


def test_gnn_odd_entities_row_shards(data):
    """GNN training at an ODD entity count must row-shard the entity tables
    (zero-padded; masked-BN keeps statistics over real rows only) and match
    single-device unpadded training — the workload class that NEEDS >1 chip
    (encoder table > HBM) gets real HBM scaling at real dataset entity
    counts.  f32 band 3e-5: pure reassociation, same provenance as
    test_gnn_training_on_mesh_matches_single_device (the f64 leg below is
    the exactness guarantee)."""
    p1, loss1, p2, loss2, mesh = _gnn_odd_mesh_vs_single(data, "float32")
    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    for k in ("entity", "bh", "bt"):
        assert not np.asarray(p2[k][N_ENT:]).any(), f"{k} pad rows drifted"
    p2 = _unpad(p2, mesh)
    for (k, a), (_, c) in zip(sorted(p1.items()), sorted(p2.items())):
        if k == "gnn":
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(c)):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           atol=3e-5)
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=3e-5, err_msg=k)


def test_gnn_odd_entities_row_shards_f64_exact(data):
    """f64 leg of the padded-GNN-sharding comparison: masked-BN over pad
    rows is exact arithmetic (pad contributions are exact zeros), so any
    real logic divergence shows up here at full magnitude."""
    p1, loss1, p2, loss2, mesh = _gnn_odd_mesh_vs_single(data, "double")
    np.testing.assert_allclose(loss1, loss2, rtol=0, atol=1e-12)
    p2 = _unpad(p2, mesh)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-11)


def test_gnn_pad_false_still_replicates(data):
    """pad=False remains the escape hatch: GNN entity tables at an odd
    count are replicated, not padded."""
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype="float32")

    class _Args:
        hidden_dim = 8
        layers = 1
        edge_dropout = 0.0
        dropout = 0.0
        opn = "mult"
        interaction = "distmult"
        basis = 0

    model = get_model("CompGCN")(cfg, _Args(), data)
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh((4, 2))
    sp = shard_params(params, mesh, pad=False)
    assert sp["entity"].shape[0] == N_ENT  # replicated, NOT padded
    assert sp["entity"].sharding.spec == ()


def test_cli_with_mesh(tmp_path):
    """Full CLI protocol with --mesh 4x2 on the virtual 8-device mesh
    (DP-sharded training batches + entity-sharded shard_map eval over an
    odd synthetic entity count), and the written checkpoint must carry
    CANONICAL (unpadded) shapes."""
    from complexhyperbolickge_tpu.cli.run import build_parser, train
    from complexhyperbolickge_tpu.train.checkpoint import load_checkpoint

    args = build_parser().parse_args([
        "--dataset", "synthetic", "--synthetic_entities", "199",
        "--model", "FFTRotH", "--rank", "5",
        "--max_epochs", "1", "--valid", "1", "--batch_size", "128",
        "--eval_batch_size", "64", "--neg_sample_size", "8",
        "--optimizer", "Adam", "--learning_rate", "0.01", "--bias", "learn",
        "--multi_c", "--dtype", "float32", "--mesh", "4x2",
        "--save_dir", str(tmp_path),
    ])
    out = train(args)
    assert 0.0 <= out["test"]["MRR"] <= 1.0
    st = load_checkpoint(str(tmp_path), device_put=False)
    for k in ("entity", "bh", "bt"):
        assert st["params"][k].shape[0] == 199, k  # canonical, not 200-padded


def test_cli_with_mesh_gnn(tmp_path):
    """Full CLI protocol for a GNN model with --mesh 4x2: encoder tables
    zero-padded + row-sharded (odd entity count, masked-BN pad rows), eval
    routed through the entity-sharded GNN ranker
    (make_best_sharded_ranker -> make_sharded_gnn_ranker), and the written
    checkpoint must carry canonical (unpadded) shapes."""
    from complexhyperbolickge_tpu.cli.run import build_parser, train

    args = build_parser().parse_args([
        "--dataset", "synthetic", "--synthetic_entities", "199",
        "--model", "CompGCN", "--rank", "8", "--hidden_dim", "8",
        "--layers", "1", "--edge_dropout", "0.0", "--dropout", "0.0",
        "--max_epochs", "1", "--valid", "1", "--batch_size", "128",
        "--eval_batch_size", "64", "--neg_sample_size", "8",
        "--optimizer", "Adam", "--learning_rate", "0.01", "--bias", "learn",
        "--dtype", "float32", "--mesh", "4x2",
        "--save_dir", str(tmp_path),
    ])
    out = train(args)
    assert 0.0 <= out["test"]["MRR"] <= 1.0
    from complexhyperbolickge_tpu.train.checkpoint import load_checkpoint

    st = load_checkpoint(str(tmp_path), device_put=False)
    for k in ("entity", "bh", "bt"):
        assert st["params"][k].shape[0] == 199, k  # canonical, not 200-padded


def _subgraph_mesh_vs_single(data, dtype):
    """One subgraph-mode CompGCN epoch at odd N_ENT=49: single-device
    unpadded vs a (4,2) mesh where the per-step QUERY arrays shard over
    'data' and the entity tables are zero-padded + row-SHARDED over 'model'
    (train/subgraph.py mesh support).  Same sampler stream (rng(7)), same
    key splits; returns (p1, loss1, padded p2, loss2, mesh)."""
    from complexhyperbolickge_tpu.train.subgraph import SubgraphTrainer

    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype=dtype)

    class _Args:
        hidden_dim = 8
        layers = 1
        edge_dropout = 0.0  # deterministic: key chains must line up
        dropout = 0.0
        opn = "mult"
        interaction = "distmult"
        basis = 0

    # SGD, not Adam: subgraph steps leave un-sampled entity rows with
    # EXACTLY zero gradient; mesh reassociation turns those zeros into
    # +-ulp crumbs that Adam's |g| normalization amplifies to full-lr
    # updates (the standing trajectory-parity trap, CLAUDE.md) — measured
    # 6.8e-3 drift under Adam vs reassociation-scale under SGD.
    model = get_model("CompGCN")(cfg, _Args(), data)
    tcfg = TrainConfig(learning_rate=0.05, batch_size=32, neg_sample_size=0,
                       loss="crossentropy", smoothing=0.1, optimizer="SGD")
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)

    tr1 = SubgraphTrainer(model, tcfg, data, fanouts=(4, 4),
                          max_nodes=64, max_edges=512)
    p1, _, loss1 = tr1.run_epoch(
        jax.tree.map(jnp.copy, params), tr1.tx.init(params), 32,
        np.random.default_rng(7), key, epoch_id=0)

    mesh = make_mesh((4, 2))
    tr2 = SubgraphTrainer(model, tcfg, data, fanouts=(4, 4),
                          max_nodes=64, max_edges=512, mesh=mesh)
    sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
    assert sp["entity"].shape[0] == padded_rows(N_ENT, 2)  # padded
    assert sp["entity"].sharding.spec[0] == "model"  # and row-SHARDED
    p2, _, loss2 = tr2.run_epoch(sp, tr2.tx.init(sp), 32,
                                 np.random.default_rng(7), key, epoch_id=0)
    return p1, loss1, p2, loss2, mesh


def test_subgraph_training_on_mesh_matches_single_device(data):
    """--subgraph composed with --mesh (VERDICT r03 item 4): the sampled
    subgraph structure stays replicated while queries/labels shard over
    'data' and the (padded) entity tables row-shard over 'model' — the
    encoder-outgrows-one-chip workload gets both HBM scaling and data
    parallelism.  f32 band 3e-5: same GSPMD-reassociation provenance as
    test_gnn_training_on_mesh_matches_single_device (f64 leg below is the
    exactness guarantee)."""
    p1, loss1, p2, loss2, mesh = _subgraph_mesh_vs_single(data, "float32")
    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
    for k in ("entity", "bh", "bt"):
        assert not np.asarray(p2[k][N_ENT:]).any(), f"{k} pad rows drifted"
    p2 = _unpad(p2, mesh)
    for (k, a), (_, c) in zip(sorted(p1.items()), sorted(p2.items())):
        if k == "gnn":
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(c)):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           atol=3e-5)
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=3e-5, err_msg=k)


def test_subgraph_training_on_mesh_matches_single_device_f64_exact(data):
    """f64 leg of the subgraph×mesh comparison: any real logic divergence
    (mis-sharded query array, pad-row contamination, dropped psum) shows up
    at full magnitude here while f32 reassociation noise vanishes."""
    p1, loss1, p2, loss2, mesh = _subgraph_mesh_vs_single(data, "double")
    np.testing.assert_allclose(loss1, loss2, rtol=0, atol=1e-12)
    p2 = _unpad(p2, mesh)
    for a, c in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-11)


def test_subgraph_mesh_batch_divisibility_refused(data):
    """A seed batch size that does not divide the mesh 'data' axis cannot
    shard evenly; the trainer must refuse at construction, not mis-shard."""
    from complexhyperbolickge_tpu.train.subgraph import SubgraphTrainer

    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype="float32")

    class _Args:
        hidden_dim = 8
        layers = 1
        edge_dropout = 0.0
        dropout = 0.0
        opn = "mult"
        interaction = "distmult"
        basis = 0

    model = get_model("CompGCN")(cfg, _Args(), data)
    tcfg = TrainConfig(batch_size=30, neg_sample_size=0, loss="crossentropy")
    with pytest.raises(ValueError, match="data"):
        SubgraphTrainer(model, tcfg, data, mesh=make_mesh((4, 2)))


def test_cli_subgraph_with_mesh(tmp_path):
    """--subgraph composes with --mesh end-to-end through the CLI (replaces
    the r03 refusal): subgraph training on a 4x2 mesh with row-sharded
    entity tables, sharded-ranker eval, canonical checkpoint shapes."""
    from complexhyperbolickge_tpu.cli.run import build_parser, train
    from complexhyperbolickge_tpu.train.checkpoint import load_checkpoint

    args = build_parser().parse_args([
        "--dataset", "synthetic", "--synthetic_entities", "199",
        "--model", "CompGCN", "--rank", "8", "--hidden_dim", "8",
        "--layers", "1", "--edge_dropout", "0.0", "--dropout", "0.0",
        "--subgraph", "--mesh", "4x2",
        "--max_epochs", "1", "--valid", "1", "--batch_size", "32",
        "--eval_batch_size", "64", "--neg_sample_size", "0",
        "--loss", "crossentropy",
        "--optimizer", "Adam", "--learning_rate", "0.01", "--bias", "learn",
        "--dtype", "float32", "--save_dir", str(tmp_path),
    ])
    out = train(args)
    assert 0.0 <= out["test"]["MRR"] <= 1.0
    st = load_checkpoint(str(tmp_path), device_put=False)
    for k in ("entity", "bh", "bt"):
        assert st["params"][k].shape[0] == 199, k  # canonical, not 200-padded


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (4, 2)])
def test_sharded_pallas_ranker_matches_dense(data, setup, mesh_shape):
    """The fused Pallas tile kernel run PER SHARD inside shard_map (interpret
    mode on the CPU mesh) + one count psum must reproduce dense filtered
    ranks exactly — multi-chip eval keeps the single-chip kernel win."""
    from complexhyperbolickge_tpu.parallel import make_sharded_pallas_ranker

    model, params = setup
    mesh = make_mesh(mesh_shape)
    pack = data.eval_pack("test", "rhs")
    dense_ranks = get_ranking(model, params, pack, batch_size=16)

    ranker = make_sharded_pallas_ranker(model, mesh, N_ENT, tile_n=8,
                                        interpret=True)
    sp = shard_params(params, mesh)
    r = np.asarray(ranker(sp, jnp.asarray(pack.queries),
                          jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense_ranks)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_sharded_pallas_maskless_ranker_matches_dense(data, setup, mesh_shape):
    """masked=False per shard (subtract-filtered counting, round 4): each
    shard subtracts only the filter ids it OWNS (others remapped to row 0
    with f_ok=0) and the count psum must reproduce dense filtered ranks —
    exactly on CPU, where the flat subtraction contraction is bitwise (the
    on-chip +-1 MXU tie caveat is the single-device maskless one)."""
    from complexhyperbolickge_tpu.parallel import make_sharded_pallas_ranker

    model, params = setup
    mesh = make_mesh(mesh_shape)
    pack = data.eval_pack("test", "rhs")
    dense_ranks = get_ranking(model, params, pack, batch_size=16)

    ranker = make_sharded_pallas_ranker(model, mesh, N_ENT, tile_n=8,
                                        interpret=True, masked=False)
    sp = shard_params(params, mesh)
    r = np.asarray(ranker(sp, jnp.asarray(pack.queries),
                          jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense_ranks)


def test_sharded_pallas_ranker_precision_default_matches_on_cpu(data, setup):
    """precision='default' threads through the sharded fused ranker (CPU
    DEFAULT==HIGHEST numerically, so ranks are exactly equal — pins the
    plumbing; the bf16 deviation story is measured on-chip)."""
    from complexhyperbolickge_tpu.parallel import make_best_sharded_ranker

    model, params = setup
    mesh = make_mesh((2, 4))
    pack = data.eval_pack("test", "rhs")
    dense_ranks = get_ranking(model, params, pack, batch_size=16)

    ranker = make_best_sharded_ranker(model, mesh, N_ENT, backend="pallas",
                                      precision="default")
    r = np.asarray(ranker(shard_params(params, mesh),
                          jnp.asarray(pack.queries),
                          jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense_ranks)

    # the DENSE sharded path now honors precision too (backend='auto')
    ranker_d = make_best_sharded_ranker(model, mesh, N_ENT, backend="auto",
                                        precision="default")
    rd = np.asarray(ranker_d(shard_params(params, mesh),
                             jnp.asarray(pack.queries),
                             jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(rd, dense_ranks)


def test_sharded_pallas_ranker_rank_many_and_unpadded(data, setup):
    """rank_many (whole-split scan form) + canonical unpadded params through
    the sharded Pallas ranker; also the lhs direction."""
    from complexhyperbolickge_tpu.parallel import make_sharded_pallas_ranker

    model, params = setup
    mesh = make_mesh((2, 4))
    ranker = make_sharded_pallas_ranker(model, mesh, N_ENT, tile_n=8,
                                        interpret=True)
    for direction in ("rhs", "lhs"):
        pack = data.eval_pack("test", direction)
        dense_ranks = get_ranking(model, params, pack, batch_size=16)
        nb = len(pack.queries) // 16
        qb = jnp.asarray(pack.queries[: nb * 16].reshape(nb, 16, 3))
        fb = jnp.asarray(
            pack.filter_idx[: nb * 16].reshape(nb, 16, -1)
        )
        r = np.asarray(ranker.rank_many(params, qb, fb)).reshape(-1)
        np.testing.assert_array_equal(r, dense_ranks[: nb * 16])


@pytest.mark.parametrize("name,rank", [
    ("RotH", 6),      # BaseH family kernel
    ("RotLH", 6),     # Lorentz family kernel
    ("AttRH", 8),     # split-feature kernel (halves must stay even)
])
def test_sharded_hyp_family_pallas_matches_dense(data, name, rank):
    """The Poincare/Lorentz/AttRH fused kernels per shard inside shard_map
    must reproduce dense filtered ranks exactly (interpret mode, odd N)."""
    from complexhyperbolickge_tpu.parallel import make_best_sharded_ranker

    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=rank,
                      multi_c=True, dtype="float32")
    model = get_model(name)(cfg)
    rng = np.random.default_rng(21)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5

    mesh = make_mesh((2, 4))
    pack = data.eval_pack("test", "rhs")
    dense_ranks = get_ranking(model, params, pack, batch_size=16)
    # backend='pallas' forces interpret-mode kernels off-TPU
    ranker = make_best_sharded_ranker(model, mesh, N_ENT, backend="pallas")
    sp = shard_params(params, mesh)
    r = np.asarray(ranker(sp, jnp.asarray(pack.queries),
                          jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense_ranks)

    # whole-split scan form (the production compute_metrics path)
    nb = len(pack.queries) // 16
    qb = jnp.asarray(pack.queries[: nb * 16].reshape(nb, 16, 3))
    fb = jnp.asarray(pack.filter_idx[: nb * 16].reshape(nb, 16, -1))
    rm = np.asarray(ranker.rank_many(sp, qb, fb)).reshape(-1)
    np.testing.assert_array_equal(rm, dense_ranks[: nb * 16])


@pytest.mark.parametrize("name,rank", [
    ("RotH", 6),      # BaseH family maskless kernel
    ("RotLH", 6),     # Lorentz family maskless kernel
])
def test_sharded_hyp_family_maskless_matches_dense(data, name, rank):
    """masked=False per shard for the Poincare/Lorentz families (round 4):
    each shard subtracts only the filter ids it OWNS (others remapped to
    row 0 with f_ok=0) and the count psum must reproduce dense filtered
    ranks — exactly on CPU, where the flat subtraction contraction is
    bitwise (the on-chip +-1 MXU tie caveat is the single-device one)."""
    from complexhyperbolickge_tpu.parallel import make_best_sharded_ranker

    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=rank,
                      multi_c=True, dtype="float32")
    model = get_model(name)(cfg)
    rng = np.random.default_rng(29)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5

    mesh = make_mesh((2, 4))
    pack = data.eval_pack("test", "rhs")
    dense_ranks = get_ranking(model, params, pack, batch_size=16)
    ranker = make_best_sharded_ranker(model, mesh, N_ENT,
                                      backend="pallas_maskless")
    sp = shard_params(params, mesh)
    r = np.asarray(ranker(sp, jnp.asarray(pack.queries),
                          jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense_ranks)

    # whole-split scan form (the production compute_metrics path)
    nb = len(pack.queries) // 16
    qb = jnp.asarray(pack.queries[: nb * 16].reshape(nb, 16, 3))
    fb = jnp.asarray(pack.filter_idx[: nb * 16].reshape(nb, 16, -1))
    rm = np.asarray(ranker.rank_many(sp, qb, fb)).reshape(-1)
    np.testing.assert_array_equal(rm, dense_ranks[: nb * 16])


def test_sharded_attrh_maskless_matches_dense(data):
    """AttRH's sharded maskless variant (round 4: subtract-filtered over
    BOTH half tables per shard) must reproduce dense filtered ranks —
    exactly on CPU, like the other families."""
    from complexhyperbolickge_tpu.parallel import make_best_sharded_ranker

    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype="float32")
    model = get_model("AttRH")(cfg)
    rng = np.random.default_rng(31)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5

    mesh = make_mesh((2, 4))
    pack = data.eval_pack("test", "rhs")
    dense_ranks = get_ranking(model, params, pack, batch_size=16)
    ranker = make_best_sharded_ranker(model, mesh, N_ENT,
                                      backend="pallas_maskless")
    sp = shard_params(params, mesh)
    r = np.asarray(ranker(sp, jnp.asarray(pack.queries),
                          jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense_ranks)

    # whole-split scan form (the production compute_metrics path)
    nb = len(pack.queries) // 16
    qb = jnp.asarray(pack.queries[: nb * 16].reshape(nb, 16, 3))
    fb = jnp.asarray(pack.filter_idx[: nb * 16].reshape(nb, 16, -1))
    rm = np.asarray(ranker.rank_many(sp, qb, fb)).reshape(-1)
    np.testing.assert_array_equal(rm, dense_ranks[: nb * 16])


@pytest.mark.parametrize("bias,gamma", [("none", 0.0), ("constant", 0.7)])
def test_sharded_rankers_other_bias_modes(data, bias, gamma):
    """bias='none'/'constant' branches of BOTH sharded rankers (no learned
    tail bias to psum; constant gamma cancels between score and target)."""
    from complexhyperbolickge_tpu.parallel import make_sharded_pallas_ranker

    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=5,
                      multi_c=True, bias=bias, gamma=gamma, dtype="float32")
    model = get_model("FFTRotH")(cfg)
    rng = np.random.default_rng(23)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5

    mesh = make_mesh((2, 4))
    pack = data.eval_pack("test", "rhs")
    dense_ranks = get_ranking(model, params, pack, batch_size=16)
    q, f = jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx)

    dense_sharded = make_sharded_ranker(model, mesh, N_ENT)
    np.testing.assert_array_equal(
        np.asarray(dense_sharded(params, q, f)), dense_ranks
    )
    pallas_sharded = make_sharded_pallas_ranker(model, mesh, N_ENT, tile_n=8,
                                                interpret=True)
    np.testing.assert_array_equal(
        np.asarray(pallas_sharded(params, q, f)), dense_ranks
    )


def test_make_best_sharded_ranker_selects(data, setup):
    from complexhyperbolickge_tpu.parallel import make_best_sharded_ranker

    model, params = setup
    mesh = make_mesh((2, 4))
    # backend='pallas' forces the fused path even off-TPU (interpret mode)
    ranker = make_best_sharded_ranker(model, mesh, N_ENT, backend="pallas")
    pack = data.eval_pack("test", "rhs")
    dense_ranks = get_ranking(model, params, pack, batch_size=16)
    r = np.asarray(ranker(shard_params(params, mesh),
                          jnp.asarray(pack.queries),
                          jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense_ranks)
    # dense backend returns the plain shard_map ranker
    dense_backend = make_best_sharded_ranker(model, mesh, N_ENT,
                                             backend="dense")
    r2 = np.asarray(dense_backend(shard_params(params, mesh),
                                  jnp.asarray(pack.queries),
                                  jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r2, dense_ranks)


def test_sharded_ranker_lhs_direction(data, setup):
    model, params = setup
    mesh = make_mesh((2, 4))
    pack = data.eval_pack("test", "lhs")
    dense_ranks = get_ranking(model, params, pack, batch_size=32)
    ranker = make_sharded_ranker(model, mesh, N_ENT)
    sp = shard_params(params, mesh)
    r = np.asarray(ranker(sp, jnp.asarray(pack.queries),
                          jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense_ranks)
