"""C++ / numpy neighbor sampler and subgraph training tests."""

import numpy as np
import pytest

import jax

from complexhyperbolickge_tpu.data.dataset import synthetic_kg
from complexhyperbolickge_tpu.data.sampler import NeighborSampler
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.subgraph import SubgraphTrainer, build_subgraph_labels
from complexhyperbolickge_tpu.train.trainer import TrainConfig

MAX_NODES, MAX_EDGES = 128, 1024


@pytest.fixture(scope="module")
def data():
    return synthetic_kg(n_entities=60, n_relations=4, n_train=400, n_valid=50,
                        n_test=50, seed=6)


@pytest.mark.parametrize("force_numpy", [False, True])
def test_sampler_invariants(data, force_numpy):
    s = NeighborSampler(data, fanouts=(4, 4), max_nodes=MAX_NODES,
                        max_edges=MAX_EDGES, force_numpy=force_numpy)
    if not force_numpy:
        assert s.backend == "cpp", "native sampler library failed to build"
    seeds = np.arange(16)
    sub = s.sample(seeds, seed=3)
    assert 0 < sub.n_nodes <= MAX_NODES
    assert 0 <= sub.n_edges <= MAX_EDGES
    # local ids in range
    real_edges = sub.edges[: sub.n_edges]
    assert real_edges[:, [0, 2]].max() < sub.n_nodes
    assert sub.queries[:, [0, 2]].max() < sub.n_nodes
    # queries decode to the original global seed triples
    e = s.edges_global[seeds]
    np.testing.assert_array_equal(sub.node_ids[sub.queries[:, 0]], e[:, 0])
    np.testing.assert_array_equal(sub.node_ids[sub.queries[:, 2]], e[:, 2])
    np.testing.assert_array_equal(sub.queries[:, 1], e[:, 1])
    # padded rows are zeroed with weight 0
    assert (sub.edge_weight[sub.n_edges:] == 0).all()
    # every kept edge joins sampled nodes
    in_set = set(sub.node_ids[: sub.n_nodes].tolist())
    glob_heads = sub.node_ids[real_edges[:, 0]]
    glob_tails = sub.node_ids[real_edges[:, 2]]
    assert set(glob_heads.tolist()) <= in_set
    assert set(glob_tails.tolist()) <= in_set


def test_sampler_seed_edges_excluded(data):
    """The seed edges' ids must not appear in the induced subgraph (the
    reference's exclude=batch.input_id, pyg_utils.py:101-111)."""
    s = NeighborSampler(data, fanouts=(20, 20), max_nodes=2048, max_edges=16384)
    seeds = np.arange(8)
    sub = s.sample(seeds, seed=0)
    e = s.edges_global
    seed_triples = {tuple(x) for x in e[seeds].tolist()}
    kept = np.stack(
        [sub.node_ids[sub.edges[: sub.n_edges, 0]],
         sub.edges[: sub.n_edges, 1],
         sub.node_ids[sub.edges[: sub.n_edges, 2]]], axis=1,
    )
    # duplicates of a seed triple under a different edge id may legally
    # remain; count must not exceed the duplicate count in the graph
    from collections import Counter

    graph_counts = Counter(map(tuple, e.tolist()))
    kept_counts = Counter(map(tuple, kept.tolist()))
    for t in seed_triples:
        assert kept_counts[t] <= graph_counts[t] - 1


def test_sampler_determinism(data):
    s = NeighborSampler(data, fanouts=(4, 4), max_nodes=MAX_NODES,
                        max_edges=MAX_EDGES)
    a = s.sample(np.arange(16), seed=9)
    b = s.sample(np.arange(16), seed=9)
    np.testing.assert_array_equal(a.node_ids, b.node_ids)
    np.testing.assert_array_equal(a.edges, b.edges)


def test_subgraph_labels(data):
    s = NeighborSampler(data, fanouts=(4, 4), max_nodes=MAX_NODES,
                        max_edges=MAX_EDGES)
    sub = s.sample(np.arange(16), seed=1)
    labels = build_subgraph_labels(sub, MAX_NODES)
    assert labels.shape == (16, MAX_NODES)
    # the gold tail is always labeled
    assert (labels[np.arange(16), sub.queries[:, 2]] == 1).all()


def test_subgraph_labels_match_dict_loop_semantics(data):
    """The vectorized sort+searchsorted label build must reproduce the
    straightforward per-edge dict group-by exactly (the reference
    make_labels semantics, kg_dataset.py:182-227)."""
    s = NeighborSampler(data, fanouts=(6, 6), max_nodes=MAX_NODES,
                        max_edges=MAX_EDGES)
    for seed in range(4):
        sub = s.sample(np.arange(seed * 8, seed * 8 + 24), seed=seed)
        got = build_subgraph_labels(sub, MAX_NODES)

        want = np.zeros((len(sub.queries), MAX_NODES), np.float32)
        tmask = sub.train_mask[: sub.n_edges] > 0
        e = sub.edges[: sub.n_edges][tmask]
        by_key = {}
        for h, r, t in e:
            by_key.setdefault((int(h), int(r)), []).append(int(t))
        for i, (h, r, t) in enumerate(sub.queries):
            want[i, int(t)] = 1.0
            for tt in by_key.get((int(h), int(r)), ()):
                want[i, tt] = 1.0
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("loss", ["crossentropy", "binarycrossentropy"])
def test_subgraph_training(data, loss):
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype="float32")

    class A:
        hidden_dim = 8
        layers = 2
        edge_dropout = 0.1
        dropout = 0.0
        opn = "mult"
        interaction = "distmult"
        basis = 0

    model = get_model("CompGCN")(cfg, A(), data)
    tcfg = TrainConfig(learning_rate=0.01, batch_size=32, neg_sample_size=0,
                       loss=loss, smoothing=0.1, optimizer="Adam")
    trainer = SubgraphTrainer(model, tcfg, data, fanouts=(4, 4),
                              max_nodes=MAX_NODES, max_edges=MAX_EDGES)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    losses = []
    for ep in range(2):
        params, opt_state, loss_v = trainer.run_epoch(
            params, opt_state, 32, rng, key, epoch_id=ep)
        losses.append(loss_v)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_epoch_yields_padded_tail_batch():
    """The final partial seed batch must be yielded (padded + query-masked),
    not dropped: every train edge seeds exactly one batch per epoch
    (round-1 advisor finding)."""
    import numpy as np

    from complexhyperbolickge_tpu.data.dataset import synthetic_kg
    from complexhyperbolickge_tpu.data.sampler import NeighborSampler

    data = synthetic_kg(n_entities=50, n_relations=3, n_train=250, n_valid=20,
                        n_test=20, seed=2)
    s = NeighborSampler(data, fanouts=(4,), max_nodes=512, max_edges=2048,
                        force_numpy=True)
    bs = 64  # n_train_edges = 500 (with inverses) -> 7 full + tail of 52
    batches = list(s.epoch(bs, np.random.default_rng(0)))
    assert len(batches) == -(-s.n_train_edges // bs)
    total_real = sum(int(b.query_weight.sum()) for b in batches)
    assert total_real == s.n_train_edges
    tail = batches[-1]
    assert tail.queries.shape[0] == bs  # padded to full batch size
    assert tail.query_weight.sum() == s.n_train_edges % bs


def test_subgraph_training_bf16_smoke(data):
    """SubgraphTrainer wraps its optimizer with the same bf16-safe f32-state
    wrapper as the full-graph Trainer; bf16 GNN params must train with
    finite loss and f32 optimizer moments."""
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype="bfloat16")

    class A:
        hidden_dim = 8
        layers = 2
        edge_dropout = 0.0
        dropout = 0.0
        opn = "mult"
        interaction = "distmult"
        basis = 0

    model = get_model("CompGCN")(cfg, A(), data)
    tcfg = TrainConfig(learning_rate=0.01, batch_size=32, neg_sample_size=0,
                       loss="crossentropy", optimizer="Adam")
    trainer = SubgraphTrainer(model, tcfg, data, fanouts=(4, 4),
                              max_nodes=MAX_NODES, max_edges=MAX_EDGES)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    # Adam moments must NOT be bf16 even though params are (the wrapper
    # upcasts; under the suite's x64 mode non-bf16 leaves may be f64)
    import jax.numpy as jnp
    moments = [x for x in jax.tree.leaves(opt_state)
               if hasattr(x, "dtype") and x.ndim >= 2]
    assert moments and all(m.dtype != jnp.bfloat16 for m in moments)
    rng = np.random.default_rng(0)
    params, opt_state, loss_v = trainer.run_epoch(
        params, opt_state, 32, rng, jax.random.PRNGKey(1), epoch_id=0)
    assert np.isfinite(loss_v)


def test_subgraph_update_steps_accumulates(data):
    """update_steps=k must SUM grads over k batches and step the optimizer
    every k-th batch + flush the partial window at epoch end (reference
    kg_optimizer.py:347-356) — it was silently ignored for a round (a step
    per batch).  Replay the identical sampler/key stream by hand with SGD
    and assert the trajectories are exactly equal."""
    import jax.numpy as jnp
    import optax

    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype="float32")

    class A:
        hidden_dim = 8
        layers = 2
        edge_dropout = 0.1  # keyed: exercises the key-chain replay too
        dropout = 0.0
        opn = "mult"
        interaction = "distmult"
        basis = 0

    K = 3
    model = get_model("CompGCN")(cfg, A(), data)
    tcfg = TrainConfig(learning_rate=0.05, batch_size=64, neg_sample_size=0,
                       loss="crossentropy", optimizer="SGD", update_steps=K)
    trainer = SubgraphTrainer(model, tcfg, data, fanouts=(4, 4),
                              max_nodes=MAX_NODES, max_edges=MAX_EDGES)
    params0, opt_state = trainer.init(jax.random.PRNGKey(0))
    # run_epoch's apply step DONATES params: hand it its own deep copy so
    # params0's buffers survive for the manual replay below
    run_params = jax.tree.map(lambda x: jnp.array(x, copy=True), params0)
    key = jax.random.PRNGKey(7)
    params, _, _ = trainer.run_epoch(
        run_params, opt_state, 64, np.random.default_rng(5), key,
        epoch_id=0)

    # ---- manual replay: same batches (fresh rng(5)), same key splits ----
    grad_fn = jax.grad(trainer._loss)
    cur = dict(params0)
    acc = jax.tree.map(jnp.zeros_like, cur)
    k = jax.random.PRNGKey(7)
    pending = 0
    n_batches = 0
    for sub in trainer.sampler.epoch(64, np.random.default_rng(5),
                                     seed_base=0):
        (node_ids, edges, edge_w, train_mask, node_w, queries, gq, labels,
         n_nodes, qw) = trainer._prep_host(sub)
        k, sk = jax.random.split(k)
        g = grad_fn(cur, jnp.asarray(node_ids), jnp.asarray(edges),
                    jnp.asarray(edge_w), jnp.asarray(train_mask),
                    jnp.asarray(node_w), jnp.asarray(queries),
                    jnp.asarray(gq), jnp.asarray(labels),
                    jnp.float32(n_nodes), jnp.asarray(qw), sk)
        acc = jax.tree.map(jnp.add, acc, g)
        pending += 1
        n_batches += 1
        if pending == K:
            cur = optax.apply_updates(
                cur, jax.tree.map(lambda x: -tcfg.learning_rate * x, acc))
            acc = jax.tree.map(jnp.zeros_like, acc)
            pending = 0
    assert n_batches % K != 0, "pick shapes that leave a partial window"
    cur = optax.apply_updates(
        cur, jax.tree.map(lambda x: -tcfg.learning_rate * x, acc))

    for (ka, va), (kb, vb) in zip(
            sorted(jax.tree.leaves_with_path(params), key=lambda kv: str(kv[0])),
            sorted(jax.tree.leaves_with_path(cur), key=lambda kv: str(kv[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-6, atol=1e-7, err_msg=str(ka))
