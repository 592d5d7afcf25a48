"""Row-sparse Adam vs torch.optim.SparseAdam on a gather-based toy problem."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from complexhyperbolickge_tpu.train.sparse_adam import sparse_adam

N, D, B, STEPS, LR = 20, 6, 4, 7, 1e-2


def test_sparse_adam_matches_torch():
    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 0.5, (N, D))
    target = rng.normal(0, 0.5, (STEPS, B, D))
    idx = rng.integers(0, N, (STEPS, B))

    emb = torch.nn.Embedding(N, D, sparse=True).double()
    with torch.no_grad():
        emb.weight.copy_(torch.from_numpy(w0))
    opt = torch.optim.SparseAdam(emb.parameters(), lr=LR)
    for s in range(STEPS):
        rows = emb(torch.from_numpy(idx[s]))
        loss = ((rows - torch.from_numpy(target[s])) ** 2).sum()
        opt.zero_grad()
        loss.backward()
        opt.step()

    params = {"w": jnp.asarray(w0)}
    tx = sparse_adam(LR)
    st = tx.init(params)
    for s in range(STEPS):
        def loss_fn(p):
            rows = p["w"][idx[s]]
            return jnp.sum((rows - jnp.asarray(target[s])) ** 2)
        g = jax.grad(loss_fn)(params)
        up, st = tx.update(g, st, params)
        params = optax.apply_updates(params, up)

    np.testing.assert_allclose(
        np.asarray(params["w"]), emb.weight.detach().numpy(), atol=1e-12
    )


def test_sparse_adam_leaves_untouched_rows_alone():
    params = {"w": jnp.ones((5, 3))}
    tx = sparse_adam(1e-1)
    st = tx.init(params)
    g = {"w": jnp.zeros((5, 3)).at[2].set(1.0)}
    for _ in range(3):
        up, st = tx.update(g, st, params)
        params = optax.apply_updates(params, up)
    w = np.asarray(params["w"])
    np.testing.assert_array_equal(w[[0, 1, 3, 4]], 1.0)
    assert (w[2] < 1.0).all()


def test_sparse_adam_trains_end_to_end():
    from complexhyperbolickge_tpu.data.dataset import epoch_batches, synthetic_kg
    from complexhyperbolickge_tpu.models import ModelConfig, get_model
    from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

    data = synthetic_kg(n_entities=50, n_relations=4, n_train=400, seed=2)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=5,
                      multi_c=True, dtype="float32")
    model = get_model("FFTRotH")(cfg)
    tcfg = TrainConfig(optimizer="SparseAdam", learning_rate=0.05,
                       batch_size=64, neg_sample_size=10)
    trainer = Trainer(model, tcfg, n_ent, n_rel)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    losses = []
    for i in range(3):
        b, w, _ = epoch_batches(data.get_examples("train"), 64, rng)
        params, opt_state, loss = trainer.run_epoch(
            params, opt_state, b, w, jax.random.PRNGKey(i))
        losses.append(loss)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_reduce_lr():
    """reduce_lr scales the in-state learning rate (reference
    kg_optimizer.py:57-64)."""
    import jax.numpy as jnp

    from complexhyperbolickge_tpu.train.trainer import make_optimizer, reduce_lr

    tx = make_optimizer("Adam", 0.1)
    st = tx.init({"w": jnp.ones((3,))})
    st2 = reduce_lr(st, 0.8)
    np.testing.assert_allclose(float(st2.hyperparams["learning_rate"]), 0.08)
    # the reduced state still drives updates
    g = {"w": jnp.ones((3,))}
    up, _ = tx.update(g, st2, {"w": jnp.ones((3,))})
    assert np.isfinite(np.asarray(up["w"])).all()


def test_torch_adagrad_matches_torch():
    """trainer.make_optimizer('Adagrad') must follow torch's update rule
    g/(sqrt(acc)+eps) — eps OUTSIDE the root.  optax.adagrad's
    rsqrt(acc+eps) diverges up to ~10x on the tiny first-step gradients KG
    init scales produce (init_size 1e-3), and Adagrad is the reference's
    DEFAULT optimizer.  Includes grads at that tiny scale on purpose."""
    from complexhyperbolickge_tpu.train.trainer import make_optimizer

    rng = np.random.default_rng(3)
    w0 = rng.normal(0, 1e-3, (N, D))
    # mix of tiny (init-scale) and O(1) gradients
    grads = np.concatenate(
        [rng.normal(0, 1e-6, (STEPS, N, D)), rng.normal(0, 1.0, (STEPS, N, D))]
    )

    w_t = torch.from_numpy(w0.copy()).requires_grad_(True)
    opt = torch.optim.Adagrad([w_t], lr=LR)
    for g in grads:
        opt.zero_grad()
        w_t.grad = torch.from_numpy(g)
        opt.step()

    tx = make_optimizer("Adagrad", LR)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    # rtol 1e-6: make_optimizer stores the lr as f32 (inject_hyperparams
    # hyperparam_dtype, required for the scan-carried reduce_lr state) —
    # everything else is f64-exact; the eps-inside-the-root bug this test
    # pins was a ~10x (1e1) divergence on the tiny-grad rows
    np.testing.assert_allclose(
        np.asarray(params["w"]), w_t.detach().numpy(), rtol=1e-6
    )
