"""Full training-loop parity: N optimizer steps of our compiled trainer vs
the reference model driven by torch.optim, starting from identical weights.

Uses the all-entity CE loss (no negative sampling -> no RNG anywhere), f64,
fixed batch order, SGD.  (Adam/Adagrad normalize by |g|, which turns
sub-ulp f64 gradient differences on noise-level entries into full +/-lr
step divergences — sign-amplification makes strict cross-framework Adam
trajectories unverifiable by construction; plain SGD is linear in g, so
after 5 steps every parameter must agree to ~1e-12.)
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.test_model_parity import N_ENT, N_REL, build_pair

from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

B, STEPS, LR = 8, 5, 1e-2


def test_five_sgd_steps_match_reference():
    ours, params, ref_model = build_pair("FFTRotH", rank=9, seed=3, natural_init=True)
    rng = np.random.default_rng(42)
    batches = rng.integers(0, N_ENT, size=(STEPS, B, 3))
    batches[..., 1] = rng.integers(0, N_REL, size=(STEPS, B))

    # ---- reference: torch SGD over CE loss (kg_optimizer.py:186-191) ----
    ref_model.train()
    opt = torch.optim.SGD(ref_model.parameters(), lr=LR)
    ce = torch.nn.CrossEntropyLoss(reduction="mean")
    ref_losses = []
    for s in range(STEPS):
        tb = torch.from_numpy(batches[s])
        preds, factors = ref_model(tb[:, :2].unsqueeze(1))
        loss = ce(preds, tb[:, 2].unsqueeze(1))
        # N3 with weight 0.05 (regularizers.py:45-57)
        reg = sum(0.05 * torch.sum(torch.abs(f) ** 3) for f in factors)
        loss = loss + reg / factors[0].shape[0]
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    # ---- ours: compiled epoch over the same batches ----
    tcfg = TrainConfig(regularizer="N3", reg=0.05, optimizer="SGD",
                       learning_rate=LR, batch_size=B, neg_sample_size=0,
                       loss="crossentropy")
    trainer = Trainer(ours, tcfg, N_ENT, N_REL)
    opt_state = trainer.tx.init(params)
    weights = np.ones((STEPS, B), np.float32)
    params2, _, mean_loss = trainer.run_epoch(
        params, opt_state, batches.astype(np.int32), weights,
        jax.random.PRNGKey(0),
    )

    np.testing.assert_allclose(mean_loss, np.mean(ref_losses), rtol=1e-9)
    for name in ("entity", "rel", "rel_diag", "bh", "bt", "c"):
        theirs = getattr(ref_model, name).weight.detach().numpy()
        np.testing.assert_allclose(
            np.asarray(params2[name]), theirs, atol=1e-12,
            err_msg=f"param {name} diverged after {STEPS} steps",
        )

    # end-to-end: eval scores from the trained weights still match
    q = rng.integers(0, N_ENT, size=(B, 2))
    q[:, 1] = rng.integers(0, N_REL, size=B)
    with torch.no_grad():
        ref_scores, _ = ref_model(torch.from_numpy(q).unsqueeze(1), None)
    our_scores = ours.score_all(params2, jnp.asarray(q))
    np.testing.assert_allclose(
        np.asarray(our_scores), ref_scores.squeeze(-1).numpy(), atol=1e-9
    )
