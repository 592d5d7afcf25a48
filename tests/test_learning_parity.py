"""Learning-dynamics validation: our compiled trainer and the reference
PyTorch stack train FFTRotH on the same structured synthetic KG (permutation
relations — perfectly learnable) with the same config, and must reach
statistically matching filtered MRR far above chance.

This is the offline proxy for the WN18RR-parity gate (the real datasets are
not fetchable in this zero-egress image): it validates the end-to-end
learning loop — negative-sampling loss, Adam, scoring geometry, and the
filtered eval protocol — not just static score parity.
"""

import copy

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_loader import load, make_args

from complexhyperbolickge_tpu.data.dataset import KGData, epoch_batches
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.evaluate import avg_both, compute_metrics
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

N_ENT, N_REL_RAW = 120, 4
RANK, BATCH, NEG, LR, EPOCHS = 9, 100, 50, 5e-2, 25


def structured_kg(seed=0):
    """Permutation relations: r_k maps entity i -> (i + off_k) mod N."""
    rng = np.random.default_rng(seed)
    offsets = [1, 7, 23, 45]
    triples = []
    for k, off in enumerate(offsets):
        for i in range(N_ENT):
            triples.append((i, k, (i + off) % N_ENT))
    triples = np.asarray(triples, dtype=np.int64)
    perm = rng.permutation(len(triples))
    triples = triples[perm]
    n_test = len(triples) // 6
    splits = {
        "train": triples[2 * n_test:],
        "valid": triples[:n_test],
        "test": triples[n_test: 2 * n_test],
    }
    return KGData(splits=splits, filters=None)


@pytest.fixture(scope="module")
def data():
    return structured_kg()


def train_ours(data):
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=RANK,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("FFTRotH")(cfg)
    tcfg = TrainConfig(optimizer="Adam", learning_rate=LR, batch_size=BATCH,
                       neg_sample_size=NEG, regularizer="N3", reg=0.0)
    trainer = Trainer(model, tcfg, n_ent, n_rel)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    ex = data.get_examples("train")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    for _ in range(EPOCHS):
        b, w, _ = epoch_batches(ex, BATCH, rng)
        key, ek = jax.random.split(key)
        params, opt_state, _ = trainer.run_epoch(params, opt_state, b, w, ek)
    return avg_both(compute_metrics(model, params, data, "test", 64))["MRR"]


def train_reference(data):
    chyp = load("models.complexhyperbolic")
    n_ent, n_rel, _ = data.get_shape()
    args = make_args(sizes=(n_ent, n_rel, n_ent), rank=RANK, multi_c=True,
                     bias="learn", dtype="float")
    torch.manual_seed(0)
    model = chyp.FFTRotH(args).float()
    model.lift = True  # the working semantics (SURVEY §2.4.1)
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    ex = torch.from_numpy(data.get_examples("train").astype(np.int64))
    g = torch.Generator().manual_seed(0)
    for _ in range(EPOCHS):
        order = torch.randperm(len(ex), generator=g)
        for i in range(0, len(ex), BATCH):
            b = ex[order[i: i + BATCH]]
            pos, _ = model(b[:, :2].unsqueeze(1), b[:, 2].unsqueeze(1))
            negs = torch.randint(0, n_ent - 1, (b.shape[0], NEG), generator=g)
            negs = torch.where(negs < b[:, 2].unsqueeze(-1), negs, negs + 1)
            neg, _ = model(b[:, :2].unsqueeze(1), negs)
            loss = -torch.cat([
                torch.nn.functional.logsigmoid(pos).reshape(-1),
                torch.nn.functional.logsigmoid(-neg).reshape(-1),
            ]).mean()
            opt.zero_grad()
            loss.backward()
            opt.step()
    model.eval()
    filters = copy.deepcopy(data.get_filters())
    test = torch.from_numpy(data.get_examples("test").astype(np.int64))
    mr, mrr, hits = model.compute_metrics(test, filters, batch_size=64)
    return (mrr["lhs"] + mrr["rhs"]) / 2


# TransE is excluded: translations in a random embedding space cannot
# represent arbitrary permutation relations (plateaus ~2x chance at any
# epoch budget — a model-capacity fact, not a gradient bug).
@pytest.mark.parametrize("name,rank", [
    ("RotH", 16), ("AttH", 16), ("ComplEx", 16), ("RotE", 16),
    ("FFTRefH", 9), ("FFTAttH", 9), ("RotLH", 16),
])
def test_families_learn_structured_kg(data, name, rank):
    """Every family must beat chance by a wide margin on the permutation KG
    (guards against silent gradient freezes like the clamped-chyp-distance
    one this suite caught)."""
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=rank,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model(name)(cfg)
    tcfg = TrainConfig(optimizer="Adam", learning_rate=LR, batch_size=BATCH,
                       neg_sample_size=NEG, regularizer="N3", reg=0.0)
    trainer = Trainer(model, tcfg, n_ent, n_rel)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    ex = data.get_examples("train")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    for _ in range(EPOCHS):
        b, w, _ = epoch_batches(ex, BATCH, rng)
        key, ek = jax.random.split(key)
        params, opt_state, _ = trainer.run_epoch(params, opt_state, b, w, ek)
    mrr = avg_both(compute_metrics(model, params, data, "test", 64))["MRR"]
    assert mrr > 5 * (2.0 / N_ENT), f"{name} failed to learn: MRR {mrr:.4f}"


def test_learning_dynamics_match_reference(data):
    mrr_ref = train_reference(data)
    mrr_ours = train_ours(data)
    chance = 2.0 / N_ENT
    assert mrr_ref > 5 * chance, f"reference failed to learn: {mrr_ref}"
    assert mrr_ours > 5 * chance, f"ours failed to learn: {mrr_ours}"
    assert abs(mrr_ours - mrr_ref) < 0.10, (mrr_ours, mrr_ref)
    print(f"MRR ours={mrr_ours:.3f} reference={mrr_ref:.3f}")
