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


def train_ours(data, name="FFTRotH", rank=RANK, optimizer="Adam", lr=LR,
               batch=BATCH, epochs=EPOCHS, neg_mode="per_query", seed=0):
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=rank,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model(name)(cfg)
    tcfg = TrainConfig(optimizer=optimizer, learning_rate=lr, batch_size=batch,
                       neg_sample_size=NEG, regularizer="N3", reg=0.0,
                       neg_mode=neg_mode, neg_pool_size=64)
    trainer = Trainer(model, tcfg, n_ent, n_rel)
    params, opt_state = trainer.init(jax.random.PRNGKey(seed))
    ex = data.get_examples("train")
    rng = np.random.default_rng(seed)
    # seed 0 must reproduce the round-2 pinned streams (PRNGKey(1))
    key = jax.random.PRNGKey(seed + 1)
    for _ in range(epochs):
        b, w, _ = epoch_batches(ex, batch, rng)
        key, ek = jax.random.split(key)
        params, opt_state, _ = trainer.run_epoch(params, opt_state, b, w, ek)
    return avg_both(compute_metrics(model, params, data, "test", 64))["MRR"]


def train_reference(data, name="FFTRotH", rank=RANK, optimizer="Adam", lr=LR,
                    batch=BATCH, epochs=EPOCHS, seed=0):
    mod = load(
        "models.complexhyperbolic" if name.startswith("FFT")
        else "models.hyperbolic"
    )
    n_ent, n_rel, _ = data.get_shape()
    args = make_args(sizes=(n_ent, n_rel, n_ent), rank=rank, multi_c=True,
                     bias="learn", dtype="float")
    torch.manual_seed(seed)
    model = getattr(mod, name)(args).float()
    if name.startswith("FFT"):
        model.lift = True  # the working semantics (SURVEY §2.4.1)
    opt_cls = {"Adam": torch.optim.Adam, "Adagrad": torch.optim.Adagrad}
    opt = opt_cls[optimizer](model.parameters(), lr=lr)
    ex = torch.from_numpy(data.get_examples("train").astype(np.int64))
    g = torch.Generator().manual_seed(seed)
    for _ in range(epochs):
        order = torch.randperm(len(ex), generator=g)
        for i in range(0, len(ex), batch):
            b = ex[order[i: i + batch]]
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


# the published model set (reference README.md:54-56: FFTRotH / FFTRefH /
# FFTAttH on WN18RR; RotH is the Chami-et-al predecessor the FFT pipelines
# mirror) — each trained by BOTH stacks on the same KG, MRR within a band
# Per-model recipes chosen so BOTH stacks reach their MRR plateau (mid-
# convergence comparisons just measure RNG-stream divergence): FFTAttH's
# attention warms up slowly, so it gets a lower lr + longer horizon; RotH
# needs an even rank (Givens pairs-of-2, reference utils/euclidean.py:39).
# (FFTRotH, the flagship, gets the tighter 3-seed gate below instead.)
@pytest.mark.parametrize("name,kw", [
    ("FFTAttH", {"lr": 0.02, "epochs": 80}),
    ("RotH", {"rank": 16}),
])
def test_learning_dynamics_match_reference(data, name, kw):
    mrr_ref = train_reference(data, name, **kw)
    mrr_ours = train_ours(data, name, **kw)
    chance = 2.0 / N_ENT
    assert mrr_ref > 5 * chance, f"reference failed to learn: {mrr_ref}"
    assert mrr_ours > 5 * chance, f"ours failed to learn: {mrr_ours}"
    assert abs(mrr_ours - mrr_ref) < 0.10, (name, mrr_ours, mrr_ref)
    print(f"{name}: MRR ours={mrr_ours:.3f} reference={mrr_ref:.3f}")


def test_flagship_multiseed_plateau_parity(data):
    """FFTRotH 3-seed mean plateau MRR, both stacks (round-2 verdict item 8:
    the single-seed ±0.10 band could hide a few-point regression).

    Measured statistics (5 seeds, 2026-08-17): ours 0.88-0.93 (std ~0.017),
    reference 0.82-0.94 (std ~0.05) — the reference's f32 torch training is
    the noisy one, and ours plateaus slightly HIGHER on mean (0.905 vs
    0.873-0.895 depending on seeds).  A two-sided ±0.03 mean band would
    therefore flake on seed choice without any real regression, so the gate
    is ONE-SIDED at 0.03 (our mean must not fall meaningfully below the
    reference's — the direction a regression moves) plus a wide two-sided
    sanity bound; absolute drops of ours are additionally caught by the
    pinned seed-0 regressions below."""
    seeds = (0, 1, 2)
    ours = [train_ours(data, "FFTRotH", seed=s) for s in seeds]
    ref = [train_reference(data, "FFTRotH", seed=s) for s in seeds]
    chance = 2.0 / N_ENT
    assert min(ours) > 5 * chance, ours
    assert min(ref) > 5 * chance, ref
    mo, mr = float(np.mean(ours)), float(np.mean(ref))
    assert mo > mr - 0.03, (ours, ref)  # ours must not regress below ref
    assert abs(mo - mr) < 0.06, (ours, ref)  # wild mismatch either way
    print(f"FFTRotH 3-seed: ours={mo:.3f} ref={mr:.3f}")


# ----------------------- FB237-shaped KG + Adagrad path -----------------------

N_ENT_FB, N_REL_FB = 150, 120  # hundreds of relations, FB237-like shape


@pytest.fixture(scope="module")
def fb_data():
    """Permutation KG with many relations (the FB237 regime: n_rel >> 11;
    exercises per-relation parameters — rel, rel_diag, multi-c — at width)."""
    rng = np.random.default_rng(1)
    offsets = rng.choice(np.arange(1, N_ENT_FB), size=N_REL_FB, replace=False)
    triples = []
    for k, off in enumerate(offsets):
        for i in range(N_ENT_FB):
            triples.append((i, k, (i + int(off)) % N_ENT_FB))
    triples = np.asarray(triples, dtype=np.int64)
    triples = triples[rng.permutation(len(triples))]
    n_test = len(triples) // 8
    splits = {
        "train": triples[2 * n_test:],
        "valid": triples[:n_test],
        "test": triples[n_test: 2 * n_test],
    }
    return KGData(splits=splits, filters=None)


def test_fb_shaped_dynamics_match_reference_adagrad(fb_data):
    """FFTRotH with the FB237 recipe's optimizer family (Adagrad — reference
    README.md:61-62): our MRR within a band of the executed reference's on a
    hundreds-of-relations KG.  Covers the Adagrad trajectory end-to-end,
    which step-level parity cannot (SURVEY: |g|-normalized optimizers turn
    sub-ulp sign flips into full-lr divergences)."""
    # 24 epochs = PLATEAU for both stacks.  Mid-training MRR is NOT
    # comparable under Adagrad: the first-step update is ~lr*sign(g)
    # (acc = g^2, eps tiny), so f32-vs-f64 sub-ulp gradient noise becomes a
    # full-lr divergence immediately (the CLAUDE.md Adam/Adagrad trap) —
    # measured 2026-08-19 (epochs: ref/ours): 8: 0.67/0.78 and 0.20/0.64
    # (seed-33 data), 16: 1.00/0.96 and 0.99/1.00, 24: 1.00/1.00 on both.
    # The old 8-epoch band only held because the pre-fix optax Adagrad
    # (eps inside the root) under-stepped tiny gradients, coincidentally
    # tracking the reference mid-run.
    kw = dict(name="FFTRotH", rank=RANK, optimizer="Adagrad", lr=0.05,
              batch=500, epochs=24)
    mrr_ref = train_reference(fb_data, **kw)
    mrr_ours = train_ours(fb_data, **kw)
    chance = 2.0 / N_ENT_FB
    assert mrr_ref > 5 * chance, f"reference failed to learn: {mrr_ref}"
    assert mrr_ours > 5 * chance, f"ours failed to learn: {mrr_ours}"
    assert abs(mrr_ours - mrr_ref) < 0.03, (mrr_ours, mrr_ref)
    print(f"FB-shaped Adagrad: ours={mrr_ours:.3f} ref={mrr_ref:.3f}")


def test_pool_mode_learns_like_per_query(data):
    """neg_mode='pool' (per-query negatives through a per-step candidate
    pool — the MXU-restructured form of the reference estimator) must reach
    the same MRR plateau as the reference-semantics per_query mode."""
    mrr_pq = train_ours(data, "FFTRotH")
    mrr_pool = train_ours(data, "FFTRotH", neg_mode="pool")
    chance = 2.0 / N_ENT
    assert mrr_pool > 5 * chance, f"pool mode failed to learn: {mrr_pool}"
    assert abs(mrr_pool - mrr_pq) < 0.10, (mrr_pool, mrr_pq)


# --------------------------- pinned MRR regression ----------------------------


def test_pinned_seed0_mrr_regression(data):
    """Exact-config regression gate: FFTRotH, seed 0, 25 epochs on the
    permutation KG must reproduce the pinned MRR (future rounds cannot
    silently regress the learning loop; CPU float32 execution of the same
    program is deterministic to well under the band here)."""
    mrr = train_ours(data, "FFTRotH")
    PINNED = 0.9200  # jax 0.9.0 CPU, recorded 2026-08-16 (round 2)
    assert abs(mrr - PINNED) < 0.02, mrr


def test_pinned_seed0_mrr_regression_fftatth(data):
    """Second pinned model (round-2 verdict item 8): FFTAttH exercises the
    attention softmax + context-vector path the FFTRotH pin does not."""
    mrr = train_ours(data, "FFTAttH", lr=0.02, epochs=80)
    PINNED = 0.9658  # jax 0.9.0 CPU, recorded 2026-08-17 (round 3)
    assert abs(mrr - PINNED) < 0.02, mrr
