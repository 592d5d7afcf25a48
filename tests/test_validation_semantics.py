"""Validation-semantics parity (round-2 verdict items 3 and 9).

Covers the divergences flagged in round 1:
  * BCE valid loss must use labels built from train+valid facts (reference
    KGDataset2.valid_filter, kg_dataset.py:75-130, consumed by
    KGOptimizer.calculate_valid_loss's (examples, labels) branch,
    kg_optimizer.py:221-236) — not fall through to the labelless branch.
  * GNN validation must encode with dropout OFF (reference model.eval()
    before calculate_valid_loss, run.py:223).
  * Validation keys derive from (seed, epoch) so --resume reproduces the
    exact trajectory a continuous run would produce.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from complexhyperbolickge_tpu.data.dataset import (
    KGData,
    epoch_batches,
    synthetic_kg,
)
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train import losses as L
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

from tests.reference_loader import load, make_args

N_ENT, N_REL = 30, 3


@pytest.fixture(scope="module")
def data():
    return synthetic_kg(n_entities=N_ENT, n_relations=N_REL, n_train=200,
                        n_valid=40, n_test=40, seed=7)


# ------------------------- label_pack vs KGDataset2 --------------------------


def _write_reference_pickles(data, tmp_path):
    import pickle

    for s in ("train", "valid", "test"):
        with open(tmp_path / f"{s}.pickle", "wb") as f:
            pickle.dump(data.data[s].astype(np.int64), f)
    with open(tmp_path / "to_skip.pickle", "wb") as f:
        pickle.dump(data.to_skip, f)


@pytest.mark.parametrize("split", ["train", "valid"])
def test_label_pack_matches_reference_kgdataset2(data, tmp_path, split):
    """Our padded label pack, densified, must equal the reference
    KGDataset2's CSR label matrix row-for-row (train labels from train facts;
    valid labels from train+valid facts — kg_dataset.py:75-130)."""
    _write_reference_pickles(data, tmp_path)
    ref_ds_mod = load("datasets.kg_dataset")
    ref = ref_ds_mod.KGDataset2(str(tmp_path), False)
    ref_ex, ref_labels = ref.get_examples(split)

    rows, lab = data.label_pack(split)
    np.testing.assert_array_equal(rows.astype(np.int64), np.asarray(ref_ex))
    ours_dense = np.asarray(
        L.dense_labels(jnp.asarray(lab), N_ENT, jnp.float64)
    )
    np.testing.assert_array_equal(ours_dense, ref_labels.toarray())


@pytest.mark.parametrize("split", ["train", "valid"])
def test_label_pack_debug_mode_keeps_gold_tails(split):
    """Debug mode truncates QUERY rows only — label sources stay complete
    (reference builds train/valid filters from the full splits in the
    constructor, kg_dataset.py:77-85).  Regression: source truncation made
    valid-split --debug BCE rows lose even their own gold tail."""
    base = synthetic_kg(n_entities=60, n_relations=4, n_train=2000,
                        n_valid=50, n_test=50, seed=11)
    dbg = KGData(splits={s: base.data[s] for s in ("train", "valid", "test")},
                 filters=base.to_skip, debug=True)
    rows, lab = dbg.label_pack(split)
    assert len(rows) <= 1000
    gold_present = (lab == rows[:, 2:3]).any(axis=1)
    assert gold_present.all(), (
        f"{(~gold_present).sum()}/{len(rows)} debug {split} rows lost their "
        "gold tail from the label lists"
    )


# -------------------- BCE valid loss vs calculate_valid_loss -----------------


def test_bce_valid_loss_matches_reference(data, tmp_path):
    """Trainer.valid_loss with the valid label pack == the reference
    calculate_valid_loss (examples, labels) branch executed batch-by-batch
    (kg_optimizer.py:221-236: mean over per-batch BCE losses, ragged final
    batch included)."""
    _write_reference_pickles(data, tmp_path)
    ref_ds_mod = load("datasets.kg_dataset")
    ref_chyp = load("models.complexhyperbolic")

    torch.manual_seed(0)
    args = make_args(sizes=(N_ENT, 2 * N_REL, N_ENT), rank=5)
    ref_model = ref_chyp.FFTRotH(args)
    ref_model.lift = True
    ref_model = ref_model.double()

    cfg = ModelConfig(n_entities=N_ENT, n_relations=2 * N_REL, rank=5,
                      multi_c=True, bias="learn", dtype="float64")
    ours = get_model("FFTRotH")(cfg)
    params = ours.init(jax.random.PRNGKey(0))
    # inject identical weights into the reference model
    with torch.no_grad():
        ref_model.entity.weight.copy_(
            torch.from_numpy(np.array(params["entity"], copy=True)))
        ref_model.rel.weight.copy_(
            torch.from_numpy(np.array(params["rel"], copy=True)))
        ref_model.rel_diag.weight.copy_(
            torch.from_numpy(np.array(params["rel_diag"], copy=True)))
        ref_model.c.weight.copy_(
            torch.from_numpy(np.array(params["c"], copy=True)))
        ref_model.bh.weight.copy_(
            torch.from_numpy(np.array(params["bh"], copy=True)))
        ref_model.bt.weight.copy_(
            torch.from_numpy(np.array(params["bt"], copy=True)))

    ref = ref_ds_mod.KGDataset2(str(tmp_path), False)
    ref_ex, ref_labels = ref.get_examples("valid")

    batch_size = 16  # 40 valid rows -> ragged final batch of 8
    bce = torch.nn.BCELoss(reduction="mean")
    ref_losses = []
    with torch.no_grad():
        for b0 in range(0, len(ref_ex), batch_size):
            xb = torch.from_numpy(np.asarray(ref_ex[b0:b0 + batch_size]))
            yb = torch.from_numpy(
                ref_labels[b0:b0 + batch_size].toarray()
            ).unsqueeze(-1)
            preds, _ = ref_model(xb[:, :2].unsqueeze(1))
            ref_losses.append(float(bce(preds.sigmoid(), yb)))
    ref_valid = float(np.mean(ref_losses))

    tcfg = TrainConfig(neg_sample_size=0, loss="binarycrossentropy", reg=0.0,
                       batch_size=batch_size)
    trainer = Trainer(ours, tcfg, N_ENT, 2 * N_REL)
    _, vlab = data.label_pack("valid")
    vb, vw, vl = epoch_batches(data.get_examples("valid"), batch_size, None,
                               vlab)
    our_valid = trainer.valid_loss(params, vb, vw, jax.random.PRNGKey(1),
                                   labels=vl)
    np.testing.assert_allclose(our_valid, ref_valid, rtol=1e-9)


# ------------------------- GNN eval-mode validation --------------------------


class _GnnArgs:
    hidden_dim = 8
    layers = 2
    edge_dropout = 0.5  # large so train-mode noise would be unmissable
    dropout = 0.4
    opn = "mult"
    interaction = "distmult"
    basis = 0


def test_gnn_valid_loss_is_deterministic_and_dropout_free(data):
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, dtype="float32")
    model = get_model("CompGCN")(cfg, _GnnArgs(), data)
    params = model.init(jax.random.PRNGKey(0))
    tcfg = TrainConfig(learning_rate=0.01, batch_size=32, neg_sample_size=4)
    trainer = Trainer(model, tcfg, n_ent, n_rel)

    ex = data.get_examples("valid")
    vb, vw, _ = epoch_batches(ex, 32, None)
    # same key -> same loss is trivial; different ENCODER keys must also give
    # the same loss because validation encodes with dropout off.  The neg
    # sampler inside the valid loss uses the key too, so fix it by comparing
    # across keys that only differ in the fold the encoder consumes: run
    # twice with the same key but assert against a no-dropout model config.
    l1 = trainer.valid_loss(params, vb, vw, jax.random.PRNGKey(3))

    class NoDropArgs(_GnnArgs):
        edge_dropout = 0.0
        dropout = 0.0

    model_nd = get_model("CompGCN")(cfg, NoDropArgs(), data)
    trainer_nd = Trainer(model_nd, tcfg, n_ent, n_rel)
    l2 = trainer_nd.valid_loss(params, vb, vw, jax.random.PRNGKey(3))
    # dropout rates are irrelevant in eval mode -> identical losses
    np.testing.assert_allclose(l1, l2, rtol=1e-6)

    # sanity: the TRAINING loss with dropout differs from the no-dropout one
    key = jax.random.PRNGKey(4)
    t1 = trainer._loss(params, jnp.asarray(vb[0]), jnp.asarray(vw[0]), None,
                       key, training=True)
    t2 = trainer_nd._loss(params, jnp.asarray(vb[0]), jnp.asarray(vw[0]),
                          None, key, training=True)
    assert float(t1) != float(t2)


# ----------------------------- resume determinism ----------------------------


def test_resume_reproduces_continuous_run(tmp_path):
    """A run interrupted at epoch 2 and resumed to epoch 4 must produce the
    same final metrics as an uninterrupted 4-epoch run (epoch-derived keys +
    shuffles; round-1 verdict item 9)."""
    from complexhyperbolickge_tpu.cli.run import build_parser, train

    def run_args(save_dir, max_epochs, resume=False):
        argv = [
            "--dataset", "synthetic", "--model", "RotE", "--rank", "6",
            "--max_epochs", str(max_epochs), "--valid", "1",
            "--patience", "50", "--batch_size", "64",
            "--eval_batch_size", "64", "--neg_sample_size", "4",
            "--optimizer", "Adam", "--learning_rate", "0.01",
            "--bias", "learn", "--dtype", "float32",
            "--save_dir", str(save_dir), "--seed", "11",
        ]
        if resume:
            argv.append("--resume")
        return build_parser().parse_args(argv)

    d1, d2 = tmp_path / "full", tmp_path / "split"
    out_full = train(run_args(d1, 4))
    train(run_args(d2, 2))
    out_resumed = train(run_args(d2, 4, resume=True))

    assert out_full["valid"] == out_resumed["valid"]
    assert out_full["test"] == out_resumed["test"]
