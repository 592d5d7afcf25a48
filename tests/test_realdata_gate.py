"""Real-dataset MRR parity gate (auto-skipped without the data pickles).

The driver target (BASELINE.md) is WN18RR rank-33 MRR within 0.5 pt of the
reference; this zero-egress image carries no dataset pickles, so the
standing proxy is executed-reference learning parity on structured
synthetic KGs (test_learning_parity.py).  THIS file is the one-command gate
that runs the real comparison the moment data exists:

    ./scripts/mrr_gate.sh          # download (if absent) -> preprocess -> gate

or directly:  python -m pytest tests/test_realdata_gate.py -v -s

Protocol = the published WN18RR FFTRotH best config
(/root/reference/README.md:54 + tuning_fft.sh fixed args): N3 reg 0.0,
Adam lr 3e-4, rank 33, batch 500, neg 100, multi_c, bias learn, valid
every 5, patience 30, max 500 epochs, dtype double (our CLI coerces to
float32 on TPU — inside the 0.5 pt budget).  double_neg note: the
published config passes double_neg=1 but the reference sampler's head
corruption is DEAD CODE (kg_optimizer.py:78-99) — the published numbers
are effectively tail-only, so both legs here train tail-only.

Expected wall-clock (see README): ours ~15-40 min on one v5e chip /
a few hours on CPU; the reference leg ~8-14 h on CPU float64 (its
precision of record) or ~1-2 h on a CUDA GPU.  MRR_GATE_EPOCHS=N shortens
both legs for smoke runs (parity band still applies at equal budgets).
"""

import copy
import os

import numpy as np
import pytest
import torch

DATA_PATH = os.environ.get("DATA_PATH", "data")
WN18RR = os.path.join(DATA_PATH, "WN18RR")
_HAVE_DATA = all(
    os.path.exists(os.path.join(WN18RR, f))
    for f in ("train.pickle", "valid.pickle", "test.pickle", "to_skip.pickle")
)

pytestmark = [
    pytest.mark.realdata,
    pytest.mark.skipif(
        not _HAVE_DATA,
        reason=f"WN18RR pickles not found under {WN18RR} "
               "(run ./scripts/mrr_gate.sh in a data-present environment)",
    ),
]

MAX_EPOCHS = int(os.environ.get("MRR_GATE_EPOCHS", "500"))
PATIENCE, VALID_EVERY = 30, 5
RANK, BATCH, NEG, LR = 33, 500, 100, 3e-4
# Training seed for OUR leg (the reference leg stays torch.manual_seed(0),
# its protocol of record).  Non-zero values exist to measure our stack's
# own training-seed MRR spread — the noise floor the gate's ±0.5-pt band
# must dominate (scripts/rehearsal_ours_leg.py --train_seed).
TRAIN_SEED = int(os.environ.get("MRR_GATE_TRAIN_SEED", "0"))


def _train_ours(tmp_path) -> float:
    from complexhyperbolickge_tpu.cli.run import build_parser, train

    args = build_parser().parse_args([
        "--dataset", "WN18RR", "--data_path", DATA_PATH,
        "--model", "FFTRotH", "--rank", str(RANK),
        "--batch_size", str(BATCH), "--neg_sample_size", str(NEG),
        "--optimizer", "Adam", "--learning_rate", str(LR),
        "--regularizer", "N3", "--reg", "0.0", "--multi_c",
        "--bias", "learn", "--init_size", "0.001", "--gamma", "0.0",
        "--dtype", "double", "--loss", "crossentropy",
        "--max_epochs", str(MAX_EPOCHS), "--patience", str(PATIENCE),
        "--valid", str(VALID_EVERY), "--seed", str(TRAIN_SEED),
        "--save_dir", str(tmp_path / "ours"),
    ])
    return train(args)["test"]["MRR"]


def _train_reference() -> float:
    """The reference stack under its own training protocol (run.py:215-270
    re-driven here because reference HEAD's run.py is GNN-wired,
    kg_optimizer.py:325 — the FFT path is its commented-out wiring)."""
    from tests.reference_loader import load, make_args

    ds_mod = load("datasets.kg_dataset")
    chyp = load("models.complexhyperbolic")
    opt_mod = load("optimizers.kg_optimizer")
    reg_mod = load("optimizers.regularizers")

    dataset = ds_mod.KGDataset(WN18RR, False)
    sizes = dataset.get_shape()
    args = make_args(sizes=sizes, rank=RANK, multi_c=True, bias="learn",
                     dtype="double", init_size=1e-3)
    torch.manual_seed(0)
    model = chyp.FFTRotH(args).double()
    model.lift = True  # the working semantics (SURVEY §2.4.1)
    optim = torch.optim.Adam(model.parameters(), lr=LR)
    optimizer = opt_mod.KGOptimizer(
        model, reg_mod.N3(0.0), optim, BATCH, 1, NEG, False,
        loss="crossentropy", verbose=False,
    )
    train_ex = dataset.get_examples("train")
    valid_ex = dataset.get_examples("valid")
    test_ex = dataset.get_examples("test")
    filters = dataset.get_filters()
    if not isinstance(train_ex, torch.Tensor):
        train_ex = torch.from_numpy(np.asarray(train_ex).astype(np.int64))
        valid_ex = torch.from_numpy(np.asarray(valid_ex).astype(np.int64))
        test_ex = torch.from_numpy(np.asarray(test_ex).astype(np.int64))

    best_mrr, counter, best_state = None, 0, None
    for epoch in range(1, MAX_EPOCHS + 1):
        model.train()
        optimizer.epoch(train_ex)
        if epoch % VALID_EVERY == 0:
            model.eval()
            with torch.no_grad():
                _, mrr, _ = model.compute_metrics(
                    valid_ex, copy.deepcopy(filters), batch_size=500
                )
            valid_mrr = (mrr["lhs"] + mrr["rhs"]) / 2
            # `is None`, not falsy: a legitimate best of 0.0 must not reset
            # the patience counter forever (500 epochs of CPU f64)
            if best_mrr is None or valid_mrr > best_mrr:
                best_mrr, counter = valid_mrr, 0
                best_state = copy.deepcopy(model.state_dict())
            else:
                counter += 1
                if counter >= PATIENCE:
                    break
    if best_state is not None:
        model.load_state_dict(best_state)
    model.eval()
    with torch.no_grad():
        _, mrr, _ = model.compute_metrics(
            test_ex, copy.deepcopy(filters), batch_size=500
        )
    return (mrr["lhs"] + mrr["rhs"]) / 2


def test_wn18rr_fftroth_mrr_parity(tmp_path):
    mrr_ours = _train_ours(tmp_path)
    print(f"\nWN18RR FFTRotH ours: MRR={mrr_ours:.4f}")
    mrr_ref = _train_reference()
    print(f"WN18RR FFTRotH reference: MRR={mrr_ref:.4f}")
    # driver gate: within 0.5 MRR points
    assert abs(mrr_ours - mrr_ref) < 0.005, (mrr_ours, mrr_ref)
    if MAX_EPOCHS >= 500:
        # sanity vs the paper-level band (Chami et al. RotH d=32 ~ 0.472;
        # the FFT paper claims ~1-2 pt over it — BASELINE.md, recalled
        # context, not a hard gate)
        assert mrr_ours > 0.43, mrr_ours
