"""Full-graph CompGCN training throughput on TPU (README row).

WN18RR-scale synthetic graph (40,943 entities, 86,835 train triples ->
~174k edges re-encoded every step with inverses), hidden 200, 2 layers,
batch 1000, 50 negatives — the configuration of the README's full-graph
GNN training row and of the CLAUDE.md ledger's 26.3 ms/step measurement.
One epoch is the production path: a single jitted lax.scan over
static-shape batches (train/trainer.py), the encoder re-run inside every
step (reference contrast: the PyG loader must subsample, SURVEY §3.5).

Reports triples/s over the epoch and ms/step.  Run on the real chip:
    python -m benchmarks.gnn_train_bench
Knobs: GNN_BENCH_BATCHES (default 60: a truncated epoch keeps the run
short; per-step cost is batch-count-independent).
"""
import os
import time

import numpy as np

import jax

from complexhyperbolickge_tpu.data.dataset import epoch_batches, synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

N_ENT, N_REL_RAW, N_TRAIN, B, NEG = 40943, 11, 86835, 1000, 50


class A:
    hidden_dim = 200
    layers = 2
    edge_dropout = 0.0
    dropout = 0.0
    opn = "mult"
    interaction = "distmult"
    basis = 0


def main():
    n_batches = int(os.environ.get("GNN_BENCH_BATCHES", "60"))
    data = synthetic_kg(n_entities=N_ENT, n_relations=N_REL_RAW,
                        n_train=N_TRAIN, n_valid=500, n_test=500, seed=0)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=32,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("CompGCN")(cfg, A, data)

    tcfg = TrainConfig(optimizer="Adam", learning_rate=1e-3, batch_size=B,
                       neg_sample_size=NEG, regularizer="N3", reg=0.0)
    trainer = Trainer(model, tcfg, n_ent, n_rel)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    train = data.get_examples("train")
    rng = np.random.default_rng(0)
    batches, weights, _ = epoch_batches(train, B, rng)
    batches, weights = batches[:n_batches], weights[:n_batches]
    n_triples = int(weights.sum())
    print(f"{batches.shape[0]} steps/epoch x batch {B} "
          f"({2 * model.edge_head.shape[0]} edges re-encoded per step)")

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, opt_state, loss = trainer.run_epoch(
        params, opt_state, batches, weights, key)  # float() fences the epoch
    print(f"cold (compile + 1 epoch): {time.perf_counter() - t0:.1f}s "
          f"loss={loss:.4f}")

    trials = []
    for i in range(3):
        key, ek = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, loss = trainer.run_epoch(
            params, opt_state, batches, weights, ek)
        trials.append(n_triples / (time.perf_counter() - t0))
    med = float(np.median(trials))
    print(f"CompGCN full-graph train (b{B}/neg{NEG}, hidden 200, 2 layers): "
          f"{med:,.0f} triples/s ({B / med * 1e3:.1f} ms/step; trials "
          f"{', '.join(f'{x/1e3:,.1f}k' for x in trials)})")


if __name__ == "__main__":
    main()
