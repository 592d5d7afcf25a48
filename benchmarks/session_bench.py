"""End-to-end session benchmark: the reference's published WN18RR config
(FFTRotH, rank 33, batch 500, neg 100, Adam 3e-4, multi_c, bias=learn) run
for several epochs at true dataset scale (synthetic triples, identical
shapes), with a full filtered evaluation — sustained wall-clock for the
whole train+eval loop on one chip.
"""

import time

import numpy as np

import jax

from complexhyperbolickge_tpu.data.dataset import epoch_batches, synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.evaluate import (
    avg_both,
    compute_metrics,
    make_best_ranker,
)
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

N_ENT, N_RELS, RANK, B, NEG, EPOCHS = 40943, 11, 33, 500, 100, 5


def main():
    data = synthetic_kg(n_entities=N_ENT, n_relations=N_RELS, n_train=86835,
                        n_valid=3034, n_test=3134, seed=0)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=RANK,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("FFTRotH")(cfg)
    tcfg = TrainConfig(optimizer="Adam", learning_rate=3e-4, batch_size=B,
                       neg_sample_size=NEG, regularizer="N3", reg=0.0)
    trainer = Trainer(model, tcfg, n_ent, n_rel)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    ex = data.get_examples("train")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    t_compile = time.perf_counter()
    b, w, _ = epoch_batches(ex, B, rng)
    key, ek = jax.random.split(key)
    params, opt_state, _ = trainer.run_epoch(params, opt_state, b, w, ek)
    print(f"compile + epoch 1: {time.perf_counter() - t_compile:.1f}s")

    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        b, w, _ = epoch_batches(ex, B, rng)
        key, ek = jax.random.split(key)
        params, opt_state, loss = trainer.run_epoch(params, opt_state, b, w, ek)
    # explicit host fence on a data-dependent output: block_until_ready is
    # UNRELIABLE through the axon tunnel (CLAUDE.md) and must not be the
    # only thing standing between the timer and unfinished device work
    loss = float(np.asarray(loss))
    dt = time.perf_counter() - t0
    print(f"train: {EPOCHS} epochs x {len(ex):,} triples in {dt:.2f}s "
          f"= {EPOCHS * len(ex) / dt:,.0f} triples/s (loss {loss:.4f})")

    rank_fn = make_best_ranker(model, B)
    # warm (compile) the eval program outside the timed region — the REAL
    # one: compute_metrics takes the whole-split rank_many scan path, so
    # warming the per-batch program would leave the timed region paying a
    # fresh tunnel compile
    avg_both(compute_metrics(model, params, data, "valid", B,
                             rank_fn=rank_fn))
    t0 = time.perf_counter()
    m = avg_both(compute_metrics(model, params, data, "valid", B,
                                 rank_fn=rank_fn))
    dt = time.perf_counter() - t0
    n_q = 2 * len(data.get_examples("valid"))
    print(f"eval: {n_q:,} filtered queries x {n_ent:,} candidates in "
          f"{dt:.2f}s = {n_q / dt:,.0f} queries/s (MRR {m['MRR']:.4f})")


if __name__ == "__main__":
    main()
