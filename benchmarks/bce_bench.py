"""BCE multi-hot training throughput (the reference's KGDataset2 path,
kg_optimizer.py:155-162) at WN18RR shapes: b500 x 40,943 entities.

Measures the factored label-gather bce_loss (train/losses.py) through the
full jitted-scan trainer.  Run on the real TPU: `python -m benchmarks.bce_bench`.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import epoch_batches, synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

N_ENT, B = 40943, 500


def main():
    data = synthetic_kg(n_entities=N_ENT, n_relations=11, n_train=86835,
                        n_valid=500, n_test=500, seed=0)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=33,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("FFTRotH")(cfg)
    tcfg = TrainConfig(optimizer="Adam", learning_rate=3e-4, batch_size=B,
                       neg_sample_size=0, loss="binarycrossentropy",
                       smoothing=0.1)
    tr = Trainer(model, tcfg, n_ent, n_rel)
    params, opt = tr.init(jax.random.PRNGKey(0))

    ex = data.get_examples("train")
    _, lab = data.label_pack("train")
    rng = np.random.default_rng(0)
    b, w, lb = epoch_batches(ex, B, rng, labels=lab)
    b, w, lb = jnp.asarray(b), jnp.asarray(w), jnp.asarray(lb)
    print(f"epoch: {b.shape[0]} steps of {B}, label width {lb.shape[-1]}")

    params, opt, loss = tr.run_epoch(params, opt, b, w, jax.random.PRNGKey(1),
                                     labels=lb)
    print(f"warm loss={float(loss):.6f}")
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt, loss = tr.run_epoch(params, opt, b, w,
                                         jax.random.PRNGKey(2), labels=lb)
        _ = float(np.asarray(loss))  # host fence (tunnel-safe, CLAUDE.md)
        dt = time.perf_counter() - t0
        trials.append(b.shape[0] * B / dt)
    med = np.median(trials)
    print(f"BCE training: {med:,.0f} triples/s "
          f"({1e3 * B / med:.2f} ms/step; "
          f"trials {', '.join(f'{x / 1e3:.0f}k' for x in trials)})")


if __name__ == "__main__":
    main()
