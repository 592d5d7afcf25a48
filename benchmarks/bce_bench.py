"""BCE multi-hot training throughput (the reference's KGDataset2 path,
kg_optimizer.py:155-162) at WN18RR shapes: b500 x 40,943 entities.

Measures the production dense multi-hot bce_loss (train/losses.py) through
the full jitted-scan trainer, then A/Bs it against the r03 factored
label-gather form it replaced.  Run on the real TPU:
`python -m benchmarks.bce_bench`.
YAGO3-10 scale (r05 verdict item 4): `BCE_BENCH_N_ENT=123182
BCE_BENCH_N_REL=37 python -m benchmarks.bce_bench`.
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import epoch_batches, synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

N_ENT = int(os.environ.get("BCE_BENCH_N_ENT", "40943"))
N_REL_RAW = int(os.environ.get("BCE_BENCH_N_REL", "11"))
B = 500


def main():
    data = synthetic_kg(n_entities=N_ENT, n_relations=N_REL_RAW,
                        n_train=86835, n_valid=500, n_test=500, seed=0)
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

    # --- trainer-level A/B: production dense multi-hot (shared softplus)
    # vs the r03 factored label-GATHER form it replaced (measured 2026-08-19:
    # factored 105k vs dense-two-softplus 119k t/s — the gather lost; the
    # production form keeps the dense scatter AND the single softplus pass).
    # Trainer level = one jitted-scan epoch per dispatch; per-dispatch v&g
    # readings carry ~15 ms of variable tunnel overhead and are not decisive.
    def factored_bce(mdl, p, batch_, wts, label_idx, n_entities, smoothing):
        queries = batch_[:, :2]
        preds = mdl.score_all(p, queries)
        fct = mdl.get_factors(p, queries, None)
        eps = 0.0 if smoothing is None else smoothing
        ls = jax.nn.log_sigmoid(preds)
        log_p = jnp.maximum(ls, -100.0)
        log_1mp = jnp.maximum(ls - preds, -100.0)
        dense = -((eps / n_entities) * log_p
                  + (1.0 - eps / n_entities) * log_1mp)
        wcol = wts[:, None]
        total = jnp.sum(wcol * dense)
        lab_ok = (label_idx < n_entities).astype(preds.dtype)
        idx = jnp.minimum(label_idx, preds.shape[-1] - 1)
        bump = jnp.take_along_axis(log_p - log_1mp, idx, axis=1)
        total = total - (1.0 - eps) * jnp.sum(wcol * lab_ok * bump)
        return total / (jnp.sum(wts) * n_entities), fct

    def epoch_tps(name):
        tr2 = Trainer(model, tcfg, n_ent, n_rel)
        p, opt = tr2.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        p, opt, loss = tr2.run_epoch(p, opt, b, w, key, labels=lb)  # compile
        assert np.isfinite(loss)
        windows = []
        for i in range(3):
            t0 = time.perf_counter()
            p, opt, loss = tr2.run_epoch(p, opt, b, w,
                                         jax.random.PRNGKey(2 + i), labels=lb)
            windows.append(b.shape[0] * B / (time.perf_counter() - t0))
            assert np.isfinite(loss)  # host fence per window
        med = float(np.median(windows))
        print(f"[{name}] trainer BCE epoch: {med:,.0f} triples/s "
              f"({1e3 * B / med:.2f} ms/step; windows "
              f"{', '.join(f'{x / 1e3:.0f}k' for x in windows)})")
        return med

    import complexhyperbolickge_tpu.train.trainer as trainer_mod

    tps_dense = epoch_tps("dense-multihot (production)")
    orig = trainer_mod.L.bce_loss
    try:
        trainer_mod.L.bce_loss = factored_bce
        tps_fac = epoch_tps("factored-gather (r03 form)")
    finally:
        trainer_mod.L.bce_loss = orig
    print(f"trainer A/B: dense/factored = {tps_dense / tps_fac:.3f}x "
          "(>1 means the production dense form is faster)")


if __name__ == "__main__":
    main()
