"""All-entity cross-entropy training step cost (kg_optimizer.py:186-191
shape) at WN18RR scale: b500 x 40,943 entities, FFTRotH rank 33.

Ledger baseline (pre-factored CE): grad 3.8 ms/step, fwd alone 1.5 ms —
bound by the VPU transcendental chain (arccosh + softmax exp/log) over the
(B, N) matrix.  The factored CE (train/losses.py) removes the log-softmax
materialization; this bench reports the value_and_grad step time.

Run on the real TPU: `python -m benchmarks.ce_bench`.
YAGO3-10 scale (r05 verdict item 4 — the (B,N) transcendental chain triples
in N): `CE_BENCH_N_ENT=123182 CE_BENCH_N_REL=74 python -m benchmarks.ce_bench`.
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train import losses as L

N_ENT = int(os.environ.get("CE_BENCH_N_ENT", "40943"))
N_REL = int(os.environ.get("CE_BENCH_N_REL", "22"))
B, RANK = 500, 33


def main():
    cfg = ModelConfig(n_entities=N_ENT, n_relations=N_REL, rank=RANK,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("FFTRotH")(cfg)
    rng = np.random.default_rng(0)
    params = {
        k: jnp.asarray(rng.normal(0, 0.1, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    batch = jnp.asarray(np.stack(
        [rng.integers(0, N_ENT, B), rng.integers(0, N_REL, B),
         rng.integers(0, N_ENT, B)], 1).astype(np.int32))
    weights = jnp.ones((B,), jnp.float32)

    def loss_fn(p):
        loss, _ = L.cross_entropy_loss(model, p, batch, weights, 0.1,
                                       n_entities=N_ENT)
        return loss

    def dense_loss_fn(p):
        # pre-factoring form (r02 shipped this): materialize the (B, N)
        # log-softmax matrix, gather gold, mean for the smoothing term —
        # the A/B baseline the factored cross_entropy_loss replaced
        queries, tails = batch[:, :2], batch[:, 2]
        preds = model.score_all(p, queries)
        logp = jax.nn.log_softmax(preds, axis=-1)
        gold = jnp.take_along_axis(logp, tails[:, None], axis=1)[:, 0]
        eps = 0.1
        nll = -((1 - eps) * gold + eps * jnp.mean(logp, axis=-1))
        return jnp.sum(weights * nll) / jnp.sum(weights)

    def bench(name, fn):
        g = jax.jit(jax.value_and_grad(fn))
        v, grads = g(params)
        print(f"[{name}] warm loss={float(np.asarray(v)):.6f}")
        ts = []
        for _i in range(4):
            t0 = time.perf_counter()
            for _j in range(20):
                v, grads = g(params)
            # host fence on data-dependent outputs (tunnel-safe, CLAUDE.md)
            _ = float(np.asarray(v)) + float(
                np.asarray(grads["entity"]).ravel()[0])
            ts.append((time.perf_counter() - t0) / 20)
        print(f"[{name}] CE value_and_grad: {min(ts) * 1e3:.2f} ms/step "
              f"best, {np.median(ts) * 1e3:.2f} median "
              f"(trials {[f'{t * 1e3:.2f}' for t in ts]}); "
              f"{B / min(ts):,.0f} triples/s at b{B}")
        return min(ts)

    t_fac = bench("factored", loss_fn)
    t_dense = bench("dense-logsoftmax", dense_loss_fn)
    print(f"A/B: dense/factored = {t_dense / t_fac:.3f}x (per-dispatch; "
          "~15 ms tunnel overhead washes this out — trust the trainer-level "
          "A/B below)")

    # --- trainer-level A/B: the BENCH-recorded form (one jitted-scan epoch
    # per dispatch, 120 varied batches -> no per-dispatch tunnel overhead,
    # no loop-invariant hoisting).  Matches bench.py's crossentropy
    # secondary config exactly. ---
    import complexhyperbolickge_tpu.train.losses  # noqa: F401 (L alias)
    from complexhyperbolickge_tpu.data.dataset import epoch_batches
    from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

    n_train = 120 * B
    ex = np.stack(
        [rng.integers(0, N_ENT, n_train), rng.integers(0, N_REL, n_train),
         rng.integers(0, N_ENT, n_train)], axis=1).astype(np.int32)
    bb, ww, _ = epoch_batches(ex, B, rng)
    bb, ww = jnp.asarray(bb), jnp.asarray(ww)
    tcfg = TrainConfig(optimizer="Adam", learning_rate=3e-4, batch_size=B,
                       neg_sample_size=0, regularizer="N3", reg=0.0,
                       loss="crossentropy")

    def dense_ce(mdl, p, batch_, wts, smoothing, n_entities=None):
        q, t = batch_[:, :2], batch_[:, 2]
        preds = mdl.score_all(p, q)
        fct = mdl.get_factors(p, q, None)
        logp = jax.nn.log_softmax(preds, axis=-1)
        gold = jnp.take_along_axis(logp, t[:, None], axis=1)[:, 0]
        eps = 0.0 if smoothing is None else smoothing
        nll = -((1 - eps) * gold + eps * jnp.mean(logp, axis=-1))
        return jnp.sum(wts * nll) / jnp.sum(wts), fct

    def epoch_tps(name):
        tr = Trainer(model, tcfg, N_ENT, N_REL)
        p, opt = tr.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        key, k0 = jax.random.split(key)
        p, opt, loss = tr.run_epoch(p, opt, bb, ww, k0)  # compile epoch
        assert np.isfinite(loss)
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(2):
                key, k = jax.random.split(key)
                p, opt, loss = tr.run_epoch(p, opt, bb, ww, k)
            windows.append(2 * n_train / (time.perf_counter() - t0))
            assert np.isfinite(loss)  # host fence per window
        med = float(np.median(windows))
        print(f"[{name}] trainer CE epoch: {med:,.0f} triples/s "
              f"({1e3 * B / med:.2f} ms/step; windows "
              f"{', '.join(f'{x / 1e3:.0f}k' for x in windows)})")
        return med

    import complexhyperbolickge_tpu.train.trainer as trainer_mod

    tps_fac = epoch_tps("factored")
    orig = trainer_mod.L.cross_entropy_loss
    try:
        trainer_mod.L.cross_entropy_loss = dense_ce
        tps_dense = epoch_tps("dense-logsoftmax")
    finally:
        trainer_mod.L.cross_entropy_loss = orig
    print(f"trainer A/B: factored/dense = {tps_fac / tps_dense:.3f}x "
          "(>1 means factored faster)")


if __name__ == "__main__":
    main()
