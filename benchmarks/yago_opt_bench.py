"""YAGO3-10-scale optimizer race: dense Adam vs SparseAdam vs SGD (r05 #2/#4).

The WN18RR-scale conclusion in the ledger ("SparseAdam loses to dense Adam;
Adam's cost is the dense-moment HBM floor, ~0.074-0.10 ms/step") was measured
on 11.2 MB tables.  At YAGO3-10 (123,182 entities, rank 33 -> ~33 MB entity
table, x2 moments) the dense-moment streaming term grows ~3x against a step
that grows much less, so the trade could shift — this bench measures it
directly instead of extrapolating.

Config: FFTRotH rank 33, multi_c, bias=learn (the published-config shape at
YAGO scale), N3 reg 0.0.  Races each optimizer at:

  pool      b500 / b2000   (production negative-sampling mode, P=512)
  per_query b500 / b2000   (bitwise reference-semantics mode)
  pool      b8000          (scaling ceiling row, Adam only)

SGD runs at pool b500/b2000 as the optimizer-free floor: Adam minus SGD =
the dense-moment update cost at this scale (same decomposition as the
WN18RR pool-step anatomy, docs/PERF_ANALYSIS.md §1).

Method = bench.py's measure(): one jitted-scan epoch per dispatch (120
batches; no per-dispatch tunnel term), epoch 1 compiles, then 3 windows of
2 epochs each, median reported with [min..max]; every window host-fences the
epoch loss.  Run: python -m benchmarks.yago_opt_bench  (real TPU; one TPU
process at a time; ~10 tunnel compiles).
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import epoch_batches
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

N_ENT = int(os.environ.get("YAGO_BENCH_N_ENT", "123182"))
N_REL_RAW = int(os.environ.get("YAGO_BENCH_N_REL", "37"))
RANK, NEG = 33, 100


def main():
    n_rel = 2 * N_REL_RAW
    cfg = ModelConfig(n_entities=N_ENT, n_relations=n_rel, rank=RANK,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("FFTRotH")(cfg)
    rng = np.random.default_rng(0)

    batch_cache = {}

    def batches_for(B):
        if B not in batch_cache:
            n_train = 120 * B
            ex = np.stack(
                [rng.integers(0, N_ENT, n_train),
                 rng.integers(0, n_rel, n_train),
                 rng.integers(0, N_ENT, n_train)], axis=1).astype(np.int32)
            bb, ww, _ = epoch_batches(ex, B, rng)
            batch_cache[B] = (jnp.asarray(bb), jnp.asarray(ww))
        return batch_cache[B]

    def measure(opt, mode, B, n_windows=3):
        bb, ww = batches_for(B)
        tcfg = TrainConfig(
            optimizer=opt, learning_rate=3e-4, batch_size=B,
            neg_sample_size=NEG, regularizer="N3", reg=0.0,
            neg_mode=mode, neg_pool_size=512,
        )
        tr = Trainer(model, tcfg, N_ENT, n_rel)
        params, opt_state = tr.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        key, k0 = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, loss = tr.run_epoch(params, opt_state, bb, ww, k0)
        compile_s = time.perf_counter() - t0
        assert np.isfinite(loss)
        windows = []
        for _ in range(n_windows):
            t0 = time.perf_counter()
            for _ in range(2):
                key, k = jax.random.split(key)
                params, opt_state, loss = tr.run_epoch(
                    params, opt_state, bb, ww, k)
            windows.append(2 * 120 * B / (time.perf_counter() - t0))
            assert np.isfinite(loss)  # host fence per window
        med = float(np.median(windows))
        print(f"[{mode:>9} b{B:<5} {opt:<10}] {med:>11,.0f} triples/s "
              f"({1e3 * B / med:6.3f} ms/step)  "
              f"[{min(windows) / 1e3:,.0f}k..{max(windows) / 1e3:,.0f}k]  "
              f"(compile {compile_s:.0f}s)", flush=True)
        return med, 1e3 * B / med

    results = {}
    for mode, B in (("pool", 500), ("pool", 2000),
                    ("per_query", 500), ("per_query", 2000)):
        for opt in ("Adam", "SparseAdam"):
            results[(mode, B, opt)] = measure(opt, mode, B)
    for B in (500, 2000):
        results[("pool", B, "SGD")] = measure("SGD", "pool", B)
    results[("pool", 8000, "Adam")] = measure("Adam", "pool", 8000)

    print("\n--- step anatomy at YAGO scale ---")
    for B in (500, 2000):
        adam_ms = results[("pool", B, "Adam")][1]
        sgd_ms = results[("pool", B, "SGD")][1]
        sp_ms = results[("pool", B, "SparseAdam")][1]
        print(f"pool b{B}: Adam {adam_ms:.3f} ms, SGD {sgd_ms:.3f} ms "
              f"-> dense-moment cost {adam_ms - sgd_ms:.3f} ms "
              f"({100 * (adam_ms - sgd_ms) / adam_ms:.0f}% of step); "
              f"SparseAdam {sp_ms:.3f} ms "
              f"({sp_ms / adam_ms:.2f}x Adam)")
    for mode, B in (("per_query", 500), ("per_query", 2000)):
        adam_ms = results[(mode, B, "Adam")][1]
        sp_ms = results[(mode, B, "SparseAdam")][1]
        print(f"{mode} b{B}: Adam {adam_ms:.3f} ms, SparseAdam {sp_ms:.3f} ms "
              f"({sp_ms / adam_ms:.2f}x Adam)")


if __name__ == "__main__":
    main()
