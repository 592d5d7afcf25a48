"""Filtered-MRR delta: dense vs masked-Pallas vs maskless rankers (r05 #3).

The `--eval_backend auto` policy keeps the exact dense ranker everywhere,
giving up the maskless subtract-filtered kernel's measured 1.35-1.38x
whole-split win at YAGO scale on a *rank-tie count* argument.  This bench
settles the policy with the end metric itself: it briefly TRAINS FFTRotH at
WN18RR and YAGO-3-10 scales (pool mode, enough epochs that scores are
spread like a real checkpoint's, not random-init), builds a filtered eval
pack, and computes full filtered MRR under all three backends on-chip.

Decision rule (VERDICT r04 item 3): if |MRR(maskless) - MRR(dense)| is
bounded by the masked-vs-dense noise class (the tie-rounding band the
default already accepts), flip `auto` to maskless at YAGO scale; else
record the measured delta as the reason it stays opt-in.

Run: python -m benchmarks.eval_mrr_delta   (real TPU; one process at a
time; 2 scales x (1 train + 3 rank compiles)).  EVAL_MRR_NQ / EVAL_MRR_
EPOCHS override the defaults.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import (EvalPack, dedup_filter_rows,
                                                   epoch_batches)
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.evaluate import get_ranking, make_best_ranker
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

NQ = int(os.environ.get("EVAL_MRR_NQ", "5000"))
EPOCHS = int(os.environ.get("EVAL_MRR_EPOCHS", "10"))
B, RANK, LMAX = 500, 33, 64
SCALES = (("WN18RR", 40943, 22), ("YAGO3-10", 123182, 74))


def trained_params(model, n_ent, n_rel, rng):
    tcfg = TrainConfig(optimizer="Adam", learning_rate=3e-4, batch_size=B,
                       neg_sample_size=100, regularizer="N3", reg=0.0,
                       neg_mode="pool", neg_pool_size=512)
    tr = Trainer(model, tcfg, n_ent, n_rel)
    params, opt_state = tr.init(jax.random.PRNGKey(0))
    n_train = 120 * B
    ex = np.stack([rng.integers(0, n_ent, n_train),
                   rng.integers(0, n_rel, n_train),
                   rng.integers(0, n_ent, n_train)], 1).astype(np.int32)
    bb, ww, _ = epoch_batches(ex, B, rng)
    bb, ww = jnp.asarray(bb), jnp.asarray(ww)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        key, k = jax.random.split(key)
        params, opt_state, loss = tr.run_epoch(params, opt_state, bb, ww, k)
    print(f"  trained {EPOCHS} epochs ({time.perf_counter() - t0:.0f}s, "
          f"final loss {loss:.4f})", flush=True)
    return params


def main():
    for name, n_ent, n_rel in SCALES:
        print(f"\n=== {name}: {n_ent:,} entities ===", flush=True)
        rng = np.random.default_rng(0)
        cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=RANK,
                          multi_c=True, bias="learn", dtype="float32")
        model = get_model("FFTRotH")(cfg)
        params = trained_params(model, n_ent, n_rel, rng)

        qs = np.stack([rng.integers(0, n_ent, NQ),
                       rng.integers(0, n_rel, NQ),
                       rng.integers(0, n_ent, NQ)], 1).astype(np.int32)
        fs = rng.integers(0, n_ent, (NQ, LMAX)).astype(np.int32)
        fs[:, -1] = qs[:, 2]  # gold always filtered (eval-pack contract)
        fs = dedup_filter_rows(fs, n_ent)
        pack = EvalPack(queries=qs, filter_idx=fs)

        ranks = {}
        for backend in ("dense", "pallas", "pallas_maskless"):
            fn = make_best_ranker(model, B, backend)
            t0 = time.perf_counter()
            ranks[backend] = get_ranking(model, params, pack, B, rank_fn=fn)
            print(f"  {backend:>16}: MRR "
                  f"{float(np.mean(1.0 / ranks[backend])):.8f}  "
                  f"({time.perf_counter() - t0:.0f}s incl. compile)",
                  flush=True)

        d = ranks["dense"].astype(np.int64)
        mrr_d = float(np.mean(1.0 / d))
        print(f"  --- vs dense (MRR {mrr_d:.8f}) ---")
        for backend in ("pallas", "pallas_maskless"):
            r = ranks[backend].astype(np.int64)
            diff = r - d
            nd = int(np.count_nonzero(diff))
            mrr = float(np.mean(1.0 / r))
            print(f"  {backend:>16}: dMRR {mrr - mrr_d:+.2e}  "
                  f"rank diffs {nd}/{NQ} (max |d| "
                  f"{int(np.max(np.abs(diff))) if nd else 0})")


if __name__ == "__main__":
    main()
