"""GNN eval throughput on TPU (README row): CompGCN filtered ranking.

WN18RR-scale synthetic graph (40,943 entities), hidden 200, 2 layers.
Measures the production eval path: encode ONCE per params version (the
reference's cached forward_base, gnnbase.py:240), then rank query batches
against all entities via the whole-split rank_many scan.  Reports
queries/s with and without the one-time encode amortized.

Run: python -m benchmarks.gnn_eval_bench (real TPU, one process at a time).
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import (EvalPack, dedup_filter_rows,
                                                   synthetic_kg)
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.evaluate import get_ranking, make_ranker

N_ENT, N_REL_RAW, N_TRAIN, B, LMAX, NQ = 40943, 11, 86835, 500, 64, 20000


class A:
    hidden_dim = 200
    layers = 2
    edge_dropout = 0.0
    dropout = 0.0
    opn = "mult"
    interaction = "distmult"
    basis = 0


def main():
    data = synthetic_kg(n_entities=N_ENT, n_relations=N_REL_RAW,
                        n_train=N_TRAIN, n_valid=500, n_test=500, seed=0)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=32,
                      multi_c=True, bias="learn", dtype="float32")

    model = get_model("CompGCN")(cfg, A, data)
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    qs = np.stack([rng.integers(0, n_ent, NQ), rng.integers(0, n_rel, NQ),
                   rng.integers(0, n_ent, NQ)], 1).astype(np.int32)
    fs = rng.integers(0, n_ent, (NQ, LMAX)).astype(np.int32)
    fs[:, -1] = qs[:, 2]
    fs = dedup_filter_rows(fs, n_ent)  # pack contract: rows dedup'd
    pack = EvalPack(queries=qs, filter_idx=fs)

    # EVAL_PRECISION=default opts the decoder sweep into 1-pass bf16 MXU (the
    # distmult decoder is the framework's most MXU-bound eval; f32 'highest'
    # emulation costs ~6x the bf16 form per matmul pass)
    precision = os.environ.get("EVAL_PRECISION", "highest")
    ranker = make_ranker(model, B, precision=precision)
    print(f"precision={precision}")

    # cold: includes the one-time full-graph encode + compile
    t0 = time.perf_counter()
    r = get_ranking(model, params, pack, B, rank_fn=ranker)
    np.asarray(r)
    print(f"cold (compile + encode): {time.perf_counter() - t0:.1f}s")

    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = get_ranking(model, params, pack, B, rank_fn=ranker)
        np.asarray(r)  # force host materialization (tunnel-safe fence)
        trials.append(NQ / (time.perf_counter() - t0))
    print(f"CompGCN filtered ranking ({n_ent} cands, cached encoder): "
          f"{np.median(trials):,.0f} queries/s "
          f"(trials {', '.join(f'{x/1e3:,.0f}k' for x in trials)})")

    # per-params-version cost: fresh params force a re-encode on first batch
    params2 = jax.tree.map(lambda x: x, params)
    t0 = time.perf_counter()
    r = get_ranking(model, params2, pack, B, rank_fn=ranker)
    np.asarray(r)
    dt = time.perf_counter() - t0
    print(f"with one re-encode folded in: {NQ / dt:,.0f} queries/s ({dt:.2f}s)")


if __name__ == "__main__":
    main()
