"""Subgraph-mode CompGCN training throughput on TPU (README row).

WN18RR-scale synthetic graph, batch 500 seed edges, fanouts (20,20),
max_nodes 4096: the C++ neighbor sampler + vectorized label build run on a
background producer thread (train/subgraph.py) while the device steps.
Run: python -m benchmarks.subgraph_bench (real TPU, one process at a time).
"""
import time
import numpy as np
import jax

from complexhyperbolickge_tpu.data.dataset import synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.subgraph import SubgraphTrainer
from complexhyperbolickge_tpu.train.trainer import TrainConfig

N_ENT, N_REL_RAW, N_TRAIN, BATCH = 40943, 11, 86835, 500


class A:
    hidden_dim = 200
    layers = 2
    edge_dropout = 0.1
    dropout = 0.1
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
    tcfg = TrainConfig(optimizer="Adam", learning_rate=1e-3, batch_size=BATCH,
                       neg_sample_size=0, loss="crossentropy",
                       regularizer="N3", reg=0.0)
    tr = SubgraphTrainer(model, tcfg, data)
    params, opt_state = tr.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    n_triples = len(data.get_examples("train"))
    # epoch 1 compiles
    key, k = jax.random.split(key)
    t0 = time.perf_counter()
    params, opt_state, loss = tr.run_epoch(params, opt_state, BATCH,
                                           np.random.default_rng(0), k,
                                           epoch_id=0)
    print(f"epoch1 (compile): {time.perf_counter()-t0:.1f}s loss={loss:.4f}")
    for e in (1, 2):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, loss = tr.run_epoch(params, opt_state, BATCH,
                                               np.random.default_rng(e), k,
                                               epoch_id=e)
        dt = time.perf_counter() - t0
        print(f"epoch{e+1}: {dt:.1f}s  {n_triples/dt:,.0f} triples/s  "
              f"loss={loss:.4f}")


if __name__ == "__main__":
    main()
