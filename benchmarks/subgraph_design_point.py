"""Subgraph mode at its design point: full-graph encoder > HBM (r05 item 6).

Subgraph training (train/subgraph.py, reference kg_optimizer.py:319-431) is
2-4x slower than full-graph at WN18RR scale and exists ONLY for graphs whose
full-graph encoder does not fit in HBM.  This bench demonstrates that design
point on the real chip instead of asserting it:

1. Builds a synthetic KG at N=2,000,000 entities / 8M train triples (16M
   directed edges with inverses), CompGCN hidden 200, 2 layers.  The
   full-graph encoder must materialize (16M, 200) f32 per-edge message
   buffers (~12.8 GB EACH, several live at once through fwd+bwd) against
   16 GB of v5e HBM.
2. AOT-compiles the full-graph train epoch via `Trainer._epoch_fn.lower(...)
   .compile()` on abstract ShapeDtypeStructs — TPU buffer assignment is
   static, so the impossibility surfaces as a clean compile-time
   RESOURCE_EXHAUSTED ("ran out of memory in memory space hbm"), no device
   run, no tunnel wedge, nothing allocated.
3. Runs REAL subgraph-mode training steps at the SAME scale (max_nodes 4096,
   fanouts 20/20; tables+moments ~6.5 GB — fits) to a finite loss, and
   records the throughput.

Run: python -m benchmarks.subgraph_design_point   (real TPU; one process
at a time; ~2 compiles).  The expected outcome is printed as PASS/FAIL per
leg — leg 2 PASSES by *failing to compile*.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.subgraph import SubgraphTrainer
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

N_ENT = int(os.environ.get("DESIGN_POINT_N_ENT", "2000000"))
N_TRAIN = int(os.environ.get("DESIGN_POINT_N_TRAIN", "8000000"))
N_REL_RAW, B = 11, 500
N_STEPS = 30  # timed subgraph steps (per-step cost is epoch-length-free)


class A:
    hidden_dim = 200
    layers = 2
    edge_dropout = 0.0
    dropout = 0.0
    opn = "mult"
    interaction = "distmult"
    basis = 0


def main():
    t0 = time.perf_counter()
    data = synthetic_kg(n_entities=N_ENT, n_relations=N_REL_RAW,
                        n_train=N_TRAIN, n_valid=500, n_test=500, seed=0)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=32,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("CompGCN")(cfg, A, data)
    print(f"graph built: {n_ent:,} nodes, {2 * N_TRAIN:,} directed edges "
          f"({time.perf_counter() - t0:.0f}s host)", flush=True)

    # ---- leg 1: full-graph epoch CANNOT compile (HBM) --------------------
    tcfg = TrainConfig(optimizer="Adam", learning_rate=1e-3, batch_size=B,
                       neg_sample_size=0, loss="crossentropy",
                       regularizer="N3", reg=0.0)
    tr = Trainer(model, tcfg, n_ent, n_rel)
    params_s = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    opt_s = jax.eval_shape(tr.tx.init, params_s)
    bb_s = jax.ShapeDtypeStruct((1, B, 3), jnp.int32)
    ww_s = jax.ShapeDtypeStruct((1, B), jnp.float32)
    key = jax.random.PRNGKey(0)
    if os.environ.get("DESIGN_POINT_SKIP_FULLGRAPH") == "1":
        _run_subgraph_leg(model, tcfg, data)  # CPU dry-run hook
        return
    t0 = time.perf_counter()
    try:
        tr._epoch_fn.lower(params_s, opt_s, bb_s, ww_s, None, key).compile()
    except Exception as e:  # expected: XlaRuntimeError RESOURCE_EXHAUSTED
        msg = str(e)
        oom = ("RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()
               or "hbm" in msg.lower())
        print(f"full-graph compile: REJECTED after "
              f"{time.perf_counter() - t0:.0f}s "
              f"({'HBM exhaustion — PASS' if oom else 'UNEXPECTED ERROR'})")
        print("  " + msg.splitlines()[0][:200], flush=True)
        if not oom:
            raise
    else:
        print("full-graph compile: SUCCEEDED — design point NOT demonstrated "
              "at this scale (FAIL; grow N/E)")
        return

    # ---- leg 2: subgraph mode at the SAME scale trains ------------------
    _run_subgraph_leg(model, tcfg, data)


def _run_subgraph_leg(model, tcfg, data):
    st = SubgraphTrainer(model, tcfg, data)
    params, opt_state = st.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    it = st.sampler.epoch(B, rng, seed_base=0)
    sub = next(it)
    host = st._prep_host(sub)
    t0 = time.perf_counter()
    params, opt_state, loss = st._step(params, opt_state, *host, key)
    print(f"subgraph step compile: {time.perf_counter() - t0:.0f}s "
          f"loss={float(loss):.4f}", flush=True)
    losses = []
    t0 = time.perf_counter()
    for i in range(N_STEPS):
        sub = next(it)
        host = st._prep_host(sub)
        key, k = jax.random.split(key)
        params, opt_state, loss = st._step(params, opt_state, *host, k)
        losses.append(loss)
    final = float(losses[-1])  # host fence on the last step's chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final), final
    print(f"subgraph-mode training at N={N_ENT:,}: "
          f"{N_STEPS * B / dt:,.0f} triples/s ({1e3 * dt / N_STEPS:.0f} "
          f"ms/step incl. host sampler), final loss {final:.4f} — PASS")


if __name__ == "__main__":
    main()
