"""Serving-latency benchmark: top-k tail prediction (the cli.predict path).

Measures end-to-end dispatch latency of `make_predictor` (score_all over the
full entity table + top_k) at WN18RR scale for single-query (online) and
batched (micro-batch) serving, reporting p50/p99 over repeated calls.
Timing forces a host copy of the result every call — that round trip IS the
serving latency a client sees (and block_until_ready is unreliable through
the remote tunnel, see CLAUDE.md).

Run: python -m benchmarks.serve_bench   (real TPU; one TPU process at a time)
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.evaluate import make_predictor

N_ENT, N_REL, RANK, K = 40943, 22, 33, 10


def main():
    rng = np.random.default_rng(0)
    cfg = ModelConfig(n_entities=N_ENT, n_relations=N_REL, rank=RANK,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("FFTRotH")(cfg)
    params = {
        k: jnp.asarray(rng.normal(0, 0.1, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    fn = make_predictor(model, k=K)

    for b in (1, 32, 256):
        qs = np.stack([rng.integers(0, N_ENT, b),
                       rng.integers(0, N_REL, b)], 1).astype(np.int32)
        jq = jnp.asarray(qs)
        ids, scores = fn(params, jq)  # compile
        np.asarray(ids)
        lat = []
        for _ in range(100):
            t0 = time.perf_counter()
            ids, _ = fn(params, jq)
            np.asarray(ids)  # host copy = what a serving client waits for
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.sort(lat)
        p50, p99 = lat[49], lat[98]
        print(f"B={b:4d}: p50 {p50:7.2f} ms  p99 {p99:7.2f} ms  "
              f"({b / (p50 / 1e3):,.0f} queries/s at p50)")


if __name__ == "__main__":
    main()
