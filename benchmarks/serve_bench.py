"""Serving-latency benchmark: top-k tail prediction (the cli.predict path).

Two numbers per batch size (round-5 verdict item 7 — the r04 client-side
p50 of 29-32 ms was ~94% tunnel round-trip, i.e. an environment artifact,
with device compute <2 ms invisible inside it):

1. CLIENT latency: end-to-end dispatch of `make_predictor` (score_all over
   the full entity table + top_k), forcing a host copy of the result every
   call — that round trip IS what a co-located serving client sees on THIS
   link (and block_until_ready is unreliable through the remote tunnel,
   see CLAUDE.md).  On a local chip the tunnel term collapses and client
   latency approaches the device number.
2. DEVICE latency: the framework's own per-call cost, measured by chaining
   M predict bodies in one lax.scan dispatch (each iteration's query
   depends on the previous top-1 id via min(id,0) — value-identical, but
   unfoldable, so no loop-invariant hoisting) and fencing on one device
   scalar; per-call = dt/M with the single tunnel RTT amortized to
   ~RTT/M (<0.15 ms at M=256).

Run: python -m benchmarks.serve_bench   (real TPU; one TPU process at a time)
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.evaluate import _mask_pad_cols, make_predictor

N_ENT, N_REL, RANK, K = 40943, 22, 33, 10
M_CHAIN = 256  # predict bodies per device-side dispatch


def make_device_chain(model, k: int):
    """One dispatch = M_CHAIN chained predict bodies; returns a scalar that
    depends on every iteration, so a single host fetch fences them all."""

    @jax.jit
    def chain(params, queries):
        def body(carry, _):
            # carry is min(top-1 id, 0) == 0 at runtime (ids are >= 0), but
            # XLA cannot fold it, so the next iteration's gather depends on
            # the previous top_k: the scan body cannot be hoisted as
            # loop-invariant and every iteration does the full predict work
            q = queries.at[:, 0].add(carry)
            scores = _mask_pad_cols(model.score_all(params, q),
                                    model.cfg.n_entities)
            vals, ids = jax.lax.top_k(scores, k)
            return jnp.minimum(ids[0, 0], 0), ids[0, 0]
        _, top1 = jax.lax.scan(body, jnp.int32(0), None, length=M_CHAIN)
        return top1.sum()

    return chain


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
    chain = make_device_chain(model, K)

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

        # device-side: M_CHAIN bodies per dispatch, fence on ONE scalar
        # (a full-buffer fetch would time the link, not the chip)
        int(chain(params, jq))  # compile
        dev = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = chain(params, jq)
            int(out)  # device-scalar fence
            dev.append((time.perf_counter() - t0) * 1e3 / M_CHAIN)
        dev_ms = float(np.median(dev))
        print(f"B={b:4d}: client p50 {p50:7.2f} ms  p99 {p99:7.2f} ms  "
              f"({b / (p50 / 1e3):,.0f} q/s at p50)  |  "
              f"device {dev_ms:6.3f} ms/call "
              f"({b / (dev_ms / 1e3):,.0f} q/s, x{M_CHAIN} chain)")


if __name__ == "__main__":
    main()
