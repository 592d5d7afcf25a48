"""All-entity cross-entropy training step cost (kg_optimizer.py:186-191
shape) at WN18RR scale: b500 x 40,943 entities, FFTRotH rank 33.

Ledger baseline (pre-factored CE): grad 3.8 ms/step, fwd alone 1.5 ms —
bound by the VPU transcendental chain (arccosh + softmax exp/log) over the
(B, N) matrix.  The factored CE (train/losses.py) removes the log-softmax
materialization; this bench reports the value_and_grad step time.

Run on the real TPU: `python -m benchmarks.ce_bench`.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train import losses as L

N_ENT, N_REL, B, RANK = 40943, 22, 500, 33


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

    g = jax.jit(jax.value_and_grad(loss_fn))
    v, grads = g(params)
    _ = float(np.asarray(v))
    print(f"warm loss={float(np.asarray(v)):.6f}")
    ts = []
    for _i in range(4):
        t0 = time.perf_counter()
        for _j in range(20):
            v, grads = g(params)
        # host fence on data-dependent outputs (tunnel-safe, CLAUDE.md)
        _ = float(np.asarray(v)) + float(np.asarray(grads["entity"]).ravel()[0])
        ts.append((time.perf_counter() - t0) / 20)
    print(f"CE value_and_grad: {min(ts) * 1e3:.2f} ms/step best, "
          f"{np.median(ts) * 1e3:.2f} median "
          f"(trials {[f'{t * 1e3:.2f}' for t in ts]}); "
          f"{B / min(ts):,.0f} triples/s at b{B}")


if __name__ == "__main__":
    main()
