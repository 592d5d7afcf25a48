"""Ablate the CompGCN eval batch cost on TPU: full ranker vs score_all vs
bare matmul, and dot_all precision highest vs default."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model

N_ENT, NQ, B, LMAX = 40943, 20000, 500, 64
data = synthetic_kg(n_entities=N_ENT, n_relations=11, n_train=86835,
                    n_valid=500, n_test=500, seed=0)
n_ent, n_rel, _ = data.get_shape()
cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=32, multi_c=True,
                  bias="learn", dtype="float32")


class A:
    hidden_dim = 200
    layers = 2
    edge_dropout = 0.0
    dropout = 0.0
    opn = "mult"
    interaction = "distmult"
    basis = 0


model = get_model("CompGCN")(cfg, A, data)
params = model.init(jax.random.PRNGKey(0))
cache = jax.jit(lambda p: model.encode(p))(params)
jax.block_until_ready(cache)

rng = np.random.default_rng(0)
qb = jnp.asarray(np.stack([rng.integers(0, n_ent, NQ), rng.integers(0, n_rel, NQ),
                           rng.integers(0, n_ent, NQ)], 1).astype(np.int32).reshape(40, B, 3))
fb = jnp.asarray(rng.integers(0, n_ent, (40, B, LMAX)).astype(np.int32))


def timeit(name, fn, *args):
    out = fn(*args)
    _ = float(np.asarray(out).sum())  # force through tunnel
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out).sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms min (per batch {min(ts)*25:.2f} ms)  trials {[f'{t*1e3:.0f}' for t in ts]}")
    return min(ts)


def _core(params, cache, q, fidx):
    x, _ = cache
    lhs, lhs_b = model.get_queries(params, q[:, :2], cache)
    s = model.sim(lhs, x, all_pairs=True)
    scores = model._apply_bias(s, lhs_b, params["bt"], all_pairs=True)
    target = jnp.take_along_axis(scores, q[:, 2:3], axis=1)
    rows = jnp.arange(q.shape[0])[:, None]
    scores = scores.at[rows, fidx].set(-1e6, mode="drop")
    return 1.0 + jnp.sum(scores >= target, axis=1).astype(jnp.float32)


@jax.jit
def full(params, cache, qb, fb):
    return jax.lax.map(lambda t: _core(params, cache, *t), (qb, fb))


@jax.jit
def score_only(params, cache, qb):
    def one(q):
        x, _ = cache
        lhs, lhs_b = model.get_queries(params, q[:, :2], cache)
        s = model.sim(lhs, x, all_pairs=True)
        scores = model._apply_bias(s, lhs_b, params["bt"], all_pairs=True)
        return jnp.sum(scores, axis=1)
    return jax.lax.map(one, qb)


@jax.jit
def matmul_only(params, cache, qb):
    x, _ = cache
    def one(q):
        lhs = x[q[:, 0]] * cache[1][q[:, 1]] if False else x[q[:, 0]]
        s = jnp.matmul(lhs, x.T, preferred_element_type=lhs.dtype, precision="highest")
        return jnp.sum(s, axis=1)
    return jax.lax.map(one, qb)


@jax.jit
def matmul_default(params, cache, qb):
    x, _ = cache
    def one(q):
        lhs = x[q[:, 0]]
        s = jnp.matmul(lhs, x.T)
        return jnp.sum(s, axis=1)
    return jax.lax.map(one, qb)


@jax.jit
def norank(params, cache, qb, fb):
    def one(q, fidx):
        x, _ = cache
        lhs, lhs_b = model.get_queries(params, q[:, :2], cache)
        s = model.sim(lhs, x, all_pairs=True)
        scores = model._apply_bias(s, lhs_b, params["bt"], all_pairs=True)
        target = jnp.take_along_axis(scores, q[:, 2:3], axis=1)
        rows = jnp.arange(q.shape[0])[:, None]
        scores = scores.at[rows, fidx].set(-1e6, mode="drop")
        return jnp.sum(scores, axis=1) + target[:, 0]
    return jax.lax.map(lambda t: one(*t), (qb, fb))


timeit("full ranker (bench path)", full, params, cache, qb, fb)
timeit("no >=target compare    ", norank, params, cache, qb, fb)
timeit("score_all only         ", score_only, params, cache, qb)
timeit("bare matmul highest    ", matmul_only, params, cache, qb)
timeit("bare matmul default    ", matmul_default, params, cache, qb)
