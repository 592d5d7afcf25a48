"""Functional base for KG embedding models.

Design (TPU-first, not a port of the reference's nn.Module tree):
  * a model instance is a cheap, immutable description (sizes + flags); all
    state lives in a `params` dict pytree of jnp arrays, so every scoring
    function is pure and can be jit/pjit/scan/vmap-transformed freely.
  * two scoring modes with distinct shapes instead of the reference's
    unsqueeze-broadcast protocol (reference models/base.py:200-226):
      - score(params, queries (B,2), tails (B,K))  -> (B, K)   [training]
      - score_all(params, queries (B,2))           -> (B, N)   [ranking]
    The all-entity mode routes its inner contraction through matmuls (MXU)
    and never materializes a (B, N, d) intermediate.

Reference parity map: KGModel ABC at reference models/base.py:15-322
(get_queries / get_rhs / similarity_score / score / forward / get_factors).
Bias handling matches base.py:148-173 with the 'constant' mode fixed: the
reference references an undefined `self.delta` (base.py:166, verified crash —
SURVEY §2.4 fact 4); here 'constant' means `score + gamma`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.ops.math import mm_precision

Params = Dict[str, jax.Array]


class NoMask:
    """Regularization factor that must NEVER be zeroed by padded-batch weights.

    `regularizers._masked_sum` decides whether to mask by shape alone
    (leading dim == batch size) — the same trap class the name-keyed entity
    pad/unpad fixed for checkpoints: BaseC's full-entity-table factor
    (complexm.get_factors, reference complex.py:54) has leading dim
    n_entities, which can coincidentally equal the batch size (toy graphs
    trained full-batch), silently zeroing entity rows at padded-batch
    positions.  Wrapping the factor makes "don't mask" explicit instead of
    shape-inferred.  Plain wrapper, not a pytree node: factors only flow
    within a single trace (loss -> regularizer)."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    @property
    def shape(self):
        # callers normalize by factors[0].shape[0] (trainer.py); delegate so
        # a NoMask in slot 0 (e.g. every GNN factor) keeps that working
        return self.value.shape

_DTYPES = {
    "float32": jnp.float32,
    "float": jnp.float32,
    "single": jnp.float32,
    "float64": jnp.float64,
    "double": jnp.float64,
    "bfloat16": jnp.bfloat16,
}


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model hyperparameters (mirrors the argparse surface of run.py).

    n_relations is the *doubled* relation count (with inverse relations),
    like the reference's sizes[1] (datasets/kg_dataset.py:41).
    """

    n_entities: int
    n_relations: int
    rank: int
    init_size: float = 1e-3
    bias: str = "learn"  # learn | none | constant
    gamma: float = 0.0
    multi_c: bool = False
    dtype: str = "float32"
    dropout: float = 0.0  # accepted for config parity; the reference never applies it

    @property
    def jnp_dtype(self):
        return _DTYPES[self.dtype]


class KGModel:
    """Base scorer. Subclasses declare `param_specs` and implement
    `get_queries` and `sim`."""

    # whether this model's entity table is already in scoring space
    # (overridden by models whose rhs needs lifting/processing)

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.dtype = cfg.jnp_dtype

    # ------------------------------ parameters ------------------------------

    @property
    def entity_dim(self) -> int:
        return self.cfg.rank

    @property
    def rel_dim(self) -> int:
        return self.cfg.rank

    def param_specs(self) -> Dict[str, Tuple[Tuple[int, ...], str]]:
        """name -> (shape, init) with init in {normal, uniform, zeros, ones}.

        normal = N(0, init_size); uniform = U(-1, 1).  Matches the reference's
        init protocol (models/base.py:59-63 and per-model __init__s).
        """
        cfg = self.cfg
        specs = {
            "entity": ((cfg.n_entities, self.entity_dim), "normal"),
            "rel": ((cfg.n_relations, self.rel_dim), "normal"),
            "bh": ((cfg.n_entities, 1), "zeros"),
            "bt": ((cfg.n_entities, 1), "zeros"),
        }
        specs.update(self.extra_param_specs())
        return specs

    def extra_param_specs(self) -> Dict[str, Tuple[Tuple[int, ...], str]]:
        return {}

    def init(self, key: jax.Array) -> Params:
        specs = self.param_specs()
        keys = jax.random.split(key, len(specs))
        params: Params = {}
        for (name, (shape, kind)), k in zip(sorted(specs.items()), keys):
            if isinstance(kind, tuple):  # ("normal", mean, std)
                _, mean, std = kind
                params[name] = (
                    jax.random.normal(k, shape, dtype=jnp.float32) * std + mean
                ).astype(self.dtype)
            elif kind == "normal":
                params[name] = (
                    jax.random.normal(k, shape, dtype=jnp.float32) * self.cfg.init_size
                ).astype(self.dtype)
            elif kind == "uniform":
                params[name] = jax.random.uniform(
                    k, shape, dtype=jnp.float32, minval=-1.0, maxval=1.0
                ).astype(self.dtype)
            elif kind == "zeros":
                params[name] = jnp.zeros(shape, dtype=self.dtype)
            elif kind == "ones":
                params[name] = jnp.ones(shape, dtype=self.dtype)
            else:
                raise ValueError(f"unknown init kind {kind}")
        return self.init_post(params)

    def init_post(self, params: Params) -> Params:
        """Hook for model-specific init adjustments (e.g. ones in a slice)."""
        return params

    # ------------------------------ curvature -------------------------------

    _softplus_single_c = False  # FFT family matches reference: raw weight when
    # not multi_c (models/complexhyperbolic.py:81); the BaseH family always
    # softpluses (models/hyperbolic.py:57) — it would crash in the reference
    # with multi_c=False, so there we softplus the shared scalar instead.

    def curvature(self, params: Params, r: jax.Array) -> jax.Array:
        """Per-query curvature, shape (B, 1)."""
        if self.cfg.multi_c:
            return jax.nn.softplus(params["c"][r])
        c0 = params["c"][0][None, :]  # (1, 1)
        if self._softplus_single_c:
            c0 = jax.nn.softplus(c0)
        return c0

    # ------------------------------- scoring --------------------------------

    def get_queries(self, params: Params, queries: jax.Array):
        """queries (B, 2) int32 [head, rel] -> (lhs_pack, lhs_bias (B, 1)).

        lhs_pack is a model-specific tuple whose first element is (B, D).
        """
        raise NotImplementedError

    def get_rhs(self, params: Params, tails=None):
        """tails (B, K) -> ((B, K, D), (B, K, 1)); tails None -> ((N, D), (N, 1)).

        Reference: models/base.py:108-133.
        """
        if tails is None:
            return params["entity"], params["bt"]
        return params["entity"][tails], params["bt"][tails]

    def sim(self, lhs_pack, rhs_e, all_pairs: bool) -> jax.Array:
        """Similarity scores: (B, K) when all_pairs=False, else (B, N)."""
        raise NotImplementedError

    def _apply_bias(self, s, lhs_bias, rhs_bias, all_pairs: bool):
        if self.cfg.bias == "learn":
            rb = rhs_bias[None, :, 0] if all_pairs else rhs_bias[..., 0]
            return lhs_bias + rb + s
        if self.cfg.bias == "constant":
            return s + self.cfg.gamma
        return s

    def score(self, params: Params, queries: jax.Array, tails: jax.Array) -> jax.Array:
        """Scores of (B,) queries against (B, K) candidate tails -> (B, K)."""
        lhs, lhs_b = self.get_queries(params, queries)
        rhs_e, rhs_b = self.get_rhs(params, tails)
        s = self.sim(lhs, rhs_e, all_pairs=False)
        return self._apply_bias(s, lhs_b, rhs_b, all_pairs=False)

    def score_all(self, params: Params, queries: jax.Array) -> jax.Array:
        """Scores of (B,) queries against all N entities -> (B, N)."""
        lhs, lhs_b = self.get_queries(params, queries)
        rhs_e, rhs_b = self.get_rhs(params, None)
        s = self.sim(lhs, rhs_e, all_pairs=True)
        return self._apply_bias(s, lhs_b, rhs_b, all_pairs=True)

    # ----------------------------- regularization ---------------------------

    def get_factors(self, params: Params, queries: jax.Array, tails=None):
        """Embedding factors for the N3/F2 regularizers.

        Reference: models/base.py:175-198 — raw head/rel/tail rows; when
        tails is None the full entity table is the third factor (this matches
        the reference's CE path, where the regularizer sees every entity).
        """
        head_e = params["entity"][queries[..., 0]]
        rel_e = params["rel"][queries[..., 1]]
        if tails is None:
            # full table, not a batch: see NoMask (padded-batch weights must
            # not touch it even when n_entities == batch_size)
            return head_e, rel_e, NoMask(params["entity"])
        return head_e, rel_e, params["entity"][tails]


# ----------------------------- shared primitives -----------------------------


def dot_train(x, y):
    """(B, d) or (B, 1, d) vs (B, K, d) -> (B, K) inner products."""
    if x.ndim == 2:
        x = x[:, None, :]
    return jnp.sum(x * y, axis=-1)


def dot_all(x, y):
    """(B, d) vs (N, d) -> (B, N) inner products as one MXU matmul."""
    return jnp.matmul(x, y.T, preferred_element_type=x.dtype, precision=mm_precision())


def sq_norms(v, axis=-1):
    return jnp.sum(v * v, axis=axis)


def neg_sq_dist(lhs, rhs_e, all_pairs: bool):
    """-(|x|^2 + |y|^2 - 2xy): the 'dist' sim shared by BaseE and CompGCN
    (reference euclidean.py:24-30) — one definition so precision pins /
    numerical guards can't drift between the two."""
    x2 = jnp.sum(lhs * lhs, axis=-1, keepdims=True)  # (B, 1)
    if all_pairs:
        y2 = jnp.sum(rhs_e * rhs_e, axis=-1)[None, :]  # (1, N)
        return -(x2 + y2 - 2 * dot_all(lhs, rhs_e))
    y2 = jnp.sum(rhs_e * rhs_e, axis=-1)  # (B, K)
    return -(x2 + y2 - 2 * dot_train(lhs, rhs_e))
