"""Training engine: optimizer wiring + whole-epoch compiled training.

Replaces the reference KGOptimizer (optimizers/kg_optimizer.py:14-316).
The reference runs a Python while-loop doing per-batch H2D copies, backward,
and stepping; here one epoch is a single jitted lax.scan over static-shape
batches — device-resident end to end, with donated params/opt state.

Optimizer parity:
  * Adam  -> optax.adam with torch defaults (betas 0.9/0.999, eps 1e-8)
  * Adagrad -> optax.adagrad with torch defaults (initial accumulator 0,
    eps 1e-10) — reference run.py:205 uses torch.optim defaults
  * SparseAdam -> train/sparse_adam.py, a lazy row-sparse Adam verified
    step-identical to torch.optim.SparseAdam

Gradient accumulation (`update_steps`, reference kg_optimizer.py:262-270):
gradients are SUMMED over k batches (torch .backward() accumulates by sum)
and applied every k-th batch and on the final batch of the epoch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from complexhyperbolickge_tpu.train import losses as L
from complexhyperbolickge_tpu.train.regularizers import get_regularizer


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirrors the training-relevant argparse surface of reference run.py:29-131."""

    regularizer: str = "N3"
    reg: float = 0.0
    optimizer: str = "Adam"
    learning_rate: float = 1e-3
    batch_size: int = 500
    update_steps: int = 1
    neg_sample_size: int = 100  # <= 0 to disable negative sampling
    loss: str = "crossentropy"  # crossentropy | binarycrossentropy
    smoothing: Optional[float] = None
    double_neg: bool = False
    neg_mode: str = "per_query"  # per_query (reference) | shared | pool
    neg_pool_size: int = 512  # candidate pool size for neg_mode='pool'
    # (512 measured best on v5e: 965k t/s vs 880k at 1024, WN18RR shapes)
    # Fused Pallas train-mode scorer (kernels/chyp_train.py).  Measured
    # perf-neutral vs XLA's own fusion of the same chain on v5e (the step is
    # bound by the candidate gather/scatter, not the distance math), so off
    # by default; kept as a verified building block.
    fused_scorer: bool = False
    # lax.scan unroll factor for the epoch loop (semantics-preserving; the
    # step chain is sequentially dependent through params, so this only
    # amortizes loop bookkeeping — measured neutral at the b500 overhead
    # floor on v5e, kept as a knob for other shapes)
    scan_unroll: int = 1


class _RssState(NamedTuple):
    sum_of_squares: object


def _scale_by_rss_torch(initial_accumulator_value: float = 0.0,
                        eps: float = 1e-10):
    """torch.optim.Adagrad's accumulator scaling: g / (sqrt(acc) + eps),
    eps OUTSIDE the root (torch/optim/adagrad.py `std = sqrt(acc) + eps`).

    optax.adagrad instead computes g * rsqrt(acc + eps) — at KG-embedding
    init scale (init_size 1e-3, first-step row grads ~1e-6, acc ~1e-12 vs
    eps 1e-10) that shrinks the first updates ~10x, silently diverging
    Adagrad trajectories from the reference (whose DEFAULT optimizer this
    is, run.py:47)."""

    def init(params):
        return _RssState(jax.tree.map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params))

    def update(grads, state, params=None):
        del params
        acc = jax.tree.map(lambda s, g: s + g * g,
                           state.sum_of_squares, grads)
        updates = jax.tree.map(lambda g, s: g / (jnp.sqrt(s) + eps),
                               grads, acc)
        return updates, _RssState(acc)

    return optax.GradientTransformation(init, update)


def torch_adagrad(learning_rate, eps: float = 1e-10,
                  initial_accumulator_value: float = 0.0):
    """Adagrad with torch's exact update rule (defaults: lr_decay=0,
    weight_decay=0, which the reference never overrides, run.py:205)."""
    return optax.chain(
        _scale_by_rss_torch(initial_accumulator_value, eps),
        optax.scale_by_learning_rate(learning_rate),
    )


def make_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    """All optimizers are wrapped in inject_hyperparams so the learning rate
    lives in the optimizer STATE — enabling reduce_lr (the reference
    KGOptimizer.reduce_lr, kg_optimizer.py:57-64) without recompilation."""
    if name == "Adam":
        return optax.inject_hyperparams(optax.adam, hyperparam_dtype=jnp.float32)(
            learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8
        )
    if name == "SparseAdam":
        from complexhyperbolickge_tpu.train.sparse_adam import sparse_adam

        return optax.inject_hyperparams(sparse_adam, hyperparam_dtype=jnp.float32)(learning_rate=lr)
    if name == "Adagrad":
        # NOT optax.adagrad: its rsqrt(acc + eps) puts eps inside the root
        # (see _scale_by_rss_torch) — trajectory parity needs torch's form
        return optax.inject_hyperparams(torch_adagrad, hyperparam_dtype=jnp.float32)(
            learning_rate=lr, initial_accumulator_value=0.0, eps=1e-10
        )
    if name == "SGD":  # not in the reference's choices; used by parity tests
        return optax.inject_hyperparams(optax.sgd, hyperparam_dtype=jnp.float32)(learning_rate=lr)
    raise ValueError(f"unknown optimizer {name!r}")


def _f32_state_for_bf16(tx: optax.GradientTransformation):
    """Keep optimizer state/arithmetic in f32 when params are bfloat16
    (bf16 moments both lose precision and clash with the f32 hyperparams
    inside lax.scan carries); updates are cast back to the param dtype.
    f32/f64 params pass through untouched."""

    def up(t):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x, t
        )

    def init(params):
        return tx.init(up(params))

    def update(grads, state, params=None):
        dtypes = jax.tree.map(lambda g: g.dtype, grads)
        updates, state = tx.update(up(grads), state,
                                   None if params is None else up(params))
        updates = jax.tree.map(lambda u, d: u.astype(d), updates, dtypes)
        return updates, state

    return optax.GradientTransformation(init, update)


def reduce_lr(opt_state, factor: float = 0.8):
    """Scale the in-state learning rate (reference kg_optimizer.py:57-64)."""
    return opt_state._replace(
        hyperparams={
            **opt_state.hyperparams,
            "learning_rate": opt_state.hyperparams["learning_rate"] * factor,
        }
    )


class Trainer:
    """Compiled train/valid loops over a fixed model + config."""

    def __init__(self, model, cfg: TrainConfig, n_entities: int, n_relations: int,
                 mesh=None, shardings=None):
        self.model = model
        self.cfg = cfg
        self.n_entities = n_entities
        self.n_relations = n_relations
        self.tx = _f32_state_for_bf16(
            make_optimizer(cfg.optimizer, cfg.learning_rate)
        )
        self.reg_fn = get_regularizer(cfg.regularizer)
        if cfg.neg_mode in ("shared", "pool") and getattr(model, "is_gnn", False):
            raise ValueError(
                f"neg_mode={cfg.neg_mode!r} is not supported for GNN models"
            )
        from complexhyperbolickge_tpu.ops.chyperbolic import (
            set_fused_train_scorer,
        )
        from complexhyperbolickge_tpu.utils.platform import is_tpu_backend

        # The flag is process-global but read at TRACE time (a jax 0.9
        # custom_vjp/nondiff_argnums bug inside jit(scan) forces the module-
        # flag form — see ops/chyperbolic.py), and tracing happens at the
        # FIRST run_epoch/valid_loss call, not at construction: arm it at
        # every dispatch so a Trainer constructed in between cannot override
        # this one's config (two trainers built up front then run would
        # otherwise both trace with the second one's flag).
        self._fused_flag = bool(cfg.fused_scorer) and is_tpu_backend()
        self._set_fused = set_fused_train_scorer
        self._set_fused(self._fused_flag)
        self._epoch_fn = self._build_epoch_fn()
        self._valid_fn = self._build_valid_fn()

    # ------------------------------- loss core -------------------------------

    def _loss(self, params, batch, weights, labels, key, training=True):
        cfg = self.cfg
        model = self.model
        is_gnn = getattr(model, "is_gnn", False)
        if is_gnn:
            # run the full-graph encoder ONCE per step (with edge/feature
            # dropout when training; validation encodes dropout-free, like
            # the reference's model.eval() before calculate_valid_loss,
            # run.py:223)
            key, enc_key = jax.random.split(key)
            cache = model.encode(
                params, key=enc_key if training else None, training=training
            )
            from complexhyperbolickge_tpu.models.gnn.models import BoundGNN

            model = BoundGNN(model, cache)
        if cfg.neg_sample_size > 0:
            if cfg.neg_mode == "shared":
                loss, factors = L.neg_sampling_loss_shared(
                    model, params, batch, weights, key, self.n_entities,
                    cfg.neg_sample_size, cfg.double_neg, self.n_relations,
                )
            elif cfg.neg_mode == "pool":
                loss, factors = L.neg_sampling_loss_pooled(
                    model, params, batch, weights, key, self.n_entities,
                    cfg.neg_sample_size, cfg.double_neg, self.n_relations,
                    cfg.neg_pool_size,
                )
            else:
                loss, factors = L.neg_sampling_loss(
                    model, params, batch, weights, key, self.n_entities,
                    cfg.neg_sample_size, cfg.double_neg, self.n_relations,
                )
        elif cfg.loss == "crossentropy":
            loss, factors = L.cross_entropy_loss(
                model, params, batch, weights, cfg.smoothing,
                n_entities=self.n_entities,
            )
        elif cfg.loss == "binarycrossentropy":
            if labels is not None:
                loss, factors = L.bce_loss(
                    model, params, batch, weights, labels,
                    self.n_entities, cfg.smoothing,
                )
            else:
                loss, factors = L.signed_logsigmoid_ce_loss(
                    model, params, batch, weights, n_entities=self.n_entities
                )
        else:
            raise ValueError(f"unknown loss {cfg.loss!r}")
        if not cfg.reg:
            # reg weight 0 (every published config): skip the regularizer
            # graph entirely so the factor gathers/norms are never computed
            # (XLA cannot fold x*0.0 away under NaN semantics)
            return loss
        if is_gnn:
            # GNN factors are encoder weight matrices; the reference
            # normalizes by factors[0].shape[0] (regularizers.py:29,57)
            loss = loss + self.reg_fn(factors, cfg.reg, factors[0].shape[0])
        else:
            # Documented divergence: on the binarycrossentropy branch the
            # reference adds the regularizer TWICE (inside no_neg_sampling_loss
            # at kg_optimizer.py:162/171 and again in calculate_loss at :196)
            # — an accumulation bug that silently doubles effective reg
            # strength there.  We add it once on every branch (all published
            # configs use reg 0.0, tuning_fft.sh / README.md:54-62, so no
            # published result depends on the doubling).
            loss = loss + self.reg_fn(factors, cfg.reg, jnp.sum(weights), weights)
        return loss

    # ----------------------------- compiled epoch ----------------------------

    def _build_epoch_fn(self):
        k_acc = max(1, self.cfg.update_steps)
        grad_fn = jax.value_and_grad(self._loss)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def epoch_fn(params, opt_state, batches, weights, labels, key):
            nb = batches.shape[0]
            keys = jax.random.split(key, nb)
            # the accumulator is only carried when actually accumulating —
            # at k_acc == 1 it would be a dead params-sized HBM buffer
            zero_grads = (
                jax.tree.map(jnp.zeros_like, params) if k_acc > 1 else None
            )

            def body(carry, xs):
                params, opt_state, acc = carry
                if labels is None:
                    i, batch, w, k = xs
                    lab = None
                else:
                    i, batch, w, lab, k = xs
                loss, grads = grad_fn(params, batch, w, lab, k)
                if k_acc == 1:
                    updates, opt_state = self.tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                else:
                    acc = jax.tree.map(jnp.add, acc, grads)
                    do_update = ((i + 1) % k_acc == 0) | (i == nb - 1)

                    def apply(args):
                        params, opt_state, acc = args
                        updates, opt_state = self.tx.update(acc, opt_state, params)
                        params = optax.apply_updates(params, updates)
                        return params, opt_state, jax.tree.map(jnp.zeros_like, acc)

                    params, opt_state, acc = jax.lax.cond(
                        do_update, apply, lambda a: a, (params, opt_state, acc)
                    )
                return (params, opt_state, acc), loss

            idx = jnp.arange(nb)
            xs = (
                (idx, batches, weights, keys)
                if labels is None
                else (idx, batches, weights, labels, keys)
            )
            (params, opt_state, _), losses = jax.lax.scan(
                body, (params, opt_state, zero_grads), xs,
                unroll=max(1, self.cfg.scan_unroll),
            )
            return params, opt_state, jnp.mean(losses)

        return epoch_fn

    def _build_valid_fn(self):
        @jax.jit
        def valid_fn(params, batches, weights, labels, key):
            nb = batches.shape[0]
            keys = jax.random.split(key, nb)

            def body(_, xs):
                if labels is None:
                    batch, w, k = xs
                    lab = None
                else:
                    batch, w, lab, k = xs
                return None, self._loss(params, batch, w, lab, k, training=False)

            xs = (
                (batches, weights, keys)
                if labels is None
                else (batches, weights, labels, keys)
            )
            _, losses = jax.lax.scan(body, None, xs)
            return jnp.mean(losses)

        return valid_fn

    # -------------------------------- public ---------------------------------

    def init(self, key):
        params = self.model.init(key)
        opt_state = self.tx.init(params)
        return params, opt_state

    def run_epoch(self, params, opt_state, batches, weights, key, labels=None):
        """One full epoch; returns (params, opt_state, mean loss)."""
        self._set_fused(self._fused_flag)  # trace-time flag: arm per dispatch
        params, opt_state, loss = self._epoch_fn(
            params, opt_state, jnp.asarray(batches), jnp.asarray(weights),
            None if labels is None else jnp.asarray(labels), key,
        )
        return params, opt_state, float(loss)

    def valid_loss(self, params, batches, weights, key, labels=None):
        self._set_fused(self._fused_flag)  # trace-time flag: arm per dispatch
        return float(
            self._valid_fn(
                params, jnp.asarray(batches), jnp.asarray(weights),
                None if labels is None else jnp.asarray(labels), key,
            )
        )
