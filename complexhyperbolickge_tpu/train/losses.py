"""Training losses.

Reference: optimizers/kg_optimizer.py —
  * negative-sampling logsigmoid loss (:101-123) with the shifted-randint
    uniform-over-non-true-tails sampler (:92-98),
  * all-entity cross-entropy with optional label smoothing (:47,:186-191),
  * BCE over multi-hot labels with label smoothing (:155-162),
  * signed-logsigmoid CE, the labelless binarycrossentropy branch (:163-171).

All losses are pure functions of (params, batch, weights, ...) where
`weights` [B] masks padded rows of the static-shape batch (the reference's
Python loop re-slices ragged final batches instead; SURVEY §7 hard-part 4).

double_neg note: the reference's flag is dead code (head corruption is
commented out, kg_optimizer.py:78-91).  Here it is implemented for real via
the inverse-relation formulation the training data already uses: corrupting
the head of (h, r, t) is scored as query (t, (r + n_rel/2) % n_rel) against
sampled head candidates — same cost as tail corruption, exact same model
semantics.  The modulo matters: train batches already contain inverse
triples (rel >= n_rel/2, data/dataset.py:79), whose inverse is the original
forward relation, not an out-of-range id.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad_col_mask(preds, n_entities):
    """(1, Np) bool mask of REAL entity columns, or None when unpadded.

    Entity tables row-padded for the mesh 'model' axis (parallel/mesh.py::
    pad_entity_tree) make score_all emit extra pad columns; every all-entity
    loss must exclude them (mask -> zero gradient -> pad rows stay zero)."""
    np_ = preds.shape[-1]
    if n_entities is None or np_ == n_entities:
        return None
    return (jnp.arange(np_) < n_entities)[None, :]


def sample_negatives(key, batch, n_entities: int, k: int):
    """k uniform samples over entities != gold tail (kg_optimizer.py:92-98)."""
    neg = jax.random.randint(key, (batch.shape[0], k), 0, n_entities - 1)
    return jnp.where(neg < batch[:, 2:3], neg, neg + 1)


def _logsigmoid(x):
    return jax.nn.log_sigmoid(x)


def neg_sampling_loss(model, params, batch, weights, key, n_entities: int,
                      k: int, double_neg: bool, n_rel: int):
    """-mean[logsig(pos) ++ logsig(-neg)] over valid elements."""
    queries, tails = batch[:, :2], batch[:, 2:3]
    factors = model.get_factors(params, queries, tails)

    # one get_queries chain serves the positive AND negative scores (same
    # math as two model.score calls, which XLA does not reliably CSE).
    # BoundGNN (cache-bound wrapper) exposes only score(): use it directly —
    # its decoder chain is cheap next to the shared encoder cache anyway.
    if hasattr(model, "get_queries"):
        lhs, lhs_b = model.get_queries(params, queries)

        def score_with(t_ids):
            rhs_e, rhs_b = model.get_rhs(params, t_ids)
            return model._apply_bias(model.sim(lhs, rhs_e, all_pairs=False),
                                     lhs_b, rhs_b, all_pairs=False)
    else:
        def score_with(t_ids):
            return model.score(params, queries, t_ids)

    pos = score_with(tails)  # (B, 1)
    keys = jax.random.split(key, 2)
    neg_t = sample_negatives(keys[0], batch, n_entities, k)
    neg_s = score_with(neg_t)  # (B, k)

    w = weights[:, None]
    num = jnp.sum(w * _logsigmoid(pos)) + jnp.sum(w * _logsigmoid(-neg_s))
    den = jnp.sum(weights) * (1 + k)

    if double_neg:
        # head corruption via the inverse relation (see module docstring)
        inv_q = jnp.stack(
            [batch[:, 2], (batch[:, 1] + n_rel // 2) % n_rel], axis=1
        )
        inv_batch = jnp.stack(
            [batch[:, 2], batch[:, 1], batch[:, 0]], axis=1
        )
        neg_h = sample_negatives(keys[1], inv_batch, n_entities, k)
        neg_hs = model.score(params, inv_q, neg_h)
        num = num + jnp.sum(w * _logsigmoid(-neg_hs))
        den = den + jnp.sum(weights) * k
    return -num / den, factors


def neg_sampling_loss_shared(model, params, batch, weights, key,
                             n_entities: int, k: int, double_neg: bool,
                             n_rel: int):
    """Negative-sampling loss with ONE shared negative set per batch.

    A TPU-native throughput option beyond the reference (which samples K
    negatives PER QUERY, kg_optimizer.py:92-98): with a shared (K,) candidate
    table the negative scoring becomes the models' all-pairs form — a
    (B, D) x (D, K) MXU matmul instead of B*K gathered elementwise chains.
    Collisions with a query's gold tail are masked out of the mean.  Same
    estimator family as DGL-KE-style shared negative sampling; enable with
    --neg_mode shared.
    """
    queries, tails = batch[:, :2], batch[:, 2:3]
    factors = model.get_factors(params, queries, tails)

    keys = jax.random.split(key, 2)
    w = weights[:, None]

    def shared_negs(kk, lhs, lhs_b, gold):
        neg_ids = jax.random.randint(kk, (k,), 0, n_entities)
        s = model.sim(lhs, params["entity"][neg_ids], all_pairs=True)  # (B,K)
        s = model._apply_bias(s, lhs_b, params["bt"][neg_ids], all_pairs=True)
        keep = w * (neg_ids[None, :] != gold)  # mask gold-tail collisions
        return jnp.sum(keep * _logsigmoid(-s)), jnp.sum(keep)

    # one get_queries chain serves the positive and the negatives
    lhs, lhs_b = model.get_queries(params, queries)
    rhs_e, rhs_b = model.get_rhs(params, tails)
    pos = model._apply_bias(model.sim(lhs, rhs_e, all_pairs=False),
                            lhs_b, rhs_b, all_pairs=False)  # (B, 1)
    num = jnp.sum(w * _logsigmoid(pos))
    den = jnp.sum(weights)

    n_t, d_t = shared_negs(keys[0], lhs, lhs_b, tails)
    num, den = num + n_t, den + d_t
    if double_neg:
        inv_q = jnp.stack(
            [batch[:, 2], (batch[:, 1] + n_rel // 2) % n_rel], axis=1
        )
        inv_lhs, inv_b = model.get_queries(params, inv_q)
        n_h, d_h = shared_negs(keys[1], inv_lhs, inv_b, batch[:, 0:1])
        num, den = num + n_h, den + d_h
    return -num / den, factors


def neg_sampling_loss_pooled(model, params, batch, weights, key,
                             n_entities: int, k: int, double_neg: bool,
                             n_rel: int, pool_size: int):
    """Per-query negative sampling scored through a per-STEP candidate pool.

    Keeps the reference's estimator — every query gets its own K negatives,
    jointly i.i.d. uniform over entities — but restructures the compute for
    the TPU memory system: the reference-semantics path gathers B*K entity
    rows (13 MB at the WN18RR config) and scatter-adds B*K row gradients
    back; here ONE pool gather of P i.i.d.-uniform rows feeds a
    (B, D) x (D, P) MXU matmul, and each query's negatives are a random
    CONTIGUOUS WINDOW of K pool slots.  Because pool entries are themselves
    i.i.d. uniform entity draws, K contiguous slots are exactly K i.i.d.
    uniform negatives per query (queries correlate only through shared pool
    entries, which leaves the per-query loss expectation unchanged).  The
    window is a pure elementwise iota mask on the (B, P) score matrix —
    measured 2x faster than (B, K) take_along_axis picks, whose gather +
    scatter-add VJP dominated the step.  Collisions with a query's gold
    tail are masked out of the mean (the reference's shifted-randint
    excludes gold by construction, so a kept negative has the same
    uniform-over-non-gold marginal).  Requires k <= pool_size.
    Enable with --neg_mode pool; pool size via --neg_pool_size.
    """
    if k > pool_size:  # user-config validation: must survive python -O
        raise ValueError(f"neg_sample_size {k} > neg_pool_size {pool_size}")
    queries, tails = batch[:, :2], batch[:, 2:3]
    factors = model.get_factors(params, queries, tails)

    keys = jax.random.split(key, 3)
    w = weights[:, None]
    pool = jax.random.randint(keys[0], (pool_size,), 0, n_entities)
    pool_rows = params["entity"][pool]
    pool_bt = params["bt"][pool]
    j = jnp.arange(pool_size, dtype=jnp.int32)[None, :]

    def pooled_negs(kk, lhs, lhs_b, gold):
        s = model.sim(lhs, pool_rows, all_pairs=True)  # (B, P)
        s = model._apply_bias(s, lhs_b, pool_bt, all_pairs=True)
        off = jax.random.randint(kk, (gold.shape[0], 1), 0, pool_size)
        in_win = jnp.remainder(j - off, pool_size) < k  # (B, P) window mask
        keep = w * in_win * (pool[None, :] != gold)
        return jnp.sum(keep * _logsigmoid(-s)), jnp.sum(keep)

    # one get_queries chain serves both the positive score and the
    # tail-direction negatives
    lhs, lhs_b = model.get_queries(params, queries)
    rhs_e, rhs_b = model.get_rhs(params, tails)
    pos = model._apply_bias(model.sim(lhs, rhs_e, all_pairs=False),
                            lhs_b, rhs_b, all_pairs=False)  # (B, 1)
    num = jnp.sum(w * _logsigmoid(pos))
    den = jnp.sum(weights)

    n_t, d_t = pooled_negs(keys[1], lhs, lhs_b, tails)
    num, den = num + n_t, den + d_t
    if double_neg:
        inv_q = jnp.stack(
            [batch[:, 2], (batch[:, 1] + n_rel // 2) % n_rel], axis=1
        )
        inv_lhs, inv_b = model.get_queries(params, inv_q)
        n_h, d_h = pooled_negs(keys[2], inv_lhs, inv_b, batch[:, 0:1])
        num, den = num + n_h, den + d_h
    return -num / den, factors


def cross_entropy_loss(model, params, batch, weights, smoothing: float | None,
                       n_entities: int | None = None):
    """All-entity CE with torch-style label smoothing (kg_optimizer.py:47,
    186-191): loss_i = (1-eps)(-log p_t) + eps * mean_k(-log p_k).

    Factored: with logp = preds - lse,
        loss_i = lse_i - (1-eps)*preds[i, t_i] - (eps/N) * sum_k preds[i, k]
    so the (B, N) logp matrix is never materialized — just the logsumexp
    reduction (whose exp pass is the irreducible transcendental cost), a
    (B, 1) gold gather from preds, and a row sum for the smoothing term."""
    queries, tails = batch[:, :2], batch[:, 2]
    preds = model.score_all(params, queries)  # (B, N) — or (B, Np) padded
    factors = model.get_factors(params, queries, None)
    valid = _pad_col_mask(preds, n_entities)
    masked = preds if valid is None else jnp.where(valid, preds, -1e30)
    lse = jax.nn.logsumexp(masked, axis=-1)  # pad cols carry no softmax mass
    gold = jnp.take_along_axis(preds, tails[:, None], axis=1)[:, 0]
    eps = 0.0 if smoothing is None else smoothing
    if eps:
        # mean over the REAL entity columns only
        n = preds.shape[-1] if valid is None else n_entities
        mean_pred = jnp.sum(
            preds if valid is None else jnp.where(valid, preds, 0.0), axis=-1
        ) / n
        nll = lse - (1 - eps) * gold - eps * mean_pred
    else:
        nll = lse - gold
    return jnp.sum(weights * nll) / jnp.sum(weights), factors


def dense_labels(label_idx, n_entities: int, dtype):
    """Padded true-tail index lists (B, L) -> multi-hot (B, N); pad value
    n_entities is dropped by the scatter.  The explicit unpadded-width dense
    form for parity tests against the reference's KGDataset2 label matrices
    (bce_loss builds its own multi-hot over the possibly-padded preds
    width)."""
    b = label_idx.shape[0]
    lab = jnp.zeros((b, n_entities), dtype=dtype)
    rows = jnp.arange(b)[:, None]
    return lab.at[rows, label_idx].set(1.0, mode="drop")


def bce_loss(model, params, batch, weights, label_idx, n_entities: int,
             smoothing: float | None):
    """BCE(sigmoid(preds), smoothed multi-hot labels) (kg_optimizer.py:155-162),
    computed in log-space for stability.

    Dense multi-hot form: scatter the padded label lists into a (B, N)
    multi-hot and take the elementwise BCE against it.  A factored
    label-GATHER form (dense label-independent reduce + a (B, Lw)
    take_along_axis of log_p - log_1mp) was built in r03 and measured
    SLOWER at the trainer level on v5e (105k vs 119k triples/s at
    b500 x 40,943, 2026-08-19): the per-row gather + its scatter-add VJP
    lose to the dense scatter+multiply passes XLA fuses into the score
    chain — the same per-row-gather-loses lesson as the pooled-negative
    window (CLAUDE.md ledger).  The shared-softplus identity
    (logsig(-x) = logsig(x) - x, exact) is kept: one softplus pass over
    the (B, N) matrix instead of two."""
    queries = batch[:, :2]
    preds = model.score_all(params, queries)  # (B, N) — or (B, Np) padded
    factors = model.get_factors(params, queries, None)
    valid = _pad_col_mask(preds, n_entities)
    eps = 0.0 if smoothing is None else smoothing
    # multi-hot over the PADDED width: pad label ids (= n_entities) would be
    # a real column when Np > n_entities, so scatter lab_ok (0 at pads) with
    # max — pads and duplicate rows are both no-ops
    rows = jnp.arange(label_idx.shape[0])[:, None]
    lab_ok = (label_idx < n_entities).astype(preds.dtype)
    idx = jnp.minimum(label_idx, preds.shape[-1] - 1)
    y = jnp.zeros_like(preds).at[rows, idx].max(lab_ok)
    y = (1.0 - eps) * y + eps / n_entities
    # BCE = -(y log sigma + (1-y) log(1-sigma)); torch.nn.BCELoss clamps each
    # log term at -100 (the reference's effective semantics) — mirrored here.
    ls = _logsigmoid(preds)
    log_p = jnp.maximum(ls, -100.0)
    log_1mp = jnp.maximum(ls - preds, -100.0)
    per = -(y * log_p + (1.0 - y) * log_1mp)
    if valid is not None:
        per = jnp.where(valid, per, 0.0)
    total = jnp.sum(weights[:, None] * per)
    return total / (jnp.sum(weights) * n_entities), factors


def signed_logsigmoid_ce_loss(model, params, batch, weights,
                              n_entities: int | None = None):
    """Labelless binarycrossentropy branch (kg_optimizer.py:163-171):
    log_prob = logsig(-preds); log_prob[i, t] += logsig(p) - logsig(-p);
    loss = -mean(log_prob)."""
    queries, tails = batch[:, :2], batch[:, 2]
    preds = model.score_all(params, queries)
    factors = model.get_factors(params, queries, None)
    valid = _pad_col_mask(preds, n_entities)
    n = preds.shape[-1] if valid is None else n_entities
    log_prob = _logsigmoid(-preds)
    if valid is not None:
        log_prob = jnp.where(valid, log_prob, 0.0)
    gold = jnp.take_along_axis(preds, tails[:, None], axis=1)
    bump = _logsigmoid(gold) - _logsigmoid(-gold)  # (B, 1)
    # the bump lands on one column per row and the loss sums over columns —
    # add the (B, 1) bump to the row sums directly instead of the original
    # zeros_like().at[rows, tails].add(bump), which materialized + copied a
    # (B, N) matrix per step just to carry B scalars into the reduction
    row_sum = jnp.sum(log_prob, axis=-1, keepdims=True) + bump
    return -jnp.sum(weights[:, None] * row_sum) / (jnp.sum(weights) * n), factors
