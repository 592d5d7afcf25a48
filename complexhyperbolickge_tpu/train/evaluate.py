"""Filtered-ranking evaluation: MR / MRR / Hits@{1,3,10}, lhs+rhs averaged.

Protocol parity with reference models/base.py:228-322 and utils/train.py:23-47:
  rank = 1 + #{score >= target} after setting all filtered entities
  (including the gold tail) to -1e6; metrics averaged over the tail- and
  head-prediction directions (the lhs direction queries the inverse relation).

TPU design: the reference runs a per-query Python loop of dict lookups to
apply filters (base.py:264-268 — a GPU->CPU sync per batch).  Here filters
are pre-packed as padded index arrays (data/dataset.py:eval_pack) and
excluded by COUNT SUBTRACTION inside the jitted ranking function
(filtered_rank_counts — gathering B*Lmax entries instead of scattering
into, and thereby copying, the (B, N) score matrix); the score matrix
itself comes from the models' all-pairs MXU form (score_all).
"""

from __future__ import annotations

import weakref

import jax
import jax.numpy as jnp
import numpy as np


def _mask_pad_cols(scores, n_entities: int):
    """Entity tables row-padded for the mesh 'model' axis (parallel/mesh.py)
    make score_all emit pad columns past n_entities; push them below any
    target so they never count toward a rank (and never win top-k)."""
    if scores.shape[-1] == n_entities:
        return scores
    valid = (jnp.arange(scores.shape[-1]) < n_entities)[None, :]
    return jnp.where(valid, scores, -jnp.inf)


def filtered_rank_counts(scores, target, fidx, n_entities: int):
    """#{score >= target} with filtered entities excluded, WITHOUT the
    (B, N) scatter.

    Semantically identical to the reference protocol (set filtered entries
    to -1e6, then count, base.py:264-271) but expressed as a count
    subtraction: gather the filtered entries' scores from the SAME matrix
    (bitwise-identical values), subtract those that were counted, and add
    back the ones a -1e6 overwrite would still have counted (only when
    target <= -1e6).  The scatter form forces XLA to materialize + copy the
    full (B, N) score matrix per batch (~2 ms at WN18RR shapes — measured
    2.7x of the whole rank program); the gather touches B*Lmax elements.

    Contract (guaranteed by data/dataset.py::eval_pack and required by the
    maskless Pallas rankers too): filter rows are DEDUPLICATED and padded
    with n_entities (never negative).
    """
    total = jnp.sum(scores >= target, axis=1)
    valid = fidx < n_entities
    g = jnp.take_along_axis(
        scores, jnp.minimum(fidx, scores.shape[-1] - 1), axis=1
    )
    sub = jnp.sum(valid & (g >= target), axis=1)
    sentinel = jnp.asarray(-1e6, scores.dtype)
    add = jnp.sum(valid & (sentinel >= target), axis=1)
    return total - sub + add


def make_ranker(model, eval_batch_size: int | None = None,
                precision: str = "highest"):
    """Compiled filtered-ranking over one query batch.

    eval_batch_size is accepted for signature symmetry with
    make_best_ranker and the Pallas rankers (which consume it for tile
    padding) but is NOT compiled in here: the XLA programs specialize on
    the shapes of the arrays passed at call time, so one ranker serves any
    batch size (each distinct shape pays its own compile).

    For GNN models the full-graph encoder output is computed ONCE and bound
    as a cache (mirroring the reference's cached forward_base during eval,
    gnnbase.py:240) instead of being re-traced into every batch's program.

    precision: "highest" (default) keeps the all-pairs score matmuls at the
    exact 6-pass f32 MXU emulation; "default" traces them as 1-pass bf16
    (ops/math.py::eval_matmul_precision) — the opt-in --eval_precision
    default now reaches the DENSE rankers too (the GNN decoder sweep is a
    pure dot product, i.e. MXU-bound, unlike the transcendental-bound
    geometric rankers).
    """
    from complexhyperbolickge_tpu.ops.math import eval_matmul_precision

    if getattr(model, "is_gnn", False):
        encode = jax.jit(lambda p: model.encode(p))

        def _core(params, cache, q, fidx):
            with eval_matmul_precision(precision):  # trace-time scope
                scores = _mask_pad_cols(
                    model.score_all(params, q[:, :2], cache=cache),
                    model.cfg.n_entities,
                )
            target = jnp.take_along_axis(scores, q[:, 2:3], axis=1)
            counts = filtered_rank_counts(
                scores, target, fidx, model.cfg.n_entities
            )
            # target*0: NaN discipline (see _rank_one below)
            return 1.0 + counts.astype(jnp.float32) + (target[:, 0] * 0.0).astype(jnp.float32)

        rank_core = jax.jit(_core)

        @jax.jit
        def rank_many_core(params, cache, qb, fb):
            return jax.lax.map(lambda x: _core(params, cache, *x), (qb, fb))

        # cache keyed on the params OBJECT, held by strong reference (an id()
        # key could alias a new pytree allocated at a freed address).  The
        # (params, cache) pair lives in ONE slot written atomically: two
        # slots let a concurrent validation/serving thread pair one params
        # version with another version's encoder cache — silently wrong
        # scores until the next params swap.
        state = {"bound": None}

        def _bind(params):
            bound = state["bound"]  # single read: never re-read after check
            if bound is None or bound[0] is not params:
                bound = (params, encode(params))
                state["bound"] = bound
            return bound[1]

        def rank_batch(params, q, fidx):
            return rank_core(params, _bind(params), q, fidx)

        rank_batch.rank_many = lambda params, qb, fb: rank_many_core(
            params, _bind(params), qb, fb
        )
        return rank_batch

    def _rank_one(params, q, fidx):
        with eval_matmul_precision(precision):  # trace-time scope
            scores = _mask_pad_cols(
                model.score_all(params, q[:, :2]), model.cfg.n_entities
            )  # (B, N)
        target = jnp.take_along_axis(scores, q[:, 2:3], axis=1)  # (B, 1)
        counts = filtered_rank_counts(scores, target, fidx, model.cfg.n_entities)
        # NaN discipline: counts are sums of comparisons — finite by
        # construction — so NaN scores would silently rank everything 1.
        # target*0 is 0 when the gold score is finite and NaN otherwise,
        # making get_ranking's host isfinite check fire loudly.  It is
        # deliberately NOT a full-matrix isfinite reduce: a second consumer
        # of `scores` makes XLA duplicate the score fusion with different
        # reassociation, flipping exact score ties (measured: sharded-vs-
        # dense rank mismatches on ~15% of a synthetic split) — whereas a
        # *0.0 term is value-independent, so ranks are bitwise-unchanged
        # for any finite gold score.  Whole-params divergence (the
        # realistic mode) is caught backend-uniformly by get_ranking's
        # host-side params finiteness check below.
        return 1.0 + counts.astype(jnp.float32) + (target[:, 0] * 0.0).astype(jnp.float32)

    rank_batch = jax.jit(_rank_one)

    @jax.jit
    def rank_many(params, qb, fb):
        """Whole-split ranking as ONE compiled program: lax.map over the
        batch axis, so a split costs one dispatch instead of nb (the
        per-dispatch round trip is the dominant eval cost on a remote
        tunnel, and non-trivial even on a local chip)."""
        return jax.lax.map(lambda x: _rank_one(params, *x), (qb, fb))

    rank_batch.rank_many = rank_many
    return rank_batch


# 'auto' flips to the maskless fused kernel at or above this entity count
# (supported families, TPU backends): the measured win there is decisive
# (1.35-1.38x whole-split at YAGO) and the measured filtered-MRR delta is
# ~1e-10 — see make_best_ranker docstring + benchmarks/eval_mrr_delta.py
AUTO_MASKLESS_MIN_ENTITIES = 100_000


def make_best_ranker(model, eval_batch_size: int, backend: str = "auto",
                     precision: str = "highest"):
    """Ranking-backend selector.

    backend='auto' selects by scale (r05 policy, decided by measured
    filtered-MRR deltas on trained params — benchmarks/eval_mrr_delta.py):

    * below AUTO_MASKLESS_MIN_ENTITIES (or off-TPU, or unsupported model
      family) — the scatter-free dense XLA ranker, same as 'dense': the
      fastest EXACT-tie-semantics path there (within noise of the masked
      fused kernels at WN18RR, ~200-224k q/s per-batch), and the maskless
      win at that scale (1.07-1.09x) is inside the ±15% tunnel band.
    * at or above it (hyperbolic/CHYP families on a TPU backend) — the
      'pallas_maskless' subtract-filtered kernel: 1.19-1.26x dense
      per-batch / 1.35-1.38x whole-split-scan at YAGO (123,182 entities),
      measured rank-identical to the masked kernel 500/500 on-chip since
      the in-kernel gold-tie exclusion, with filtered MRR equal to the
      masked kernel's and within ~1e-10 of dense (2026-08-19, 5000
      queries per scale).  Its residual +-1 risk (exact f32 ties between
      distinct non-gold entities across the tile-vs-flat dot shapes) is
      the same class in which masked-vs-dense already differs.

    backend='dense' forces exact dense-tie semantics everywhere.  The
    masked kernels remain available (backend='pallas', every hyperbolic
    family) as the VMEM-resident form and as a cross-check.

    A failure to build a forced Pallas path is LOUD: backend='pallas'
    re-raises (a silent fallback would hide kernel rot).

    precision='highest' (default) keeps every all-pairs score contraction
    at the exact 6-pass f32 MXU emulation — ranks bitwise-comparable with
    the reference protocol.  'default' opts into the single-pass bf16 MXU
    form, on BOTH backends: the fused kernels measured ~1.08x on v5e
    (VPU-transcendental-bound) with MRR deltas ~5e-8 at WN18RR scale; the
    dense rankers trace their score region under
    ops/math.py::eval_matmul_precision — most relevant for GNN eval, whose
    distmult decoder sweep is a pure MXU matmul.
    """
    from complexhyperbolickge_tpu.models.chyperbolic import FFTUnitBall
    from complexhyperbolickge_tpu.models.hyperbolic import (
        AttRH,
        BaseH,
        BaseLorentz,
    )

    from complexhyperbolickge_tpu.utils.platform import is_tpu_backend

    if backend == "auto" and is_tpu_backend() \
            and model.cfg.n_entities >= AUTO_MASKLESS_MIN_ENTITIES \
            and isinstance(model, (FFTUnitBall, BaseH, BaseLorentz)):
        # r05 policy flip (verdict item 3), decided by MEASURED MRR deltas,
        # not the old rank-tie count: at YAGO scale the maskless kernel is
        # 1.19-1.26x dense per-batch / 1.35-1.38x whole-split-scan, and on
        # trained params its filtered MRR is identical to the masked
        # kernel's and within ~1e-10 of dense (benchmarks/eval_mrr_delta.py,
        # 2026-08-19: maskless == masked rank-for-rank at 5000 queries on
        # both scales; both differ from dense only on the pre-existing
        # f32-tie class, dMRR -1.9e-11 at YAGO).  Below the threshold the
        # win is ~1.07-1.09x (inside tunnel noise) and exact dense-tie
        # semantics stay the default.
        backend = "pallas_maskless"

    if backend in ("pallas", "pallas_maskless"):

        # Pallas TPU kernels lower only on TPU backends (native or
        # tunneled); elsewhere a forced 'pallas' runs in interpret mode
        on_tpu = is_tpu_backend()
        if isinstance(model, FFTUnitBall):
            from complexhyperbolickge_tpu.kernels import make_pallas_ranker

            # 'pallas_maskless' (CHYP family): subtract-filtered counting
            # with NO (B, N) mask build/stream — measured 1.19-1.26x the
            # dense ranker at YAGO scale and 1.09x at WN18RR (2026-08-19,
            # benchmarks/eval_bench.py), rank-identical to the masked
            # kernel 500/500 on-chip since the in-kernel gold-tie
            # exclusion; residual +-1 risk is exact non-gold f32 ties
            # only — see PERF_ANALYSIS §2b.
            return make_pallas_ranker(model, eval_batch_size,
                                      interpret=not on_tpu,
                                      precision=precision,
                                      masked=backend != "pallas_maskless")
        if isinstance(model, (BaseH, BaseLorentz)) and not isinstance(
                model, AttRH) and backend == "pallas_maskless":
            from complexhyperbolickge_tpu.kernels import make_pallas_hyp_ranker

            return make_pallas_hyp_ranker(model, eval_batch_size,
                                          interpret=not on_tpu,
                                          precision=precision, masked=False)
        if isinstance(model, AttRH):
            from complexhyperbolickge_tpu.kernels import (
                make_pallas_attrh_ranker,
            )

            return make_pallas_attrh_ranker(
                model, eval_batch_size, interpret=not on_tpu,
                precision=precision,
                masked=backend != "pallas_maskless")
        if backend == "pallas_maskless":
            import logging

            logging.warning(
                "backend='pallas_maskless' has no %s variant; using the "
                "masked fused kernel", type(model).__name__,
            )
        if isinstance(model, (BaseH, BaseLorentz)):
            from complexhyperbolickge_tpu.kernels import make_pallas_hyp_ranker

            return make_pallas_hyp_ranker(model, eval_batch_size,
                                          interpret=not on_tpu,
                                          precision=precision)
        import logging

        logging.warning(
            "no fused Pallas ranker exists for %s; using the dense XLA ranker",
            type(model).__name__,
        )
    return make_ranker(model, eval_batch_size, precision=precision)


def make_predictor(model, k: int = 10):
    """Compiled top-k tail prediction for (head, rel) queries — the serving
    path (beyond the reference, which only ranks gold answers).  Returns
    fn(params, queries (B, 2), filter_idx=None) -> (ids (B, k), scores
    (B, k)); filter_idx (padded known-true-tail ids, data/dataset.py
    layout) masks known facts so predictions are NEW candidates.

    NaN discipline: NaN params would make top_k return arbitrary ids with
    NaN scores — garbage served silently; the same host-side params
    finiteness check as get_ranking raises FloatingPointError instead
    (verdict cached per params object, so the serving hot path pays it
    once per checkpoint, not per request).  Finite params can STILL
    overflow to NaN scores inside score_all (inf - inf), so the returned
    top-k values get a host-side NaN check too — (B, k) is trivially small
    next to the score matmul, and the server materializes it anyway.
    -inf values are legitimate (filtered / pad columns when k exceeds the
    unfiltered candidate count); NaN never is."""

    def _check_topk(ids, vals):
        if np.isnan(np.asarray(vals)).any():
            raise FloatingPointError(
                "NaN top-k prediction scores (score overflow at serving "
                "time?) — refusing to serve arbitrary ids"
            )
        return ids, vals

    if getattr(model, "is_gnn", False):
        encode = jax.jit(lambda p: model.encode(p))
        # single-slot (params, cache) pair, written atomically — see _bind
        # in make_ranker for the two-slot interleave this prevents
        state = {"bound": None}

        @jax.jit
        def _predict(params, cache, queries, fidx):
            scores = _mask_pad_cols(
                model.score_all(params, queries, cache=cache),
                model.cfg.n_entities,
            )
            if fidx is not None:
                rows = jnp.arange(queries.shape[0])[:, None]
                scores = scores.at[rows, fidx].set(-jnp.inf, mode="drop")
            vals, ids = jax.lax.top_k(scores, k)
            return ids, vals

        def predict(params, queries, fidx=None):
            _check_params_finite(params)
            bound = state["bound"]  # single read
            if bound is None or bound[0] is not params:
                bound = (params, encode(params))
                state["bound"] = bound
            return _check_topk(*_predict(params, bound[1], queries, fidx))

        return predict

    @jax.jit
    def _predict(params, queries, fidx=None):
        scores = _mask_pad_cols(model.score_all(params, queries),
                                model.cfg.n_entities)
        if fidx is not None:
            rows = jnp.arange(queries.shape[0])[:, None]
            scores = scores.at[rows, fidx].set(-jnp.inf, mode="drop")
        vals, ids = jax.lax.top_k(scores, k)
        return ids, vals

    def predict(params, queries, fidx=None):
        _check_params_finite(params)
        return _check_topk(*_predict(params, queries, fidx))

    return predict


# Device-resident eval packs, keyed on (pack identity, batch_size).  The
# pack arrays are static per (split, direction, rel_idx) — re-uploading the
# padded filter array (B*Lmax int32, several MB at WN18RR scale) on every
# validation pass costs more than the ranking itself on a remote-tunnel
# link and is pure waste on a local chip too.  Entries hold a STRONG
# reference to the pack so the id() key cannot alias a recycled object;
# the dict is capped (FIFO) so long test sessions don't accumulate packs.
_DEVICE_PACKS: dict = {}
_DEVICE_PACKS_MAX = 64


def _device_pack(pack, batch_size: int):
    """Padded, batch-reshaped, device-resident (qb, fb) for an EvalPack."""
    key = (id(pack), batch_size)
    hit = _DEVICE_PACKS.get(key)
    if hit is not None and hit[0] is pack:
        return hit[1], hit[2]
    q, fidx = pack.queries, pack.filter_idx
    n = q.shape[0]
    nb = -(-n // batch_size)
    pad = nb * batch_size - n
    if pad:
        q = np.concatenate([q, np.broadcast_to(q[:1], (pad, 3))], axis=0)
        fidx = np.concatenate(
            [fidx, np.broadcast_to(fidx[:1], (pad, fidx.shape[1]))], axis=0
        )
    qb = jnp.asarray(q.reshape(nb, batch_size, 3))
    fb = jnp.asarray(fidx.reshape(nb, batch_size, fidx.shape[1]))
    if len(_DEVICE_PACKS) >= _DEVICE_PACKS_MAX:
        # same lock-free eviction race as _FINITE_CACHE below: two threads
        # (validation concurrent with serving) can both pick the oldest key
        try:
            _DEVICE_PACKS.pop(next(iter(_DEVICE_PACKS)), None)
        except (StopIteration, RuntimeError):
            pass  # concurrent mutation emptied/resized it: fine
    _DEVICE_PACKS[key] = (pack, qb, fb)
    return qb, fb


@jax.jit
def _all_finite(params):
    """Single-dispatch finiteness check over every float leaf — the
    reference's NaN assert on the score matrix (models/base.py:259-260)
    moved to its root cause: non-finite scores in practice mean diverged
    params.  One fused program (not one dispatch per leaf — per-dispatch
    round trips dominate on a remote-tunnel link), applied identically to
    every ranking backend without touching the compiled rank programs
    (an in-program full-matrix isfinite reduce flips exact score ties —
    see _rank_one)."""
    flags = [
        jnp.all(jnp.isfinite(leaf))
        for leaf in jax.tree.leaves(params)
        if jnp.issubdtype(leaf.dtype, jnp.inexact)
    ]
    return jnp.all(jnp.stack(flags)) if flags else jnp.asarray(True)


# params finiteness verdict cached per params object — eval calls
# get_ranking 2x per split (lhs/rhs) with the same pytree.  Entries hold
# WEAK refs to the leaf arrays, never the pytree: a strong ref would pin a
# superseded epoch's entire entity table in HBM until eviction (GBs at the
# scales the sharded rankers exist for).  Validity = every leaf is the
# SAME object as the cached weakrefs' — sound even across id() recycling,
# because jax arrays are immutable so identical leaves imply an identical
# verdict; a dead weakref simply misses and rechecks.
_FINITE_CACHE: dict = {}
_FINITE_CACHE_MAX = 8


def _check_params_finite(params):
    leaves = jax.tree.leaves(params)
    key = id(params)
    hit = _FINITE_CACHE.get(key)
    if (hit is not None and len(hit[0]) == len(leaves)
            and all(r() is l for r, l in zip(hit[0], leaves))):
        ok = hit[1]
    else:
        ok = bool(_all_finite(params))
        try:
            refs = tuple(weakref.ref(l) for l in leaves)
        except TypeError:  # non-weakrefable leaf (plain scalar): skip caching
            refs = None
        if refs is not None:
            if len(_FINITE_CACHE) >= _FINITE_CACHE_MAX:
                # default=None: two serving threads can race to evict the
                # same oldest key; losing that race must not KeyError a
                # live predict() request
                try:
                    _FINITE_CACHE.pop(next(iter(_FINITE_CACHE)), None)
                except (StopIteration, RuntimeError):
                    pass  # concurrent mutation emptied/resized it: fine
            _FINITE_CACHE[key] = (refs, ok)
    if not ok:
        raise FloatingPointError(
            "non-finite model parameters entering evaluation (diverged "
            "training run?) — ranks would silently read as 1"
        )


# Default rankers cached per (model identity, precision): a fresh
# make_ranker per call would build brand-new jit closures, so jax's
# compilation cache never hits and every validation pass pays a full
# rank-program compile (40s-6min through the remote tunnel).  Strong
# model reference (same id()-aliasing policy as _DEVICE_PACKS), FIFO cap.
_DEFAULT_RANKERS: dict = {}
_DEFAULT_RANKERS_MAX = 16


def _default_ranker(model, precision: str = "highest"):
    key = (id(model), precision)
    hit = _DEFAULT_RANKERS.get(key)
    if hit is not None and hit[0] is model:
        return hit[1]
    fn = make_ranker(model, precision=precision)
    if len(_DEFAULT_RANKERS) >= _DEFAULT_RANKERS_MAX:
        try:
            _DEFAULT_RANKERS.pop(next(iter(_DEFAULT_RANKERS)), None)
        except (StopIteration, RuntimeError):
            pass  # concurrent eviction race: fine
    _DEFAULT_RANKERS[key] = (model, fn)
    return fn


def get_ranking(model, params, pack, batch_size: int = 500, rank_fn=None):
    """Ranks of the gold entity for every query in an EvalPack."""
    _check_params_finite(params)
    rank_fn = rank_fn or _default_ranker(model)
    n = pack.queries.shape[0]
    qb, fb = _device_pack(pack, batch_size)
    if hasattr(rank_fn, "rank_many"):
        # one dispatch for the whole split (scan-compiled)
        out = np.asarray(rank_fn.rank_many(params, qb, fb)).reshape(-1)[:n]
    else:
        ranks = []
        for i in range(qb.shape[0]):
            # keep results on device: batches pipeline through jax's async
            # dispatch instead of syncing to host every iteration
            ranks.append(rank_fn(params, qb[i], fb[i]))
        out = np.concatenate([np.asarray(r) for r in ranks])[:n]
    if not np.isfinite(out).all():  # NaN discipline: must survive python -O
        raise FloatingPointError("non-finite ranks in evaluation")
    return out


def _direction_metrics(ranks: np.ndarray):
    return {
        "MR": float(np.mean(ranks)),
        "MRR": float(np.mean(1.0 / ranks)),
        "hits@[1,3,10]": [float(np.mean(ranks <= k)) for k in (1, 3, 10)],
    }


def compute_metrics(model, params, dataset, split: str, batch_size: int = 500,
                    rel_idx: int = -1, rank_fn=None):
    """Both-direction filtered metrics (reference models/base.py:282-322)."""
    rank_fn = rank_fn or _default_ranker(model)
    out = {}
    for direction in ("rhs", "lhs"):
        pack = dataset.eval_pack(split, direction, rel_idx=rel_idx)
        if len(pack.queries) == 0:
            out[direction] = {"MR": 0.0, "MRR": 0.0, "hits@[1,3,10]": [0.0] * 3}
            continue
        ranks = get_ranking(model, params, pack, batch_size, rank_fn=rank_fn)
        out[direction] = _direction_metrics(ranks)
    return out


def avg_both(metrics):
    """Average lhs/rhs metric dicts (reference utils/train.py:23-37)."""
    lhs, rhs = metrics["lhs"], metrics["rhs"]
    return {
        "MR": (lhs["MR"] + rhs["MR"]) / 2,
        "MRR": (lhs["MRR"] + rhs["MRR"]) / 2,
        "hits@[1,3,10]": [
            (a + b) / 2 for a, b in zip(lhs["hits@[1,3,10]"], rhs["hits@[1,3,10]"])
        ],
    }


def format_metrics(metrics, split: str) -> str:
    """Log line formatting (reference utils/train.py:40-47)."""
    h = metrics["hits@[1,3,10]"]
    return (
        f"\t {split} MR: {metrics['MR']:.2f} | MRR: {metrics['MRR']:.3f} | "
        f"H@1: {h[0]:.3f} | H@3: {h[1]:.3f} | H@10: {h[2]:.3f}"
    )


def count_params(params) -> int:
    """Total parameter count (reference utils/train.py:59-67)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
