"""Fused Pallas ranking kernel for the Poincare-ball (BaseH) model family.

Same skeleton as chyp_rank.py — one MXU matmul per entity tile + a fused
VPU epilogue + masked rank counting, so the (B, N) score matrix never
reaches HBM — with the BaseH epilogue: the reference's double-folded
expmap0/tanh Poincare distance with per-query curvature
(models/hyperbolic.py:45-49, utils/hyperbolic.py:194-216; folded all-pairs
derivation in ops/hyperbolic.py::hyp_sim_expmap_all).

Covers RotH / RefH / AttH / IsoH / IFFTH (every BaseH model whose sim is
-hyp_distance_multi_c(lhs, expmap0(rhs, c), c)^2), the Lorentz family
(RotLH / HyboNet), and AttRH (its own kernel: two single-fold half-space
distances with learned 2-way weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from complexhyperbolickge_tpu.kernels.chyp_rank import _PRECISIONS
from complexhyperbolickge_tpu.ops.math import MIN_NORM, ball_eps, round_up


def _tanh15(x):
    return jnp.tanh(jnp.clip(x, -15, 15))


def _artanh(x):
    x = jnp.clip(x, -1 + 1e-5, 1 - 1e-5)
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def _poincare_dist(xv, un, c, x2, eps):
    """Shared BaseH epilogue (kernel tiles AND the maskless subtraction):
    double-folded expmap0/tanh Poincare distance with per-query curvature.
    xv = <x, v/||v||>, un = ||v||; broadcasting shapes are the caller's."""
    sqrt_c = jnp.sqrt(c)
    # expmap0 radius with project() clip, then the distance's second fold
    m = _tanh15(sqrt_c * un) / sqrt_c
    m = jnp.minimum(m, (1.0 - eps) / sqrt_c)
    gamma = _tanh15(sqrt_c * m) / sqrt_c
    c1 = 1.0 - 2.0 * c * gamma * xv + c * gamma * gamma
    c2 = 1.0 - c * x2
    num = jnp.sqrt(
        jnp.maximum(
            c1 * c1 * x2 + c2 * c2 * gamma * gamma - 2.0 * c1 * c2 * gamma * xv,
            MIN_NORM,  # same floor as ops/hyperbolic.py so dense and fused
        )          # rankers agree bitwise at coincident points
    )
    denom = 1.0 - 2.0 * c * gamma * xv + c * c * gamma * gamma * x2
    pn = num / jnp.maximum(denom, MIN_NORM)
    return 2.0 * _artanh(sqrt_c * pn) / sqrt_c


def _lorentz_dist(xdir, un, c, x2, eps):
    """Shared BaseLorentz epilogue: folded expmap0_lorentz + hyperboloid
    distance (ops/hyperbolic.py::lorentz_sim_expmap_all; reference
    models/hyperbolic.py:330-334, utils/hyperbolic.py:109-121,218-239)."""
    sqrt_c = jnp.sqrt(c)
    alpha = sqrt_c * un
    # sinh(a)/a: Pallas TPU lowers neither sinh nor expm1, so use the exp
    # form with a Taylor branch below the f32 cancellation crossover (~0.1);
    # series error there is ~a^6/5040 < 3e-10
    sinh_ratio = jnp.where(
        alpha < 0.1,
        1.0 + (alpha * alpha / 6.0) * (1.0 + alpha * alpha / 20.0),
        (jnp.exp(alpha) - jnp.exp(-alpha))
        / (2.0 * jnp.maximum(alpha, MIN_NORM)),
    )
    s = sinh_ratio * un  # expmap0_lorentz radius
    x0 = jnp.sqrt(x2 + 1.0 / c)
    v0 = jnp.sqrt(s * s + 1.0 / c)
    res = xdir * s - x0 * v0
    # arcosh with the reference's clamp_min(1 + 1e-6); log+sqrt form
    z = jnp.maximum(-c * res, 1.0 + 1e-6)
    return jnp.log(z + jnp.sqrt(z * z - 1.0)) / sqrt_c


_DISTS = {"poincare": _poincare_dist, "lorentz": _lorentz_dist}


def _hyp_scores(lhs, rhs_t, c, x2, bt, *, family: str, eps: float,
                precision: str):
    """Tile score block: one MXU contraction + the family epilogue — shared
    verbatim by the masked/nomask kernels (and mirrored with the same
    dot_general form by the maskless subtraction)."""
    acc = jax.lax.dot_general(
        lhs, rhs_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISIONS[precision],
    )  # (B, T) = <x, v>
    un_sq = jnp.sum(rhs_t * rhs_t, axis=1, keepdims=True).T  # (1, T)
    un = jnp.sqrt(jnp.maximum(un_sq, MIN_NORM * MIN_NORM))
    dist = _DISTS[family](acc / un, un, c, x2, eps)
    return bt - dist * dist


def _hyp_rank_kernel(lhs_ref, x2_ref, c_ref, t2_ref, rhs_ref, bt_ref,
                     mask_ref, out_ref, *, eps: float, family: str,
                     precision: str = "highest"):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    score = _hyp_scores(lhs_ref[:], rhs_ref[:], c_ref[:], x2_ref[:], bt_ref[:],
                        family=family, eps=eps, precision=precision)
    maskf = mask_ref[:].astype(jnp.float32)
    keep = jnp.where(score >= t2_ref[:], 1.0 - maskf, 0.0)
    out_ref[:] += jnp.sum(keep, axis=1)[None, :]


def _hyp_rank_kernel_nomask(lhs_ref, x2_ref, c_ref, t2_ref, gold_ref, rhs_ref,
                            bt_ref, out_ref, *, tile_n: int, eps: float,
                            family: str, precision: str = "highest"):
    """Maskless tile: counts ALL entities with score >= t2 EXCEPT the gold
    row (gold_ref: (B,1) i32 row index; -1 = not in this table/shard — see
    chyp_rank.py::_rank_kernel_nomask for why the gold's tie must be
    excluded in-kernel).  The CALLER must prep bt_row with -1e30 pad slots
    (hyp tables' pad rows are zeros, whose finite distance could otherwise
    outrank); filtered entities are subtracted outside
    (hyp_rank_counts_nomask)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    score = _hyp_scores(lhs_ref[:], rhs_ref[:], c_ref[:], x2_ref[:], bt_ref[:],
                        family=family, eps=eps, precision=precision)
    b = score.shape[0]
    col = i * tile_n + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    notgold = jnp.minimum(
        jnp.abs((col - gold_ref[:]).astype(jnp.float32)), 1.0
    )
    keep = jnp.where(score >= t2_ref[:], notgold, jnp.float32(0.0))
    out_ref[:] += jnp.sum(keep, axis=1)[None, :]


def _attrh_half_dist_sq(xv, un, c, x2):
    """Shared AttRH half-space distance² epilogue (kernel tiles AND the
    maskless subtraction): SINGLE-fold Poincare distance — the reference
    scores RAW rhs halves (models/hyperbolic.py:172-184 via
    hyp_distance_multi_c, no expmap0 of the candidate), so gamma folds the
    candidate norm once, unlike the BaseH double-fold.  xv = <x, v/||v||>,
    un = ||v||; broadcasting shapes are the caller's."""
    sqrt_c = jnp.sqrt(c)
    gamma = _tanh15(sqrt_c * un) / sqrt_c  # single fold: raw rhs norm
    c1 = 1.0 - 2.0 * c * gamma * xv + c * gamma * gamma
    c2 = 1.0 - c * x2
    num = jnp.sqrt(
        jnp.maximum(
            c1 * c1 * x2 + c2 * c2 * gamma * gamma
            - 2.0 * c1 * c2 * gamma * xv,
            MIN_NORM,  # same floor as the dense path
        )
    )
    denom = 1.0 - 2.0 * c * gamma * xv + c * c * gamma * gamma * x2
    pn = num / jnp.maximum(denom, MIN_NORM)
    dist = 2.0 * _artanh(sqrt_c * pn) / sqrt_c
    return dist * dist


def _attrh_scores(lhs_rot, lhs_ref, rhs_rot_t, rhs_ref_t, c, x2r, x2f,
                  w0, w1, bt, *, precision: str):
    """AttRH tile score block — shared verbatim by the masked/nomask kernels
    (and mirrored with the same dot_general form by the maskless
    subtraction):

        score = bt - w0*d(lhs_rot, rhs_rot)^2 - w1*d(lhs_ref, rhs_ref)^2
    """

    def half_dist_sq(lhs, rhs_t, x2):
        acc = jax.lax.dot_general(
            lhs, rhs_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PRECISIONS[precision],
        )  # (B, T) = <x, v>
        un_sq = jnp.sum(rhs_t * rhs_t, axis=1, keepdims=True).T  # (1, T)
        un = jnp.sqrt(jnp.maximum(un_sq, MIN_NORM * MIN_NORM))
        return _attrh_half_dist_sq(acc / un, un, c, x2)

    d2_rot = half_dist_sq(lhs_rot, rhs_rot_t, x2r)
    d2_ref = half_dist_sq(lhs_ref, rhs_ref_t, x2f)
    return bt - w0 * d2_rot - w1 * d2_ref


def _attrh_rank_kernel(lhs_rot_ref, lhs_ref_ref, x2r_ref, x2f_ref, c_ref,
                       w0_ref, w1_ref, t2_ref, rhs_rot_ref, rhs_ref_ref,
                       bt_ref, mask_ref, out_ref, *,
                       precision: str = "highest"):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    score = _attrh_scores(lhs_rot_ref[:], lhs_ref_ref[:], rhs_rot_ref[:],
                          rhs_ref_ref[:], c_ref[:], x2r_ref[:], x2f_ref[:],
                          w0_ref[:], w1_ref[:], bt_ref[:],
                          precision=precision)
    maskf = mask_ref[:].astype(jnp.float32)
    keep = jnp.where(score >= t2_ref[:], 1.0 - maskf, 0.0)
    out_ref[:] += jnp.sum(keep, axis=1)[None, :]


def _attrh_rank_kernel_nomask(lhs_rot_ref, lhs_ref_ref, x2r_ref, x2f_ref,
                              c_ref, w0_ref, w1_ref, t2_ref, gold_ref,
                              rhs_rot_ref, rhs_ref_ref, bt_ref, out_ref, *,
                              tile_n: int, precision: str = "highest"):
    """Maskless AttRH tile: counts ALL entities with score >= t2 except the
    gold row (gold_ref: (B,1) i32 row index; -1 = not in this table/shard —
    see chyp_rank.py::_rank_kernel_nomask for why the gold's tie must be
    excluded in-kernel).  The CALLER preps bt_row with -1e30 pad slots (the
    zero pad rows' two half distances are finite); filtered entities are
    subtracted outside (attrh_rank_counts_nomask)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    score = _attrh_scores(lhs_rot_ref[:], lhs_ref_ref[:], rhs_rot_ref[:],
                          rhs_ref_ref[:], c_ref[:], x2r_ref[:], x2f_ref[:],
                          w0_ref[:], w1_ref[:], bt_ref[:],
                          precision=precision)
    b = score.shape[0]
    col = i * tile_n + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    notgold = jnp.minimum(
        jnp.abs((col - gold_ref[:]).astype(jnp.float32)), 1.0
    )
    keep = jnp.where(score >= t2_ref[:], notgold, jnp.float32(0.0))
    out_ref[:] += jnp.sum(keep, axis=1)[None, :]


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "interpret", "precision"))
def attrh_rank_counts(lhs_rot, lhs_ref, x2r, x2f, c, w0, w1, t2, rhs_rot,
                      rhs_ref, bt_row, mask, *, tile_n: int = 512,
                      interpret: bool = False, precision: str = "highest"):
    b, dp = lhs_rot.shape
    np_, _ = rhs_rot.shape
    assert np_ % tile_n == 0
    col = pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    counts = pl.pallas_call(
        functools.partial(_attrh_rank_kernel, precision=precision),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        grid=(np_ // tile_n,),
        in_specs=[
            pl.BlockSpec((b, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            col, col, col, col, col, col,
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lhs_rot, lhs_ref, x2r, x2f, c, w0, w1, t2, rhs_rot, rhs_ref, bt_row,
      mask)
    return counts[0]


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "interpret", "precision"))
def attrh_rank_counts_nomask(lhs_rot, lhs_ref, x2r, x2f, c, w0, w1, t2,
                             rhs_rot, rhs_ref, bt_row, fidx, f_ok=None,
                             gold=None, *, tile_n: int = 512,
                             interpret: bool = False,
                             precision: str = "highest"):
    """Maskless AttRH counting: the kernel counts every entity (caller preps
    bt_row with -1e30 pad slots) and the filtered entities' scores are
    recomputed with the SAME flat dot_general form + two-half epilogue and
    subtracted, chunked over queries like hyp_rank_counts_nomask.  f_ok and
    gold as in the other families: the gold row (score == t2 by
    construction) is excluded from BOTH sides and the caller adds back its
    deterministic contribution.  Residual +-1 risk: exact non-gold score
    ties only."""
    b, dp = lhs_rot.shape
    np_, _ = rhs_rot.shape
    assert np_ % tile_n == 0
    gold_col = (jnp.full((b, 1), -1, jnp.int32) if gold is None
                else gold.astype(jnp.int32).reshape(b, 1))
    col = pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    counts = pl.pallas_call(
        functools.partial(_attrh_rank_kernel_nomask, tile_n=tile_n,
                          precision=precision),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        grid=(np_ // tile_n,),
        in_specs=[
            pl.BlockSpec((b, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            col, col, col, col, col, col, col,
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lhs_rot, lhs_ref, x2r, x2f, c, w0, w1, t2, gold_col, rhs_rot, rhs_ref,
      bt_row)[0]

    f = jnp.minimum(fidx.astype(jnp.int32), np_ - 1)  # (B, L)
    l = f.shape[1]
    ok = (jnp.ones(f.shape, jnp.float32) if f_ok is None
          else f_ok.astype(jnp.float32))
    # the gold's slot (if present) is excluded from the subtraction too —
    # the kernel above never counted it
    ok = ok * (f != gold_col).astype(jnp.float32)
    g = min(b, 64)
    bp = round_up(b, g)
    if bp != b:  # pad queries; padded rows' counts are sliced away below
        f = jnp.concatenate(
            [f, jnp.full((bp - b, l), np_ - 1, jnp.int32)], axis=0)
        ok = jnp.concatenate([ok, jnp.zeros((bp - b, l), jnp.float32)], axis=0)

    def _padq(a, fill):
        return jnp.concatenate(
            [a, jnp.full((bp - b, a.shape[1]), fill, a.dtype)], axis=0)

    lr_p, lf_p = _padq(lhs_rot, 0.0), _padq(lhs_ref, 0.0)
    x2r_p, x2f_p = _padq(x2r, 0.0), _padq(x2f, 0.0)
    c_p = _padq(c, 1.0)  # curvature 1 on pad queries: keeps sqrt_c finite
    w0_p, w1_p = _padq(w0, 0.0), _padq(w1, 0.0)
    t2_p = _padq(t2, 0.0)
    diag = jnp.arange(g)

    def chunk_counts(args):
        lr, lf, fc, okc, x2rc, x2fc, cc, w0c, w1c, t2c = args

        def half(lc, table, x2c):
            rows = table[fc.reshape(-1)]  # (G*L, Dp)
            acc = jax.lax.dot_general(
                lc, rows,
                dimension_numbers=(((1,), (1,)), ((), ())),  # == tile form
                preferred_element_type=jnp.float32,
                precision=_PRECISIONS[precision],
            ).reshape(g, g, l)[diag, diag]  # (G, L) per-query diagonal
            un_sq = jnp.sum(rows * rows, axis=-1).reshape(g, l)
            un = jnp.sqrt(jnp.maximum(un_sq, MIN_NORM * MIN_NORM))
            return _attrh_half_dist_sq(acc / un, un, cc, x2c)

        d2r = half(lr, rhs_rot, x2rc)
        d2f = half(lf, rhs_ref, x2fc)
        score_f = bt_row[0, fc] - w0c * d2r - w1c * d2f
        return jnp.sum(
            jnp.where(score_f >= t2c, okc, jnp.float32(0.0)), axis=1,
        )

    nchunk = bp // g
    count_f = jax.lax.map(
        chunk_counts,
        (lr_p.reshape(nchunk, g, dp), lf_p.reshape(nchunk, g, dp),
         f.reshape(nchunk, g, l), ok.reshape(nchunk, g, l),
         x2r_p.reshape(nchunk, g, 1), x2f_p.reshape(nchunk, g, 1),
         c_p.reshape(nchunk, g, 1), w0_p.reshape(nchunk, g, 1),
         w1_p.reshape(nchunk, g, 1), t2_p.reshape(nchunk, g, 1)),
    ).reshape(bp)[:b]
    return counts - count_f


class PallasAttRHRanker:
    """Drop-in filtered ranker for AttRH (the one BaseH model whose sim
    splits the feature axis; round-1 verdict item 8)."""

    def __init__(self, model, batch_size: int, tile_n: int = 512,
                 interpret: bool = False, precision: str = "highest",
                 masked: bool = True):
        from complexhyperbolickge_tpu.models.hyperbolic import AttRH

        assert isinstance(model, AttRH)
        assert precision in _PRECISIONS, precision
        self.model = model
        self.tile_n = tile_n
        self.interpret = interpret
        self.precision = precision
        # masked=False: subtract-filtered counting over BOTH half tables,
        # same trade as the other families' maskless rankers
        self.masked = masked
        self._prep = jax.jit(self._prepare_tables)
        self._one = jax.jit(self._rank_one)
        self._scan = jax.jit(self._rank_scan)
        self._tables_params = None
        self._tables = None

    def _prepare_tables(self, params):
        ent = params["entity"].astype(jnp.float32)
        n, d = ent.shape
        half = d // 2
        # n+1 guarantees >= 1 pad row so padded filter ids (== n_entities)
        # clamp onto an unreachable row in the maskless path (chyp trick)
        np_ = round_up(n + 1, self.tile_n)
        dp = round_up(half, 128)
        rot = jnp.zeros((np_, dp), jnp.float32).at[:n, :half].set(ent[:, :half])
        ref = jnp.zeros((np_, dp), jnp.float32).at[:n, :half].set(ent[:, half:])
        bt = params["bt"][:, 0].astype(jnp.float32)
        if self.model.cfg.bias != "learn":
            bt = jnp.zeros_like(bt)
        # pad slots carry -1e30: the zero pad rows' two half distances are
        # FINITE, so the maskless kernel needs them below any threshold;
        # the masked kernel's pad-row mask bits make the fill a no-op there
        bt_row = jnp.full((1, np_), -1e30, jnp.float32).at[0, :n].set(bt)
        return rot, ref, bt_row

    def _queries_core(self, params, q, rhs_rot):
        model = self.model
        dp = rhs_rot.shape[1]
        b = q.shape[0]
        (lhs2, c, w), lhs_b = model.get_queries(params, q[:, :2])
        lhs2 = lhs2.astype(jnp.float32)
        c = jnp.broadcast_to(c.astype(jnp.float32), (b, 1))
        w = w.astype(jnp.float32)
        half = lhs2.shape[-1] // 2
        l_rot = jnp.zeros((b, dp), jnp.float32).at[:, :half].set(lhs2[:, :half])
        l_ref = jnp.zeros((b, dp), jnp.float32).at[:, :half].set(lhs2[:, half:])
        x2r = jnp.sum(lhs2[:, :half] ** 2, axis=-1, keepdims=True)
        x2f = jnp.sum(lhs2[:, half:] ** 2, axis=-1, keepdims=True)

        gold = model.sim((lhs2, c, w),
                         params["entity"][q[:, 2]].astype(jnp.float32)
                         [:, None, :], all_pairs=False)[:, 0:1]
        t2 = gold
        if model.cfg.bias == "learn":
            t2 = t2 + params["bt"][q[:, 2]].astype(jnp.float32)
        return l_rot, l_ref, x2r, x2f, c, w[:, 0:1], w[:, 1:2], t2

    def _rank_one(self, params, q, fidx, rhs_rot, rhs_ref, bt_row):
        np_ = rhs_rot.shape[0]
        b = q.shape[0]
        (l_rot, l_ref, x2r, x2f, c, w0, w1, t2) = self._queries_core(
            params, q, rhs_rot
        )
        if self.masked:
            mask = jnp.zeros((b, np_), jnp.int8)
            mask = mask.at[:, self.model.cfg.n_entities :].set(1)
            mask = mask.at[jnp.arange(b)[:, None], fidx].set(1, mode="drop")
            counts = attrh_rank_counts(
                l_rot, l_ref, x2r, x2f, c, w0, w1, t2, rhs_rot, rhs_ref,
                bt_row, mask, tile_n=self.tile_n, interpret=self.interpret,
                precision=self.precision,
            )
        else:
            gold = q[:, 2].astype(jnp.int32)
            counts = attrh_rank_counts_nomask(
                l_rot, l_ref, x2r, x2f, c, w0, w1, t2, rhs_rot, rhs_ref,
                bt_row, fidx, None, gold,
                tile_n=self.tile_n, interpret=self.interpret,
                precision=self.precision,
            )
            # gold excluded in-kernel + from the subtraction; add back its
            # deterministic dense-path contribution (0 when filtered)
            gold_filtered = jnp.any(
                fidx.astype(jnp.int32) == gold[:, None], axis=1
            )
            counts = counts + jnp.where(gold_filtered, 0.0, 1.0)
        # t2*0: NaN-params discipline (see chyp_rank.py::_rank_one)
        return 1.0 + counts + (t2[:, 0] * 0.0).astype(jnp.float32)

    def _rank_scan(self, params, qb, fb, rhs_rot, rhs_ref, bt_row):
        return jax.lax.map(
            lambda x: self._rank_one(params, *x, rhs_rot, rhs_ref, bt_row),
            (qb, fb),
        )

    def _get_tables(self, params):
        if self._tables_params is not params:
            self._tables_params, self._tables = params, self._prep(params)
        return self._tables

    def rank_many(self, params, qb, fb):
        rhs_rot, rhs_ref, bt_row = self._get_tables(params)
        return self._scan(params, qb, fb, rhs_rot, rhs_ref, bt_row)

    def __call__(self, params, q, fidx):
        rhs_rot, rhs_ref, bt_row = self._get_tables(params)
        return self._one(params, q, fidx, rhs_rot, rhs_ref, bt_row)


def make_pallas_attrh_ranker(model, batch_size: int, interpret: bool = False,
                             **kw):
    return PallasAttRHRanker(model, batch_size, interpret=interpret, **kw)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret",
                                              "family", "precision"))
def hyp_rank_counts(lhs_pad, x2, c, t2, rhs_pad, bt_row, mask, *,
                    tile_n: int = 512, interpret: bool = False,
                    family: str = "poincare", precision: str = "highest"):
    b, dp = lhs_pad.shape
    np_, _ = rhs_pad.shape
    assert np_ % tile_n == 0
    eps = float(ball_eps(jnp.float32))
    counts = pl.pallas_call(
        functools.partial(_hyp_rank_kernel, eps=eps, family=family,
                          precision=precision),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        grid=(np_ // tile_n,),
        in_specs=[
            pl.BlockSpec((b, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lhs_pad, x2, c, t2, rhs_pad, bt_row, mask)
    return counts[0]


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret",
                                              "family", "precision"))
def hyp_rank_counts_nomask(lhs_pad, x2, c, t2, rhs_pad, bt_row, fidx,
                           f_ok=None, gold=None, *, tile_n: int = 512,
                           interpret: bool = False,
                           family: str = "poincare",
                           precision: str = "highest"):
    """Maskless hyp/Lorentz counting: the kernel counts every entity (the
    caller preps bt_row with -1e30 pad slots so zero pad rows are
    unreachable) and the filtered entities' scores are recomputed with the
    SAME flat dot_general form + family epilogue and subtracted, chunked
    over queries like chyp_rank_counts_nomask.  f_ok and gold as in the
    chyp variant: the gold row (whose score ties t2 by construction) is
    excluded from BOTH sides and the caller adds back its deterministic
    contribution — without this, tile-vs-flat gemm-shape rounding flips the
    gold's >= on one side only (+-1 rank; observed even on CPU at batched
    shapes).  Residual +-1 risk: exact non-gold score ties only."""
    b, dp = lhs_pad.shape
    np_, _ = rhs_pad.shape
    assert np_ % tile_n == 0
    eps = float(ball_eps(jnp.float32))
    gold_col = (jnp.full((b, 1), -1, jnp.int32) if gold is None
                else gold.astype(jnp.int32).reshape(b, 1))
    counts = pl.pallas_call(
        functools.partial(_hyp_rank_kernel_nomask, tile_n=tile_n, eps=eps,
                          family=family, precision=precision),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        grid=(np_ // tile_n,),
        in_specs=[
            pl.BlockSpec((b, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lhs_pad, x2, c, t2, gold_col, rhs_pad, bt_row)[0]

    f = jnp.minimum(fidx.astype(jnp.int32), np_ - 1)  # (B, L)
    l = f.shape[1]
    ok = (jnp.ones(f.shape, jnp.float32) if f_ok is None
          else f_ok.astype(jnp.float32))
    # the gold's slot (if present) is excluded from the subtraction too —
    # the kernel above never counted it
    ok = ok * (f != gold_col).astype(jnp.float32)
    g = min(b, 64)
    bp = round_up(b, g)
    if bp != b:
        f = jnp.concatenate(
            [f, jnp.full((bp - b, l), np_ - 1, jnp.int32)], axis=0)
        ok = jnp.concatenate([ok, jnp.zeros((bp - b, l), jnp.float32)], axis=0)
    lhs_p = jnp.concatenate([lhs_pad, jnp.zeros((bp - b, dp), lhs_pad.dtype)])
    x2_p = jnp.concatenate([x2, jnp.ones((bp - b, 1), x2.dtype)])
    c_p = jnp.concatenate([c, jnp.ones((bp - b, 1), c.dtype)])
    t2_p = jnp.concatenate([t2, jnp.zeros((bp - b, 1), t2.dtype)])
    diag = jnp.arange(g)

    def chunk_counts(args):
        lc, fc, okc, x2c, cc, t2c = args  # (G,Dp) (G,L) (G,L) (G,1)x3
        rows = rhs_pad[fc.reshape(-1)]  # (G*L, Dp)
        acc = jax.lax.dot_general(
            lc, rows,
            dimension_numbers=(((1,), (1,)), ((), ())),  # == tile kernel form
            preferred_element_type=jnp.float32,
            precision=_PRECISIONS[precision],
        ).reshape(g, g, l)[diag, diag]  # (G, L) per-query diagonal block
        un_sq = jnp.sum(rows * rows, axis=-1).reshape(g, l)
        un = jnp.sqrt(jnp.maximum(un_sq, MIN_NORM * MIN_NORM))
        dist = _DISTS[family](acc / un, un, cc, x2c, eps)
        score_f = bt_row[0, fc] - dist * dist
        return jnp.sum(
            jnp.where(score_f >= t2c, okc, jnp.float32(0.0)), axis=1,
        )

    nchunk = bp // g
    count_f = jax.lax.map(
        chunk_counts,
        (lhs_p.reshape(nchunk, g, dp), f.reshape(nchunk, g, l),
         ok.reshape(nchunk, g, l), x2_p.reshape(nchunk, g, 1),
         c_p.reshape(nchunk, g, 1), t2_p.reshape(nchunk, g, 1)),
    ).reshape(bp)[:b]
    return counts - count_f


class PallasHypRanker:
    """Drop-in filtered ranker for the BaseH family (not AttRH) and the
    BaseLorentz family (RotLH, HyboNet)."""

    def __init__(self, model, batch_size: int, tile_n: int = 512,
                 interpret: bool = False, precision: str = "highest",
                 masked: bool = True):
        from complexhyperbolickge_tpu.models.hyperbolic import (
            AttRH,
            BaseH,
            BaseLorentz,
        )

        assert (isinstance(model, BaseH) and not isinstance(model, AttRH)) or \
            isinstance(model, BaseLorentz)
        assert precision in _PRECISIONS, precision
        self.family = "poincare" if isinstance(model, BaseH) else "lorentz"
        self.model = model
        self.tile_n = tile_n
        self.interpret = interpret
        self.precision = precision
        # masked=False: subtract-filtered counting, same trade as the chyp
        # maskless ranker (no (B, N) mask build/stream; +-1 rank on exact
        # f32 MXU ties — bitwise on CPU)
        self.masked = masked
        self._prep = jax.jit(self._prepare_tables)
        self._qfn = jax.jit(self._queries)
        self._one = jax.jit(self._rank_one)
        self._scan = jax.jit(self._rank_scan)
        # padded tables cached per params version (strong-reference key)
        self._tables_params = None
        self._tables = None

    def _prepare_tables(self, params):
        ent = params["entity"].astype(jnp.float32)
        n, d = ent.shape
        # n+1 guarantees >= 1 pad row so padded filter ids (== n_entities)
        # clamp onto an unreachable row in the maskless path (chyp trick)
        np_ = round_up(n + 1, self.tile_n)
        dp = round_up(d, 128)
        rhs = jnp.zeros((np_, dp), jnp.float32).at[:n, :d].set(ent)
        bt = params["bt"][:, 0].astype(jnp.float32)
        if self.model.cfg.bias != "learn":
            bt = jnp.zeros_like(bt)
        # pad slots carry -1e30: below any threshold, so the maskless kernel
        # never counts the zero pad rows (whose distance is finite); the
        # masked kernel's pad-row mask bits make it a no-op there
        bt_row = jnp.full((1, np_), -1e30, jnp.float32).at[0, :n].set(bt)
        return rhs, bt_row

    def _queries_core(self, params, q, rhs_pad):
        model = self.model
        dp = rhs_pad.shape[1]
        b = q.shape[0]
        (lhs, c), lhs_b = model.get_queries(params, q[:, :2])
        lhs = lhs.astype(jnp.float32)
        c = c.astype(jnp.float32)
        if c.shape[0] == 1:
            c = jnp.broadcast_to(c, (b, 1))
        d = lhs.shape[-1]
        lhs_pad = jnp.zeros((b, dp), jnp.float32).at[:, :d].set(lhs)
        x2 = jnp.sum(lhs * lhs, axis=-1, keepdims=True)

        # gold target (same folded math as the kernel), lhs bias folded out
        gold = model.sim((lhs, c), params["entity"][q[:, 2]].astype(jnp.float32)
                         [:, None, :], all_pairs=False)[:, 0:1]
        t2 = gold
        if model.cfg.bias == "learn":
            t2 = t2 + params["bt"][q[:, 2]].astype(jnp.float32)
        return lhs_pad, x2, c, t2

    def _queries(self, params, q, fidx, rhs_pad, bt_row):
        np_ = rhs_pad.shape[0]
        b = q.shape[0]
        lhs_pad, x2, c, t2 = self._queries_core(params, q, rhs_pad)
        mask = jnp.zeros((b, np_), jnp.int8)
        mask = mask.at[:, self.model.cfg.n_entities :].set(1)
        mask = mask.at[jnp.arange(b)[:, None], fidx].set(1, mode="drop")
        return lhs_pad, x2, c, t2, mask

    def _rank_one(self, params, q, fidx, rhs_pad, bt_row):
        if self.masked:
            lhs_pad, x2, c, t2, mask = self._queries(params, q, fidx,
                                                     rhs_pad, bt_row)
            counts = hyp_rank_counts(
                lhs_pad, x2, c, t2, rhs_pad, bt_row, mask,
                tile_n=self.tile_n, interpret=self.interpret,
                family=self.family, precision=self.precision,
            )
        else:
            lhs_pad, x2, c, t2 = self._queries_core(params, q, rhs_pad)
            gold = q[:, 2].astype(jnp.int32)
            counts = hyp_rank_counts_nomask(
                lhs_pad, x2, c, t2, rhs_pad, bt_row, fidx, None, gold,
                tile_n=self.tile_n, interpret=self.interpret,
                family=self.family, precision=self.precision,
            )
            # gold excluded in-kernel + from the subtraction; add back its
            # deterministic dense-path contribution (0 when filtered)
            gold_filtered = jnp.any(
                fidx.astype(jnp.int32) == gold[:, None], axis=1
            )
            counts = counts + jnp.where(gold_filtered, 0.0, 1.0)
        # t2*0: NaN-params discipline (see chyp_rank.py::_rank_one)
        return 1.0 + counts + (t2[:, 0] * 0.0).astype(jnp.float32)

    def _rank_scan(self, params, qb, fb, rhs_pad, bt_row):
        return jax.lax.map(
            lambda x: self._rank_one(params, *x, rhs_pad, bt_row), (qb, fb)
        )

    def _get_tables(self, params):
        if self._tables_params is not params:
            self._tables_params, self._tables = params, self._prep(params)
        return self._tables

    def rank_many(self, params, qb, fb):
        rhs_pad, bt_row = self._get_tables(params)
        return self._scan(params, qb, fb, rhs_pad, bt_row)

    def __call__(self, params, q, fidx):
        rhs_pad, bt_row = self._get_tables(params)
        return self._one(params, q, fidx, rhs_pad, bt_row)


def make_pallas_hyp_ranker(model, batch_size: int, interpret: bool = False,
                           **kw):
    return PallasHypRanker(model, batch_size, interpret=interpret, **kw)
