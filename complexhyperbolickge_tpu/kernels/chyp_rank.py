"""Fused Pallas ranking kernel for the complex-hyperbolic (FFT) model family.

The eval hot loop scores every query against ALL entities (reference
models/base.py:243-271).  Done naively that materializes a (B, N) score
matrix in HBM (for WN18RR at B=500: ~80 MB written + re-read per batch,
dwarfing the 11 MB entity-table stream).  This kernel fuses, per entity
tile resident in VMEM:

    Hermitian form (one MXU matmul of the stacked [lhs; swap(lhs)] block)
    -> cross-ratio x -> acosh -> score = bias - dist^2
    -> masked count of {score >= target}

so the ONLY HBM outputs are (B,) rank counts: the score matrix never leaves
the chip.  Filters arrive as a dense int8 mask (built by one XLA scatter from
the padded filter indices); since the gold tail is always masked, the
rank identity  rank = 1 + #{unmasked j : s_j >= target}  is exact and
tie-free with respect to the separately-computed target score.

Feature dim is zero-padded to a lane multiple (128); zero-padding is exact
for the Hermitian form (it only adds zero terms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from complexhyperbolickge_tpu.ops.chyperbolic import swap_neg
from complexhyperbolickge_tpu.ops.math import ball_eps, round_up


_PRECISIONS = {
    # 'highest': 6-pass f32 emulation on the MXU — scores bitwise-comparable
    # with the XLA dense ranker (its dot_general also runs HIGHEST).
    # 'default': single-pass bf16 MXU — the contraction rounds inputs to
    # bf16; an opt-in throughput mode (see PallasChypRanker.precision).
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def _chyp_scores(lhs2, zn, rhs_t, bt, *, b: int, eps: float,
                 precision: str = "highest"):
    """Shared score math (kernel tile AND the host-side filtered-subtraction
    path): Hermitian form -> cross-ratio -> acosh -> bt - dist^2.  Both
    callers contract over the same padded feature axis with the same
    dot_general settings, so scores agree bitwise and the subtraction in
    chyp_rank_counts_nomask is exact."""
    acc = jax.lax.dot_general(
        lhs2, rhs_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISIONS[precision],
    )  # (2B, T)
    sr = acc[:b] - 1.0  # Re<z,w> - 1
    si = acc[b:]        # Im<z,w>

    wnorm = jnp.sum(rhs_t * rhs_t, axis=1, keepdims=True).T - 1.0  # (1, T)
    wnorm = jnp.clip(wnorm, -1.0, -eps)

    x = 2.0 * (sr * sr + si * si) / (zn * wnorm) - 1.0
    x = jnp.maximum(x, 1.0 + eps)
    # acosh(x) = log(x + sqrt(x^2 - 1)); Pallas TPU has no acosh lowering,
    # and x >= 1 + eps keeps the sqrt argument strictly positive.
    dist = jnp.log(x + jnp.sqrt(x * x - 1.0))
    return bt - dist * dist  # (1,T) + (B,T); lhs bias folded into t2


def _rank_kernel(lhs2_ref, zn_ref, t2_ref, rhs_ref, bt_ref, mask_ref, out_ref,
                 *, b: int, eps: float, precision: str):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    score = _chyp_scores(lhs2_ref[:], zn_ref[:], rhs_ref[:], bt_ref[:],
                         b=b, eps=eps, precision=precision)

    # int8 vector compares don't lower in Mosaic; use the 0/1 mask
    # arithmetically: count += [score >= t2] * (1 - mask)
    maskf = mask_ref[:].astype(jnp.float32)
    keep = jnp.where(score >= t2_ref[:], 1.0 - maskf, 0.0)
    out_ref[:] += jnp.sum(keep, axis=1)[None, :]


def _rank_kernel_nomask(lhs2_ref, zn_ref, t2_ref, gold_ref, rhs_ref, bt_ref,
                        out_ref, *, b: int, tile_n: int, eps: float,
                        precision: str):
    """Maskless tile: counts ALL entities with score >= t2 EXCEPT the gold
    row (gold_ref: (B,1) i32 row index into the padded table; -1 = not in
    this table/shard).  Table pad rows carry bt = -1e30, so they can never
    reach any threshold; filtered entities are subtracted OUTSIDE the kernel
    (chyp_rank_counts_nomask) — eliminating the (B, N) mask build + stream.

    Why the gold is excluded IN-kernel: its score ties t2 by construction,
    and the tile dot vs the subtraction's flat dot can round that tie apart
    (one ulp is enough to flip >=), double-counting or double-subtracting
    the gold by 1.  Skipping it here and in the subtraction (and adding the
    dense path's net-0-when-filtered / +1-when-not constant in the caller)
    makes the gold's contribution exact by construction on every backend.
    The not-gold mask is arithmetic (min(|col-gold|, 1)) — Mosaic has no
    int vector compare lowering (see the int8 trap in _rank_kernel)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    score = _chyp_scores(lhs2_ref[:], zn_ref[:], rhs_ref[:], bt_ref[:],
                         b=b, eps=eps, precision=precision)
    col = i * tile_n + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    notgold = jnp.minimum(
        jnp.abs((col - gold_ref[:]).astype(jnp.float32)), 1.0
    )
    keep = jnp.where(score >= t2_ref[:], notgold, jnp.float32(0.0))
    out_ref[:] += jnp.sum(keep, axis=1)[None, :]


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "interpret", "precision"))
def chyp_rank_counts(lhs2, znorm, t2, rhs_pad, bt_row, mask, *, tile_n: int = 512,
                     interpret: bool = False, precision: str = "highest"):
    """Counts #{unmasked entities with score >= t2} per query.

    lhs2:    (2B, Dp) stacked [lhs; swap_neg(lhs)] query embeddings,
             feature-padded AFTER the Re/Im swap (the swap must act on the
             true packed layout, not on padded rows)
    znorm:   (B, 1)  clamped Hermitian norm of lhs
    t2:      (B, 1)  target score minus lhs bias
    rhs_pad: (Np, Dp) entity table, rows+features padded (pad rows masked;
             feature zero-padding is exact — only zero terms enter the dots)
    bt_row:  (1, Np)  tail biases
    mask:    (B, Np)  int8, 1 = filtered out
    """
    b2, dp = lhs2.shape
    b = b2 // 2
    np_, _ = rhs_pad.shape
    assert np_ % tile_n == 0
    eps = float(ball_eps(jnp.float32))

    grid = (np_ // tile_n,)
    counts = pl.pallas_call(
        functools.partial(_rank_kernel, b=b, eps=eps, precision=precision),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * b, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lhs2, znorm, t2, rhs_pad, bt_row, mask)
    return counts[0]


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "interpret", "precision"))
def chyp_rank_counts_nomask(lhs2, znorm, t2, rhs_pad, bt_row, fidx, f_ok=None,
                            gold=None, *, tile_n: int = 512,
                            interpret: bool = False,
                            precision: str = "highest"):
    """Counts #{non-filtered, non-gold entities with score >= t2} per query,
    WITHOUT a dense (B, N) mask: the kernel counts every entity over the
    padded table (pad rows carry bt = -1e30, unreachable), and the filtered
    entities' scores are recomputed with the SAME 2-D dot_general form the
    tile kernel uses and subtracted.  fidx rows must be DEDUPLICATED
    (data/dataset.py::eval_pack guarantees it); pad value >= n_entities
    lands on a pad row and self-excludes.  f_ok (optional (B, L) bool/0-1):
    explicit per-slot validity for callers whose table slice has no
    guaranteed pad row to absorb remapped ids — the sharded ranker maps
    other shards' filter ids to row 0 with f_ok=0 (parallel/ranking.py).
    Saves ~2 x B x N bytes of mask build+stream per batch (62 MB/batch at
    YAGO3-10 scale).

    gold (optional (B,) i32 row index into THIS table; -1 = not present):
    the gold row is excluded from BOTH the kernel count and the
    subtraction — its score ties t2 by construction, and any rounding
    difference between the tile dot and the flat dot (1 ulp suffices, and
    gemm shape alone changes ulps even on CPU) flips the >= on one side
    only, shifting the rank by +-1.  The CALLER adds back the dense path's
    deterministic gold contribution: 0 if the gold is in the filter list
    (it always is under the reference protocol), else +1.  With gold=None
    the gold row is counted/subtracted like any other (pre-round-4
    semantics, tie-fragile).

    Tie exactness: the original subtraction used a BATCHED dot_general
    ((B,2,Dp) x (B,L,Dp)), which rounds differently on the MXU than the
    tile's plain 2-D contraction — ~2% of queries shifted +-1 rank on exact
    score ties.  The flat form below contracts (2G, Dp) x (G*L, Dp) with
    the tile's exact dimension_numbers/precision and takes the per-query
    diagonal blocks, chunked over queries (G <= 64) so the cross-query
    product stays ~2 MB instead of a (2B, B*L) 128 MB materialization; the
    wasted off-diagonal FLOPs are ~4% of the main sweep's at YAGO shapes.
    Residual +-1 risk after the gold fix: only exact score ties between
    DISTINCT non-gold entities across the two dot shapes."""
    b2, dp = lhs2.shape
    b = b2 // 2
    np_, _ = rhs_pad.shape
    assert np_ % tile_n == 0
    eps = float(ball_eps(jnp.float32))
    gold_col = (jnp.full((b, 1), -1, jnp.int32) if gold is None
                else gold.astype(jnp.int32).reshape(b, 1))

    counts = pl.pallas_call(
        functools.partial(_rank_kernel_nomask, b=b, tile_n=tile_n, eps=eps,
                          precision=precision),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        grid=(np_ // tile_n,),
        in_specs=[
            pl.BlockSpec((2 * b, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lhs2, znorm, t2, gold_col, rhs_pad, bt_row)[0]

    # filtered subtraction: flat same-form contraction, chunked over queries
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
    lhs_re = jnp.concatenate([lhs2[:b], jnp.zeros((bp - b, dp), lhs2.dtype)])
    lhs_im = jnp.concatenate([lhs2[b:], jnp.zeros((bp - b, dp), lhs2.dtype)])
    zn_p = jnp.concatenate([znorm, jnp.full((bp - b, 1), -1.0, znorm.dtype)])
    t2_p = jnp.concatenate([t2, jnp.zeros((bp - b, 1), t2.dtype)])
    diag = jnp.arange(g)

    def chunk_counts(args):
        fre, fim, fc, okc, znc, t2c = args  # (G,Dp) (G,Dp) (G,L) (G,L) (G,1) (G,1)
        rows = rhs_pad[fc.reshape(-1)]  # (G*L, Dp)
        lhs_gl = jnp.concatenate([fre, fim], axis=0)  # (2G, Dp)
        acc = jax.lax.dot_general(
            lhs_gl, rows,
            dimension_numbers=(((1,), (1,)), ((), ())),  # == tile kernel form
            preferred_element_type=jnp.float32,
            precision=_PRECISIONS[precision],
        )  # (2G, G*L)
        acc = acc.reshape(2 * g, g, l)
        sr = acc[:g][diag, diag] - 1.0  # (G, L) per-query diagonal block
        si = acc[g:][diag, diag]
        wnorm = jnp.clip(
            jnp.sum(rows * rows, axis=-1).reshape(g, l) - 1.0, -1.0, -eps)
        x = 2.0 * (sr * sr + si * si) / (znc * wnorm) - 1.0
        x = jnp.maximum(x, 1.0 + eps)
        dist = jnp.log(x + jnp.sqrt(x * x - 1.0))
        score_f = bt_row[0, fc] - dist * dist  # (G, L)
        return jnp.sum(
            jnp.where(score_f >= t2c, okc, jnp.float32(0.0)), axis=1,
        )

    nchunk = bp // g
    count_f = jax.lax.map(
        chunk_counts,
        (lhs_re.reshape(nchunk, g, dp), lhs_im.reshape(nchunk, g, dp),
         f.reshape(nchunk, g, l), ok.reshape(nchunk, g, l),
         zn_p.reshape(nchunk, g, 1), t2_p.reshape(nchunk, g, 1)),
    ).reshape(bp)[:b]
    return counts - count_f


class PallasChypRanker:
    """Drop-in filtered ranker for FFTUnitBall-family models.

    Pads the entity table once per params version; per batch it computes the
    query embeddings + gold-tail targets with the normal XLA path and hands
    the all-entity sweep to the fused kernel.
    """

    def __init__(self, model, batch_size: int, tile_n: int = 512,
                 interpret: bool = False, masked: bool = True,
                 precision: str = "highest"):
        from complexhyperbolickge_tpu.models.chyperbolic import FFTUnitBall

        assert isinstance(model, FFTUnitBall), "Pallas ranker is CHYP-family only"
        assert model.cfg.bias in ("learn", "none", "constant")
        assert precision in _PRECISIONS, precision
        self.model = model
        self.batch_size = batch_size
        self.tile_n = tile_n
        self.interpret = interpret
        # precision='highest' (default): 6-pass f32 MXU emulation — scores
        # bitwise-comparable with the dense ranker.  'default': single-pass
        # bf16 MXU contraction (inputs round to bf16) — an opt-in throughput
        # mode; ranks can shift where bf16 rounding crosses the (exact)
        # gold-target threshold.
        self.precision = precision
        # masked=True (default) streams a dense (B, N) int8 filter mask
        # through the kernel — bitwise tie semantics identical to the dense
        # ranker.  masked=False subtracts per-filtered-entity counts instead
        # (chyp_rank_counts_nomask): measured 1.09-1.38x faster on v5e
        # (WN18RR/YAGO shapes; the entity-table stream, not the mask,
        # dominates).  The gold's systematic tie is handled exactly (in-
        # kernel exclusion, round 4); residual +-1 risk is exact non-gold
        # score ties only — the same class in which the masked kernel
        # itself can differ from the XLA dense ranker on the MXU.  Exact
        # mask semantics stay the default; flip for throughput at scale.
        self.masked = masked
        self._prep = jax.jit(self._prepare_tables)
        self._one = jax.jit(self._rank_one)
        self._scan = jax.jit(self._rank_scan)
        # padded tables cached per params version, keyed by a STRONG
        # reference to the params object (an id() key could alias a new
        # pytree allocated at a freed address)
        self._tables_params = None
        self._tables = None

    # --------------------------- per-params prep ----------------------------

    def _prepare_tables(self, params):
        ent = params["entity"].astype(jnp.float32)
        n, d = ent.shape
        # n+1 guarantees >= 1 pad row so padded filter ids (== n_entities)
        # land on an unreachable row in the maskless path
        np_ = round_up(n + 1, self.tile_n)
        dp = round_up(d, 128)
        rhs = jnp.zeros((np_, dp), jnp.float32).at[:n, :d].set(ent)
        bt = params["bt"][:, 0].astype(jnp.float32)
        if self.model.cfg.bias != "learn":
            bt = jnp.zeros_like(bt)
        # pad rows carry bt = -1e30: below any threshold, so they never
        # count (replaces the pad-row mask slice)
        bt_row = jnp.full((1, np_), -1e30, jnp.float32).at[0, :n].set(bt)
        return rhs, bt_row

    # ----------------------------- per-batch work ----------------------------

    def _queries_core(self, params, q, rhs_pad):
        model = self.model
        b = q.shape[0]
        eps = ball_eps(jnp.float32)

        (lhs,), lhs_b = model.get_queries(params, q[:, :2])
        lhs = lhs.astype(jnp.float32)
        d = lhs.shape[-1]
        dp = rhs_pad.shape[1]
        lhs2_raw = jnp.concatenate([lhs, swap_neg(lhs)], axis=0)  # (2B, d)
        lhs2 = jnp.zeros((2 * b, dp), jnp.float32).at[:, :d].set(lhs2_raw)

        znorm = jnp.sum(lhs * lhs, axis=-1, keepdims=True) - 1.0
        znorm = jnp.clip(znorm, -1.0, -eps)

        # gold-tail target score via the plain (B,) distance
        from complexhyperbolickge_tpu.ops.chyperbolic import chyp_distance

        rhs_gold = params["entity"][q[:, 2]].astype(jnp.float32)
        d_gold = chyp_distance(lhs, rhs_gold)[:, None]
        target = -(d_gold**2)
        if model.cfg.bias == "learn":
            # score = lhs_b + bt + sim; fold lhs_b into the threshold and
            # keep bt on the tile side
            t2 = target + params["bt"][q[:, 2]].astype(jnp.float32)
        elif model.cfg.bias == "constant":
            t2 = target  # constant gamma cancels on both sides
        else:
            t2 = target
        return lhs2, znorm, t2

    def _queries_and_mask(self, params, q, fidx, rhs_pad, bt_row):
        lhs2, znorm, t2 = self._queries_core(params, q, rhs_pad)
        np_ = rhs_pad.shape[0]
        b = q.shape[0]
        # dense filter mask: one scatter from the padded index array;
        # padded table rows (ids >= n_entities) start masked
        mask = jnp.zeros((b, np_), jnp.int8)
        mask = mask.at[:, self.model.cfg.n_entities :].set(1)
        rows = jnp.arange(b)[:, None]
        mask = mask.at[rows, fidx].set(1, mode="drop")
        return lhs2, znorm, t2, mask

    def _rank_one(self, params, q, fidx, rhs_pad, bt_row):
        if self.masked:
            lhs2, znorm, t2, mask = self._queries_and_mask(
                params, q, fidx, rhs_pad, bt_row
            )
            counts = chyp_rank_counts(
                lhs2, znorm, t2, rhs_pad, bt_row, mask,
                tile_n=self.tile_n, interpret=self.interpret,
                precision=self.precision,
            )
        else:
            lhs2, znorm, t2 = self._queries_core(params, q, rhs_pad)
            gold = q[:, 2].astype(jnp.int32)
            counts = chyp_rank_counts_nomask(
                lhs2, znorm, t2, rhs_pad, bt_row, fidx, None, gold,
                tile_n=self.tile_n, interpret=self.interpret,
                precision=self.precision,
            )
            # the gold was excluded in-kernel AND from the subtraction; its
            # deterministic dense-path contribution is 0 when filtered
            # (always, under the reference protocol) and +1 otherwise
            gold_filtered = jnp.any(
                fidx.astype(jnp.int32) == gold[:, None], axis=1
            )
            counts = counts + jnp.where(gold_filtered, 0.0, 1.0)
        # NaN discipline: counts are sums of comparisons (finite by
        # construction), so NaN params would silently rank everything 1.
        # t2 * 0 is 0 when the gold-target score is finite and NaN
        # otherwise, making get_ranking's host isfinite check fire loudly
        # (whole-params divergence is caught earlier by get_ranking's
        # host-side params finiteness check, train/evaluate.py).
        return 1.0 + counts + (t2[:, 0] * 0.0).astype(jnp.float32)

    def _rank_scan(self, params, qb, fb, rhs_pad, bt_row):
        """Whole-split ranking as one compiled program (lax.map over batches
        with the pallas kernel in the body): one dispatch per split."""
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


def make_pallas_ranker(model, batch_size: int, interpret: bool = False,
                       **kw):
    return PallasChypRanker(model, batch_size, interpret=interpret, **kw)
