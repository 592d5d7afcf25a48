"""Entity-sharded filtered ranking with explicit collectives.

This is the 'long axis' of the workload (SURVEY §5.7): at eval time every
query is scored against ALL entities (up to 123k for YAGO3-10).  Under
shard_map each device holds a row-shard of the entity table, scores the
query block against its local candidates (one local MXU matmul via
model.sim), excludes its slice of the filtered entities (by count
subtraction — no (B, shard_n) scatter), and contributes a local count to

    rank = 1 + psum_over_model_axis(#{local scores >= target})

— an exact, communication-light parallel ranking: the collectives are a
psum-gather of the B query-head rows, one psum of the gold-tail score, and
one psum of a (B,) count vector.

Real datasets have odd entity counts (WN18RR 40,943; FB237 14,541;
YAGO3-10 123,182 = 2*61,591) that never divide a multi-device model axis,
so the ranker zero-pads the entity tables up to the next multiple (cached
per params version) and masks the pad rows out of the local counts — the
same pattern the fused Pallas ranker uses for its tile grid
(kernels/chyp_rank.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from complexhyperbolickge_tpu.parallel.mesh import (
    _ENTITY_PARAMS,
    pad_entity_tree,
    padded_rows,
)


def _gather_rows_sharded(local_table, ids, lo, shard_n, axis_name="model"):
    """Gather global rows from a row-sharded table: each shard contributes the
    rows it owns, combined with one psum."""
    local = ids - lo
    owns = (local >= 0) & (local < shard_n)
    safe = jnp.clip(local, 0, shard_n - 1)
    rows = local_table[safe]
    rows = jnp.where(owns[..., None], rows, jnp.zeros_like(rows))
    return jax.lax.psum(rows, axis_name=axis_name)


def _filtered_count_local(s, target, fidx, lo, shard_n, n_entities):
    """Shard-local #{score >= target} with filtered entities excluded by
    count subtraction (train/evaluate.py::filtered_rank_counts, local form)
    instead of scattering -1e6 into — and thereby copying — the whole
    (B, shard_n) score block.  Filter ids owned by other shards and pad ids
    (>= n_entities) contribute nothing here; pack rows are dedup'd by the
    eval_pack contract.  The -1e6 term keeps the reference overwrite
    semantics exactly when a target itself is <= -1e6."""
    f = fidx.astype(jnp.int32)
    owned = (f >= lo) & (f < lo + shard_n) & (f < n_entities)
    g = jnp.take_along_axis(s, jnp.clip(f - lo, 0, shard_n - 1), axis=1)
    tgt = target[:, None]
    total = jnp.sum(s >= tgt, axis=1)
    sub = jnp.sum(owned & (g >= tgt), axis=1)
    add = jnp.sum(owned & (jnp.asarray(-1e6, s.dtype) >= tgt), axis=1)
    return (total - sub + add).astype(jnp.float32)


def make_sharded_ranker(model, mesh, n_entities: int,
                        precision: str = "highest"):
    """Compiled shard_map ranking: (params, q, fidx) -> float ranks (B,).

    Accepts params with the entity tables at EITHER the real n_entities row
    count or already padded to a model-axis multiple (mesh training); the
    tables are (re-)padded and committed row-sharded over 'model' once per
    params version.  q and fidx are replicated.  precision: "highest"
    (exact 6-pass f32 score matmuls) or "default" (1-pass bf16 MXU,
    ops/math.py::eval_matmul_precision — same opt-in as the single-device
    rankers).
    """
    from complexhyperbolickge_tpu.ops.math import eval_matmul_precision

    n_shards = mesh.shape["model"]
    np_ = padded_rows(n_entities, n_shards)
    shard_n = np_ // n_shards

    def local_rank(params, q, fidx):
        shard_idx = jax.lax.axis_index("model")
        lo = shard_idx * shard_n
        b = q.shape[0]

        # psum-gather the query heads' rows, then run get_queries against a
        # dense (B, D) mini-table so model code is unchanged.
        heads = _gather_rows_sharded(params["entity"], q[:, 0], lo, shard_n)
        bh = _gather_rows_sharded(params["bh"], q[:, 0], lo, shard_n)
        q_local = jnp.stack([jnp.arange(b, dtype=q.dtype), q[:, 1]], axis=1)
        with eval_matmul_precision(precision):  # trace-time scope
            lhs, lhs_b = model.get_queries(
                {**params, "entity": heads, "bh": bh}, q_local
            )

            s = model.sim(lhs, params["entity"], all_pairs=True)  # (B, shard_n)
        if model.cfg.bias == "learn":
            s = lhs_b + params["bt"][None, :, 0] + s
        elif model.cfg.bias == "constant":
            s = s + model.cfg.gamma

        # mask this shard's PAD rows (global id >= n_entities) below any
        # reachable score so they never count; gold tails are always real
        gid = lo + jnp.arange(shard_n)
        s = jnp.where((gid < n_entities)[None, :], s, -jnp.inf)

        # gold-tail score: only the owning shard contributes
        t_local = q[:, 2] - lo
        owns = (t_local >= 0) & (t_local < shard_n)
        t_safe = jnp.clip(t_local, 0, shard_n - 1)
        target_local = jnp.take_along_axis(s, t_safe[:, None], axis=1)[:, 0]
        target = jax.lax.psum(
            jnp.where(owns, target_local, jnp.zeros_like(target_local)),
            axis_name="model",
        )

        count = _filtered_count_local(s, target, fidx, lo, shard_n, n_entities)
        # target*0: NaN discipline (see train/evaluate.py::_rank_one — a
        # value-independent poison keeps score-tie exactness, unlike a
        # full-matrix isfinite reduce which duplicates the score fusion)
        return (1.0 + jax.lax.psum(count, axis_name="model")
                + (target * 0.0).astype(jnp.float32))

    in_specs = (
        {
            name: (P("model", None) if name in _ENTITY_PARAMS else P())
            for name in model.param_specs()
        },
        P(),
        P(),
    )
    fn = jax.shard_map(
        local_rank, mesh=mesh, in_specs=in_specs, out_specs=P(),
        check_vma=False,
    )
    jit_fn = jax.jit(fn)

    # padded+row-sharded tables cached per params version, keyed by a STRONG
    # reference to the params object (an id() key could alias a new pytree
    # allocated at a freed address)
    ent_keys = [k for k in model.param_specs() if k in _ENTITY_PARAMS]
    out_sh = {
        name: NamedSharding(
            mesh, P("model", *([None] * (len(spec[0]) - 1)))
            if name in _ENTITY_PARAMS else P()
        )
        for name, spec in model.param_specs().items()
    }

    def _pad(params):
        sub = {k: params[k] for k in ent_keys}
        n = sub["entity"].shape[0]
        return {**params, **pad_entity_tree(sub, n, np_)}

    pad_jit = jax.jit(_pad, out_shardings=out_sh)
    # single-slot (src, padded) pair, written atomically (two slots let a
    # concurrent reader pair one params version with another's tables)
    cache = {"bound": None}

    def _tables(params):
        bound = cache["bound"]  # single read
        if bound is None or bound[0] is not params:
            bound = (params, pad_jit(params))
            cache["bound"] = bound
        return bound[1]

    @jax.jit
    def _rank_many(params, qb, fb):
        """Whole-split form: lax.map over batches with the shard_map body
        inlined — one dispatch per split (train/evaluate.py::get_ranking
        takes this path automatically)."""
        return jax.lax.map(lambda x: fn(params, *x), (qb, fb))

    def ranker(params, q, fidx):
        return jit_fn(_tables(params), q, fidx)

    ranker.rank_many = lambda params, qb, fb: _rank_many(_tables(params), qb, fb)
    return ranker


def make_sharded_gnn_ranker(model, mesh, n_entities: int,
                            precision: str = "highest"):
    """Entity-sharded eval for GNN models: (params, q, fidx) -> ranks (B,).

    The full-graph encoder runs ONCE per params version, replicated — its
    cost is per-EDGE (message passing over the whole graph), not per-query,
    and it needs every node's neighbourhood.  The ENCODED node table and the
    bias tables are then row-sharded over 'model' and ranking proceeds like
    make_sharded_ranker: each shard scores the query block against its local
    slice of encoded nodes and contributes a local count to one psum.  This
    splits the eval sweep's (B, N) matmul + entity-table stream — the actual
    long axis at YAGO scale — across the mesh.

    Reference semantics: cached forward_base during eval (gnnbase.py:240)
    + filtered ranking over all entities (base.py:228-280).

    precision: "highest" (exact) or "default" (1-pass bf16 MXU for the
    decoder sweep — the most MXU-bound eval in the framework: the distmult
    decoder is a pure dot product).
    """
    from complexhyperbolickge_tpu.ops.math import eval_matmul_precision

    n_shards = mesh.shape["model"]
    np_ = padded_rows(n_entities, n_shards)
    shard_n = np_ // n_shards
    row_sh = NamedSharding(mesh, P("model", None))
    rep = NamedSharding(mesh, P())

    # dropout-free eval encode (the reference's model.eval() forward_base)
    encode = jax.jit(lambda p: model.encode(p))
    rest_keys = [k for k in model.param_specs() if k not in _ENTITY_PARAMS]

    def local_rank(x_local, bh_local, bt_local, rel_pack, rest, q, fidx):
        shard_idx = jax.lax.axis_index("model")
        lo = shard_idx * shard_n
        b = q.shape[0]

        # psum-gather the query heads' ENCODED rows + head biases, then run
        # get_queries against a dense (B, D) mini-cache so model code is
        # unchanged (same trick as make_sharded_ranker)
        heads = _gather_rows_sharded(x_local, q[:, 0], lo, shard_n)
        bh = _gather_rows_sharded(bh_local, q[:, 0], lo, shard_n)
        q_local = jnp.stack([jnp.arange(b, dtype=q.dtype), q[:, 1]], axis=1)
        with eval_matmul_precision(precision):  # trace-time scope
            lhs, lhs_b = model.get_queries(
                {**rest, "bh": bh}, q_local, cache=(heads, rel_pack)
            )

            s = model.sim(lhs, x_local, all_pairs=True)  # (B, shard_n)
        if model.cfg.bias == "learn":
            s = lhs_b + bt_local[None, :, 0] + s
        elif model.cfg.bias == "constant":
            s = s + model.cfg.gamma

        # pad rows (global id >= n_entities) never count
        gid = lo + jnp.arange(shard_n)
        s = jnp.where((gid < n_entities)[None, :], s, -jnp.inf)

        # gold-tail score: only the owning shard contributes
        t_local = q[:, 2] - lo
        owns = (t_local >= 0) & (t_local < shard_n)
        t_safe = jnp.clip(t_local, 0, shard_n - 1)
        target_local = jnp.take_along_axis(s, t_safe[:, None], axis=1)[:, 0]
        target = jax.lax.psum(
            jnp.where(owns, target_local, jnp.zeros_like(target_local)),
            axis_name="model",
        )

        count = _filtered_count_local(s, target, fidx, lo, shard_n, n_entities)
        # target*0: NaN discipline (see train/evaluate.py::_rank_one)
        return (1.0 + jax.lax.psum(count, axis_name="model")
                + (target * 0.0).astype(jnp.float32))

    fn = jax.shard_map(
        local_rank, mesh=mesh,
        in_specs=(P("model", None), P("model", None), P("model", None),
                  P(), P(), P(), P()),
        out_specs=P(), check_vma=False,
    )
    jit_fn = jax.jit(fn)

    def _pad(params, x):
        # the ENCODED node table rides under the "entity" key so the
        # name-keyed pad_entity_tree (mesh.py::_is_entity_leaf) pads it —
        # it IS the per-entity table of this eval path
        sub = pad_entity_tree(
            {"entity": x, "bh": params["bh"], "bt": params["bt"]},
            n_entities, np_,
        )
        return sub["entity"], sub["bh"], sub["bt"], {
            k: params[k] for k in rest_keys
        }

    pad_jit = jax.jit(_pad, out_shardings=(row_sh, row_sh, row_sh, rep))

    # encoded+padded tables cached per params version, keyed by a STRONG
    # reference to the params object (same policy as make_ranker's GNN
    # cache); single-slot (src, tables) pair, written atomically
    cache = {"bound": None}

    def _tables(params):
        bound = cache["bound"]  # single read
        if bound is None or bound[0] is not params:
            x, rel_pack = encode(params)
            xs, bhs, bts, rest = pad_jit(params, x)
            rel_pack = jax.device_put(rel_pack, rep)
            bound = (params, (xs, bhs, bts, rel_pack, rest))
            cache["bound"] = bound
        return bound[1]

    @jax.jit
    def _rank_many(tables, qb, fb):
        return jax.lax.map(lambda t: fn(*tables, *t), (qb, fb))

    def ranker(params, q, fidx):
        return jit_fn(*_tables(params), q, fidx)

    ranker.rank_many = lambda params, qb, fb: _rank_many(_tables(params), qb, fb)
    return ranker


def make_sharded_pallas_ranker(model, mesh, n_entities: int, tile_n: int = 512,
                               interpret: bool = False,
                               precision: str = "highest",
                               masked: bool = True):
    """Entity-sharded ranking with the FUSED Pallas tile kernel per shard.

    Each model-axis shard sweeps its LOCAL slice of the entity table with
    kernels/chyp_rank.py::chyp_rank_counts (score matrix never leaves VMEM;
    measures within noise of the scatter-free dense XLA sweep on one chip,
    benchmarks/eval_bench.py) and one psum combines the per-shard counts —
    multi-chip eval keeps the single-chip kernel path.

    CHYP-family (FFTUnitBall) models only.  Table layout: entity rows padded
    to n_shards * local_np (local_np a tile_n multiple) with bt = -1e30 pad
    rows (unreachable by any threshold — the same trick as the single-device
    kernel); features zero-padded to a lane multiple (exact for the
    Hermitian form).  Ranks are exactly the single-device Pallas masked
    ranker's: the per-tile contraction is identical, counts are
    order-independent sums.

    masked=False: the subtract-filtered form (chyp_rank_counts_nomask) per
    shard — no (B, local_np) mask build/stream; each shard subtracts only
    the filter ids it OWNS (others remap to row 0 with f_ok=0), so the
    psum total matches.  Same throughput rationale and +-1-rank tie caveat
    as the single-device maskless ranker (train/evaluate.py docstring).
    """
    from complexhyperbolickge_tpu.kernels.chyp_rank import (
        chyp_rank_counts,
        chyp_rank_counts_nomask,
    )
    from complexhyperbolickge_tpu.models.chyperbolic import FFTUnitBall
    from complexhyperbolickge_tpu.ops.chyperbolic import chyp_distance, swap_neg
    from complexhyperbolickge_tpu.ops.math import ball_eps, round_up

    assert isinstance(model, FFTUnitBall), "Pallas ranker is CHYP-family only"
    assert model.cfg.bias in ("learn", "none", "constant")
    n_shards = mesh.shape["model"]
    local_np = round_up(-(-n_entities // n_shards), tile_n)
    np_ = local_np * n_shards
    d = model.param_specs()["entity"][0][1]
    dp = round_up(d, 128)
    eps = float(ball_eps(jnp.float32))
    other = [k for k in model.param_specs() if k not in _ENTITY_PARAMS]

    # pad-row bt = -1e30 (the single-device kernel's trick) AND the shared
    # mask's pad-row bits both exclude pad rows — belt and suspenders since
    # the mask builder is shared with the zero-bias hyp kernels
    prep_jit = _single_table_prep(model, mesh, n_entities, np_, dp, d, other,
                                  bt_pad_fill=-1e30)

    def local_rank(rhs_local, bt_local, rest, q, fidx):
        shard_idx = jax.lax.axis_index("model")
        lo = shard_idx * local_np
        b = q.shape[0]

        # head rows + gold-tail rows from the sharded padded table (real ids
        # only — features beyond d are zero pad, slice them off)
        heads = _gather_rows_sharded(rhs_local, q[:, 0], lo, local_np)[:, :d]
        gold = _gather_rows_sharded(rhs_local, q[:, 2], lo, local_np)[:, :d]

        # query chain on a dense (B, D) mini-table; bh is irrelevant — the
        # lhs bias cancels between score and threshold (see t2 below)
        q_local = jnp.stack([jnp.arange(b, dtype=q.dtype), q[:, 1]], axis=1)
        mini = {**rest, "entity": heads,
                "bh": jnp.zeros((b, 1), heads.dtype)}
        (lhs,), _ = model.get_queries(mini, q_local)
        lhs = lhs.astype(jnp.float32)

        lhs2_raw = jnp.concatenate([lhs, swap_neg(lhs)], axis=0)  # (2B, d)
        lhs2 = jnp.zeros((2 * b, dp), jnp.float32).at[:, :d].set(lhs2_raw)
        znorm = jnp.clip(
            jnp.sum(lhs * lhs, axis=-1, keepdims=True) - 1.0, -1.0, -eps
        )

        # threshold: gold score minus the (shared) lhs bias — kernel tiles
        # carry bt on their side, so lhs_b cancels (kernels/chyp_rank.py)
        d_gold = chyp_distance(lhs, gold.astype(jnp.float32))[:, None]
        t2 = -(d_gold**2)
        if model.cfg.bias == "learn":
            t2 = t2 + _psum_gold_bias(bt_local, q[:, 2], lo, local_np)[:, None]

        if masked:
            mask = _local_pad_filter_mask(fidx, lo, local_np, n_entities, b)
            counts = chyp_rank_counts(
                lhs2, znorm, t2, rhs_local, bt_local, mask,
                tile_n=tile_n, interpret=interpret,
                precision=precision,
            )
        else:
            # subtract-filtered per shard: remap owned filter ids to local
            # rows; non-owned (incl. pad ids) -> row 0 with f_ok=0 (this
            # shard's slice has no guaranteed pad row to absorb them — the
            # kernel's bt=-1e30 trick only covers the LAST shard)
            f = fidx.astype(jnp.int32)
            owns = (f >= lo) & (f < lo + local_np) & (f < n_entities)
            f_local = jnp.where(owns, f - lo, 0)
            counts = chyp_rank_counts_nomask(
                lhs2, znorm, t2, rhs_local, bt_local, f_local,
                owns.astype(jnp.float32),
                _gold_local(q, lo, local_np),
                tile_n=tile_n, interpret=interpret,
                precision=precision,
            )
            counts = counts + _gold_addback(q, fidx, shard_idx)
        # t2*0: NaN discipline (see kernels/chyp_rank.py::_rank_one)
        return (1.0 + jax.lax.psum(counts, axis_name="model")
                + (t2[:, 0] * 0.0).astype(jnp.float32))

    return _finish_sharded_pallas(model, mesh, local_rank, prep_jit, other)


def _gold_local(q, lo, local_np: int):
    """(B,) i32 LOCAL row index of each query's gold tail, or -1 when
    another shard owns it — the maskless kernels exclude that row in-tile
    (its score ties t2 by construction; see chyp_rank.py)."""
    loc = q[:, 2].astype(jnp.int32) - lo
    owns = (loc >= 0) & (loc < local_np)
    return jnp.where(owns, loc, -1)


def _gold_addback(q, fidx, shard_idx):
    """The gold's deterministic dense-path contribution (0 when it appears
    in the filter list — always, under the reference protocol — else +1),
    added on shard 0 ONLY so the count psum adds it exactly once."""
    gold_filtered = jnp.any(
        fidx.astype(jnp.int32) == q[:, 2].astype(jnp.int32)[:, None], axis=1
    )
    on_shard0 = (shard_idx == 0).astype(jnp.float32)
    return jnp.where(gold_filtered, 0.0, 1.0) * on_shard0


def _bt_row_and_rest(model, params, np_: int, n_entities: int, other,
                     bt_pad_fill: float):
    """(1, np_) tail-bias row (pad slots carry bt_pad_fill; zeroed unless
    bias='learn') + the replicated non-entity params — shared by every
    family's table prep."""
    bt = params["bt"][:, 0].astype(jnp.float32)
    if model.cfg.bias != "learn":
        bt = jnp.zeros_like(bt)
    bt_row = jnp.full((1, np_), bt_pad_fill, jnp.float32)
    # entity rows may exceed n_entities (mesh-padded training params)
    n = params["bt"].shape[0]
    bt_row = bt_row.at[0, :min(n, n_entities)].set(bt[:n_entities])
    return bt_row, {k: params[k] for k in other}


def _single_table_prep(model, mesh, n_entities: int, np_: int, dp: int,
                       d: int, other, bt_pad_fill: float):
    """jitted per-params table prep shared by the single-entity-table family
    rankers (CHYP, BaseH, BaseLorentz): (np_, dp) padded f32 entity rows
    row-sharded over 'model', (1, np_) tail-bias row (pad slots carry
    bt_pad_fill), non-entity params replicated."""

    def _prep(params):
        ent = params["entity"].astype(jnp.float32)
        n = ent.shape[0]  # may exceed n_entities (mesh-padded training)
        rhs = jnp.zeros((np_, dp), jnp.float32).at[:n, :d].set(ent[:, :d])
        bt_row, rest = _bt_row_and_rest(model, params, np_, n_entities,
                                        other, bt_pad_fill)
        return rhs, bt_row, rest

    return jax.jit(_prep, out_shardings=(
        NamedSharding(mesh, P("model", None)),
        NamedSharding(mesh, P(None, "model")),
        {k: NamedSharding(mesh, P()) for k in other},
    ))


def _local_pad_filter_mask(fidx, lo, local_np: int, n_entities: int, b: int):
    """Local int8 mask: this shard's PAD rows (global id >= n_entities) plus
    the queries' filtered ids remapped into local coordinates (ids owned by
    other shards -> positive OOB local_np -> dropped by the scatter; a plain
    `fidx - lo` would produce NEGATIVE locals which .at[] WRAPS)."""
    gid = lo + jnp.arange(local_np)
    mask = jnp.broadcast_to(
        (gid >= n_entities).astype(jnp.int8)[None, :], (b, local_np)
    )
    f = fidx.astype(jnp.int32)
    f_local = jnp.where((f >= lo) & (f < lo + local_np), f - lo, local_np)
    rows = jnp.arange(b)[:, None]
    return mask.at[rows, f_local].set(1, mode="drop")


def _psum_gold_bias(bt_local, gold_ids, lo, local_np: int):
    """(B,) learned tail bias of the gold entities from the row-sharded
    (1, local_np) bias slice — only the owning shard contributes."""
    loc = gold_ids - lo
    owns = (loc >= 0) & (loc < local_np)
    safe = jnp.clip(loc, 0, local_np - 1)
    btg = jnp.where(owns, bt_local[0][safe], 0.0)
    return jax.lax.psum(btg, axis_name="model")


def make_sharded_hyp_ranker(model, mesh, n_entities: int, tile_n: int = 512,
                            interpret: bool = False,
                            precision: str = "highest",
                            masked: bool = True):
    """Entity-sharded ranking with the fused Poincare/Lorentz tile kernel per
    shard (kernels/hyp_rank.py) — the BaseH family (not AttRH) and the
    BaseLorentz family.  Same layout/collective structure as
    make_sharded_pallas_ranker.

    masked=False: the per-shard subtract-filtered form
    (hyp_rank_counts_nomask) — no (B, local_np) mask build/stream; each
    shard subtracts only the filter ids it OWNS (others remap to row 0 with
    f_ok=0), so the psum total matches.  Same throughput rationale and
    +-1-rank tie caveat as the single-device maskless ranker.  Pad rows
    carry bt = -1e30 (unreachable by any threshold) in BOTH modes, like the
    single-device prep — the masked kernel's pad-row mask bits make the
    fill a no-op there."""
    from complexhyperbolickge_tpu.kernels.hyp_rank import (
        hyp_rank_counts,
        hyp_rank_counts_nomask,
    )
    from complexhyperbolickge_tpu.models.hyperbolic import (
        AttRH,
        BaseH,
        BaseLorentz,
    )
    from complexhyperbolickge_tpu.ops.math import round_up

    assert (isinstance(model, BaseH) and not isinstance(model, AttRH)) or \
        isinstance(model, BaseLorentz)
    family = "poincare" if isinstance(model, BaseH) else "lorentz"
    n_shards = mesh.shape["model"]
    local_np = round_up(-(-n_entities // n_shards), tile_n)
    np_ = local_np * n_shards
    d = model.param_specs()["entity"][0][1]
    dp = round_up(d, 128)
    other = [k for k in model.param_specs() if k not in _ENTITY_PARAMS]

    # pad-row bt = -1e30 (the single-device prep's trick): the maskless
    # kernel needs it — zero pad rows have a FINITE distance here, unlike
    # the CHYP table whose pad rows the Hermitian form maps to the ball
    # origin — and the masked kernel's pad-row mask bits are unaffected
    prep_jit = _single_table_prep(model, mesh, n_entities, np_, dp, d, other,
                                  bt_pad_fill=-1e30)

    def local_rank(rhs_local, bt_local, rest, q, fidx):
        shard_idx = jax.lax.axis_index("model")
        lo = shard_idx * local_np
        b = q.shape[0]

        heads = _gather_rows_sharded(rhs_local, q[:, 0], lo, local_np)[:, :d]
        gold = _gather_rows_sharded(rhs_local, q[:, 2], lo, local_np)[:, :d]
        q_local = jnp.stack([jnp.arange(b, dtype=q.dtype), q[:, 1]], axis=1)
        mini = {**rest, "entity": heads,
                "bh": jnp.zeros((b, 1), heads.dtype)}
        (lhs, c), _ = model.get_queries(mini, q_local)
        lhs = lhs.astype(jnp.float32)
        c = c.astype(jnp.float32)
        if c.shape[0] == 1:
            c = jnp.broadcast_to(c, (b, 1))
        lhs_pad = jnp.zeros((b, dp), jnp.float32).at[:, :d].set(lhs)
        x2 = jnp.sum(lhs * lhs, axis=-1, keepdims=True)

        t2 = model.sim((lhs, c), gold[:, None, :], all_pairs=False)[:, 0:1]
        if model.cfg.bias == "learn":
            t2 = t2 + _psum_gold_bias(bt_local, q[:, 2], lo, local_np)[:, None]

        if masked:
            mask = _local_pad_filter_mask(fidx, lo, local_np, n_entities, b)
            counts = hyp_rank_counts(
                lhs_pad, x2, c, t2, rhs_local, bt_local, mask,
                tile_n=tile_n, interpret=interpret, family=family,
                precision=precision,
            )
        else:
            # subtract-filtered per shard: remap owned filter ids to local
            # rows; non-owned (incl. pad ids) -> row 0 with f_ok=0 (same
            # scheme as the sharded CHYP maskless ranker above)
            f = fidx.astype(jnp.int32)
            owns = (f >= lo) & (f < lo + local_np) & (f < n_entities)
            f_local = jnp.where(owns, f - lo, 0)
            counts = hyp_rank_counts_nomask(
                lhs_pad, x2, c, t2, rhs_local, bt_local, f_local,
                owns.astype(jnp.float32),
                _gold_local(q, lo, local_np),
                tile_n=tile_n, interpret=interpret, family=family,
                precision=precision,
            )
            counts = counts + _gold_addback(q, fidx, shard_idx)
        # t2*0: NaN discipline (see kernels/chyp_rank.py::_rank_one)
        return (1.0 + jax.lax.psum(counts, axis_name="model")
                + (t2[:, 0] * 0.0).astype(jnp.float32))

    return _finish_sharded_pallas(model, mesh, local_rank, prep_jit, other)


def make_sharded_attrh_ranker(model, mesh, n_entities: int, tile_n: int = 512,
                              interpret: bool = False,
                              precision: str = "highest",
                              masked: bool = True):
    """Entity-sharded ranking with the fused AttRH tile kernel per shard
    (kernels/hyp_rank.py::attrh_rank_counts): two half-space Poincare
    distances combined with the relation's learned softmax weights.

    masked=False: the per-shard subtract-filtered form
    (attrh_rank_counts_nomask) over BOTH half tables — same owned-ids f_ok
    scheme, gold exclusion, and tie story as the other families' sharded
    maskless rankers.  Pad rows carry bt = -1e30 in BOTH modes (the zero
    pad rows' two half distances are finite; the masked kernel's pad-row
    mask bits make the fill a no-op there)."""
    from complexhyperbolickge_tpu.kernels.hyp_rank import (
        attrh_rank_counts,
        attrh_rank_counts_nomask,
    )
    from complexhyperbolickge_tpu.models.hyperbolic import AttRH
    from complexhyperbolickge_tpu.ops.math import round_up

    assert isinstance(model, AttRH)
    n_shards = mesh.shape["model"]
    local_np = round_up(-(-n_entities // n_shards), tile_n)
    np_ = local_np * n_shards
    d = model.param_specs()["entity"][0][1]
    half = d // 2
    dp = round_up(half, 128)
    other = [k for k in model.param_specs() if k not in _ENTITY_PARAMS]

    def _prep(params):
        ent = params["entity"].astype(jnp.float32)
        n = ent.shape[0]
        rot = jnp.zeros((np_, dp), jnp.float32).at[:n, :half].set(ent[:, :half])
        ref = jnp.zeros((np_, dp), jnp.float32).at[:n, :half].set(ent[:, half:d])
        bt_row, rest = _bt_row_and_rest(model, params, np_, n_entities,
                                        other, bt_pad_fill=-1e30)
        return rot, ref, bt_row, rest

    prep_jit = jax.jit(_prep, out_shardings=(
        NamedSharding(mesh, P("model", None)),
        NamedSharding(mesh, P("model", None)),
        NamedSharding(mesh, P(None, "model")),
        {k: NamedSharding(mesh, P()) for k in other},
    ))

    def local_rank(rot_local, ref_local, bt_local, rest, q, fidx):
        shard_idx = jax.lax.axis_index("model")
        lo = shard_idx * local_np
        b = q.shape[0]

        h_rot = _gather_rows_sharded(rot_local, q[:, 0], lo, local_np)[:, :half]
        h_ref = _gather_rows_sharded(ref_local, q[:, 0], lo, local_np)[:, :half]
        g_rot = _gather_rows_sharded(rot_local, q[:, 2], lo, local_np)[:, :half]
        g_ref = _gather_rows_sharded(ref_local, q[:, 2], lo, local_np)[:, :half]
        heads = jnp.concatenate([h_rot, h_ref], axis=-1)
        gold = jnp.concatenate([g_rot, g_ref], axis=-1)

        q_local = jnp.stack([jnp.arange(b, dtype=q.dtype), q[:, 1]], axis=1)
        mini = {**rest, "entity": heads,
                "bh": jnp.zeros((b, 1), heads.dtype)}
        (lhs2, c, w), _ = model.get_queries(mini, q_local)
        lhs2 = lhs2.astype(jnp.float32)
        c = jnp.broadcast_to(c.astype(jnp.float32), (b, 1))
        w = w.astype(jnp.float32)
        l_rot = jnp.zeros((b, dp), jnp.float32).at[:, :half].set(lhs2[:, :half])
        l_ref = jnp.zeros((b, dp), jnp.float32).at[:, :half].set(lhs2[:, half:])
        x2r = jnp.sum(lhs2[:, :half] ** 2, axis=-1, keepdims=True)
        x2f = jnp.sum(lhs2[:, half:] ** 2, axis=-1, keepdims=True)

        t2 = model.sim((lhs2, c, w), gold[:, None, :], all_pairs=False)[:, 0:1]
        if model.cfg.bias == "learn":
            t2 = t2 + _psum_gold_bias(bt_local, q[:, 2], lo, local_np)[:, None]

        if masked:
            mask = _local_pad_filter_mask(fidx, lo, local_np, n_entities, b)
            counts = attrh_rank_counts(
                l_rot, l_ref, x2r, x2f, c, w[:, 0:1], w[:, 1:2], t2,
                rot_local, ref_local, bt_local, mask,
                tile_n=tile_n, interpret=interpret,
                precision=precision,
            )
        else:
            # subtract-filtered per shard: remap owned filter ids to local
            # rows; non-owned (incl. pad ids) -> row 0 with f_ok=0 (same
            # scheme as the other sharded maskless rankers)
            f = fidx.astype(jnp.int32)
            owns = (f >= lo) & (f < lo + local_np) & (f < n_entities)
            f_local = jnp.where(owns, f - lo, 0)
            counts = attrh_rank_counts_nomask(
                l_rot, l_ref, x2r, x2f, c, w[:, 0:1], w[:, 1:2], t2,
                rot_local, ref_local, bt_local, f_local,
                owns.astype(jnp.float32),
                _gold_local(q, lo, local_np),
                tile_n=tile_n, interpret=interpret,
                precision=precision,
            )
            counts = counts + _gold_addback(q, fidx, shard_idx)
        # t2*0: NaN discipline (see kernels/chyp_rank.py::_rank_one)
        return (1.0 + jax.lax.psum(counts, axis_name="model")
                + (t2[:, 0] * 0.0).astype(jnp.float32))

    n_tables = 3  # rot, ref, bt_row
    return _finish_sharded_pallas(model, mesh, local_rank, prep_jit, other,
                                  n_tables=n_tables)


def _finish_sharded_pallas(model, mesh, local_rank, prep_jit, other,
                           n_tables: int = 2):
    """Shared scaffolding: shard_map wiring, per-params-version table cache,
    and the whole-split rank_many scan form."""
    table_specs = tuple(
        P("model", None) if i < n_tables - 1 else P(None, "model")
        for i in range(n_tables)
    )
    fn = jax.shard_map(
        local_rank, mesh=mesh,
        in_specs=(*table_specs, {k: P() for k in other}, P(), P()),
        out_specs=P(), check_vma=False,
    )
    jit_fn = jax.jit(fn)

    @jax.jit
    def _rank_many(*args):
        *tables_rest, qb, fb = args
        return jax.lax.map(lambda x: fn(*tables_rest, *x), (qb, fb))

    # single-slot (src, tables) pair, written atomically (see the dense
    # sharded ranker above)
    cache = {"bound": None}

    def _tables(params):
        bound = cache["bound"]  # single read
        if bound is None or bound[0] is not params:
            bound = (params, prep_jit(params))
            cache["bound"] = bound
        return bound[1]

    def ranker(params, q, fidx):
        return jit_fn(*_tables(params), q, fidx)

    ranker.rank_many = lambda params, qb, fb: _rank_many(*_tables(params), qb, fb)
    return ranker


def make_best_sharded_ranker(model, mesh, n_entities: int,
                             backend: str = "auto",
                             precision: str = "highest"):
    """Sharded-ranker analogue of train/evaluate.py::make_best_ranker:
    backend='auto'/'dense' -> the scatter-free dense shard_map ranker
    (fastest-or-equal at every measured scale — see make_best_ranker);
    backend='pallas' -> the fused kernel per shard for every hyperbolic
    family (interpret mode off-TPU), failing LOUDLY if it cannot build;
    backend='pallas_maskless' (every hyperbolic family, incl. AttRH's
    two-table form) -> the per-shard subtract-filtered kernel (same
    speed/tie trade as the single-device maskless ranker).
    precision: MXU contraction mode for the score matmuls on EVERY path
    (see make_best_ranker) — "highest" = exact 6-pass f32 (default),
    "default" = 1-pass bf16."""
    if getattr(model, "is_gnn", False):
        # GNN models: encoder replicated, ENCODED table sharded (no Pallas
        # kernel — the decoder sweep is a plain MXU matmul XLA tiles well)
        return make_sharded_gnn_ranker(model, mesh, n_entities,
                                       precision=precision)
    if backend in ("pallas", "pallas_maskless"):
        from complexhyperbolickge_tpu.models.chyperbolic import FFTUnitBall
        from complexhyperbolickge_tpu.models.hyperbolic import (
            AttRH,
            BaseH,
            BaseLorentz,
        )
        from complexhyperbolickge_tpu.utils.platform import is_tpu_backend

        on_tpu = is_tpu_backend()
        if isinstance(model, FFTUnitBall):
            return make_sharded_pallas_ranker(
                model, mesh, n_entities, interpret=not on_tpu,
                precision=precision,
                masked=backend != "pallas_maskless",
            )
        if isinstance(model, AttRH):
            return make_sharded_attrh_ranker(
                model, mesh, n_entities, interpret=not on_tpu,
                precision=precision,
                masked=backend != "pallas_maskless",
            )
        if isinstance(model, (BaseH, BaseLorentz)):
            return make_sharded_hyp_ranker(
                model, mesh, n_entities, interpret=not on_tpu,
                precision=precision,
                masked=backend != "pallas_maskless",
            )
        import logging

        logging.warning(
            "no sharded Pallas ranker exists for %s; using the dense "
            "shard_map ranker",
            type(model).__name__,
        )
    return make_sharded_ranker(model, mesh, n_entities, precision=precision)
