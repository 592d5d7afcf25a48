"""GNN encoder-decoder KG models: CompGCN, PoincareGCN, LorentzGCN.

Reference: models/gnnbase.py (GNN base: full-graph encoder with cached
forward_base), models/euclideangnn.py:110-173 (CompGCN),
models/hyperbolicgnn/poincaregnn.py:465-549, lorentzgnn.py:235-318.

TPU design: the encoder runs over the FULL train graph as one compiled
program per step (static [forward; inverse] edge layout, segment-sum
aggregation).  The reference instead trains on PyG LinkNeighborLoader
subgraphs (kg_optimizer.py:319-431) because a full-graph torch backward
blows up on GPU memory; on TPU the full graph at these scales (<=1.1M train
edges) is comfortably resident, removing the sampler+subgraph machinery from
the hot path entirely.  (A host-side neighbor sampler for the subgraph
training mode lives in data/sampler.py for parity.)

Scoring reuses the functional KGModel protocol with an extra `cache`
argument holding the encoder output; when omitted it is recomputed (inside
one jitted step XLA CSEs the duplicate encoder subgraphs away).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from complexhyperbolickge_tpu.models.base import KGModel, ModelConfig, dot_all, dot_train, neg_sq_dist
from complexhyperbolickge_tpu.models.gnn import message as M
from complexhyperbolickge_tpu.models.gnn.convs import (
    CompGCNConv,
    LorentzConv,
    PoincareConv,
    PoincareGATConv,
)
from complexhyperbolickge_tpu.ops import hyperbolic as H
from complexhyperbolickge_tpu.ops.euclidean import givens_rotations
from complexhyperbolickge_tpu.ops.math import pinned_mm
from complexhyperbolickge_tpu.ops.math import tanh as _tanh  # ref ±15 clamp

GNN_MODELS = ["CompGCN", "PoincareGCN", "PoincareGAT", "LorentzGCN"]


class GNNModel(KGModel):
    """Shared encoder plumbing (reference models/gnnbase.py:9-147)."""

    is_gnn = True
    conv_cls = None
    act_r_on_rel = True  # tanh on the relation part between layers

    def __init__(self, cfg: ModelConfig, args, dataset):
        super().__init__(cfg)
        self.hidden_dim = getattr(args, "hidden_dim", None) or cfg.rank
        self.n_layers = getattr(args, "layers", 2)
        self.edge_dropout = getattr(args, "edge_dropout", 0.0)
        self.feat_dropout = getattr(args, "dropout", 0.0)
        # between-layer feature dropout on x (reference messagepassing.py:
        # 208-215); default False, enabled by CompGCN (euclideangnn.py:108)
        # — IN ADDITION to each conv's internal aggregation dropout
        self.drop_in_between = False
        train = dataset.data["train"]  # forward edges only (no inverses)
        self.edge_head = jnp.asarray(train[:, 0].astype(np.int32))
        self.edge_tail = jnp.asarray(train[:, 2].astype(np.int32))
        self.edge_type = jnp.asarray(train[:, 1].astype(np.int32))
        # per-direction permutations sorting edges by their RECEIVING node:
        # the encoder lays each half out sorted so every segment-sum can use
        # XLA's sorted-scatter fast path (1.33x at full-graph scale)
        self._perm_fwd = jnp.asarray(np.argsort(train[:, 0], kind="stable")
                                     .astype(np.int32))
        self._perm_inv = jnp.asarray(np.argsort(train[:, 2], kind="stable")
                                     .astype(np.int32))
        self.layers = self._build_layers()

    # ------------------------------ layer stack ------------------------------

    def _channels(self):
        """(d_in, d_out, d_in_r, d_out_r, act, dropout) per layer, mirroring
        the reference stack construction (messagepassing.py:152-206)."""
        r, h = self.cfg.rank, self.hidden_dim
        rin, rh = self.rel_channels(r), self.rel_channels(h)
        if self.n_layers == 1:
            return [(r, h, rin, rh, None, 0.0)]
        out = [(r, h, rin, rh, _tanh, self.feat_dropout)]
        for _ in range(self.n_layers - 2):
            out.append((h, h, rh, rh, _tanh, self.feat_dropout))
        out.append((h, h, rh, rh, None, 0.0))
        return out

    def rel_channels(self, d):
        return 3 * d

    def _build_layers(self):
        return [self.conv_cls(*ch[:4], act=ch[4], dropout=ch[5],
                              **self.conv_kwargs(i))
                for i, ch in enumerate(self._channels())]

    def conv_kwargs(self, layer_idx: int):
        """Per-layer conv constructor kwargs (reference BaseGNN's
        kwargs_first/hidden/last_layer, messagepassing.py:148-206)."""
        return {}

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params = super().init(k1)
        lkeys = jax.random.split(k2, len(self.layers))
        # conv initializers draw in f32; honor cfg.dtype like the base
        # tables do (float64 parity / bfloat16 runs were silently getting a
        # mixed-dtype pytree with f32 encoder weights)
        wd = self.cfg.jnp_dtype
        params["gnn"] = [
            jax.tree.map(lambda w: w.astype(wd), l.init(k))
            for l, k in zip(self.layers, lkeys)
        ]
        return params

    # -------------------------------- encoder --------------------------------

    def get_r(self, params):
        raise NotImplementedError

    def encode(self, params, key=None, training: bool = False):
        """Full-graph forward_base (reference gnnbase.py:41-84): edge dropout
        (as a weight mask), inverse-edge mirroring, then the layer stack.

        Tolerates a row-PADDED entity table (parallel/mesh.py: zero pad rows
        make odd entity counts divisible by the mesh 'model' axis): edges
        only reference real ids, every other op is row-local, and the one
        cross-row statistic — CompGCN's batch-norm — excludes pad rows via
        node_w, so padded encoder output matches unpadded up to float
        reassociation.  Pad rows of the ENCODED table are garbage by
        construction; every consumer masks columns >= n_entities
        (train/losses.py, train/evaluate.py::_mask_pad_cols,
        parallel/ranking.py)."""
        x = params["entity"]
        node_w = None
        if x.shape[0] != self.cfg.n_entities:  # mesh pad rows present
            node_w = (jnp.arange(x.shape[0]) < self.cfg.n_entities).astype(
                x.dtype
            )
        rel_pack = self.get_r(params)
        e = self.edge_head.shape[0]
        rate = self.edge_dropout if training else 0.0
        kmask, key = (jax.random.split(key) if key is not None else (None, None))
        mask = M.edge_dropout_mask(kmask, e, rate, dtype=x.dtype)
        # [forward; inverse] halves, EACH sorted by its receiving node
        pf, pi = self._perm_fwd, self._perm_inv
        head = jnp.concatenate([self.edge_head[pf], self.edge_tail[pi]])
        tail = jnp.concatenate([self.edge_tail[pf], self.edge_head[pi]])
        etype = jnp.concatenate(
            [self.edge_type[pf], self.edge_type[pi] + self.cfg.n_relations // 2]
        )
        edge_w = jnp.concatenate([mask[pf], mask[pi]])
        edges = (head, tail, etype)

        for i, (layer, p) in enumerate(zip(self.layers, params["gnn"])):
            lk = None
            if key is not None:
                key, lk = jax.random.split(key)
            x, rel_pack = layer.apply(p, x, edges, rel_pack, edge_w, key=lk,
                                      node_w=node_w)
            if i != len(self.layers) - 1:
                if (training and self.drop_in_between
                        and self.feat_dropout > 0 and key is not None):
                    key, dk = jax.random.split(key)
                    x = M.dropout(dk, x, self.feat_dropout)
                rel_pack = self._act_r(rel_pack)
        return self.finish_cache(x, rel_pack)

    def encode_subgraph(self, params, node_ids, edges, edge_w, node_w,
                        key=None, training: bool = False):
        """Encoder over a sampled padded subgraph (data/sampler.py contract).

        edges: (E, 3) int32 (local head, type, local tail); edge_w masks
        padded edge rows; node_w masks padded node rows (batch-norm stats).
        Replaces the reference's PyG-subgraph forward
        (kg_optimizer.py:383-388 + gnnbase.py:41-84).
        """
        x = params["entity"][node_ids]
        rel_pack = self.get_r(params)
        head, etype, tail = edges[:, 0], edges[:, 1], edges[:, 2]
        dir_w = (etype < self.cfg.n_relations // 2).astype(x.dtype)
        if training and key is not None:
            kmask, key = jax.random.split(key)
            edge_w = edge_w * M.edge_dropout_mask(
                kmask, edge_w.shape[0], self.edge_dropout, dtype=x.dtype
            )
        for i, (layer, p) in enumerate(zip(self.layers, params["gnn"])):
            lk = None
            if key is not None:
                key, lk = jax.random.split(key)
            x, rel_pack = layer.apply_masked(
                p, x, (head, tail, etype), rel_pack, edge_w, dir_w, node_w,
                key=lk,
            )
            if i != len(self.layers) - 1:
                if (training and self.drop_in_between
                        and self.feat_dropout > 0 and key is not None):
                    key, dk = jax.random.split(key)
                    x = M.dropout(dk, x, self.feat_dropout)
                rel_pack = self._act_r(rel_pack)
        return self.finish_cache(x, rel_pack)

    def _act_r(self, rel_pack):
        if isinstance(rel_pack, tuple):  # (rel, curvature): tanh on rel only
            return (_tanh(rel_pack[0]), rel_pack[1]) if self.act_r_on_rel else rel_pack
        return _tanh(rel_pack) if self.act_r_on_rel else rel_pack

    def finish_cache(self, x, rel_pack):
        return (x, rel_pack)

    # -------------------------------- scoring --------------------------------

    def get_queries(self, params, queries, cache=None):
        raise NotImplementedError

    def score(self, params, queries, tails, cache=None):
        cache = cache if cache is not None else self.encode(params)
        x, _ = cache
        lhs, lhs_b = self.get_queries(params, queries, cache)
        rhs_e, rhs_b = x[tails], params["bt"][tails]
        s = self.sim(lhs, rhs_e, all_pairs=False)
        return self._apply_bias(s, lhs_b, rhs_b, all_pairs=False)

    def score_all(self, params, queries, cache=None):
        cache = cache if cache is not None else self.encode(params)
        x, _ = cache
        lhs, lhs_b = self.get_queries(params, queries, cache)
        s = self.sim(lhs, x, all_pairs=True)
        return self._apply_bias(s, lhs_b, params["bt"], all_pairs=True)

    def get_factors(self, params, queries=None, tails=None):
        """Regularizable encoder weights (reference gnnbase.py:145-147).

        Wrapped in NoMask: these are weight MATRICES (leading dim = d_in /
        hidden), not batches — _masked_sum keys on shape[0] alone, so a
        padded batch whose static size coincides with a weight's leading
        dim would silently zero rows of the penalty (CLAUDE.md trap)."""
        from complexhyperbolickge_tpu.models.base import NoMask

        out = []
        for layer, p in zip(self.layers, params["gnn"]):
            out.extend(NoMask(f) for f in layer.regularizable(p))
        return tuple(out)


class BoundGNN:
    """A GNN model with a fixed encoder cache bound — lets the generic loss
    functions call score/score_all without re-specifying the cache."""

    def __init__(self, model: GNNModel, cache):
        self.model = model
        self.cache = cache
        self.cfg = model.cfg

    def score(self, params, queries, tails):
        return self.model.score(params, queries, tails, cache=self.cache)

    def score_all(self, params, queries):
        return self.model.score_all(params, queries, cache=self.cache)

    def get_factors(self, params, queries=None, tails=None):
        return self.model.get_factors(params)


# -------------------------------- CompGCN ------------------------------------


class CompGCN(GNNModel):
    """CompGCN with optional basis decomposition and distmult/transe decoder
    (reference euclideangnn.py:110-173)."""

    conv_cls = CompGCNConv
    act_r_on_rel = False  # reference act_r = Identity (euclideangnn.py:132)

    def __init__(self, cfg, args, dataset):
        self.basis = getattr(args, "basis", 0) or 0
        self.opn = getattr(args, "opn", "mult") or "mult"
        self.interaction = (getattr(args, "interaction", "distmult") or "distmult").lower()
        assert self.interaction in ("distmult", "transe")
        super().__init__(cfg, args, dataset)
        self.drop_in_between = True

    def rel_channels(self, d):
        return d

    def conv_kwargs(self, layer_idx: int):
        return {"opn": self.opn}

    def extra_param_specs(self):
        if self.basis > 0:
            return {
                # fresh nn.Embedding in the reference (euclideangnn.py:
                # 115-120, created after the base init and never
                # re-initialized): torch default N(0,1), NOT init_size —
                # the encoder's relation inputs start at O(1)
                "rel_basis": ((self.basis, self.cfg.rank), ("normal", 0.0, 1.0)),
                # rel holds coefficients (Nr, B) — overridden shape below
            }
        return {}

    def param_specs(self):
        specs = super().param_specs()
        if self.basis > 0:
            # same fresh-embedding N(0,1) as rel_basis above
            specs["rel"] = ((self.cfg.n_relations, self.basis),
                            ("normal", 0.0, 1.0))
        return specs

    def get_r(self, params):
        if self.basis > 0:
            return pinned_mm(params["rel"], params["rel_basis"])
        return params["rel"]

    def get_queries(self, params, queries, cache=None):
        x, r = cache if cache is not None else self.encode(params)
        head = x[queries[..., 0]]
        rel = r[queries[..., 1]]
        lhs = head * rel if self.interaction == "distmult" else head + rel
        return (lhs,), params["bh"][queries[..., 0]]

    def sim(self, lhs_pack, rhs_e, all_pairs: bool):
        (lhs,) = lhs_pack
        if self.interaction == "distmult":
            return dot_all(lhs, rhs_e) if all_pairs else dot_train(lhs, rhs_e)
        return neg_sq_dist(lhs, rhs_e, all_pairs)


# ------------------------------- PoincareGCN ---------------------------------


class PoincareGCN(GNNModel):
    """Poincare-ball GCN (reference poincaregnn.py:465-549).

    agg_method (the --gnn_agg_method CLI flag) selects among the
    reference's three PoincareConv aggregation branches (poincaregnn.py:
    132 hardcodes 1; 2/3 are its alternate paths at 195-216)."""

    conv_cls = PoincareConv

    def __init__(self, cfg, args, dataset):
        self.agg_method = getattr(args, "gnn_agg_method", 1) or 1
        super().__init__(cfg, args, dataset)

    def conv_kwargs(self, layer_idx: int):
        return {"agg_method": self.agg_method}

    @property
    def rel_dim(self):
        return 2 * self.cfg.rank

    def extra_param_specs(self):
        nr = self.cfg.n_relations
        return {
            "rel_diag": ((nr, self.cfg.rank), "uniform"),
            # per-relation raw curvature input to the first layer
            # (reference poincaregnn.py:474: multi_c is a fresh
            # nn.Embedding left at torch's default N(0,1); only the
            # single-c Parameter is zeros)
            "c_layer": (
                ((nr, 1), ("normal", 0.0, 1.0)) if self.cfg.multi_c
                else ((1, 1), "zeros")
            ),
        }

    def get_r(self, params):
        r = jnp.concatenate([params["rel"], params["rel_diag"]], axis=-1)
        c = params["c_layer"]
        if not self.cfg.multi_c and c.shape[0] != r.shape[0]:
            c = jnp.broadcast_to(c, (r.shape[0], 1))
        return (r, c)

    def finish_cache(self, x, rel_pack):
        r, c_raw = rel_pack
        c = jax.nn.softplus(c_raw)
        if not self.cfg.multi_c:
            c = jnp.mean(c, axis=0, keepdims=True)
        return (x, (r, c))

    def get_queries(self, params, queries, cache=None):
        x, (r, curv) = cache if cache is not None else self.encode(params)
        h, rid = queries[..., 0], queries[..., 1]
        rq = r[rid]
        rel1, rel2, rot = jnp.split(rq, 3, axis=-1)
        c = curv[rid] if self.cfg.multi_c else curv  # (B,1) or (1,1)
        head = H.expmap0(x[h], c)
        rel1 = H.expmap0(rel1, c)
        rel2 = H.expmap0(rel2, c)
        lhs = H.project(H.mobius_add(rel1, head, c), c)
        res1 = givens_rotations(rot, lhs)
        res2 = H.mobius_add(rel2, res1, c)
        return (res2, c), params["bh"][h]

    def sim(self, lhs_pack, rhs_e, all_pairs: bool):
        lhs, c = lhs_pack
        if all_pairs:
            if self.cfg.multi_c:
                return -H.hyp_sim_expmap_all(lhs, rhs_e, c) ** 2
            return -H.hyp_plain_sim_expmap_all(lhs, rhs_e, c) ** 2
        lhs3, c3 = lhs[:, None, :], c[..., None] if c.ndim == 2 else c
        rhs_h = H.expmap0(rhs_e, c3)
        if self.cfg.multi_c:
            return -H.hyp_distance_multi_c(lhs3, rhs_h, c3)[..., 0] ** 2
        return -H.hyp_distance(lhs3, rhs_h, c3)[..., 0] ** 2


# -------------------------------- PoincareGAT --------------------------------


class PoincareGAT(PoincareGCN):
    """Multi-head-attention Poincare GCN (reference poincaregnn.py:551-572
    wiring PoincareGATConv, 296-463).  The reference leaves this model OUT
    of its registry (`all_models`, models/__init__.py:9 — dead code at
    HEAD); it is registered here as a first-class model, with the conv
    numeric-parity-tested against the executed reference class.

    Head gather per layer mirrors the reference's HyperbolicBase kwargs
    (poincaregnn.py:554-572): first layer 'mean' if layers < 2 else
    'concat', hidden layers 'concat', last layer 'mean'.  Decoder and
    relation stream are PoincareGCN's.  Constraint inherited from the
    reference shapes: hidden_dim must be divisible by 2*heads (= 8) for
    concat layers (per-head width must be even for the Givens rotations)."""

    conv_cls = PoincareGATConv

    def conv_kwargs(self, layer_idx: int):
        n = self.n_layers
        if layer_idx == 0:
            gather = "mean" if n < 2 else "concat"
        elif layer_idx == n - 1:
            gather = "mean"
        else:
            gather = "concat"
        return {"gather": gather, "agg_method": self.agg_method}


# -------------------------------- LorentzGCN ---------------------------------


class LorentzGCN(GNNModel):
    """Hyperboloid GCN (reference lorentzgnn.py:235-318)."""

    conv_cls = LorentzConv

    @property
    def rel_dim(self):
        return 2 * self.cfg.rank

    def extra_param_specs(self):
        nr = self.cfg.n_relations
        return {
            "rel_diag": ((nr, self.cfg.rank), "uniform"),
            # always per-relation, and a fresh nn.Embedding left at torch's
            # default N(0,1) (lorentzgnn.py:243 — never re-initialized)
            "c_layer": ((nr, 1), ("normal", 0.0, 1.0)),
        }

    def get_r(self, params):
        r = jnp.concatenate([params["rel"], params["rel_diag"]], axis=-1)
        return (r, params["c_layer"])

    def finish_cache(self, x, rel_pack):
        r, c_raw = rel_pack
        c = jax.nn.softplus(c_raw)
        if not self.cfg.multi_c:
            c = jnp.mean(c, axis=0, keepdims=True)
        return (x, (r, c))

    def get_queries(self, params, queries, cache=None):
        x, (r, curv) = cache if cache is not None else self.encode(params)
        h, rid = queries[..., 0], queries[..., 1]
        rel1, rel2, rot = jnp.split(r[rid], 3, axis=-1)
        c = curv[rid] if self.cfg.multi_c else curv
        head = H.expmap0_lorentz(x[h], c)
        lhs = H.lorentz_boost(head, rel1, c)
        res1 = givens_rotations(rot, lhs)
        res2 = H.lorentz_boost(res1, rel2, c)
        return (res2, c), params["bh"][h]

    def sim(self, lhs_pack, rhs_e, all_pairs: bool):
        lhs, c = lhs_pack
        if all_pairs:
            return -H.lorentz_sim_expmap_all(lhs, rhs_e, c) ** 2
        lhs3, c3 = lhs[:, None, :], c[..., None] if c.ndim == 2 else c
        rhs_h = H.expmap0_lorentz(rhs_e, c3)
        return -H.hyp_distance_multi_c_lorentz(lhs3, rhs_h, c3)[..., 0] ** 2
