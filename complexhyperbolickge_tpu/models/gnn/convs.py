"""Graph convolution layers: CompGCN, Poincare, Lorentz.

Pure-functional re-designs of the reference convs
(models/euclideangnn.py:16-108, models/hyperbolicgnn/poincaregnn.py:19-294,
models/hyperbolicgnn/lorentzgnn.py:18-232).  Each conv is a (param_specs,
apply) pair; parameters live in a nested dict pytree; all aggregation uses
static-shape segment sums over the [forward; inverse] edge layout, with
edge dropout as a 0/1 weight mask (see message.py).

Reference quirks handled:
  * LorentzConv.forward returns a 3-tuple the reference's own layer stack
    cannot unpack (lorentzgnn.py:79 vs messagepassing.py:210 — LorentzGCN
    with >1 layer crashes at HEAD); here every conv returns
    (x, (rel, curvature)) uniformly.
  * PoincareConv applies one Mobius bias-add with the UN-softplused
    curvature (poincaregnn.py:77, `curvatures_out` vs `curvatures_out_`);
    we use the softplused curvature for both rel1 and rel2 (a negative
    curvature would NaN in sqrt) — divergence documented.
  * LorentzConv swaps in_type/out_type in its messages (lorentzgnn.py:96-101
    passes out_type for the 'in' edges); replicated PER EDGE
    ((t + n_rel/2) % n_rel on each half's own types — the halves here are
    each sorted by receiving node, so slice-level swapping would misalign).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.models.gnn import message as M
from complexhyperbolickge_tpu.ops import hyperbolic as H
from complexhyperbolickge_tpu.ops.euclidean import givens_rotations
from complexhyperbolickge_tpu.ops.math import mm_precision, pinned_mm


def _xavier(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(key, shape, dtype) * std


def _kaiming(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / shape[0])


def init_linear(key, d_in, d_out, bias=True, kind="xavier"):
    k1, _ = jax.random.split(key)
    w = _xavier(k1, (d_in, d_out)) if kind == "xavier" else _kaiming(k1, (d_in, d_out))
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,))
    return p


def apply_linear(p, x):
    y = pinned_mm(x, p["w"])
    return y + p["b"] if "b" in p else y


def init_mlp(key, d_in, d_hidden, d_out, num_layers=2):
    """reference models/mlp.py:4-21 (kaiming init, relu between layers)."""
    dims = [d_in] + [d_hidden] * (num_layers - 1) + [d_out]
    keys = jax.random.split(key, num_layers)
    return [
        {"w": _kaiming(k, (dims[i], dims[i + 1])), "b": jnp.zeros((dims[i + 1],))}
        for i, k in enumerate(keys)
    ]


def apply_mlp(layers, x):
    for i, p in enumerate(layers):
        x = pinned_mm(x, p["w"]) + p["b"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


# -------------------------------- CompGCN ------------------------------------


class CompGCNConv:
    """Composition GCN layer (reference euclideangnn.py:16-101).

    message = composition(x_tail, rel) @ W_dir for dir in {in, out, loop};
    aggregation = 1/3 each of degree-normalized in/out sums + self loop;
    then batch-norm (batch statistics) and activation; rel' = rel @ W_rel.
    """

    def __init__(self, d_in, d_out, d_in_r, d_out_r, act, dropout=0.0,
                 opn="mult"):
        self.d_in, self.d_out = d_in, d_out
        self.d_in_r, self.d_out_r = d_in_r, d_out_r
        self.act, self.dropout, self.opn = act, dropout, opn

    def init(self, key):
        ks = jax.random.split(key, 6)
        return {
            "w_loop": _xavier(ks[0], (self.d_in, self.d_out)),
            "w_in": _xavier(ks[1], (self.d_in, self.d_out)),
            "w_out": _xavier(ks[2], (self.d_in, self.d_out)),
            "w_rel": _xavier(ks[3], (self.d_in_r, self.d_out_r)),
            "loop_rel": jax.random.normal(ks[4], (1, self.d_in)),
            "bn_scale": jnp.ones((self.d_out,)),
            "bn_bias": jnp.zeros((self.d_out,)),
        }

    def _compose(self, x, r):
        return x - r if self.opn == "add" else x * r

    def apply_masked(self, p, x, edges, rel_pack, edge_w, dir_w, node_w,
                     key=None):
        """Subgraph variant: edges are NOT [forward; inverse]-aligned, so the
        in/out split is the per-edge direction mask dir_w (1 = forward).
        node_w masks padded node rows out of the batch-norm statistics."""
        rel = rel_pack
        head, tail, etype = edges
        n_ent = x.shape[0]
        comp = self._compose(x[tail], rel[etype])

        def direction(w_mat, w_edge):
            # matmul AFTER aggregation: segsum is linear and w_mat is
            # edge-independent, so segsum(norm*comp) @ W == segsum(norm*
            # (comp @ W)) exactly (up to float association) — E/N fewer
            # matmul FLOPs and no (E, d) post-matmul intermediate
            norm = M.compute_norm(head, w_edge, n_ent)
            return pinned_mm(M.segment_sum(norm[:, None] * comp, head, n_ent), w_mat)

        agg_in = direction(p["w_in"], edge_w * dir_w)
        agg_out = direction(p["w_out"], edge_w * (1.0 - dir_w))
        loop = pinned_mm(self._compose(x, p["loop_rel"]), p["w_loop"])
        if key is not None and self.dropout > 0:
            k1, k2 = jax.random.split(key)
            agg_in = M.dropout(k1, agg_in, self.dropout)
            agg_out = M.dropout(k2, agg_out, self.dropout)
        out = (agg_in + agg_out + loop) / 3.0
        out = self._bn(p, out, node_w)
        if self.act is not None:
            out = self.act(out)
        return out, pinned_mm(rel, p["w_rel"])

    def _bn(self, p, out, node_w=None):
        if node_w is None:
            mean = jnp.mean(out, axis=0, keepdims=True)
            var = jnp.var(out, axis=0, keepdims=True)
        else:
            w = node_w[:, None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(out * w, axis=0, keepdims=True) / n
            var = jnp.sum(w * (out - mean) ** 2, axis=0, keepdims=True) / n
        return (out - mean) / jnp.sqrt(var + 1e-5) * p["bn_scale"] + p["bn_bias"]

    def apply(self, p, x, edges, rel_pack, edge_w, key=None, node_w=None):
        """Full-graph layout ([forward; inverse] halves, each sorted by
        receiving node).  node_w, when given, masks rows out of the
        batch-norm statistics — the full-graph analogue of apply_masked's
        subgraph mask, used when the entity table carries zero pad rows for
        mesh row-sharding (parallel/mesh.py::pad_entity_tree)."""
        rel = rel_pack
        head, tail, etype = edges
        n_ent, e = x.shape[0], head.shape[0]
        half = e // 2  # [forward; inverse] layout

        def direction(sl, w):
            r = rel[etype[sl]]
            comp = self._compose(x[tail[sl]], r)
            # each [forward; inverse] half arrives sorted by head
            # (GNNModel.__init__) -> sorted-scatter fast path.  Matmul
            # AFTER aggregation (segsum is linear, w is edge-independent):
            # E/N fewer matmul FLOPs, no (E, d) post-matmul intermediate.
            norm = M.compute_norm(head[sl], edge_w[sl], n_ent,
                                  indices_are_sorted=True)
            agg = M.segment_sum(norm[:, None] * comp, head[sl], n_ent,
                                indices_are_sorted=True)
            return pinned_mm(agg, w)

        agg_in = direction(slice(0, half), p["w_in"])
        agg_out = direction(slice(half, e), p["w_out"])
        loop = pinned_mm(self._compose(x, p["loop_rel"]), p["w_loop"])
        if key is not None and self.dropout > 0:
            k1, k2 = jax.random.split(key)
            agg_in = M.dropout(k1, agg_in, self.dropout)
            agg_out = M.dropout(k2, agg_out, self.dropout)
        out = (agg_in + agg_out + loop) / 3.0

        # batch-norm over nodes (batch statistics; reference uses
        # nn.BatchNorm1d, euclideangnn.py:27,37); node_w excludes mesh pad
        # rows from the statistics so padded row-sharding matches unpadded
        out = self._bn(p, out, node_w)
        if self.act is not None:
            out = self.act(out)
        return out, pinned_mm(rel, p["w_rel"])

    def regularizable(self, p):
        return [p["w_loop"], p["w_in"], p["w_out"], p["w_rel"]]


# ------------------------------ PoincareConv ---------------------------------


class PoincareConv:
    """Poincare-ball conv (reference poincaregnn.py:19-294): RotH-style
    relation transform per edge in the tangent space, then one of the
    reference's three aggregation methods (poincaregnn.py:132 hardcodes
    method 1; 2 and 3 are its alternate code paths at lines 195-216,
    selectable here via agg_method / the --gnn_agg_method CLI flag):

      1: symmetric-normalized tangent aggregation, gyro-midpoint mixing
         with the self-loop message (poincaregnn.py:141-191);
      2: gyromidpoint over [edges; self-loops] jointly in hyperbolic space
         (poincaregnn.py:195-199 + update() at 221-241);
      3: per-direction 1/deg tangent means, 1/3 mix with the self-loop
         message (poincaregnn.py:201-216).

    Relation/curvature update by learned MLPs in all methods."""

    def __init__(self, d_in, d_out, d_in_r, d_out_r, act, dropout=0.0,
                 agg_method: int = 1):
        self.d_in, self.d_out = d_in, d_out
        self.d_in_r, self.d_out_r = d_in_r, d_out_r
        self.act, self.dropout = act, dropout
        assert agg_method in (1, 2, 3), agg_method
        self.agg_method = agg_method

    def init(self, key):
        ks = jax.random.split(key, 8)
        return {
            "w_loop": _xavier(ks[0], (self.d_in, self.d_out)),
            "w_in": _xavier(ks[1], (self.d_in, self.d_out)),
            "w_out": _xavier(ks[2], (self.d_in, self.d_out)),
            "b_loop": jnp.zeros((1, self.d_out)),
            "b_in": jnp.zeros((1, self.d_out)),
            "b_out": jnp.zeros((1, self.d_out)),
            "w_rel": init_linear(ks[3], 3 * self.d_in + 1, 3 * self.d_out),
            "b_rel1": jnp.zeros((1, self.d_out)),
            "b_rel2": jnp.zeros((1, self.d_out)),
            "loop_curvature": jnp.ones((1,)),
            "loop_weight": jnp.zeros((1,)),
            "mlp_curvature": init_mlp(ks[4], 3 * self.d_in + 1, 3 * self.d_in, 1),
        }

    # ---- manifold pieces (Poincare) ----

    def _rel_transform(self, ent, rel_emb, c):
        """RotH-style inverse isometry (poincaregnn.py:243-264)."""
        rel1, rel2, rot = jnp.split(rel_emb, 3, axis=-1)
        lhs = H.expmap0(ent, c)
        rel1 = H.expmap0(rel1, c)
        rel2 = H.expmap0(rel2, c)
        lhs = H.project(H.mobius_add(-rel2, lhs, c), c)
        lhs = givens_rotations(rot, lhs, inverse=True)
        lhs = H.mobius_add(-rel1, lhs, c)
        return H.logmap0(lhs, c)

    def _message(self, p, x_j, etype, rel, curv, mode):
        lc = jax.nn.softplus(p["loop_curvature"])
        xj = pinned_mm(x_j, p["w_" + mode])
        xj = H.expmap0(xj, lc)
        bias = H.expmap0(p["b_" + mode], lc)
        xj = H.project(H.mobius_add(xj, bias, lc), lc)
        xj = H.logmap0(xj, lc)
        if mode != "loop":
            xj = self._rel_transform(xj, rel[etype], curv[etype])
        return xj

    def _update_rel(self, p, rel, curv_raw):
        """Relation + curvature update (poincaregnn.py:59-81): w_rel linear,
        curvature MLP, then the b_rel1/b_rel2 Mobius adds.  ONE definition
        shared by apply and apply_masked (LorentzConv overrides — no b_rel
        adds, lorentzgnn.py:57-63)."""
        trc = jnp.concatenate([rel[..., : 3 * self.d_in], curv_raw], axis=-1)
        out_rel = apply_linear(p["w_rel"], trc)
        c_out_raw = apply_mlp(p["mlp_curvature"], trc)
        c_out = jax.nn.softplus(c_out_raw)
        rel1, rel2, rot = jnp.split(out_rel, 3, axis=-1)
        rel1 = H.mobius_add(H.expmap0(rel1, c_out), H.expmap0(p["b_rel1"], c_out), c_out)
        rel2 = H.mobius_add(H.expmap0(rel2, c_out), H.expmap0(p["b_rel2"], c_out), c_out)
        rel1 = H.logmap0(rel1, c_out)
        rel2 = H.logmap0(rel2, c_out)
        out_rel = jnp.concatenate([rel1, rel2, rot], axis=-1)
        return out_rel, c_out, c_out_raw

    def apply(self, p, x, edges, rel_pack, edge_w, key=None, node_w=None):
        # node_w accepted for signature uniformity with CompGCNConv (mesh
        # pad-row masking); unused — every cross-row op here is row-local
        # per receiving node (pad rows aggregate nothing and pollute nothing)
        rel, curv_raw = rel_pack  # (Nr, >=3*d_in), (Nr, 1) un-softplused
        head, tail, etype = edges

        out_rel, c_out, c_out_raw = self._update_rel(p, rel, curv_raw)
        out = self._propagate(p, x, (head, tail, etype), out_rel, c_out, edge_w)
        if self.act is not None:
            out = self.act(out)
        if key is not None and self.dropout > 0:
            k1, k2 = jax.random.split(key)
            out = M.dropout(k1, out, self.dropout)
            out_rel = M.dropout(k2, out_rel, self.dropout)
        return out, (out_rel, c_out_raw)

    def _propagate(self, p, x, edges, rel, curv, edge_w):
        """Method-1 tangent aggregation + gyro-midpoint self-loop mixing
        (poincaregnn.py:141-191)."""
        head, tail, etype = edges
        n_ent, e = x.shape[0], head.shape[0]
        half = e // 2
        lc = jax.nn.softplus(p["loop_curvature"])

        msg_in = self._message(p, x[tail[:half]], etype[:half], rel, curv, "in")
        msg_out = self._message(p, x[tail[half:]], etype[half:], rel, curv, "out")
        msg_loop = self._message(p, x, None, None, None, "loop")

        msgs = jnp.concatenate([msg_in, msg_out], axis=0)
        return self._mix(p, msgs, msg_loop, head, tail, edge_w, n_ent, lc,
                         sorted_halves=True)

    def _mix(self, p, msgs, msg_loop, head, tail, edge_w, n_ent, lc,
             sorted_halves=False, dir_w=None):
        """Dispatch to the selected reference aggregation method."""
        if self.agg_method == 2:
            return self._aggregate_gyromidpoint(p, msgs, msg_loop, head,
                                                edge_w, n_ent, lc)
        if self.agg_method == 3:
            return self._aggregate_thirds(msgs, msg_loop, head, edge_w, n_ent,
                                          sorted_halves=sorted_halves,
                                          dir_w=dir_w)
        return self._aggregate_and_mix(p, msgs, msg_loop, head, tail, edge_w,
                                       n_ent, lc, sorted_halves=sorted_halves)

    def _gyromidpoint_update(self, out, edge_norm, idx, lc, n_ent):
        """Weighted Einstein/gyro-midpoint of hyperbolic points, back to the
        tangent plane (reference update(), poincaregnn.py:221-241).  Shape-
        generic: (M, D) rows or (M, K, D) per-head rows, weights matching
        with a trailing 1 axis; segment index idx over axis 0."""
        out = H.expmap0(out, lc)
        gamma = 2.0 / (1.0 - lc * jnp.sum(out * out, axis=-1, keepdims=True))
        den = M.segment_sum(edge_norm * (gamma - 1.0), idx, n_ent)
        den = den[idx] + 1e-5
        wts = gamma * edge_norm / den
        agg = M.segment_sum(wts * out, idx, n_ent)
        factor = 1.0 / (
            1.0 + jnp.sqrt(1.0 - lc * jnp.sum(agg * agg, axis=-1,
                                              keepdims=True))
        )
        return H.logmap0(factor * agg, lc)

    def _aggregate_gyromidpoint(self, p, msgs, msg_loop, head, edge_w, n_ent,
                                lc):
        """Reference method 2 (poincaregnn.py:195-199): gyromidpoint over
        the [edges; self-loops] union with 1/deg weights.  Every node has a
        weight-1 loop entry, so segments are never empty; dropped edges
        carry weight 0 through the norm exactly like physically-removed
        edges do in the reference."""
        dtype = msgs.dtype
        idx = jnp.concatenate([head, jnp.arange(n_ent, dtype=head.dtype)])
        w = jnp.concatenate([edge_w, jnp.ones((n_ent,), dtype)])
        all_msgs = jnp.concatenate([msgs, msg_loop], axis=0)
        deg = M.segment_sum(w, idx, n_ent)
        deg_inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-30), 0.0)
        norm = (deg_inv[idx] * w)[:, None]
        return self._gyromidpoint_update(all_msgs, norm, idx, lc, n_ent)

    def _aggregate_thirds(self, msgs, msg_loop, head, edge_w, n_ent,
                          sorted_halves=False, dir_w=None):
        """Reference method 3 (poincaregnn.py:201-216): per-direction 1/deg
        tangent means, mixed 1/3 each with the self-loop message.  In the
        masked (subgraph) layout the in/out split is the per-edge dir_w
        mask; the per-direction edge weight zeroes the other direction's
        contribution exactly like the reference's index split."""
        if dir_w is None:  # [forward; inverse] halves layout
            half = head.shape[0] // 2

            def half_mean(sl):
                n = M.compute_norm(head[sl], edge_w[sl], n_ent,
                                   indices_are_sorted=sorted_halves)
                return M.segment_sum(n[:, None] * msgs[sl], head[sl], n_ent,
                                     indices_are_sorted=sorted_halves)

            agg_in = half_mean(slice(0, half))
            agg_out = half_mean(slice(half, None))
        else:
            def dir_mean(w):
                n = M.compute_norm(head, w, n_ent)
                return M.segment_sum(n[:, None] * msgs, head, n_ent)

            agg_in = dir_mean(edge_w * dir_w)
            agg_out = dir_mean(edge_w * (1.0 - dir_w))
        return (agg_in + agg_out + msg_loop) / 3.0

    def _aggregate_and_mix(self, p, msgs, msg_loop, head, tail, edge_w, n_ent,
                           lc, sorted_halves=False):
        seg = M.segment_sum_sorted_halves if sorted_halves else (
            lambda v, i, n: M.segment_sum(v, i, n))
        norm = M.compute_symmetric_norm(head, tail, edge_w, n_ent,
                                        head_sorted_halves=sorted_halves)
        agg = seg(norm[:, None] * msgs, head, n_ent)
        degs = seg(edge_w, head, n_ent)

        # gyro-barycenter of (aggregate, self-loop) with learned weight
        lw = jax.nn.sigmoid(p["loop_weight"])
        hb = H.expmap0(agg, lc)
        hl = H.expmap0(msg_loop, lc)
        gamma_rel = 2.0 / (1.0 - lc * jnp.sum(hb * hb, axis=-1, keepdims=True))
        gamma_loop = 2.0 / (1.0 - lc * jnp.sum(hl * hl, axis=-1, keepdims=True))
        den = (1 - lw) * (gamma_rel - 1) + lw * (gamma_loop - 1)
        m = ((1 - lw) * gamma_rel / den) * hb + (lw * gamma_loop / den) * hl
        factor = 1.0 / (
            1.0 + jnp.sqrt(1.0 - lc * jnp.sum(m * m, axis=-1, keepdims=True))
        )
        mixed = H.logmap0(factor * m, lc)
        return jnp.where(degs[:, None] > 0, mixed, msg_loop)

    # ------------------------- subgraph (masked) path -------------------------

    def apply_masked(self, p, x, edges, rel_pack, edge_w, dir_w, node_w,
                     key=None):
        """Subgraph variant: sampled edges are NOT [forward; inverse]-aligned;
        dir_w (E,) = 1 for forward edges selects the in/out weights per edge.
        node_w is unused here (no cross-row statistics in this conv)."""
        rel, curv_raw = rel_pack
        head, tail, etype = edges
        n_ent = x.shape[0]
        lc = jax.nn.softplus(p["loop_curvature"])

        out_rel, c_out, c_out_raw = self._update_rel(p, rel, curv_raw)

        et_in = self._etype_for(etype, dir_w, rel.shape[0], "in")
        et_out = self._etype_for(etype, dir_w, rel.shape[0], "out")
        m_in = self._message(p, x[tail], et_in, out_rel, c_out, "in")
        m_out = self._message(p, x[tail], et_out, out_rel, c_out, "out")
        msgs = dir_w[:, None] * m_in + (1.0 - dir_w[:, None]) * m_out
        msg_loop = self._message(p, x, None, None, None, "loop")
        out = self._mix(p, msgs, msg_loop, head, tail, edge_w, n_ent, lc,
                        dir_w=dir_w)
        if self.act is not None:
            out = self.act(out)
        if key is not None and self.dropout > 0:
            k1, k2 = jax.random.split(key)
            out = M.dropout(k1, out, self.dropout)
            out_rel = M.dropout(k2, out_rel, self.dropout)
        return out, (out_rel, c_out_raw)

    def _etype_for(self, etype, dir_w, n_rel, mode):
        """Relation-type lookup per direction (PoincareConv uses the true
        type; LorentzConv overrides with its swapped-type quirk)."""
        return etype

    def regularizable(self, p):
        return [p["w_loop"], p["w_in"], p["w_out"], p["w_rel"]["w"]]


# ------------------------------- LorentzConv ---------------------------------


class LorentzConv(PoincareConv):
    """Hyperboloid conv (reference lorentzgnn.py:18-232): boost-based
    relation transform, 1/deg tangent aggregation, Lorentz-centroid mixing
    with the self-loop message."""

    def __init__(self, *args, **kwargs):
        assert kwargs.get("agg_method", 1) == 1, (
            "LorentzConv has only the centroid aggregation "
            "(reference lorentzgnn.py:117-143 — no method-2/3 branches)")
        super().__init__(*args, **kwargs)

    def _rel_transform(self, ent, rel_emb, c):
        """Boost-rotate-boost (lorentzgnn.py:181-205)."""
        rel1, rel2, rot = jnp.split(rel_emb, 3, axis=-1)
        lhs = H.expmap0_lorentz(ent, c)
        lhs = H.lorentz_boost(lhs, rel1, c)
        lhs = givens_rotations(rot, lhs)
        lhs = H.lorentz_boost(lhs, rel2, c)
        return H.logmap0_lorentz(lhs, c)

    def _message(self, p, x_j, etype, rel, curv, mode):
        lc = jax.nn.softplus(p["loop_curvature"])
        xj = pinned_mm(x_j, p["w_" + mode])
        xj = H.expmap0_lorentz(xj, lc)
        xj = H.lorentz_boost(xj, p["b_" + mode], lc)
        xj = H.logmap0_lorentz(xj, lc)
        if mode != "loop":
            xj = self._rel_transform(xj, rel[etype], curv[etype])
        return xj

    def _update_rel(self, p, rel, curv_raw):
        """No b_rel Mobius adds (lorentzgnn.py:57-63); apply/apply_masked
        are inherited from PoincareConv and route through this override."""
        trc = jnp.concatenate([rel[..., : 3 * self.d_in], curv_raw], axis=-1)
        out_rel = apply_linear(p["w_rel"], trc)
        c_out_raw = apply_mlp(p["mlp_curvature"], trc)
        return out_rel, jax.nn.softplus(c_out_raw), c_out_raw

    def _propagate(self, p, x, edges, rel, curv, edge_w):
        """Lorentz method-1 (lorentzgnn.py:117-143).  NB the reference swaps
        in/out edge types in the messages (lorentzgnn.py:96-101) — kept,
        expressed PER EDGE (forward edge of raw type t messages with type
        t + n_rel/2 and vice versa).  The halves are each sorted by their
        own receiving-node permutation (GNNModel.encode), so indexing the
        OTHER half's etype slice — which was equivalent when the halves
        were edge-aligned — would pair almost every message with an
        arbitrary other edge's relation transform."""
        head, tail, etype = edges
        n_ent, e = x.shape[0], head.shape[0]
        half = e // 2
        half_rel = rel.shape[0] // 2
        lc = jax.nn.softplus(p["loop_curvature"])

        msg_in = self._message(p, x[tail[:half]], etype[:half] + half_rel,
                               rel, curv, "in")
        msg_out = self._message(p, x[tail[half:]], etype[half:] - half_rel,
                                rel, curv, "out")
        msg_loop = self._message(p, x, None, None, None, "loop")

        msgs = jnp.concatenate([msg_in, msg_out], axis=0)
        return self._aggregate_and_mix(p, msgs, msg_loop, head, tail, edge_w,
                                       n_ent, lc, sorted_halves=True)

    def _aggregate_and_mix(self, p, msgs, msg_loop, head, tail, edge_w, n_ent,
                           lc, sorted_halves=False):
        norm = (M.compute_norm_sorted_halves(head, edge_w, n_ent)
                if sorted_halves else M.compute_norm(head, edge_w, n_ent))
        agg = (M.segment_sum_sorted_halves(norm[:, None] * msgs, head, n_ent)
               if sorted_halves else
               M.segment_sum(norm[:, None] * msgs, head, n_ent))

        lw = jax.nn.sigmoid(p["loop_weight"])
        hb = H.explicit_lorentz(H.expmap0_lorentz(agg, lc), lc)
        hl = H.explicit_lorentz(H.expmap0_lorentz(msg_loop, lc), lc)
        mix = (1 - lw) * hb + lw * hl
        mix_l = -mix[..., :1] ** 2 + jnp.sum(mix[..., 1:] ** 2, axis=-1,
                                             keepdims=True)
        mix_l = (1.0 / jnp.sqrt(lc)) * jnp.sqrt(jnp.abs(mix_l)) + 1e-6
        out = (mix / mix_l)[..., 1:]
        return H.logmap0_lorentz(out, lc)

    def _etype_for(self, etype, dir_w, n_rel, mode):
        """The reference LorentzConv looks up the OPPOSITE direction's
        relation type in its messages (lorentzgnn.py:96-101); in the masked
        layout that is type +/- n_rel/2 per edge."""
        half = n_rel // 2
        if mode == "in":  # forward edges processed as 'in' use type + half
            return jnp.where(dir_w > 0.5, etype + half, etype)
        return jnp.where(dir_w > 0.5, etype, etype - half)


# ------------------------------ PoincareGATConv -------------------------------


def _xavier_normal_torch(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_normal_ fan computation for >=2-D tensors:
    fan_in = shape[1] * prod(shape[2:]), fan_out = shape[0] * prod(shape[2:])."""
    rf = math.prod(shape[2:]) if len(shape) > 2 else 1
    std = math.sqrt(2.0 / ((shape[0] + shape[1]) * rf))
    return jax.random.normal(key, shape, dtype) * std


class PoincareGATConv(PoincareConv):
    """Multi-head attention variant of PoincareConv (reference
    poincaregnn.py:296-463 — present but UNREGISTERED dead code at reference
    HEAD; implemented here as a first-class conv, numeric-parity-tested
    against the executed reference class).

    Per-head (heads=4) messages through (K, d_in, out_att) weights with the
    reference's positional type-swap quirk (forward edges message with the
    inverse relation's embedding, poincaregnn.py:350-355 — expressed per
    edge as type +- n_rel/2 since our halves are sorted, not edge-aligned);
    LeakyReLU additive attention a_h.loop(head) + a_t.msg + a_r.W_r(rel)
    with a scatter-softmax over [edges; self-loops] per receiving node
    (compute_norm, poincaregnn.py:418-453); gyromidpoint update per head
    (inherited update semantics); head gather = mean or concat
    (poincaregnn.py:388-391).  The relation stream is PoincareConv's
    (inherited forward/_update_rel)."""

    def __init__(self, d_in, d_out, d_in_r, d_out_r, act, dropout=0.0,
                 gather="mean", heads=4, agg_method: int = 1):
        assert agg_method == 1, (
            "the reference PoincareGATConv.propagate has only the method-1 "
            "branch (poincaregnn.py:359-396)")
        super().__init__(d_in, d_out, d_in_r, d_out_r, act, dropout=dropout,
                         agg_method=agg_method)
        assert gather in ("mean", "concat"), gather
        self.gather, self.heads = gather, heads
        self.out_att = d_out if gather == "mean" else d_out // heads
        assert self.out_att * (1 if gather == "mean" else heads) == d_out
        assert self.out_att % 2 == 0, (
            "per-head width must be even (Givens rotations act on pairs); "
            f"got out_att={self.out_att} from d_out={d_out}, gather={gather}")

    def init(self, key):
        p = super().init(key)
        K, oa = self.heads, self.out_att
        ks = jax.random.split(jax.random.fold_in(key, 17), 9)
        # per-head projections replace the single-head ones
        # (poincaregnn.py:306-312; xavier_uniform -> same scale family here)
        p["w_loop"] = _xavier(ks[0], (K, self.d_in, oa))
        p["w_in"] = _xavier(ks[1], (K, self.d_in, oa))
        p["w_out"] = _xavier(ks[2], (K, self.d_in, oa))
        p["b_loop"] = jnp.zeros((K, oa))
        p["b_in"] = jnp.zeros((K, oa))
        p["b_out"] = jnp.zeros((K, oa))
        # loop_rel / w_k_r keep torch.randn N(0,1): the reference never
        # re-initializes them (poincaregnn.py:304,315 vs 323-334)
        p["loop_rel"] = jax.random.normal(ks[3], (1, 3 * oa))
        p["w_k_r"] = jax.random.normal(ks[4], (K, 3 * self.d_out, 3 * oa))
        p["W_r"] = _xavier(ks[5], (K, 3 * oa, oa))
        p["a_h"] = _xavier_normal_torch(ks[6], (1, K, oa))
        p["a_r"] = _xavier_normal_torch(ks[7], (1, K, oa))
        p["a_t"] = _xavier_normal_torch(ks[8], (1, K, oa))
        return p

    def _message(self, p, x_j, etype, relh, curv, mode):
        """Per-head message (poincaregnn.py:398-416).  relh is the per-head
        projected relation table (Nr, K, 3*out_att); etype arrives already
        direction-swapped by the caller."""
        lc = jax.nn.softplus(p["loop_curvature"])
        xj = jnp.einsum("ed,kdo->eko", x_j, p["w_" + mode],
                        precision=mm_precision())
        xj = H.expmap0(xj, lc)
        bias = H.expmap0(p["b_" + mode], lc)
        xj = H.project(H.mobius_add(xj, bias, lc), lc)
        xj = H.logmap0(xj, lc)
        if mode != "loop":
            c = curv[etype][:, None, :]  # (E,1,1): broadcast over heads
            xj = self._rel_transform(xj, relh[etype], c)
        return xj

    def _propagate(self, p, x, edges, rel, curv, edge_w):
        head, tail, etype = edges
        n_ent, e = x.shape[0], head.shape[0]
        half = e // 2
        half_rel = rel.shape[0] // 2
        lc = jax.nn.softplus(p["loop_curvature"])
        relh = jnp.einsum("nd,kde->nke", rel, p["w_k_r"],
                          precision=mm_precision())  # (Nr, K, 3*out_att)
        # positional type-swap quirk (poincaregnn.py:350-355), per edge
        msg_in = self._message(p, x[tail[:half]], etype[:half] + half_rel,
                               relh, curv, "in")
        msg_out = self._message(p, x[tail[half:]], etype[half:] - half_rel,
                                relh, curv, "out")
        msg_loop = self._message(p, x, None, None, None, "loop")
        msgs = jnp.concatenate([msg_in, msg_out], axis=0)  # (E, K, d)
        # the attention relation term uses the UNSWAPPED edge type
        # (compute_norm receives propagate's own edge_type, :365-371)
        return self._attend_and_update(p, msgs, msg_loop, head, etype, relh,
                                       edge_w, n_ent, lc)

    def _attend_and_update(self, p, msgs, msg_loop, head, etype, relh, edge_w,
                           n_ent, lc):
        """Scatter-softmax attention + per-head gyromidpoint update + head
        gather (poincaregnn.py:363-391 and 418-453)."""
        dtype = msgs.dtype
        prec = mm_precision()
        idx = jnp.concatenate([head, jnp.arange(n_ent, dtype=head.dtype)])
        w_all = jnp.concatenate([edge_w, jnp.ones((n_ent,), dtype)])
        h_all = jnp.concatenate([msgs, msg_loop], axis=0)  # (E+N, K, d)

        r_proj = jnp.einsum("nke,keo->nko", relh, p["W_r"], precision=prec)
        r_self = jnp.einsum("e,keo->ko", p["loop_rel"][0], p["W_r"],
                            precision=prec)  # (K, oa)

        a_head = jnp.sum(p["a_h"] * msg_loop, axis=-1, keepdims=True)  # (N,K,1)
        a = a_head[idx] + jnp.sum(p["a_t"] * h_all, axis=-1, keepdims=True)
        r_edge = jnp.sum(p["a_r"] * r_proj, axis=-1, keepdims=True)[etype]
        r_loop = jnp.broadcast_to(
            jnp.sum(p["a_r"][0] * r_self, axis=-1, keepdims=True)[None],
            (n_ent, self.heads, 1),
        )
        a = a + jnp.concatenate([r_edge, r_loop], axis=0)
        a = jax.nn.leaky_relu(a, 0.2)
        # scatter-softmax per receiving node; dropped edges (weight 0) are
        # excluded from max and sum exactly like the reference's physically
        # removed edges.  Loop entries keep every segment non-empty.
        a_m = jnp.where(w_all[:, None, None] > 0, a,
                        jnp.asarray(-1e30, dtype))
        mx = M.segment_max(a_m[..., 0], idx, n_ent)  # (N, K)
        aexp = jnp.exp(a_m - mx[idx][..., None]) * w_all[:, None, None]
        ssum = M.segment_sum(aexp, idx, n_ent)
        alpha = aexp / (ssum[idx] + 1e-8)

        out = self._gyromidpoint_update(h_all, alpha, idx, lc, n_ent)
        if self.gather == "mean":
            return jnp.mean(out, axis=1)
        return out.reshape(n_ent, -1)

    def apply_masked(self, p, x, edges, rel_pack, edge_w, dir_w, node_w,
                     key=None):
        """Subgraph variant (sampled edges, per-edge dir_w direction mask).
        No reference counterpart exists (KGOptimizerSubgraph never ran the
        unregistered GAT); semantics mirror apply() with the per-edge
        direction blend used by the other convs."""
        rel, curv_raw = rel_pack
        head, tail, etype = edges
        n_ent = x.shape[0]
        lc = jax.nn.softplus(p["loop_curvature"])

        out_rel, c_out, c_out_raw = self._update_rel(p, rel, curv_raw)
        relh = jnp.einsum("nd,kde->nke", out_rel, p["w_k_r"],
                          precision=mm_precision())
        et_in = self._etype_for(etype, dir_w, rel.shape[0], "in")
        et_out = self._etype_for(etype, dir_w, rel.shape[0], "out")
        m_in = self._message(p, x[tail], et_in, relh, c_out, "in")
        m_out = self._message(p, x[tail], et_out, relh, c_out, "out")
        d3 = dir_w[:, None, None]
        msgs = d3 * m_in + (1.0 - d3) * m_out
        msg_loop = self._message(p, x, None, None, None, "loop")
        out = self._attend_and_update(p, msgs, msg_loop, head, etype, relh,
                                      edge_w, n_ent, lc)
        if self.act is not None:
            out = self.act(out)
        if key is not None and self.dropout > 0:
            k1, k2 = jax.random.split(key)
            out = M.dropout(k1, out, self.dropout)
            out_rel = M.dropout(k2, out_rel, self.dropout)
        return out, (out_rel, c_out_raw)

    def _etype_for(self, etype, dir_w, n_rel, mode):
        """Positional type-swap per edge in the masked layout (same quirk
        class as LorentzConv; poincaregnn.py:350-355)."""
        half = n_rel // 2
        if mode == "in":
            return jnp.where(dir_w > 0.5, etype + half, etype)
        return jnp.where(dir_w > 0.5, etype, etype - half)

    def regularizable(self, p):
        return [p["w_loop"], p["w_in"], p["w_out"], p["w_rel"]["w"],
                p["w_k_r"], p["W_r"]]
