"""Euclidean KG embedding models: TransE, CP, MurE, RotE, RefE, AttE.

Reference: models/euclidean.py (EUC_MODELS at :10).  The reference's RefE has
a NameError at euclidean.py:129 (`lhs_e` used before assignment — SURVEY
known-bugs list); here RefE is implemented as evidently intended
(reflection + translation).
"""

from __future__ import annotations

import jax.numpy as jnp

from complexhyperbolickge_tpu.models.base import KGModel, dot_all, dot_train, neg_sq_dist
from complexhyperbolickge_tpu.ops.euclidean import givens_reflection, givens_rotations

EUC_MODELS = ["TransE", "CP", "MurE", "RotE", "RefE", "AttE"]


class BaseE(KGModel):
    """sim = dot product or negative squared distance (euclidean.py:24-30)."""

    sim_kind = "dist"  # or "dot"

    def sim(self, lhs_pack, rhs_e, all_pairs: bool):
        (lhs_e,) = lhs_pack
        if self.sim_kind == "dot":
            return dot_all(lhs_e, rhs_e) if all_pairs else dot_train(lhs_e, rhs_e)
        return neg_sq_dist(lhs_e, rhs_e, all_pairs)

    def _finish(self, params, queries, lhs_e):
        return (lhs_e,), params["bh"][queries[..., 0]]


class TransE(BaseE):
    """Translations (euclidean.py:33-49)."""

    def get_queries(self, params, queries):
        lhs_e = params["entity"][queries[..., 0]] + params["rel"][queries[..., 1]]
        return self._finish(params, queries, lhs_e)


class CP(BaseE):
    """Canonical tensor decomposition (euclidean.py:52-67)."""

    sim_kind = "dot"

    def get_queries(self, params, queries):
        lhs_e = params["entity"][queries[..., 0]] * params["rel"][queries[..., 1]]
        return self._finish(params, queries, lhs_e)


class MurE(BaseE):
    """Diagonal scaling (euclidean.py:70-89)."""

    def extra_param_specs(self):
        return {"rel_diag": ((self.cfg.n_relations, self.cfg.rank), "uniform")}

    def get_queries(self, params, queries):
        lhs_e = (
            params["rel_diag"][queries[..., 1]] * params["entity"][queries[..., 0]]
            + params["rel"][queries[..., 1]]
        )
        return self._finish(params, queries, lhs_e)


class RotE(BaseE):
    """Givens rotations + translation (euclidean.py:92-111)."""

    def extra_param_specs(self):
        return {"rel_diag": ((self.cfg.n_relations, self.cfg.rank), "uniform")}

    def get_queries(self, params, queries):
        lhs_e = givens_rotations(
            params["rel_diag"][queries[..., 1]], params["entity"][queries[..., 0]]
        ) + params["rel"][queries[..., 1]]
        return self._finish(params, queries, lhs_e)


class RefE(BaseE):
    """Givens reflections + translation (euclidean.py:113-133, NameError fixed)."""

    def extra_param_specs(self):
        return {"rel_diag": ((self.cfg.n_relations, self.cfg.rank), "uniform")}

    def get_queries(self, params, queries):
        lhs = givens_reflection(
            params["rel_diag"][queries[..., 1]], params["entity"][queries[..., 0]]
        )
        lhs_e = lhs + params["rel"][queries[..., 1]]
        return self._finish(params, queries, lhs_e)


class AttE(BaseE):
    """Attention over {reflection, rotation} candidates (euclidean.py:136-186)."""

    def extra_param_specs(self):
        nr, r = self.cfg.n_relations, self.cfg.rank
        return {
            "ref": ((nr, r), "uniform"),
            "rot": ((nr, r), "uniform"),
            # the reference re-inits only rot/ref (euclidean.py:155-157);
            # context_vec keeps torch's nn.Embedding default N(0,1) — NOT
            # init_size-scaled (unlike AttH, which re-inits it at
            # hyperbolic.py:108), so attention starts sharp, not uniform
            "context_vec": ((nr, r), ("normal", 0.0, 1.0)),
        }

    def get_queries(self, params, queries):
        import jax

        head = params["entity"][queries[..., 0]]
        r = queries[..., 1]
        ref_q = givens_reflection(params["ref"][r], head)[..., None, :]
        rot_q = givens_rotations(params["rot"][r], head)[..., None, :]
        cands = jnp.concatenate([ref_q, rot_q], axis=-2)  # (B, 2, d)
        context = params["context_vec"][r][..., None, :]
        scale = 1.0 / jnp.sqrt(jnp.asarray(float(self.cfg.rank), dtype=head.dtype))
        att = jnp.sum(context * cands * scale, axis=-1, keepdims=True)
        att = jax.nn.softmax(att, axis=-2)
        lhs_e = jnp.sum(att * cands, axis=-2) + params["rel"][r]
        return self._finish(params, queries, lhs_e)
