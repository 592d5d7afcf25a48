"""Real-hyperbolic KG embedding models (Poincare ball + Lorentz hyperboloid).

Reference: models/hyperbolic.py (HYP_MODELS at :14).  Eight models:
RotH / RefH / AttH are the Chami et al. 2020 models; AttRH, IsoH, IFFTH,
RotLH, HyboNet are fork additions.

TPU design notes:
  * train mode broadcasts (B, 1, d) against (B, K, d) candidates — tiny K,
    pure VPU work fused by XLA.
  * all-entity mode uses the folded distance forms from ops.hyperbolic
    (`hyp_sim_expmap_all` / `lorentz_sim_expmap_all`): the reference would
    materialize expmap0 of the whole table per query batch and broadcast to
    (B, N, d) (models/hyperbolic.py:45-49); here the only cross term is one
    (B, d) x (d, N) matmul on the MXU.
  * the reference's BaseH family crashes with multi_c=False (it indexes a
    1-row embedding with relation ids, hyperbolic.py:57); here single-c means
    a shared softplused scalar.  IFFTH mirrors the reference exactly (raw
    weight when single-c, hyperbolic.py:257).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.models.base import KGModel
from complexhyperbolickge_tpu.ops import hyperbolic as H
from complexhyperbolickge_tpu.ops.euclidean import (
    givens_reflection,
    givens_rotations,
    givens_unitary,
)
from complexhyperbolickge_tpu.ops.math import mm_precision

HYP_MODELS = ["RotH", "RefH", "AttH", "AttRH", "IFFTH", "IsoH", "RotLH", "HyboNet"]


def _scale_pairs(x, scale2):
    """x[..., 0::2] *= s; x[..., 1::2] *= s  (reference hyperbolic.py:224-225)."""
    xp = x.reshape(*x.shape[:-1], -1, 2)
    return (xp * scale2[..., None]).reshape(x.shape)


class BaseH(KGModel):
    """Poincare-ball family base (reference models/hyperbolic.py:17-49).

    sim = -hyp_distance_multi_c(lhs, expmap0(rhs, c), c)^2.  Note the double
    tanh: expmap0 maps the tail into the ball AND hyp_distance_multi_c folds
    another expmap of its `v` argument — reference semantics kept exactly.
    """

    _softplus_single_c = True

    @property
    def rel_dim(self):
        return 2 * self.cfg.rank

    def extra_param_specs(self):
        nr = self.cfg.n_relations
        specs = {"rel_diag": ((nr, self.cfg.rank), "uniform")}
        specs["c"] = ((nr if self.cfg.multi_c else 1, 1), "ones")
        return specs

    def sim(self, lhs_pack, rhs_e, all_pairs: bool):
        lhs_e, c = lhs_pack
        if all_pairs:
            return -H.hyp_sim_expmap_all(lhs_e, rhs_e, c) ** 2
        lhs3 = lhs_e[:, None, :]  # (B, 1, d)
        c3 = c[:, :, None]  # (B, 1, 1)
        rhs_h = H.expmap0(rhs_e, c3)
        return -H.hyp_distance_multi_c(lhs3, rhs_h, c3)[..., 0] ** 2


class RotH(BaseH):
    """Rotations then Mobius translations (hyperbolic.py:52-72)."""

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        c = self.curvature(params, r)
        head = H.expmap0(params["entity"][h], c)
        rel1, rel2 = jnp.split(params["rel"][r], 2, axis=-1)
        rel1 = H.expmap0(rel1, c)
        rel2 = H.expmap0(rel2, c)
        lhs = H.project(H.mobius_add(head, rel1, c), c)
        res1 = givens_rotations(params["rel_diag"][r], lhs)
        res2 = H.mobius_add(res1, rel2, c)
        return (res2, c), params["bh"][h]


class RefH(BaseH):
    """Reflections in tangent space then Mobius translation (hyperbolic.py:75-93)."""

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        c = self.curvature(params, r)
        rel = jnp.split(params["rel"][r], 2, axis=-1)[0]
        rel = H.expmap0(rel, c)
        lhs = givens_reflection(params["rel_diag"][r], params["entity"][h])
        lhs = H.expmap0(lhs, c)
        res = H.project(H.mobius_add(lhs, rel, c), c)
        return (res, c), params["bh"][h]


class AttH(BaseH):
    """Softmax attention over {reflection, rotation} (hyperbolic.py:96-133)."""

    def extra_param_specs(self):
        nr, rank = self.cfg.n_relations, self.cfg.rank
        specs = super().extra_param_specs()
        specs["rel_diag"] = ((nr, 2 * rank), "uniform")
        specs["context_vec"] = ((nr, rank), "normal")
        return specs

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        c = self.curvature(params, r)
        head = params["entity"][h]
        rot_mat, ref_mat = jnp.split(params["rel_diag"][r], 2, axis=-1)
        rot_q = givens_rotations(rot_mat, head)[..., None, :]
        ref_q = givens_reflection(ref_mat, head)[..., None, :]
        cands = jnp.concatenate([ref_q, rot_q], axis=-2)  # (B, 2, d)
        context_vec = params["context_vec"][r][..., None, :]
        scale = 1.0 / jnp.sqrt(jnp.asarray(float(self.cfg.rank), dtype=head.dtype))
        att = jnp.sum(context_vec * cands * scale, axis=-1, keepdims=True)
        att = jax.nn.softmax(att, axis=-2)
        att_q = jnp.sum(att * cands, axis=-2)
        lhs = H.expmap0(att_q, c)
        rel = jnp.split(params["rel"][r], 2, axis=-1)[0]
        rel = H.expmap0(rel, c)
        res = H.project(H.mobius_add(lhs, rel, c), c)
        return (res, c), params["bh"][h]


class AttRH(BaseH):
    """Split rotation/reflection subspaces + learned 2-way weights
    (hyperbolic.py:136-196).  NOTE: the reference scores raw (un-expmapped)
    rhs halves, so the all-pairs form uses the plain folded distance."""

    def extra_param_specs(self):
        nr, rank = self.cfg.n_relations, self.cfg.rank
        specs = super().extra_param_specs()
        specs["rel_diag"] = ((nr, rank), "uniform")
        specs["weights"] = ((nr, 2), "normal")
        return specs

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        c = self.curvature(params, r)
        head = H.expmap0(params["entity"][h], c)
        rel = params["rel"][r]
        rel_diag = params["rel_diag"][r]
        head_rot, head_ref = jnp.split(head, 2, axis=-1)
        rel_rot, rel_ref = jnp.split(rel, 2, axis=-1)
        rd_rot, rd_ref = jnp.split(rel_diag, 2, axis=-1)

        rel1, rel2 = jnp.split(rel_rot, 2, axis=-1)
        rel1 = H.expmap0(rel1, c)
        rel2 = H.expmap0(rel2, c)
        lhs = H.project(H.mobius_add(head_rot, rel1, c), c)
        res_rot = givens_rotations(rd_rot, lhs)
        res_rot = H.mobius_add(res_rot, rel2, c)

        relr = jnp.split(rel_ref, 2, axis=-1)[0]
        relr = H.expmap0(relr, c)
        lhs = givens_reflection(rd_ref, head_ref)
        lhs = H.expmap0(lhs, c)
        res_ref = H.project(H.mobius_add(lhs, relr, c), c)

        res2 = jnp.concatenate([res_rot, res_ref], axis=-1)
        w = jax.nn.softmax(params["weights"][r], axis=-1)  # (B, 2)
        return (res2, c, w), params["bh"][h]

    def sim(self, lhs_pack, rhs_e, all_pairs: bool):
        lhs_e, c, w = lhs_pack
        lhs_rot, lhs_ref = jnp.split(lhs_e, 2, axis=-1)
        if all_pairs:
            rhs_rot, rhs_ref = jnp.split(rhs_e, 2, axis=-1)
            d_rot = H.hyp_distance_multi_c_all(lhs_rot, rhs_rot, c)
            d_ref = H.hyp_distance_multi_c_all(lhs_ref, rhs_ref, c)
            return -w[:, 0:1] * d_rot**2 - w[:, 1:2] * d_ref**2
        rhs_rot, rhs_ref = jnp.split(rhs_e, 2, axis=-1)
        c3 = c[:, :, None]
        d_rot = H.hyp_distance_multi_c(lhs_rot[:, None, :], rhs_rot, c3)[..., 0]
        d_ref = H.hyp_distance_multi_c(lhs_ref[:, None, :], rhs_ref, c3)[..., 0]
        return -w[:, 0:1] * d_rot**2 - w[:, 1:2] * d_ref**2


class IsoH(BaseH):
    """Rotation + per-block scaling via logmap/expmap sandwich
    (hyperbolic.py:200-235)."""

    def extra_param_specs(self):
        nr, rank = self.cfg.n_relations, self.cfg.rank
        specs = super().extra_param_specs()
        specs["rel_diag"] = ((nr, 2 * rank), "uniform")
        return specs

    def init_post(self, params):
        # scaling half initialized at 1 (hyperbolic.py:209)
        rd = params["rel_diag"]
        rd = rd.at[..., self.cfg.rank :].set(1.0)
        return {**params, "rel_diag": rd}

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        rank = self.cfg.rank
        c = self.curvature(params, r)
        head = H.expmap0(params["entity"][h], c)
        rel1, rel2 = jnp.split(params["rel"][r], 2, axis=-1)
        rel1 = H.expmap0(rel1, c)
        rel2 = H.expmap0(rel2, c)
        lhs = H.project(H.mobius_add(head, rel1, c), c)
        rd = params["rel_diag"][r]
        rot, scale = rd[..., :rank], rd[..., rank:]
        scale1, scale2 = jnp.split(scale, 2, axis=-1)
        lhs = H.logmap0(lhs, c)
        res1 = givens_rotations(rot, lhs, scale=scale1)
        res1 = _scale_pairs(res1, scale2)
        res1 = H.expmap0(res1, c)
        res2 = H.project(H.mobius_add(res1, rel2, c), c)
        return (res2, c), params["bh"][h]


class IFFTH(BaseH):
    """rfft -> Givens unitary -> irfft inside the Poincare pipeline
    (hyperbolic.py:239-287).  rank must satisfy: n = rank//2 + 1 even."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.n = (cfg.rank // 2) + 1  # complex dim after rfft
        # user-config validation: must survive python -O.  rank must ALSO be
        # even: irfft of n bins returns 2(n-1) = rank-1 dims for odd rank,
        # which only crashes later at trace time with an opaque broadcast
        # error in mobius_add.
        if cfg.rank % 2 != 0 or self.n % 2 != 0:
            raise ValueError(
                f"IFFTH requires rank even and n = rank//2 + 1 even; "
                f"got rank={cfg.rank}, n={self.n}"
            )

    # reference: softplus only when multi_c (hyperbolic.py:257)
    _softplus_single_c = False

    def extra_param_specs(self):
        specs = super().extra_param_specs()
        specs["rel_diag"] = ((self.cfg.n_relations, 3 * self.n), "uniform")
        return specs

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        c = self.curvature(params, r)
        head = H.expmap0(params["entity"][h], c)
        rel1, rel2 = jnp.split(params["rel"][r], 2, axis=-1)
        rel1 = H.expmap0(rel1, c)
        rel2 = H.expmap0(rel2, c)
        head = H.project(H.mobius_add(head, rel1, c), c)
        from complexhyperbolickge_tpu.ops.fft import _fft_dtype

        # XLA's FFT HLO only accepts f32/f64: bf16 round-trips through f32
        # (same guard as ops/fft.py's packed helpers)
        head_f = jnp.fft.rfft(head.astype(_fft_dtype(head.dtype)),
                              norm="ortho")  # (B, n) complex
        a, b, angle = jnp.split(params["rel_diag"][r], 3, axis=-1)
        head_f = givens_unitary(a, b, angle, head_f)
        head = jnp.fft.irfft(head_f, norm="ortho").astype(head.dtype)  # (B, rank)
        res2 = H.project(H.mobius_add(head, rel2, c), c)
        return (res2, c), params["bh"][h]


# ------------------------------ Lorentz family -------------------------------


class BaseLorentz(KGModel):
    """Hyperboloid family base (reference models/hyperbolic.py:302-334)."""

    _softplus_single_c = True

    @property
    def rel_dim(self):
        return 2 * self.cfg.rank

    def extra_param_specs(self):
        nr = self.cfg.n_relations
        return {
            "rel_diag": ((nr, self.cfg.rank), "uniform"),
            "c": ((nr if self.cfg.multi_c else 1, 1), "ones"),
        }

    def sim(self, lhs_pack, rhs_e, all_pairs: bool):
        lhs_e, c = lhs_pack
        if all_pairs:
            return -H.lorentz_sim_expmap_all(lhs_e, rhs_e, c) ** 2
        lhs3 = lhs_e[:, None, :]
        c3 = c[:, :, None]
        rhs_h = H.expmap0_lorentz(rhs_e, c3)
        return -H.hyp_distance_multi_c_lorentz(lhs3, rhs_h, c3)[..., 0] ** 2


class RotLH(BaseLorentz):
    """Lorentz boosts + scaled rotations (hyperbolic.py:336-371)."""

    def extra_param_specs(self):
        specs = super().extra_param_specs()
        specs["rel_diag"] = ((self.cfg.n_relations, 2 * self.cfg.rank), "uniform")
        return specs

    def init_post(self, params):
        rd = params["rel_diag"]
        rd = rd.at[..., self.cfg.rank :].set(1.0)  # hyperbolic.py:345
        return {**params, "rel_diag": rd}

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        rank = self.cfg.rank
        c = self.curvature(params, r)
        head = H.expmap0_lorentz(params["entity"][h], c)
        rel1, rel2 = jnp.split(params["rel"][r], 2, axis=-1)
        lhs = H.lorentz_boost(head, rel1, c)
        rd = params["rel_diag"][r]
        rot, scale = rd[..., :rank], rd[..., rank:]
        scale1, scale2 = jnp.split(scale, 2, axis=-1)
        lhs = H.logmap0_lorentz(lhs, c)
        res1 = givens_rotations(rot, lhs, scale=scale1)
        res1 = _scale_pairs(res1, scale2)
        res1 = H.expmap0_lorentz(res1, c)
        res2 = H.lorentz_boost(res1, rel2, c)
        return (res2, c), params["bh"][h]


class HyboNet(BaseLorentz):
    """Full (rank+1)^2 Lorentz linear transform per relation
    (hyperbolic.py:373-421)."""

    @property
    def rel_dim(self):
        return (self.cfg.rank + 1) ** 2

    def extra_param_specs(self):
        nr = self.cfg.n_relations
        specs = super().extra_param_specs()
        # reference init: normal(mean=-1, std=1) with last column set to 1
        # (hyperbolic.py:380-383)
        specs["rel_diag"] = ((nr, self.cfg.rank + 2), ("normal", -1.0, 1.0))
        return specs

    def init_post(self, params):
        rd = params["rel_diag"].at[..., -1].set(1.0)
        return {**params, "rel_diag": rd}

    def _lorentz_linear(self, x, weight, scale, bias, c):
        """reference hyperbolic.py:386-395; `time` uses the pre-bias matmul."""
        # pinned: an unpinned contraction defaults to 1-pass bf16 on TPU,
        # silently degrading the model's core transform
        x = jnp.einsum("...i,...ji->...j", x, weight, precision=mm_precision())
        epsilon = (1.0 / c**0.5) + 0.1
        time = jax.nn.sigmoid(x[..., 0:1]) * scale + epsilon
        x = x + bias
        x_narrow = x[..., 1:]
        denom = jnp.sqrt(
            jnp.sum(x_narrow * x_narrow, axis=-1, keepdims=True) / (time * time - 1)
        )
        return x_narrow / denom

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        rank = self.cfg.rank
        c = self.curvature(params, r)
        head = H.expmap0_lorentz(params["entity"][h], c)
        head0 = jnp.sqrt(jnp.sum(head**2, axis=-1, keepdims=True) + 1 / c)
        head = jnp.concatenate([head0, head], axis=-1)
        rel_transform = params["rel"][r].reshape(*r.shape, rank + 1, rank + 1)
        rel = params["rel_diag"][r]
        rel_bias, rel_scale = rel[..., :-1], jnp.abs(rel[..., -1:])
        res2 = self._lorentz_linear(head, rel_transform, rel_scale, rel_bias, c)
        return (res2, c), params["bh"][h]
