"""Complex-hyperbolic FFT KG embedding models (the paper's core family).

Reference: models/complexhyperbolic.py (CHYP_MODELS at :14).  Entity
embeddings are complex frequency-space vectors stored packed as
[Re | Im] (2*rank reals).  get_queries round-trips through real coordinate
space with an orthonormal inverse rFFT (dim = 2*(rank-1)), applies a
relation-specific hyperbolic isometry there (Mobius translation + Givens
rotation / reflection / attention), and maps back with rFFT.  The score is
the complex-hyperbolic (Bergman) distance on the unit ball via the Hermitian
cross-ratio, with the implicit PU(n,1) lift.

Divergences from the reference (documented, SURVEY §2.4):
  * lift semantics: the reference HEAD sets lift=False and crashes on a
    shape mismatch (models/complexhyperbolic.py:43,61-73 vs
    utils/complexhyperbolic.py:225-227).  We implement the working
    lift=True (implicit lift) semantics for all models; the explicit-lift
    variant lives in ops.chyperbolic.{lift, chyp_distance_explicit} and is
    verified equal.
  * the hand-written Distance backward is bit-identical to autodiff through
    the same forward (verified vs reference), so plain JAX autodiff is used.

TPU design: train-mode scoring broadcasts (B, 1, 2R) vs (B, K, 2R); ranking
mode uses ops.chyperbolic.chyp_distance_all, where the Hermitian form is two
(B, 2R) x (2R, N) MXU matmuls.  The irfft/rfft round trips are also available
as small constant matmuls (ops.fft.*_mm) for the fused Pallas kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.models.base import KGModel
from complexhyperbolickge_tpu.ops import chyperbolic as CH
from complexhyperbolickge_tpu.ops.euclidean import (
    givens_reflection,
    givens_rotations,
    givens_unitary,
)
from complexhyperbolickge_tpu.ops.fft import irfft_packed, rfft_packed

CHYP_MODELS = ["FFTRotH", "FFTRefH", "FFTAttH", "FFTIsoH"]


class FFTUnitBall(KGModel):
    """Base for the FFT family (reference models/complexhyperbolic.py:17-73).

    rank = complex dimension + 1; real coordinate dim = 2*(rank-1).
    entity (N, 2*rank) packed complex; rel (nR, 2*dim); rel_diag (nR, dim).
    """

    _softplus_single_c = False  # complexhyperbolic.py:81 — raw weight single-c

    def __init__(self, cfg):
        super().__init__(cfg)
        self.dim = 2 * (cfg.rank - 1)

    @property
    def entity_dim(self):
        return 2 * self.cfg.rank

    @property
    def rel_dim(self):
        return 2 * self.dim

    def extra_param_specs(self):
        nr = self.cfg.n_relations
        return {
            "rel_diag": ((nr, self.dim), "uniform"),
            "c": ((nr if self.cfg.multi_c else 1, 1), "ones"),
        }

    def sim(self, lhs_pack, rhs_e, all_pairs: bool):
        (lhs_e,) = lhs_pack
        if all_pairs:
            return -CH.chyp_distance_all(lhs_e, rhs_e) ** 2
        return -CH.chyp_distance(lhs_e[:, None, :], rhs_e) ** 2


class FFTRotH(FFTUnitBall):
    """Givens rotations in coordinate space (complexhyperbolic.py:76-101)."""

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        c = self.curvature(params, r)
        head = irfft_packed(params["entity"][h])  # (B, dim) real
        head = CH.expmap0(head, c)
        rel1, rel2 = jnp.split(params["rel"][r], 2, axis=-1)
        rel1 = CH.expmap0(rel1, c)
        rel2 = CH.expmap0(rel2, c)
        lhs = CH.project(CH.real_mobius_add(head, rel1, c), c)
        res1 = givens_rotations(params["rel_diag"][r], lhs)
        res2 = CH.real_mobius_add(res1, rel2, c)
        res = rfft_packed(res2)  # (B, 2*rank) packed
        return (res,), params["bh"][h]


class FFTRefH(FFTUnitBall):
    """Givens reflections applied in Euclidean space before expmap0
    (complexhyperbolic.py:104-127)."""

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        c = self.curvature(params, r)
        rel = jnp.split(params["rel"][r], 2, axis=-1)[0]
        rel = CH.expmap0(rel, c)
        head = irfft_packed(params["entity"][h])
        lhs = givens_reflection(params["rel_diag"][r], head)
        lhs = CH.expmap0(lhs, c)
        res = CH.project(CH.real_mobius_add(lhs, rel, c), c)
        res = rfft_packed(res)
        return (res,), params["bh"][h]


class FFTAttH(FFTUnitBall):
    """Attention over {reflection, rotation} candidates
    (complexhyperbolic.py:130-171)."""

    def extra_param_specs(self):
        nr = self.cfg.n_relations
        specs = super().extra_param_specs()
        specs["rel_diag"] = ((nr, 2 * self.dim), "uniform")
        specs["context_vec"] = ((nr, self.dim), "normal")
        return specs

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        c = self.curvature(params, r)
        head = irfft_packed(params["entity"][h])
        rot_mat, ref_mat = jnp.split(params["rel_diag"][r], 2, axis=-1)
        rot_q = givens_rotations(rot_mat, head)[..., None, :]
        ref_q = givens_reflection(ref_mat, head)[..., None, :]
        cands = jnp.concatenate([ref_q, rot_q], axis=-2)  # (B, 2, dim)
        context_vec = params["context_vec"][r][..., None, :]
        # scale = 1/sqrt(rank) with rank the COMPLEX rank (complexhyperbolic.py:138)
        scale = 1.0 / jnp.sqrt(jnp.asarray(float(self.cfg.rank), dtype=head.dtype))
        att = jnp.sum(context_vec * cands * scale, axis=-1, keepdims=True)
        att = jax.nn.softmax(att, axis=-2)
        att_q = jnp.sum(att * cands, axis=-2)
        lhs = CH.expmap0(att_q, c)
        rel = jnp.split(params["rel"][r], 2, axis=-1)[0]
        rel = CH.expmap0(rel, c)
        res = CH.project(CH.real_mobius_add(lhs, rel, c), c)
        res = rfft_packed(res)
        return (res,), params["bh"][h]


class FFTIsoH(FFTUnitBall):
    """Experimental PU(n,1)-isometry model (complexhyperbolic.py:174-234).

    Differences from the other FFT models, mirrored from the reference:
      * rel is (nR, dim) — a single Mobius translation (complexhyperbolic.py:182)
      * rel_diag is (nR, 3*rank) normal-initialized unitary parameters (:183,:197)
      * the unitary transform acts on the complex frequency vector BEFORE the
        irfft (:209-217)
      * the expmap0 of the head is computed then immediately discarded
        (`lhs = expmap0(head, c); lhs = head`, :219-220) — replicated exactly
      * rank must be even (the unitary needs rank/2 complex pairs, :178)
    """

    def __init__(self, cfg):
        super().__init__(cfg)
        if cfg.rank % 2 != 0:  # user-config validation: must survive python -O
            raise ValueError(f"FFTIsoH requires even rank, got {cfg.rank}")

    @property
    def rel_dim(self):
        return self.dim

    def extra_param_specs(self):
        nr = self.cfg.n_relations
        return {
            "rel_diag": ((nr, 3 * self.cfg.rank), "normal"),
            "c": ((nr if self.cfg.multi_c else 1, 1), "ones"),
        }

    def get_queries(self, params, queries):
        h, r = queries[..., 0], queries[..., 1]
        rank = self.cfg.rank
        c = self.curvature(params, r)
        rel = CH.expmap0(params["rel"][r], c)
        head_p = params["entity"][h]
        head = head_p[..., :rank] + 1j * head_p[..., rank:]  # (B, rank) complex
        a, b, angles = jnp.split(params["rel_diag"][r], 3, axis=-1)
        head = givens_unitary(a, b, angles, head)
        head = jnp.fft.irfft(head, norm="ortho").astype(head_p.dtype)  # (B, dim)
        # reference computes expmap0 then overwrites it with the raw head
        # (complexhyperbolic.py:219-220); we keep the effective semantics.
        lhs = head
        res = CH.project(CH.real_mobius_add(lhs, rel, c), c)
        res = rfft_packed(res)
        return (res,), params["bh"][h]
