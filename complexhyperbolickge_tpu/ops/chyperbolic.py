"""Complex-hyperbolic unit-ball ops (the paper's core math).

The complex-hyperbolic distance (Bergman metric on the unit ball, computed via
a Hermitian cross-ratio through the PU(n,1) lift) is implemented in *real*
arithmetic over the reference's packed layout: a complex vector z of dimension
R is stored as 2R reals [Re(z) | Im(z)].  This keeps every array real-typed —
friendlier to the MXU/VPU and to Pallas — and makes the all-pairs form two
plain matmuls.

Semantics match reference utils/complexhyperbolic.py with lift=True (the
paper's working path; the HEAD lift=False path shape-crashes, see SURVEY §2.4
fact 1).  The reference's in-place signature flip (`w[...,-1].mul_(-1)`,
utils/complexhyperbolic.py:179) is replaced by a functional explicit-lift
variant, verified equal to the implicit lift.

Key identity (implicit lift, curvature 1):
    <z, w>  = sum_j z_j conj(w_j) - 1          (Hermitian form on the lift)
    x       = 2 |<z,w>|^2 / (<z,z> <w,w>) - 1
    dist    = acosh(x)
with <z,z>, <w,w> clamped into [-1, -eps] and x clamped to >= 1 + eps
(utils/complexhyperbolic.py:229-237).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.ops.math import (
    MIN_NORM,
    artanh,
    ball_eps,
    mm_precision,
    safe_norm,
    st_clip,
    tanh,
)

# The reference's complex-hyperbolic `project` uses a fixed eps = 1e-5
# independent of dtype (utils/complexhyperbolic.py:83), unlike the Poincare
# project which is dtype-dependent. Mirrored exactly.
_PROJECT_EPS = 1e-5


def project(x, c):
    """Clip into the unit ball of curvature c. Reference: complexhyperbolic.py:72-87."""
    norm = safe_norm(x)
    maxnorm = (1 - _PROJECT_EPS) / (c**0.5)
    cond = norm > maxnorm
    projected = x / norm * maxnorm
    return jnp.where(cond, projected, x)


def expmap0(u, c):
    """Exponential map at the origin. Reference: complexhyperbolic.py:41-54."""
    sqrt_c = c**0.5
    u_norm = safe_norm(u)
    gamma_1 = tanh(sqrt_c * u_norm) * u / (sqrt_c * u_norm)
    return project(gamma_1, c)


def logmap0(y, c):
    """Logarithmic map at the origin. Reference: complexhyperbolic.py:57-69."""
    sqrt_c = c**0.5
    y_norm = safe_norm(y)
    return y / y_norm / sqrt_c * artanh(sqrt_c * y_norm)


def real_mobius_add(x, y, c):
    """Mobius addition (Poincare formula) on real vectors.

    Reference: complexhyperbolic.py:90-106.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    num = (1 + 2 * c * xy + c * y2) * x + (1 - c * x2) * y
    denom = 1 + 2 * c * xy + c**2 * x2 * y2
    return num / jnp.maximum(denom, MIN_NORM)


def mobius_add_complex(x, y):
    """Complex Mobius addition on the unit disk. Reference: complexhyperbolic.py:109-122."""
    return (x + y) / (1 + jnp.conj(x) * y)


# ------------------------- packed-real complex helpers -----------------------


def split_re_im(v):
    """Split packed [Re | Im] layout into (re, im), each (..., R)."""
    r = v.shape[-1] // 2
    return v[..., :r], v[..., r:]


def swap_neg(v):
    """[Re | Im] -> [Im | -Re]; used to get Im(z conj(w)) as a single matmul."""
    re, im = split_re_im(v)
    return jnp.concatenate([im, -re], axis=-1)


def hermitian_sqnorm_lifted(v):
    """<z, z> - 1 = ||z||^2 - 1 for packed-real z (implicit PU(n,1) lift).

    Reference: HermitianNorm with lift=True, complexhyperbolic.py:176-188.
    """
    return jnp.sum(v * v, axis=-1) - 1.0


def _chyp_x(sr, si, znorm, wnorm, eps):
    """Cross-ratio argument x from Hermitian pieces.

    The clamps are STRAIGHT-THROUGH (see ops.math.st_clip): the reference's
    custom Distance.backward evaluates the analytic unclamped gradient at the
    clamped values (utils/complexhyperbolic.py:193-254), and without that the
    saturated clamps at small embedding norms would zero every gradient.
    """
    znorm = st_clip(znorm, -1.0, -eps)
    wnorm = st_clip(wnorm, -1.0, -eps)
    x = 2 * (sr * sr + si * si) / (znorm * wnorm) - 1.0
    return st_clip(x, 1 + eps, None)


def _chyp_distance_ad(lhs, rhs):
    """Autodiff form of the broadcast distance (straight-through clamps).

    Only non-train broadcast shapes reach this (train (B,1,D)x(B,K,D) goes
    through _chyp_distance_core; all-pairs through chyp_distance_all — both
    carry the reference backward's denominator clamp, which plain autodiff
    here does not).  Gradients through this path match the reference only
    away from the unit-ball boundary."""
    eps = ball_eps(lhs.dtype)
    zr, zi = split_re_im(lhs)
    wr, wi = split_re_im(rhs)
    sr = jnp.sum(zr * wr + zi * wi, axis=-1) - 1.0
    si = jnp.sum(zi * wr - zr * wi, axis=-1)
    znorm = hermitian_sqnorm_lifted(lhs)
    wnorm = hermitian_sqnorm_lifted(rhs)
    x = _chyp_x(sr, si, znorm, wnorm, eps)
    return jnp.arccosh(x)


@jax.custom_vjp
def _chyp_distance_core(lhs, rhs):
    """Core train-mode distance: lhs (B, D) vs rhs (B, K, D) -> (B, K)."""
    return _chyp_distance_ad(lhs[:, None, :], rhs)


def _chyp_core_fwd(lhs, rhs):
    eps = ball_eps(lhs.dtype)
    zr, zi = split_re_im(lhs[:, None, :])
    wr, wi = split_re_im(rhs)
    sr = jnp.sum(zr * wr + zi * wi, axis=-1) - 1.0  # (B, K)
    si = jnp.sum(zi * wr - zr * wi, axis=-1)
    zn = jnp.clip(hermitian_sqnorm_lifted(lhs), -1.0, -eps)[:, None]  # (B, 1)
    wn = jnp.clip(hermitian_sqnorm_lifted(rhs), -1.0, -eps)  # (B, K)
    x = jnp.maximum(2 * (sr * sr + si * si) / (zn * wn) - 1.0, 1 + eps)
    return jnp.arccosh(x), (lhs, rhs, sr, si, zn, wn, x)


def _chyp_core_bwd(res, g):
    """Analytic backward — the reference Distance.backward
    (utils/complexhyperbolic.py:239-254) re-derived for the packed-real
    layout, INCLUDING its denominator clamp: the reference divides each
    side's gradient by p = clamp(sqrt(x^2-1) * norm_self^2 * norm_other,
    max=-eps) (complexhyperbolic.py:203-204), which caps gradient magnitude
    near the unit-ball boundary.  Saves only (B, K) residuals, so the
    backward touches each (B, K, D) tensor once instead of autodiff's many
    rematerialized intermediates."""
    lhs, rhs, sr, si, zn, wn, x = res
    eps = ball_eps(lhs.dtype)
    a2 = sr * sr + si * si
    sq = jnp.sqrt(x * x - 1.0)
    # zn/wn are negative, so sq*norm^2*norm_other is negative; clamping it
    # to at most -eps bounds |1/p| by 1/eps (reference Distance.grad)
    p_z = jnp.minimum(sq * zn * zn * wn, -eps)
    p_w = jnp.minimum(sq * wn * wn * zn, -eps)

    ca_z = g * 4.0 * sr * zn / p_z  # (B, K) coeff on the Re cross term (lhs)
    cb_z = g * 4.0 * si * zn / p_z
    cz = g * (-4.0) * a2 / p_z  # coeff on lhs via znorm
    ca_w = g * 4.0 * sr * wn / p_w  # coefficients for the rhs side
    cb_w = g * 4.0 * si * wn / p_w
    cw = g * (-4.0) * a2 / p_w  # coeff on rhs via wnorm (incl. d|w|^2)

    lhs_sw = swap_neg(lhs)  # (B, D)
    d_rhs = (
        ca_w[..., None] * lhs[:, None, :]
        + cb_w[..., None] * lhs_sw[:, None, :]
        + cw[..., None] * rhs
    )
    # d si / d lhs = -swap(rhs); swap is linear so sum first, swap once.
    # Precision pinned like the forward: unpinned contractions default to
    # 1-pass bf16 on TPU, silently degrading only these custom-VJP gradients
    # while every autodiff path inherits "highest" through transposition.
    m_a = jnp.einsum("bk,bkd->bd", ca_z, rhs, precision=mm_precision())
    m_b = jnp.einsum("bk,bkd->bd", cb_z, rhs, precision=mm_precision())
    d_lhs = m_a - swap_neg(m_b) + jnp.sum(cz, axis=1, keepdims=True) * lhs
    return d_lhs, d_rhs


_chyp_distance_core.defvjp(_chyp_core_fwd, _chyp_core_bwd)


_FUSED_TRAIN_SCORER = False


def set_fused_train_scorer(on: bool):
    """Route train-shape distances through the fused Pallas forward+VJP
    kernels (kernels/chyp_train.py).  f32 only; enabled by the Trainer on
    TPU.  Affects functions traced AFTER the call."""
    global _FUSED_TRAIN_SCORER
    _FUSED_TRAIN_SCORER = bool(on)


def chyp_distance(lhs, rhs):
    """Broadcast complex-hyperbolic distance on packed-real inputs.

    lhs: (..., 2R), rhs: (..., 2R) with standard numpy broadcasting across
    leading dims (e.g. (B, 1, 2R) vs (B, K, 2R) in training).
    Reference: Distance.forward, complexhyperbolic.py:213-237 (lift=True).

    The training-shaped case (B, 1, D) vs (B, K, D) routes through a
    custom-VJP core with the reference's analytic backward (optionally the
    fused Pallas kernels — set_fused_train_scorer); other shapes use plain
    autodiff with straight-through clamps (same gradients).
    """
    if lhs.ndim == 3 and rhs.ndim == 3 and lhs.shape[1] == 1 \
            and lhs.shape[0] == rhs.shape[0]:
        if _FUSED_TRAIN_SCORER and lhs.dtype == jnp.float32:
            from complexhyperbolickge_tpu.kernels.chyp_train import (
                chyp_train_distance,
            )

            return chyp_train_distance(lhs[:, 0, :], rhs)
        return _chyp_distance_core(lhs[:, 0, :], rhs)
    return _chyp_distance_ad(lhs, rhs)


@jax.custom_vjp
def chyp_distance_all(lhs, rhs):
    """All-pairs complex-hyperbolic distance: lhs (B, 2R) vs rhs (N, 2R) -> (B, N).

    The Hermitian form <z, w> over the packed layout is exactly two matmuls:
        Re<z,w> + 1 = lhs @ rhs^T          (since Re(z conj w) = zr.wr + zi.wi)
        Im<z,w>     = swap_neg(lhs) @ rhs^T (since Im(z conj w) = zi.wr - zr.wi)
    Both land on the MXU; the epilogue is fused elementwise work.  This is the
    TPU-native form of the reference's (B,1,d)x(1,N,d) broadcast eval.

    Differentiable (pool/shared-negative training routes all-pairs scores
    through here): the custom VJP is the reference Distance.backward in
    matmul form, including its near-boundary denominator clamp
    (complexhyperbolic.py:203-204) — matching _chyp_distance_core.
    """
    eps = ball_eps(lhs.dtype)
    sr = jnp.matmul(lhs, rhs.T, preferred_element_type=lhs.dtype, precision=mm_precision()) - 1.0
    si = jnp.matmul(swap_neg(lhs), rhs.T, preferred_element_type=lhs.dtype, precision=mm_precision())
    znorm = hermitian_sqnorm_lifted(lhs)[:, None]  # (B, 1)
    wnorm = hermitian_sqnorm_lifted(rhs)[None, :]  # (1, N)
    x = _chyp_x(sr, si, znorm, wnorm, eps)
    return jnp.arccosh(x)


def _chyp_all_fwd(lhs, rhs):
    eps = ball_eps(lhs.dtype)
    sr = jnp.matmul(lhs, rhs.T, preferred_element_type=lhs.dtype, precision=mm_precision()) - 1.0
    si = jnp.matmul(swap_neg(lhs), rhs.T, preferred_element_type=lhs.dtype, precision=mm_precision())
    zn = jnp.clip(hermitian_sqnorm_lifted(lhs), -1.0, -eps)[:, None]  # (B, 1)
    wn = jnp.clip(hermitian_sqnorm_lifted(rhs), -1.0, -eps)[None, :]  # (1, N)
    x = jnp.maximum(2 * (sr * sr + si * si) / (zn * wn) - 1.0, 1 + eps)
    return jnp.arccosh(x), (lhs, rhs, sr, si, zn, wn, x)


def _chyp_all_bwd(res, g):
    """Reference Distance.backward in all-pairs matmul form (clamped p as in
    _chyp_core_bwd); rhs rows are shared across queries, so its per-pair
    contributions sum over the batch axis via the transposed matmuls."""
    lhs, rhs, sr, si, zn, wn, x = res
    eps = ball_eps(lhs.dtype)
    a2 = sr * sr + si * si
    sq = jnp.sqrt(x * x - 1.0)
    p_z = jnp.minimum(sq * zn * zn * wn, -eps)  # (B, N)
    p_w = jnp.minimum(sq * wn * wn * zn, -eps)

    ca_z = g * 4.0 * sr * zn / p_z
    cb_z = g * 4.0 * si * zn / p_z
    cz = g * (-4.0) * a2 / p_z
    ca_w = g * 4.0 * sr * wn / p_w
    cb_w = g * 4.0 * si * wn / p_w
    cw = g * (-4.0) * a2 / p_w

    lhs_sw = swap_neg(lhs)
    # precision pinned to match the forward (see _chyp_core_bwd)
    mp = mm_precision()
    d_lhs = (
        jnp.matmul(ca_z, rhs, precision=mp)
        - swap_neg(jnp.matmul(cb_z, rhs, precision=mp))
        + jnp.sum(cz, axis=1, keepdims=True) * lhs
    )
    d_rhs = (
        jnp.matmul(ca_w.T, lhs, precision=mp)
        + jnp.matmul(cb_w.T, lhs_sw, precision=mp)
        + jnp.sum(cw, axis=0)[:, None] * rhs
    )
    return d_lhs, d_rhs


chyp_distance_all.defvjp(_chyp_all_fwd, _chyp_all_bwd)


# ----------------------------- explicit lift ---------------------------------


def lift(v):
    """Explicit PU(n,1) lift of packed-real v: [re | im] -> [re, 1 | im, 0].

    Functional replacement for the reference's get_rhs padding
    (models/complexhyperbolic.py:61-73) — applied to BOTH sides, which fixes
    the HEAD shape bug (SURVEY §2.4 fact 1).
    """
    re, im = split_re_im(v)
    ones = jnp.ones((*v.shape[:-1], 1), dtype=v.dtype)
    zeros = jnp.zeros_like(ones)
    return jnp.concatenate([re, ones, im, zeros], axis=-1)


def chyp_distance_explicit(lhs_lifted, rhs_lifted):
    """Distance on explicitly lifted inputs with signature (+,...,+,-).

    <z, w>_sig = sum_{j<R} z_j conj(w_j) - z_R conj(w_R).  With the last
    coordinate fixed to 1 by `lift`, this equals the implicit-lift form; kept
    as a tested, functional version of the reference's lift=False path
    (complexhyperbolic.py:179, which mutated w in place).
    """
    eps = ball_eps(lhs_lifted.dtype)
    zr, zi = split_re_im(lhs_lifted)
    wr, wi = split_re_im(rhs_lifted)
    sig = jnp.ones(zr.shape[-1], dtype=lhs_lifted.dtype).at[-1].set(-1.0)
    sr = jnp.sum(sig * (zr * wr + zi * wi), axis=-1)
    si = jnp.sum(sig * (zi * wr - zr * wi), axis=-1)
    znorm = jnp.sum(sig * (zr * zr + zi * zi), axis=-1)
    wnorm = jnp.sum(sig * (wr * wr + wi * wi), axis=-1)
    x = _chyp_x(sr, si, znorm, wnorm, eps)
    return jnp.arccosh(x)
