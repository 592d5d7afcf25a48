"""Poincare-ball and Lorentz-hyperboloid ops.

Semantics match the reference's utils/hyperbolic.py (file:line cited per
function).  Every distance comes in two forms:

  * broadcast form  — matches the reference call pattern; used in training
    where the candidate set is small (positives + sampled negatives).
  * `*_all` form    — query block (B, d) against a full candidate table
    (N, d); the inner contraction is written as a matmul so XLA places it on
    the MXU and never materializes a (B, N, d) intermediate.  This is the
    TPU-native replacement for the reference's broadcast-to-(B,N,d) eval path.
"""

from __future__ import annotations

import jax.numpy as jnp

from complexhyperbolickge_tpu.ops.math import (MIN_NORM, arcosh, artanh,
                                               ball_eps, mm_precision,
                                               safe_norm, tanh)


# ------------------------------- Poincare ball -------------------------------


def project(x, c):
    """Clip points into the ball of curvature c with per-dtype margin.

    Reference: utils/hyperbolic.py:73-88 (eps = BALL_EPS[dtype]).
    """
    norm = safe_norm(x)
    eps = ball_eps(x.dtype)
    maxnorm = (1 - eps) / (c**0.5)
    cond = norm > maxnorm
    projected = x / norm * maxnorm
    return jnp.where(cond, projected, x)


def expmap0(u, c):
    """Exponential map at the origin of the Poincare ball.

    Reference: utils/hyperbolic.py:42-55.
    """
    sqrt_c = c**0.5
    u_norm = safe_norm(u)
    gamma_1 = tanh(sqrt_c * u_norm) * u / (sqrt_c * u_norm)
    return project(gamma_1, c)


def logmap0(y, c):
    """Logarithmic map at the origin of the Poincare ball.

    Reference: utils/hyperbolic.py:58-70.
    """
    sqrt_c = c**0.5
    y_norm = safe_norm(y)
    return y / y_norm / sqrt_c * artanh(sqrt_c * y_norm)


def mobius_add(x, y, c):
    """Mobius addition on the Poincare ball. Reference: utils/hyperbolic.py:91-107."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    num = (1 + 2 * c * xy + c * y2) * x + (1 - c * x2) * y
    denom = 1 + 2 * c * xy + c**2 * x2 * y2
    return num / jnp.maximum(denom, MIN_NORM)


def hyp_distance(x, y, c):
    """Poincare distance, shared curvature. Reference: utils/hyperbolic.py:170-191."""
    sqrt_c = c**0.5
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    c1 = 1 - 2 * c * xy + c * y2
    c2 = 1 - c * x2
    # expanded quadratic >= 0 exactly but can round negative in f32 at
    # coincident points; MIN_NORM floor also keeps the sqrt VJP finite
    num = jnp.sqrt(jnp.maximum(
        (c1**2) * x2 + (c2**2) * y2 - (2 * c1 * c2) * xy, MIN_NORM))
    denom = 1 - 2 * c * xy + c**2 * x2 * y2
    pairwise_norm = num / jnp.maximum(denom, MIN_NORM)
    dist = artanh(sqrt_c * pairwise_norm)
    return 2 * dist / sqrt_c


def _hyp_dist_multi_c_from_parts(x2, xv, vnorm, c):
    """Core of hyp_distance_multi_c given precomputed reductions.

    x2:    ||x||^2, broadcastable to the output shape
    xv:    <x, v/||v||>, output shape
    vnorm: ||v||, broadcastable to the output shape
    c:     curvature, broadcastable to the output shape
    """
    sqrt_c = c**0.5
    gamma = tanh(sqrt_c * vnorm) / sqrt_c
    c1 = 1 - 2 * c * gamma * xv + c * gamma**2
    c2 = 1 - c * x2
    # the expanded quadratic is >= 0 exactly but can round negative in f32
    # when the pairwise distance falls below rounding noise (the Pallas
    # mirror of this expression guards the same way, kernels/hyp_rank.py);
    # the MIN_NORM floor also keeps the sqrt VJP finite at 0
    num = jnp.sqrt(jnp.maximum(
        (c1**2) * x2 + (c2**2) * (gamma**2) - (2 * c1 * c2) * gamma * xv,
        MIN_NORM,
    ))
    denom = 1 - 2 * c * gamma * xv + (c**2) * (gamma**2) * x2
    pairwise_norm = num / jnp.maximum(denom, MIN_NORM)
    return 2 * artanh(sqrt_c * pairwise_norm) / sqrt_c


def hyp_distance_multi_c(x, v, c):
    """Poincare distance with per-example curvature, broadcast form.

    `v` enters through its norm and direction only — the reference evaluates
    the distance to expmap0(v) analytically (utils/hyperbolic.py:194-216).
    Shapes broadcast like the reference: x (..., d) vs v (..., d).
    """
    vnorm = safe_norm(v)  # NaN-grad-free at v == 0 (CLAUDE.md norm rule)
    xv = jnp.sum(x * v / vnorm, axis=-1, keepdims=True)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return _hyp_dist_multi_c_from_parts(x2, xv, vnorm, c)


def hyp_distance_multi_c_all(x, v, c):
    """All-pairs form: x (B, d) queries vs v (N, d) tangent candidates -> (B, N).

    The only cross term is <x, v/||v||>, computed as one (B,d)x(d,N) matmul on
    the MXU; everything else is rank-1 broadcast arithmetic fused by XLA.
    """
    vnorm = safe_norm(v)  # (N, 1); NaN-grad-free at v == 0
    vdir = v / vnorm
    xv = jnp.matmul(x, vdir.T, preferred_element_type=x.dtype, precision=mm_precision())  # (B, N)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (B, 1)
    return _hyp_dist_multi_c_from_parts(x2, xv, vnorm[:, 0][None, :], c)


# ------------------------------ Lorentz model --------------------------------


def expmap0_lorentz(u, c):
    """Exponential map at the origin of the hyperboloid (space-like coords).

    Reference: utils/hyperbolic.py:109-121.
    """
    sqrt_c = c**0.5
    alpha = sqrt_c * safe_norm(u)
    return (jnp.sinh(alpha) / alpha) * u


def logmap0_lorentz(y, c):
    """Logarithmic map at the origin of the hyperboloid.

    Reference: utils/hyperbolic.py:123-136.
    """
    sqrt_c = c**0.5
    y_norm = safe_norm(y)
    beta = sqrt_c * jnp.sqrt(y_norm**2 + 1 / c)
    # beta^2 - 1 == c * y_norm^2 EXACTLY; computing it as written cancels
    # catastrophically in f32 (beta rounds to 1.0 for sqrt_c*y_norm <~ 3e-4,
    # giving arcosh/0 = inf on small rows).  Use the exact identity.
    return (arcosh(beta) / (sqrt_c * y_norm)) * y


def lorentz_boost(y, v, c):
    """Lorentz boost of hyperboloid points by velocity parameter v.

    Reference: utils/hyperbolic.py:138-164 (gamma clamped <= 15, velocity
    tanh-normalized to stay below the speed of light).
    """
    # squared-norm clamp keeps the gradient at v == 0 finite (torch
    # F.normalize's eps clamp has a zero subgradient there)
    norm_v = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-24))
    v = tanh(norm_v) * v / norm_v
    y0 = jnp.sqrt(jnp.sum(y**2, axis=-1, keepdims=True) + 1 / c)
    # f32 hazard: tanh saturates to exactly 1.0 for norm_v >~ 10 and the
    # normalize-square chain can round g to >= 1 (measured 1.0000004), making
    # 1/sqrt(1-g) NaN before the reference's gamma<=15 clamp can act (the
    # reference is only safe because it runs f64).  gamma=15 <=> g ~ 0.9956,
    # so clamping g below 1 changes nothing the gamma clamp wouldn't.
    g = jnp.minimum(jnp.sum(v**2, axis=-1, keepdims=True), 1.0 - 1e-7)
    gamma = jnp.minimum(1 / jnp.sqrt(1 - g), 15.0)
    factor = gamma**2 / (1 + gamma)
    vy = jnp.sum(v * y, axis=-1, keepdims=True)
    return -gamma * y0 * v + y + factor * vy * v


def hyp_distance_multi_c_lorentz(x, v, c):
    """Hyperboloid distance, per-example curvature, broadcast form.

    Reference: utils/hyperbolic.py:218-239.  x, v carry space-like coords only;
    the time coordinate is reconstructed from the hyperboloid constraint.
    """
    x0 = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + 1 / c)
    v0 = jnp.sqrt(jnp.sum(v**2, axis=-1, keepdims=True) + 1 / c)
    res = jnp.sum(x * v, axis=-1, keepdims=True) - x0 * v0
    return arcosh(-c * res) / (c**0.5)


def hyp_distance_multi_c_lorentz_all(x, v, c):
    """All-pairs hyperboloid distance: x (B, d) vs v (N, d), c (B, 1) -> (B, N)."""
    x0 = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + 1 / c)  # (B, 1)
    v2 = jnp.sum(v**2, axis=-1)[None, :]  # (1, N)
    v0 = jnp.sqrt(v2 + 1 / c)  # (B, N)
    xv = jnp.matmul(x, v.T, preferred_element_type=x.dtype, precision=mm_precision())  # (B, N)
    res = xv - x0 * v0
    return arcosh(-c * res) / (c**0.5)


# --------------------- folded all-pairs model distances ----------------------
#
# The reference's BaseH / BaseLorentz similarity first expmaps every candidate
# with the *query's* curvature and then evaluates the distance
# (models/hyperbolic.py:45-49, :330-334).  Done literally in all-pairs mode
# that is a (B, N, d) tensor.  But expmap0 preserves direction — only the
# radius changes — so the candidate table contributes one direction matmul
# plus per-(query, candidate) radius arithmetic.  These helpers compute
# exactly  dist(x, expmap0(v, c))  for x (B, d), v (N, d), c (B, 1) -> (B, N).


def hyp_sim_expmap_all(x, v, c):
    """hyp_distance_multi_c(x, expmap0(v, c), c) in folded all-pairs form."""
    un = safe_norm(v)  # (N, 1), clamped like expmap0's u_norm
    vdir = v / un
    xv = jnp.matmul(x, vdir.T, preferred_element_type=x.dtype, precision=mm_precision())  # (B, N)
    sqrt_c = c**0.5  # (B, 1)
    eps = ball_eps(v.dtype)
    m = tanh(sqrt_c * un[:, 0][None, :]) / sqrt_c  # (B, N) radius after expmap0
    m = jnp.minimum(m, (1 - eps) / sqrt_c)  # project() clip
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return _hyp_dist_multi_c_from_parts(x2, xv, m, c)


def hyp_plain_sim_expmap_all(x, v, c):
    """hyp_distance(x, expmap0(v, c), c) in folded all-pairs form.

    The PLAIN Poincare distance (reference utils/hyperbolic.py:170-191, used
    by the single-curvature PoincareGCN decoder, poincaregnn.py:548) treats
    its second argument as a ball point, so expmap0 is folded once (not
    twice like the multi_c form).  x (B, d), v (N, d), c (1, 1) -> (B, N).
    """
    sqrt_c = c**0.5
    un = safe_norm(v)  # (N, 1)
    vdir = v / un
    xv_dir = jnp.matmul(x, vdir.T, preferred_element_type=x.dtype,
                        precision=mm_precision())  # (B, N)
    eps = ball_eps(v.dtype)
    m = tanh(sqrt_c * un[:, 0][None, :]) / sqrt_c  # (1->B, N) ball radius
    m = jnp.minimum(m, (1 - eps) / sqrt_c)  # project() clip
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (B, 1)
    y2 = m**2
    xy = m * xv_dir
    c1 = 1 - 2 * c * xy + c * y2
    c2 = 1 - c * x2
    num = jnp.sqrt(jnp.maximum(  # same f32 rounding guard as hyp_distance
        (c1**2) * x2 + (c2**2) * y2 - (2 * c1 * c2) * xy, MIN_NORM))
    denom = 1 - 2 * c * xy + c**2 * x2 * y2
    pairwise_norm = num / jnp.maximum(denom, MIN_NORM)
    return 2 * artanh(sqrt_c * pairwise_norm) / sqrt_c


def lorentz_sim_expmap_all(x, v, c):
    """hyp_distance_multi_c_lorentz(x, expmap0_lorentz(v, c), c), folded."""
    un = safe_norm(v)  # (N, 1)
    vdir = v / un
    xdir = jnp.matmul(x, vdir.T, preferred_element_type=x.dtype, precision=mm_precision())  # (B, N)
    sqrt_c = c**0.5
    alpha = sqrt_c * un[:, 0][None, :]  # (B, N)
    s = jnp.sinh(alpha) / alpha * un[:, 0][None, :]  # radius after expmap0_lorentz
    x0 = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + 1 / c)  # (B, 1)
    v0 = jnp.sqrt(s**2 + 1 / c)  # (B, N)
    res = xdir * s - x0 * v0
    return arcosh(-c * res) / sqrt_c


def explicit_lorentz(x, c):
    """Prepend the time-like coordinate. Reference: utils/hyperbolic.py:246-263."""
    x0 = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1 / c)
    return jnp.concatenate([x0, x], axis=-1)
