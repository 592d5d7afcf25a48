"""Euclidean ops: Givens-block transforms and distances.

Functional JAX re-implementations with the same semantics as the reference's
utils/euclidean.py (file:line cited per function). All functions are pure,
shape-polymorphic over leading batch dims, and keep the trailing feature axis
contiguous so XLA can vectorize on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from complexhyperbolickge_tpu.ops.math import safe_norm


def euc_sqdistance(x, y):
    """Squared Euclidean distance along the last axis with broadcasting.

    Reference: utils/euclidean.py:7-23.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    return x2 + y2 - 2 * xy


def _pairs(v):
    """View (..., d) as (..., d//2, 2)."""
    return v.reshape(*v.shape[:-1], -1, 2)


def _unit_pairs(g):
    """Normalize (cos, sin) pairs to unit 2-vectors, NaN-free at exact zero.

    The reference divides by the UNCLAMPED norm (utils/euclidean.py:40,71):
    it NaNs only at an exactly-zero pair and correctly normalizes any other.
    Plain `g / linalg.norm(g)` would match values but its VJP is NaN at a
    zero pair even when the incoming cotangent is 0 (0 * (x/||x||=0/0));
    torch's norm subgradient at 0 is 0, so the reference trains through it.
    Clamping the SQUARED norm at the dtype tiny is value-identical to the
    reference for every pair with norm >= sqrt(tiny) (~1.1e-19 in f32,
    ~1.5e-154 in f64) — NOT at MIN_NORM=1e-15, which is a hyperbolic-ops
    constant with no analogue here and would widen the divergence band by
    four decades in f32."""
    sq = jnp.sum(g * g, axis=-1, keepdims=True)
    return g / jnp.sqrt(jnp.maximum(sq, jnp.finfo(g.dtype).tiny))


def givens_rotations(r, x, scale=None, inverse=False):
    """Block-diagonal 2x2 rotations parameterized by unnormalized (cos, sin) pairs.

    Reference: utils/euclidean.py:26-57.  `r` and `x` have shape (..., d); the
    d/2 consecutive pairs of `r` are normalized to unit 2-vectors (cos, sin)
    and applied as rotation blocks to the pairs of `x`.  With `scale`, pairs
    are additionally scaled per block (IsoH / RotLH path, euclidean.py:43-51).
    """
    g = _unit_pairs(_pairs(r))
    xp = _pairs(x)
    cos, sin = g[..., 0], g[..., 1]
    x0, x1 = xp[..., 0], xp[..., 1]
    if scale is not None:
        scaler = scale.reshape(*r.shape[:-1], -1)
        scaler = scaler / (jnp.abs(scaler) + 1e-3)
        abs_scaler = jnp.abs(scaler)
        if inverse:
            y0 = (1 / abs_scaler) * (cos * x0 + sin * x1)
            y1 = (1 / scaler) * (cos * x1 - sin * x0)
        else:
            y0 = abs_scaler * cos * x0 - scaler * sin * x1
            y1 = abs_scaler * sin * x0 + scaler * cos * x1
    else:
        if inverse:
            sin = -sin
        y0 = cos * x0 - sin * x1
        y1 = sin * x0 + cos * x1
    return jnp.stack([y0, y1], axis=-1).reshape(x.shape)


def givens_reflection(r, x):
    """Block-diagonal 2x2 reflections: [[cos, sin], [sin, -cos]] per pair.

    Reference: utils/euclidean.py:60-75.  NOTE divergence: the reference fork
    contains a typo at euclidean.py:73 (`-x[..., :1]` instead of the upstream
    KGEmb `-x[..., 1:]`), which silently turns the second output component into
    `(sin - cos) * x0` — not a reflection and independent of x1.  We implement
    the true involutive reflection (matching upstream HazyResearch/KGEmb, which
    produced the published numbers); see tests/test_ops_euclidean.py.
    """
    g = _unit_pairs(_pairs(r))
    xp = _pairs(x)
    cos, sin = g[..., 0], g[..., 1]
    x0, x1 = xp[..., 0], xp[..., 1]
    y0 = cos * x0 + sin * x1
    y1 = sin * x0 - cos * x1
    return jnp.stack([y0, y1], axis=-1).reshape(x.shape)


def givens_unitary(a, b, angle, z, lift=False):
    """Block-diagonal 2x2 complex unitary transforms.

    Matrix per complex pair (z0, z1):
        [ a                b          ]
        [ -e^{i\\theta} b*   e^{i\\theta} a* ]
    with (a, b) normalized so |a|^2 + |b|^2 = 1 and e^{i\\theta} normalized to
    unit modulus.  Reference: utils/euclidean.py:78-131.

    Args:
      a, b: (..., d) real tensors; first/second halves are Re/Im of d/2 complex
            parameters.
      angle: (..., d) real tensor or None; halves are (cos, sin) of theta.
      z: (..., d) complex tensor, viewed as d/2 pairs.
      lift: if True additionally return conj(prod e^{i\\theta}) normalized —
            the determinant correction used by the explicit PU(2,1) lift.
    """
    d2 = a.shape[-1] // 2
    a_ = a[..., :d2] + 1j * a[..., d2:]
    b_ = b[..., :d2] + 1j * b[..., d2:]
    norm = jnp.sqrt(jnp.abs(a_) ** 2 + jnp.abs(b_) ** 2)
    a_ = a_ / norm
    b_ = b_ / norm
    if angle is not None:
        eit = angle[..., :d2] + 1j * angle[..., d2:]
        eit = eit / jnp.abs(eit)
    else:
        eit = jnp.ones_like(a_)
    zp = z.reshape(*a_.shape, 2)
    z0, z1 = zp[..., 0], zp[..., 1]
    o0 = a_ * z0 + b_ * z1
    o1 = -eit * jnp.conj(b_) * z0 + eit * jnp.conj(a_) * z1
    out = jnp.stack([o0, o1], axis=-1).reshape(z.shape)
    if not lift:
        return out
    det = jnp.conj(jnp.prod(eit, axis=-1, keepdims=True))
    det = det / jnp.abs(det)
    return out, det


def givens_isometry(unitary, z, abelian=None, nilpotent=None, lift=False):
    """PU(2,1) isometry via the KAN (Iwasawa) decomposition.

    Reference: utils/complexhyperbolic.py:294-345.  K = 2x2 unitary blocks,
    A = diag(e^t, e^-t), N = upper-triangular nilpotent.  The reference's
    abelian/nilpotent branch is retained (functional, no in-place writes).
    """
    d3 = unitary.shape[-1] // 3
    a, b, angle = unitary[..., :d3], unitary[..., d3 : 2 * d3], unitary[..., 2 * d3 :]
    if nilpotent is not None and abelian is not None:
        h = nilpotent.shape[-1] // 2
        zn_r, zn_i = nilpotent[..., :h], nilpotent[..., h:]
        zn_sq = zn_r**2 + zn_i**2
        zn = zn_r + 1j * zn_i
        e_t = jnp.exp(abelian)
        zp = z.reshape(*z.shape[:-1], -1, 2)
        o0 = e_t * (zp[..., 0] + zn * zp[..., 1] + 0.5 * zn_sq)
        o1 = (1 / e_t) * (zp[..., 1] + jnp.conj(zn))
        z = jnp.stack([o0, o1], axis=-1).reshape(z.shape)
    return givens_unitary(a, b, angle, z, lift=lift)


def norm_clamp(source, min=None, max=None, axis=-1):
    """Rescale vectors so their L2 norm lies in [min*(1+1e-3), max*(1-1e-3)].

    Reference: utils/euclidean.py:164-172.
    """
    norms = jnp.linalg.norm(source, axis=axis, keepdims=True)
    lo = None if min is None else min * (1 + 1e-3)
    hi = None if max is None else max * (1 - 1e-3)
    clamped = jnp.clip(norms, lo, hi)
    return source / norms * clamped


def multi_index_select(source, indices):
    """Gather rows of `source` by an arbitrarily-shaped index tensor.

    Reference: utils/euclidean.py:157-162; on TPU this is a single gather HLO.
    """
    return jnp.take(source, indices, axis=0)


def safe_normalize(x, axis=-1):
    """x / max(||x||, MIN_NORM)."""
    return x / safe_norm(x, axis=axis, keepdims=True)
