"""Scalar math primitives with the reference's exact numerics.

Parity notes (constants must match the reference bit-for-bit in f64):
  * MIN_NORM = 1e-15                       (reference utils/hyperbolic.py:6)
  * artanh input clamp ±(1 - 1e-5)         (utils/hyperbolic.py:15)
  * tanh input clamp ±15                   (utils/hyperbolic.py:32)
  * arcosh input clamp_min 1 + 1e-6        (utils/hyperbolic.py:36)
  * per-dtype ball eps {f32: 4e-3, f64: 1e-5}  (utils/hyperbolic.py:7,
    utils/complexhyperbolic.py:13); bf16 entry is new for TPU.

The reference's Artanh is a custom autograd Function whose backward is
g / (1 - x_clamped^2) — i.e. gradient still flows when the input was clamped.
We reproduce that with a custom_vjp (plain autodiff through clamp would return
zero gradient outside the clamp region).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_NORM = 1e-15


def round_up(x: int, m: int) -> int:
    """Smallest multiple of m >= x (kernel tile/lane padding helper)."""
    return -(-x // m) * m

_BALL_EPS = {
    jnp.dtype(jnp.bfloat16): 4e-2,
    jnp.dtype(jnp.float32): 4e-3,
    jnp.dtype(jnp.float64): 1e-5,
}


def ball_eps(dtype) -> float:
    """Per-dtype boundary margin of the (complex-)hyperbolic unit ball."""
    return _BALL_EPS[jnp.dtype(dtype)]


@jax.custom_vjp
def artanh(x):
    x = jnp.clip(x, -1 + 1e-5, 1 - 1e-5)
    # Reference computes in f64 internally regardless of input dtype
    # (utils/hyperbolic.py:18); on TPU we stay in the working dtype — the
    # clamp keeps the log arguments well away from 0 so f32 is stable.
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def _artanh_fwd(x):
    xc = jnp.clip(x, -1 + 1e-5, 1 - 1e-5)
    return 0.5 * (jnp.log1p(xc) - jnp.log1p(-xc)), xc


def _artanh_bwd(xc, g):
    return (g / (1 - xc**2),)


artanh.defvjp(_artanh_fwd, _artanh_bwd)


def tanh(x):
    """tanh with the reference's ±15 input clamp (utils/hyperbolic.py:32)."""
    return jnp.tanh(jnp.clip(x, -15, 15))


def arcosh(x):
    """acosh with clamp_min 1 + 1e-6 (utils/hyperbolic.py:34-37)."""
    return jnp.arccosh(jnp.maximum(x, 1 + 1e-6))


def clamp_min(x, lo):
    return jnp.maximum(x, lo)


def st_clip(x, lo=None, hi=None):
    """Clip with a straight-through (identity) gradient.

    The reference's hand-written Distance.backward
    (utils/complexhyperbolic.py:239-254) computes the analytic unclamped
    gradient EVALUATED AT the clamped forward values — i.e. its clamps are
    straight-through.  This is not an optimization: at small-embedding
    regimes (init scale 1e-3, or f32 where BALL_EPS=4e-3) the forward
    clamps saturate for every pair and plain autodiff through max/clip
    returns exactly zero gradient, freezing training.
    """
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


def safe_sqrt(sq):
    """Elementwise sqrt of a nonnegative quantity with ZERO (not NaN)
    gradient at exactly 0, and values/gradients bit-identical to jnp.sqrt
    everywhere sq > 0 (double-where: the inner where keeps the NaN cotangent
    of d sqrt/ds = inf at s = 0 out of the backward pass entirely).

    Use for magnitudes that sweep rows which are exactly zero by
    construction — e.g. the complex family's full-table regularizer factor
    over mesh-padded entity rows (parallel/mesh.py::pad_entity_tree), where
    plain sqrt NaN'd the whole reg gradient.  Unlike safe_norm (which
    clamps to MIN_NORM, matching torch's clamp_min) this returns an exact 0
    at 0 and does not reduce over an axis."""
    nz = sq > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)


def safe_norm(x, axis=-1, keepdims=True):
    """L2 norm clamped below by MIN_NORM, matching `.norm().clamp_min(MIN_NORM)`.

    Clamps the SQUARED norm before the sqrt so the gradient at x == 0 is 0
    (torch's norm has a zero subgradient at the origin; jnp.linalg.norm would
    propagate NaN through 0/0 — the GNN convs' zero-initialized biases hit
    this through expmap0)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, MIN_NORM * MIN_NORM))


# ----------------------- eval matmul precision override ----------------------

# Trace-time override of the all-pairs eval matmuls' MXU precision.  Every
# eval-path contraction pins precision="highest" (6-pass f32 emulation) so
# ranks are exact vs the reference; the dense rankers opt into the 1-pass
# bf16 MXU form (--eval_precision default) by tracing their score region
# under eval_matmul_precision("default").  The override is read at TRACE
# time (mm_precision() below), so it scopes to exactly the jitted region
# built inside the context; training paths never enter the context and stay
# at "highest".
_EVAL_MM_OVERRIDE: str | None = None


class eval_matmul_precision:
    """Context manager: `with eval_matmul_precision("default"): ...` makes
    mm_precision() return "default" for matmuls TRACED inside the block.
    "highest" (or None) is a no-op."""

    def __init__(self, precision: str | None):
        self._p = None if precision in (None, "highest") else precision

    def __enter__(self):
        global _EVAL_MM_OVERRIDE
        self._old = _EVAL_MM_OVERRIDE
        if self._p is not None:
            _EVAL_MM_OVERRIDE = self._p
        return self

    def __exit__(self, *exc):
        global _EVAL_MM_OVERRIDE
        _EVAL_MM_OVERRIDE = self._old
        return False


def mm_precision() -> str:
    """The precision for all-pairs eval matmuls: "highest" unless inside
    eval_matmul_precision("default")."""
    return "highest" if _EVAL_MM_OVERRIDE is None else _EVAL_MM_OVERRIDE


def pinned_mm(a, b):
    """`a @ b` with MXU precision pinned to mm_precision().

    jnp.matmul defaults to 1-pass bf16 on TPU: every contraction feeding a
    score (directly or through an encoder) must pin precision, or eval at
    the default --eval_precision highest is silently inexact and training
    gradients inherit bf16 through transposition."""
    return jnp.matmul(a, b, precision=mm_precision())
