"""Mathematical invariants of the manifold ops (random-sweep property tests).

Complements the reference-parity suite: these check that the ops satisfy the
geometry they claim (isometries preserve norms, exp/log invert, distances are
symmetric and zero on the diagonal), which parity alone would not catch if
both implementations shared a bug.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.ops import chyperbolic as CH
from complexhyperbolickge_tpu.ops import euclidean as E
from complexhyperbolickge_tpu.ops import hyperbolic as H

B, D = 11, 12


@pytest.fixture(params=range(3))
def draw(request, rng):
    r = np.random.default_rng(request.param)
    return (
        jnp.asarray(r.normal(0, 0.4, (B, D))),
        jnp.asarray(r.normal(0, 0.4, (B, D))),
        jnp.asarray(r.uniform(0.5, 1.5, (B, 1))),
    )


def test_givens_rotation_is_isometry(draw):
    r, x, _ = draw
    y = E.givens_rotations(r, x)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(y, axis=-1)),
        np.asarray(jnp.linalg.norm(x, axis=-1)), rtol=1e-10)
    # inverse undoes
    back = E.givens_rotations(r, y, inverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-12)


def test_givens_unitary_is_unitary(draw):
    r, x, _ = draw
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(B, D)))
    b = jnp.asarray(rng.normal(size=(B, D)))
    ang = jnp.asarray(rng.normal(size=(B, D)))
    z = jnp.asarray(rng.normal(size=(B, D)) + 1j * rng.normal(size=(B, D)))
    out = E.givens_unitary(a, b, ang, z)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out, axis=-1)),
        np.asarray(jnp.linalg.norm(z, axis=-1)), rtol=1e-10)


def test_expmap_logmap_roundtrip(draw):
    u, _, c = draw
    y = H.expmap0(u, c)
    u2 = H.logmap0(y, c)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), rtol=1e-6,
                               atol=1e-9)


def test_lorentz_expmap_logmap_roundtrip(draw):
    u, _, c = draw
    y = H.expmap0_lorentz(u, c)
    u2 = H.logmap0_lorentz(y, c)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), rtol=1e-6,
                               atol=1e-9)


def test_mobius_identity_and_inverse(draw):
    x, _, c = draw
    x = H.project(x * 0.5, c)
    zero = jnp.zeros_like(x)
    np.testing.assert_allclose(np.asarray(H.mobius_add(x, zero, c)),
                               np.asarray(x), atol=1e-12)
    # left inverse: (-x) + x = 0
    np.testing.assert_allclose(
        np.asarray(H.mobius_add(-x, x, c)), 0.0, atol=1e-9)


def test_hyp_distance_symmetric_and_zero_diag(draw):
    x, y, _ = draw
    c = jnp.asarray([[0.9]])
    x = H.project(x * 0.5, c)
    y = H.project(y * 0.5, c)
    dxy = H.hyp_distance(x, y, c)
    dyx = H.hyp_distance(y, x, c)
    np.testing.assert_allclose(np.asarray(dxy), np.asarray(dyx), rtol=1e-7)
    # d(x, x) small (artanh clamp floor keeps it ~0)
    assert float(jnp.abs(H.hyp_distance(x, x, c)).max()) < 1e-3


def test_lorentz_boost_preserves_hyperboloid(draw):
    x, v, c = draw
    y = H.expmap0_lorentz(x, c)
    b = H.lorentz_boost(y, v, c)
    # both live on the hyperboloid: -t^2 + |s|^2 = -1/c with t from constraint
    ey = H.explicit_lorentz(y, c)
    eb = H.explicit_lorentz(b, c)
    for e in (ey, eb):
        q = -e[..., :1] ** 2 + jnp.sum(e[..., 1:] ** 2, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(q), np.asarray(-1 / c),
                                   rtol=1e-6)


def test_chyp_distance_symmetric_and_diag(draw):
    z, w, _ = draw
    nz = np.asarray(z) / (np.linalg.norm(np.asarray(z), axis=-1,
                                         keepdims=True) + 1.0)
    nw = np.asarray(w) / (np.linalg.norm(np.asarray(w), axis=-1,
                                         keepdims=True) + 1.0)
    z, w = jnp.asarray(nz), jnp.asarray(nw)
    dzw = CH.chyp_distance(z, w)
    dwz = CH.chyp_distance(w, z)
    np.testing.assert_allclose(np.asarray(dzw), np.asarray(dwz), rtol=1e-9)
    # diagonal ~ clamp floor acosh(1 + eps)
    diag = np.asarray(CH.chyp_distance(z, z))
    import math

    from complexhyperbolickge_tpu.ops.math import ball_eps

    floor = math.acosh(1 + float(ball_eps(z.dtype)))
    np.testing.assert_allclose(diag, floor, rtol=1e-5)


def test_chyp_distance_invariant_under_unitary(draw):
    """The Bergman distance is PU(n,1)-invariant: a block-unitary transform
    applied to both points preserves it."""
    z, w, _ = draw
    nz = np.asarray(z) / (np.linalg.norm(np.asarray(z), axis=-1,
                                         keepdims=True) + 1.0)
    nw = np.asarray(w) / (np.linalg.norm(np.asarray(w), axis=-1,
                                         keepdims=True) + 1.0)
    rng = np.random.default_rng(5)
    # z has D//2 complex coords -> the unitary needs D//2 real params per slot
    a = jnp.asarray(rng.normal(size=(B, D // 2)))
    b = jnp.asarray(rng.normal(size=(B, D // 2)))
    ang = jnp.asarray(rng.normal(size=(B, D // 2)))

    def to_c(v):
        return jnp.asarray(v[..., : D // 2] + 1j * v[..., D // 2:])

    def to_packed(vc):
        return jnp.concatenate([vc.real, vc.imag], axis=-1)

    uz = to_packed(E.givens_unitary(a, b, ang, to_c(jnp.asarray(nz))))
    uw = to_packed(E.givens_unitary(a, b, ang, to_c(jnp.asarray(nw))))
    d0 = CH.chyp_distance(jnp.asarray(nz), jnp.asarray(nw))
    d1 = CH.chyp_distance(uz, uw)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-8)


# ------------------------- f32 robustness (TPU regime) ------------------------


def test_lorentz_boost_finite_at_saturated_velocity_f32():
    """f32 hazard: tanh saturates to exactly 1.0 for ||v|| >= ~10 and the
    normalize-square chain can round sum(v^2) to >= 1, so 1/sqrt(1-g) NaNs
    without a clamp (the reference is only safe in f64)."""
    y = jnp.asarray(np.full((4, 8), 0.1), dtype=jnp.float32)
    v = jnp.asarray(np.full((4, 8), 5.0), dtype=jnp.float32)  # ||v|| ~ 14
    c = jnp.asarray(np.ones((4, 1)), dtype=jnp.float32)
    out = H.lorentz_boost(y, v, c)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda vv: jnp.sum(H.lorentz_boost(y, vv, c)))(v)
    assert np.isfinite(np.asarray(g)).all()


def test_logmap0_lorentz_finite_on_tiny_rows_f32():
    """beta = sqrt_c*sqrt(||y||^2 + 1/c) rounds to exactly 1.0 in f32 for
    ||y|| <~ 3e-4; sqrt(beta^2-1) then divides by zero unless the exact
    identity sqrt(beta^2-1) == sqrt_c*||y|| is used."""
    y = jnp.asarray(np.full((4, 8), 1e-4 / np.sqrt(8)), dtype=jnp.float32)
    c = jnp.asarray(np.ones((4, 1)), dtype=jnp.float32)
    out = H.logmap0_lorentz(y, c)
    assert np.isfinite(np.asarray(out)).all()
    # expected value per the REFERENCE semantics computed stably in f64:
    # arcosh(clamp(beta, min=1+1e-6)) / sqrt(beta^2-1) * y, with
    # sqrt(beta^2-1) == sqrt_c*||y|| exactly (the arcosh clamp floor makes
    # this ~14x ||y|| here — in f32 the naive form is inf, not this)
    y64 = np.asarray(y, dtype=np.float64)
    y_norm = np.linalg.norm(y64, axis=-1, keepdims=True)
    beta = np.sqrt(y_norm**2 + 1.0)
    expect = np.arccosh(np.maximum(beta, 1 + 1e-6)) / y_norm * y64
    # f32 arcosh near 1 itself carries %-level cancellation error (x^2-1);
    # the test pins magnitude + finiteness, not sub-% accuracy
    np.testing.assert_allclose(np.asarray(out), expect, rtol=5e-2)
    g = jax.grad(lambda yy: jnp.sum(H.logmap0_lorentz(yy, c)))(y)
    assert np.isfinite(np.asarray(g)).all()


def test_hyp_distance_multi_c_finite_at_coincident_points_f32():
    """The expanded sqrt argument can round negative in f32 when the
    pairwise distance is below rounding noise; forward and grad must stay
    finite (the Pallas eval kernel already guards the same expression)."""
    x = jnp.asarray(np.full((4, 8), 0.1), dtype=jnp.float32)
    v = jnp.asarray(np.full((4, 8), 0.1003353), dtype=jnp.float32)
    c = jnp.asarray(np.ones((4, 1)), dtype=jnp.float32)
    # v chosen so expmap0(v) ~ x: distance ~ 0
    d = H.hyp_distance_multi_c(x, v, c)
    assert np.isfinite(np.asarray(d)).all()
    g = jax.grad(lambda xx: jnp.sum(H.hyp_distance_multi_c(xx, v, c)))(x)
    assert np.isfinite(np.asarray(g)).all()
    # zero candidate vector: safe_norm keeps forward/grad finite
    v0 = jnp.zeros_like(v)
    d0 = H.hyp_distance_multi_c(x, v0, c)
    g0 = jax.grad(lambda xx: jnp.sum(H.hyp_distance_multi_c(xx, v0, c)))(x)
    assert np.isfinite(np.asarray(d0)).all()
    assert np.isfinite(np.asarray(g0)).all()
