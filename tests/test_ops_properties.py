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
