"""Parity of every manifold op against the reference implementations in f64.

Each test draws random inputs in the regime the models actually produce
(init scale ~1e-3 up to O(1) tangent vectors), runs the reference op under
torch f64 and ours under JAX x64, and asserts agreement to tight tolerance.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_loader import load

ref_hyp = load("utils.hyperbolic")
ref_euc = load("utils.euclidean")
ref_chyp = load("utils.complexhyperbolic")

from complexhyperbolickge_tpu.ops import chyperbolic as CH
from complexhyperbolickge_tpu.ops import euclidean as E
from complexhyperbolickge_tpu.ops import fft as F
from complexhyperbolickge_tpu.ops import hyperbolic as H
from complexhyperbolickge_tpu.ops import math as M

ATOL = 1e-12
B, D = 7, 12  # D divisible by 4 (givens pairs + half-splits)


def t(x):
    return torch.from_numpy(np.asarray(x))


def allclose(ours, theirs, atol=ATOL, rtol=1e-10):
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy(), atol=atol, rtol=rtol
    )


@pytest.fixture
def x(rng):
    return rng.normal(size=(B, D)) * 0.3


@pytest.fixture
def y(rng):
    return rng.normal(size=(B, D)) * 0.3


@pytest.fixture
def c(rng):
    return rng.uniform(0.5, 1.5, size=(B, 1))


# ------------------------------- scalar math --------------------------------


def test_artanh(rng):
    v = rng.uniform(-1.2, 1.2, size=(100,))
    allclose(M.artanh(jnp.asarray(v)), ref_hyp.artanh(t(v)))


def test_artanh_grad_matches_reference(rng):
    v = rng.uniform(-1.2, 1.2, size=(50,))
    tv = t(v).requires_grad_(True)
    ref_hyp.artanh(tv).sum().backward()
    import jax

    ours = jax.grad(lambda z: M.artanh(z).sum())(jnp.asarray(v))
    allclose(ours, tv.grad)


def test_tanh_arcosh(rng):
    v = rng.normal(size=(100,)) * 20
    allclose(M.tanh(jnp.asarray(v)), ref_hyp.tanh(t(v)))
    w = rng.uniform(0.5, 5.0, size=(100,))
    allclose(M.arcosh(jnp.asarray(w)), ref_hyp.arcosh(t(w)))


# ------------------------------ euclidean ops -------------------------------


def test_givens_rotations(x, y):
    allclose(E.givens_rotations(jnp.asarray(x), jnp.asarray(y)),
             ref_euc.givens_rotations(t(x), t(y)))


def test_givens_tiny_pair_parity_and_zero_vjp(x, y):
    """The reference divides by the UNCLAMPED pair norm (euclidean.py:40,71):
    any nonzero pair — down to norm 1e-20 — is normalized exactly.  Pin that
    our tiny-clamp matches it bit-wise there (a MIN_NORM=1e-15 floor did
    not), and that the VJP at an exactly-zero pair is finite (where the
    reference itself NaNs, torch norm subgradient aside)."""
    xt = np.array(x, copy=True)
    xt[:, 0], xt[:, 1] = 1e-20, -2e-20  # first (cos, sin) pair: tiny nonzero
    allclose(E.givens_rotations(jnp.asarray(xt), jnp.asarray(y)),
             ref_euc.givens_rotations(t(xt), t(y)))
    from tests.test_model_parity import fixed_givens_reflection

    allclose(E.givens_reflection(jnp.asarray(xt), jnp.asarray(y)),
             fixed_givens_reflection(t(xt), t(y)))
    xz = np.array(x, copy=True)
    xz[:, :2] = 0.0  # exactly-zero pair: VJP must stay finite
    for fn in (E.givens_rotations, E.givens_reflection):
        g = jax.grad(lambda r: jnp.sum(fn(r, jnp.asarray(y)) ** 2))(
            jnp.asarray(xz))
        assert np.isfinite(np.asarray(g)).all()


def test_givens_rotations_inverse(x, y):
    allclose(E.givens_rotations(jnp.asarray(x), jnp.asarray(y), inverse=True),
             ref_euc.givens_rotations(t(x), t(y), inverse=True))


def test_givens_rotations_scaled(rng, x, y):
    s = rng.normal(size=(B, D // 2))
    allclose(
        E.givens_rotations(jnp.asarray(x), jnp.asarray(y), scale=jnp.asarray(s)),
        ref_euc.givens_rotations(t(x), t(y), scale=t(s)),
    )
    allclose(
        E.givens_rotations(jnp.asarray(x), jnp.asarray(y), scale=jnp.asarray(s),
                           inverse=True),
        ref_euc.givens_rotations(t(x), t(y), scale=t(s), inverse=True),
    )


def test_givens_reflection_is_fixed_involution(x, y):
    """The reference's givens_reflection has a typo (euclidean.py:73:
    `-x[..., :1]` for `-x[..., 1:]`) making it non-involutive.  We implement
    the true reflection (upstream KGEmb); assert involution + norm
    preservation instead of bug parity."""
    r, v = jnp.asarray(x), jnp.asarray(y)
    out = E.givens_reflection(r, v)
    again = E.givens_reflection(r, out)
    np.testing.assert_allclose(np.asarray(again), np.asarray(v), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out, axis=-1)),
        np.asarray(jnp.linalg.norm(v, axis=-1)),
        atol=1e-12,
    )


def test_givens_unitary(rng, x, y):
    a = rng.normal(size=(B, D))
    b = rng.normal(size=(B, D))
    ang = rng.normal(size=(B, D))
    z = rng.normal(size=(B, D)) + 1j * rng.normal(size=(B, D))
    ours = E.givens_unitary(jnp.asarray(a), jnp.asarray(b), jnp.asarray(ang),
                            jnp.asarray(z))
    theirs = ref_euc.givens_unitary(t(a), t(b), t(ang), t(z))
    allclose(ours, theirs)


def test_givens_unitary_lift_det(rng):
    a = rng.normal(size=(B, D))
    b = rng.normal(size=(B, D))
    ang = rng.normal(size=(B, D))
    z = rng.normal(size=(B, D)) + 1j * rng.normal(size=(B, D))
    ours, det_o = E.givens_unitary(jnp.asarray(a), jnp.asarray(b),
                                   jnp.asarray(ang), jnp.asarray(z), lift=True)
    theirs, det_t = ref_euc.givens_unitary(t(a), t(b), t(ang), t(z), lift=True)
    allclose(ours, theirs)
    allclose(det_o, det_t)


def test_norm_clamp(rng, x):
    ours = E.norm_clamp(jnp.asarray(x), min=0.1, max=0.5)
    theirs = ref_euc.norm_clamp(t(x), min=0.1, max=0.5)
    allclose(ours, theirs)


# ------------------------------ hyperbolic ops ------------------------------


def test_expmap0_logmap0_project(x, c):
    allclose(H.expmap0(jnp.asarray(x), jnp.asarray(c)), ref_hyp.expmap0(t(x), t(c)))
    allclose(H.logmap0(jnp.asarray(x), jnp.asarray(c)), ref_hyp.logmap0(t(x), t(c)))
    big = x * 100
    allclose(H.project(jnp.asarray(big), jnp.asarray(c)),
             ref_hyp.project(t(big), t(c)))


def test_mobius_add(x, y, c):
    allclose(H.mobius_add(jnp.asarray(x), jnp.asarray(y), jnp.asarray(c)),
             ref_hyp.mobius_add(t(x), t(y), t(c)))


def test_hyp_distance(x, y):
    c = np.array([[0.8]])
    allclose(H.hyp_distance(jnp.asarray(x), jnp.asarray(y), jnp.asarray(c)),
             ref_hyp.hyp_distance(t(x), t(y), t(c)))


def test_hyp_distance_multi_c(x, y, c):
    allclose(H.hyp_distance_multi_c(jnp.asarray(x), jnp.asarray(y), jnp.asarray(c)),
             ref_hyp.hyp_distance_multi_c(t(x), t(y), t(c)))


def test_hyp_distance_multi_c_all_matches_broadcast(rng, c):
    """Folded all-pairs form == reference broadcast form."""
    xq = rng.normal(size=(B, D)) * 0.3
    vt = rng.normal(size=(17, D)) * 0.3
    ours = H.hyp_distance_multi_c_all(jnp.asarray(xq), jnp.asarray(vt), jnp.asarray(c))
    theirs = ref_hyp.hyp_distance_multi_c(
        t(xq).unsqueeze(1), t(vt).unsqueeze(0), t(c).unsqueeze(1)
    ).squeeze(-1)
    allclose(ours, theirs)


def test_hyp_sim_expmap_all_matches_reference_pipeline(rng, c):
    """Folded expmap0+distance == reference BaseH.similarity_score pipeline
    (models/hyperbolic.py:45-49)."""
    xq = rng.normal(size=(B, D)) * 0.3
    vt = rng.normal(size=(17, D)) * 0.5
    ours = H.hyp_sim_expmap_all(jnp.asarray(xq), jnp.asarray(vt), jnp.asarray(c))
    rhs_h = ref_hyp.expmap0(t(vt).unsqueeze(0), t(c).unsqueeze(1))
    theirs = ref_hyp.hyp_distance_multi_c(
        t(xq).unsqueeze(1), rhs_h, t(c).unsqueeze(1)
    ).squeeze(-1)
    allclose(ours, theirs)


def test_lorentz_ops(x, y, c):
    allclose(H.expmap0_lorentz(jnp.asarray(x), jnp.asarray(c)),
             ref_hyp.expmap0_lorentz(t(x), t(c)))
    allclose(H.logmap0_lorentz(jnp.asarray(x), jnp.asarray(c)),
             ref_hyp.logmap0_lorentz(t(x), t(c)))
    allclose(H.lorentz_boost(jnp.asarray(x), jnp.asarray(y), jnp.asarray(c)),
             ref_hyp.lorentz_boost(t(x), t(y), t(c)))
    allclose(H.hyp_distance_multi_c_lorentz(jnp.asarray(x), jnp.asarray(y),
                                            jnp.asarray(c)),
             ref_hyp.hyp_distance_multi_c_lorentz(t(x), t(y), t(c)))
    allclose(H.explicit_lorentz(jnp.asarray(x), jnp.asarray(c)),
             ref_hyp.explicit_lorentz(t(x), t(c)))


def test_lorentz_sim_expmap_all_matches_reference_pipeline(rng, c):
    xq = rng.normal(size=(B, D)) * 0.3
    vt = rng.normal(size=(17, D)) * 0.5
    ours = H.lorentz_sim_expmap_all(jnp.asarray(xq), jnp.asarray(vt), jnp.asarray(c))
    rhs_h = ref_hyp.expmap0_lorentz(t(vt).unsqueeze(0), t(c).unsqueeze(1))
    theirs = ref_hyp.hyp_distance_multi_c_lorentz(
        t(xq).unsqueeze(1), rhs_h, t(c).unsqueeze(1)
    ).squeeze(-1)
    allclose(ours, theirs)


# --------------------------- complex-hyperbolic ops --------------------------


def test_chyp_expmap_project_mobius(x, y, c):
    allclose(CH.expmap0(jnp.asarray(x), jnp.asarray(c)),
             ref_chyp.expmap0(t(x), t(c)))
    allclose(CH.logmap0(jnp.asarray(x), jnp.asarray(c)),
             ref_chyp.logmap0(t(x), t(c)))
    big = x * 1000
    allclose(CH.project(jnp.asarray(big), jnp.asarray(c)),
             ref_chyp.project(t(big), t(c)))
    allclose(CH.real_mobius_add(jnp.asarray(x), jnp.asarray(y), jnp.asarray(c)),
             ref_chyp.real_mobius_add(t(x), t(y), t(c)))


def _packed_ball_points(rng, n, rank):
    """Packed [Re|Im] vectors with ||z|| < 1 (unit-ball points)."""
    v = rng.normal(size=(n, 2 * rank))
    v = v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1.0)
    return v * rng.uniform(0.1, 0.95, size=(n, 1))


def test_chyp_distance_vs_reference_forward(rng):
    rank = 9
    z = _packed_ball_points(rng, B, rank)
    w = _packed_ball_points(rng, B, rank)
    ours = CH.chyp_distance(jnp.asarray(z), jnp.asarray(w))
    theirs = ref_chyp.Distance.apply(t(z), t(w), 1, True).squeeze(-1)
    allclose(ours, theirs)


def test_chyp_distance_grad_vs_reference_backward(rng):
    """Plain autodiff through our forward == the reference's hand-written
    Distance.backward (verified bit-identical to autograd, SURVEY §2.4.3)."""
    rank = 9
    z = _packed_ball_points(rng, B, rank)
    w = _packed_ball_points(rng, B, rank)
    tz = t(z)[:, None, :].requires_grad_(True)
    tw = t(w)[:, None, :].requires_grad_(True)
    ref_chyp.Distance.apply(tz, tw, 1, True).sum().backward()
    import jax

    gz, gw = jax.grad(
        lambda a, b: CH.chyp_distance(a, b).sum(), argnums=(0, 1)
    )(jnp.asarray(z), jnp.asarray(w))
    allclose(gz, tz.grad.squeeze(1), atol=1e-9)
    allclose(gw, tw.grad.squeeze(1), atol=1e-9)


def test_chyp_core_vjp_vs_reference_backward(rng):
    """The analytic custom-VJP core (train shapes (B,D) vs (B,K,D)) must
    reproduce the reference's hand-written Distance.backward."""
    rank, K = 9, 5
    z = _packed_ball_points(rng, B, rank)
    w = _packed_ball_points(rng, B * K, rank).reshape(B, K, 2 * rank)
    tz = t(z)[:, None, :].requires_grad_(True)
    tw = t(w).requires_grad_(True)
    ref_chyp.Distance.apply(tz, tw, 1, True).sum().backward()
    import jax

    gz, gw = jax.grad(
        lambda a, b: CH._chyp_distance_core(a, b).sum(), argnums=(0, 1)
    )(jnp.asarray(z), jnp.asarray(w))
    allclose(gz, tz.grad.squeeze(1), atol=1e-9)
    allclose(gw, tw.grad, atol=1e-9)


def _boundary_pair(rng, n, rank):
    """Near-boundary pairs (||z||~0.997, w a tiny perturbation of z): the
    regime where the reference Distance.grad's denominator clamp
    p = clamp(sqrt(x^2-1)*norm^2*norm, max=-eps) is ACTIVE."""
    z = _packed_ball_points(rng, n, rank)
    z = z / np.linalg.norm(z, axis=-1, keepdims=True) * 0.997
    w = z + rng.normal(size=z.shape) * 1e-5
    w = w / np.maximum(np.linalg.norm(w, axis=-1, keepdims=True) / 0.9985, 1.0)
    return z, w


def test_chyp_core_vjp_clamped_regime_matches_reference(rng):
    """Near the unit-ball boundary the reference backward clamps its
    denominator (complexhyperbolic.py:203-204), capping gradient magnitude;
    our analytic VJP must reproduce the CLAMPED gradients, not the raw ones."""
    rank, K = 9, 5
    z, _ = _boundary_pair(rng, B, rank)
    # candidates = tiny perturbations OF z itself, so pair distances stay
    # small while both norms hug the boundary (that's what drives |p| under
    # eps)
    w = np.stack([z + rng.normal(size=z.shape) * 1e-5 for _ in range(K)],
                 axis=1)
    w = w / np.maximum(
        np.linalg.norm(w, axis=-1, keepdims=True) / 0.9985, 1.0
    )
    tz = t(z)[:, None, :].requires_grad_(True)
    tw = t(w).requires_grad_(True)
    ref_chyp.Distance.apply(tz, tw, 1, True).sum().backward()
    import jax

    gz, gw = jax.grad(
        lambda a, b: CH._chyp_distance_core(a, b).sum(), argnums=(0, 1)
    )(jnp.asarray(z), jnp.asarray(w))
    # confirm the clamp regime is actually reached (tiny distances at
    # near-boundary norms give |p| ~ d*1e-7 << eps=1e-5), else the test
    # degenerates to the unclamped case
    with torch.no_grad():
        d_ref = ref_chyp.Distance.apply(t(z)[:, None, :], tw.detach(), 1, True)
        assert float(d_ref.min()) < 0.05
    allclose(gz, tz.grad.squeeze(1), atol=1e-9)
    allclose(gw, tw.grad, atol=1e-9)


def test_chyp_all_vjp_matches_reference_backward(rng):
    """chyp_distance_all (the pool/shared-negative training path) must carry
    the reference backward incl. its clamp; checked in both the generic and
    the near-boundary regimes against the executed reference."""
    import jax

    rank, N = 9, 13
    for gen in ("generic", "boundary"):
        if gen == "generic":
            z = _packed_ball_points(rng, B, rank)
            w = _packed_ball_points(rng, N, rank)
        else:
            z, _ = _boundary_pair(rng, B, rank)
            # candidate rows: perturbations of z rows (small distances at
            # boundary norms -> clamp active) plus a few generic rows
            pert = z[: N - 3 if N - 3 <= B else B]
            pert = np.tile(pert, (-(-(N - 3) // B), 1))[: N - 3]
            pert = pert + rng.normal(size=pert.shape) * 1e-5
            pert = pert / np.maximum(
                np.linalg.norm(pert, axis=-1, keepdims=True) / 0.9985, 1.0
            )
            w = np.concatenate([pert, _packed_ball_points(rng, 3, rank)],
                               axis=0)
        tz = t(z).unsqueeze(1).requires_grad_(True)
        tw = t(w).unsqueeze(0).requires_grad_(True)
        ref_chyp.Distance.apply(tz, tw, 1, True).sum().backward()
        gz, gw = jax.grad(
            lambda a, b: CH.chyp_distance_all(a, b).sum(), argnums=(0, 1)
        )(jnp.asarray(z), jnp.asarray(w))
        allclose(gz, tz.grad.squeeze(1), atol=1e-9)
        allclose(gw, tw.grad.squeeze(0), atol=1e-9)


def test_chyp_distance_all_matches_broadcast(rng):
    rank = 9
    z = _packed_ball_points(rng, B, rank)
    w = _packed_ball_points(rng, 23, rank)
    ours = CH.chyp_distance_all(jnp.asarray(z), jnp.asarray(w))
    theirs = ref_chyp.Distance.apply(
        t(z).unsqueeze(1), t(w).unsqueeze(0), 1, True
    ).squeeze(-1)
    allclose(ours, theirs)


def test_chyp_explicit_lift_equals_implicit(rng):
    rank = 9
    z = _packed_ball_points(rng, B, rank)
    w = _packed_ball_points(rng, B, rank)
    implicit = CH.chyp_distance(jnp.asarray(z), jnp.asarray(w))
    explicit = CH.chyp_distance_explicit(CH.lift(jnp.asarray(z)),
                                         CH.lift(jnp.asarray(w)))
    np.testing.assert_allclose(np.asarray(implicit), np.asarray(explicit),
                               atol=1e-12)


def test_chyp_distance_vs_chyp_distance_fn(rng):
    """Also check against the reference's plain chyp_distance function
    (utils/complexhyperbolic.py:127-148), complex-typed path."""
    rank = 9
    z = _packed_ball_points(rng, B, rank)
    w = _packed_ball_points(rng, B, rank)
    zc = t(z[:, :rank] + 1j * z[:, rank:])
    wc = t(w[:, :rank] + 1j * w[:, rank:])
    theirs = ref_chyp.chyp_distance(zc, wc, 1, lift=True).squeeze(-1)
    ours = CH.chyp_distance(jnp.asarray(z), jnp.asarray(w))
    allclose(ours, theirs)


# ----------------------------------- fft ------------------------------------


def test_fft_packed_roundtrip_vs_torch(rng):
    rank = 33
    v = rng.normal(size=(B, 2 * rank))
    ours = F.irfft_packed(jnp.asarray(v))
    vc = t(v[:, :rank] + 1j * v[:, rank:])
    theirs = torch.fft.irfft(vc, norm="ortho")
    allclose(ours, theirs)

    x = rng.normal(size=(B, 2 * (rank - 1)))
    ours2 = F.rfft_packed(jnp.asarray(x))
    z = torch.fft.rfft(t(x), norm="ortho")
    theirs2 = torch.cat([z.real, z.imag], dim=-1)
    allclose(ours2, theirs2)


def test_fft_matrix_forms_match_fft(rng):
    rank = 33
    v = jnp.asarray(rng.normal(size=(B, 2 * rank)))
    np.testing.assert_allclose(np.asarray(F.irfft_packed_mm(v)),
                               np.asarray(F.irfft_packed(v)), atol=1e-12)
    x = jnp.asarray(rng.normal(size=(B, 64)))
    np.testing.assert_allclose(np.asarray(F.rfft_packed_mm(x)),
                               np.asarray(F.rfft_packed(x)), atol=1e-12)
