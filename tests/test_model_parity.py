"""Score parity of every non-GNN model against the reference with identical
injected weights (f64, train-mode (B,1) scoring and all-entity scoring).

Reference bugs handled (SURVEY known-bugs list):
  * givens_reflection typo (reference utils/euclidean.py:73) — the reference
    module is monkeypatched with the corrected involutive reflection so that
    RefE/RefH/AttE/AttH/AttRH/FFTRefH/FFTAttH parity is meaningful.
  * RefE NameError (reference models/euclidean.py:129) — same patching makes
    the reference RefE unrunnable regardless; RefE is tested against a local
    torch re-expression of its intended pipeline.
  * FFT models' lift=False shape crash (models/complexhyperbolic.py:43) —
    reference instances are flipped to lift=True (the working semantics).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.reference_loader import load, make_args

ref_euc_mod = load("models.euclidean")
ref_cplx_mod = load("models.complex")
ref_hyp_mod = load("models.hyperbolic")
ref_chyp_mod = load("models.complexhyperbolic")
ref_euc_utils = load("utils.euclidean")

from complexhyperbolickge_tpu.models import ModelConfig, get_model

N_ENT, N_REL = 20, 6  # n_relations already doubled (with inverses)
B = 5


def fixed_givens_reflection(r, x):
    """The intended (involutive) 2x2 reflection; fixes the typo at reference
    utils/euclidean.py:73 (`-x[..., :1]` for `-x[..., 1:]`)."""
    givens = r.reshape(*r.shape[:-1], -1, 2)
    givens = givens / torch.norm(givens, p=2, dim=-1, keepdim=True)
    xv = x.reshape(*r.shape[:-1], -1, 2)
    y0 = givens[..., 0] * xv[..., 0] + givens[..., 1] * xv[..., 1]
    y1 = givens[..., 1] * xv[..., 0] - givens[..., 0] * xv[..., 1]
    return torch.stack([y0, y1], dim=-1).reshape(x.shape)


@pytest.fixture(autouse=True)
def patch_reflection(monkeypatch):
    for mod in (ref_euc_mod, ref_hyp_mod, ref_chyp_mod, ref_euc_utils):
        if hasattr(mod, "givens_reflection"):
            monkeypatch.setattr(mod, "givens_reflection", fixed_givens_reflection)
    yield


def build_pair(name, rank, multi_c=True, bias="learn", seed=0,
               natural_init=False):
    """Construct (our model, our params, reference model) with shared weights.

    natural_init=False randomizes weights uniform(-0.5, 0.5) for
    well-spread scores; True keeps the reference's own init distribution
    (init_size-scaled normals — the realistic early-training regime)."""
    torch.manual_seed(seed)
    ref_cls = None
    for mod in (ref_euc_mod, ref_cplx_mod, ref_hyp_mod, ref_chyp_mod):
        if hasattr(mod, name):
            ref_cls = getattr(mod, name)
            break
    args = make_args(sizes=(N_ENT, N_REL, N_ENT), rank=rank, multi_c=multi_c,
                     bias=bias)
    ref_model = ref_cls(args).double()
    if hasattr(ref_model, "lift"):
        ref_model.lift = True  # fix the HEAD lift=False crash (SURVEY §2.4.1)
    ref_model.eval()

    cfg = ModelConfig(
        n_entities=N_ENT, n_relations=N_REL, rank=rank, multi_c=multi_c,
        bias=bias, dtype="float64",
    )
    ours = get_model(name)(cfg)

    # weight injection: randomize reference weights, copy into our pytree
    if not natural_init:
        with torch.no_grad():
            for p in ref_model.parameters():
                p.uniform_(-0.5, 0.5)
            # curvatures positive-ish like training would keep them
            if hasattr(ref_model, "c"):
                ref_model.c.weight.uniform_(0.5, 1.5)

    params = {}
    for ours_name, (shape, _) in ours.param_specs().items():
        ref_attr = getattr(ref_model, ours_name)
        # NB: .numpy() aliases the torch buffer and jnp.asarray may zero-copy
        # on CPU — an explicit copy isolates our params from torch's in-place
        # optimizer updates.
        w = np.array(ref_attr.weight.detach().numpy(), copy=True)
        assert w.shape == shape, f"{name}.{ours_name}: {w.shape} != {shape}"
        params[ours_name] = jnp.asarray(w)
    return ours, params, ref_model


def run_pair(name, rank, multi_c=True, bias="learn", atol=1e-10):
    ours, params, ref_model = build_pair(name, rank, multi_c, bias)
    rng = np.random.default_rng(0)
    q = rng.integers(0, N_ENT, size=(B, 3))
    q[:, 1] = rng.integers(0, N_REL, size=B)
    tq = torch.from_numpy(q)

    # train-mode: one gold tail per query
    with torch.no_grad():
        ref_scores, _ = ref_model(tq[:, :2].unsqueeze(1), tq[:, 2].unsqueeze(1))
    if name == "AttRH" and ref_scores.shape[0] == ref_scores.shape[1] == B:
        # reference AttRH broadcasting bug: the (B,1,1,2) attention weights
        # cross the batch dim of the (B,*,1) distances, yielding (B,B,...)
        # scores; the diagonal is the intended result (models/hyperbolic.py:
        # 178-196).  Our implementation computes the intended semantics.
        ref_scores = ref_scores[torch.arange(B), torch.arange(B)]
        while ref_scores.dim() < 3:
            ref_scores = ref_scores.unsqueeze(1)
    our_scores = ours.score(params, jnp.asarray(q[:, :2]), jnp.asarray(q[:, 2:3]))
    np.testing.assert_allclose(
        np.asarray(our_scores), ref_scores.squeeze(-1).numpy(), atol=atol,
        rtol=1e-8, err_msg=f"{name} train-mode scores",
    )

    # all-entity mode
    with torch.no_grad():
        ref_all, _ = ref_model(tq[:, :2].unsqueeze(1), None)
    if name == "AttRH" and ref_all.shape[0] == ref_all.shape[1] == B:
        ref_all = ref_all[torch.arange(B), torch.arange(B)]
    our_all = ours.score_all(params, jnp.asarray(q[:, :2]))
    np.testing.assert_allclose(
        np.asarray(our_all), ref_all.squeeze(-1).numpy(), atol=atol,
        rtol=1e-8, err_msg=f"{name} all-entity scores",
    )


# ------------------------------- euclidean ----------------------------------


@pytest.mark.parametrize("name", ["TransE", "CP", "MurE", "RotE", "AttE"])
def test_euclidean_parity(name):
    run_pair(name, rank=8)


def test_refe_intended_semantics():
    """Reference RefE crashes (NameError, models/euclidean.py:129); check our
    RefE against the evidently intended pipeline (reflection + translation)."""
    cfg = ModelConfig(n_entities=N_ENT, n_relations=N_REL, rank=8, dtype="float64")
    ours = get_model("RefE")(cfg)
    rng = np.random.default_rng(1)
    params = {k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape))
              for k, (shape, _) in ours.param_specs().items()}
    q = rng.integers(0, N_ENT, size=(B, 2))
    q[:, 1] = rng.integers(0, N_REL, size=B)
    (lhs,), _ = ours.get_queries(params, jnp.asarray(q))
    r = torch.from_numpy(np.asarray(params["rel_diag"]))[torch.from_numpy(q[:, 1])]
    e = torch.from_numpy(np.asarray(params["entity"]))[torch.from_numpy(q[:, 0])]
    rel = torch.from_numpy(np.asarray(params["rel"]))[torch.from_numpy(q[:, 1])]
    expected = fixed_givens_reflection(r, e) + rel
    np.testing.assert_allclose(np.asarray(lhs), expected.numpy(), atol=1e-12)


# -------------------------------- complex -----------------------------------


@pytest.mark.parametrize("name", ["ComplEx", "RotatE", "Fourier"])
def test_complex_parity(name):
    run_pair(name, rank=8)


# ------------------------------- hyperbolic ---------------------------------


@pytest.mark.parametrize("name", ["RotH", "RefH", "AttH", "AttRH", "IsoH"])
def test_hyperbolic_parity(name):
    run_pair(name, rank=8)


def test_iffth_parity():
    run_pair("IFFTH", rank=14)  # n = rank//2 + 1 = 8, even


@pytest.mark.parametrize("name", ["RotLH", "HyboNet"])
def test_lorentz_parity(name):
    run_pair(name, rank=8)


# ---------------------------- complex-hyperbolic ----------------------------


@pytest.mark.parametrize("name", ["FFTRotH", "FFTRefH", "FFTAttH"])
def test_chyp_parity(name):
    run_pair(name, rank=9)


def test_fftisoh_parity():
    run_pair("FFTIsoH", rank=8)


@pytest.mark.parametrize("name", ["FFTRotH", "RotH"])
def test_bias_none(name):
    run_pair(name, rank=9 if name.startswith("FFT") else 8, bias="none")


def test_fft_single_curvature_raw_weight():
    """Reference FFT single-c path uses the raw c weight, no softplus
    (models/complexhyperbolic.py:81)."""
    run_pair("FFTRotH", rank=9, multi_c=False)
