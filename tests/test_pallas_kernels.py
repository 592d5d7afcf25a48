"""Pallas fused-ranking kernel vs the dense XLA filtered ranker.

Runs in interpreter mode on CPU (the kernel itself is exercised on real TPU
by bench.py / the driver's compile check).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import synthetic_kg
from complexhyperbolickge_tpu.kernels import make_pallas_ranker
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.evaluate import get_ranking

N_ENT = 200


def _assert_ranks_match(ranks, dense):
    """Exact equality up to f32 score TIES: the kernel contracts a 128-lane
    zero-padded feature axis while the dense path contracts the raw width,
    so accumulation grouping can differ by 1 ulp and flip a >= comparison
    when two candidates' scores coincide to ~1e-5 (random-param tests make
    such near-ties likely).  Real bugs shift many rows or whole ranks."""
    diff = np.abs(ranks - dense)
    n_diff = int((diff > 0).sum())
    assert diff.max() <= 1 and n_diff <= 2, (
        f"{n_diff} rows differ, max diff {diff.max()}"
    )



@pytest.fixture(scope="module", params=["learn", "none"])
def setup(request):
    data = synthetic_kg(n_entities=N_ENT, n_relations=5, n_train=500,
                        n_valid=50, n_test=64, seed=4)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=9,
                      multi_c=True, bias=request.param, dtype="float32")
    model = get_model("FFTRotH")(cfg)
    rng = np.random.default_rng(12)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    return data, model, params


@pytest.mark.parametrize("direction", ["rhs", "lhs"])
def test_pallas_ranker_matches_dense(setup, direction):
    data, model, params = setup
    pack = data.eval_pack("test", direction)
    dense = get_ranking(model, params, pack, batch_size=64)

    ranker = make_pallas_ranker(model, batch_size=64, interpret=True)
    ranks = np.asarray(
        ranker(params, jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx))
    )
    _assert_ranks_match(ranks, dense)


@pytest.mark.parametrize("name,rank", [
    ("FFTRefH", 9), ("FFTAttH", 9), ("FFTIsoH", 10),
])
@pytest.mark.parametrize("direction", ["rhs", "lhs"])
def test_pallas_ranker_other_fft_models(name, rank, direction):
    """Every FFT-family model (not just the flagship) through the fused
    chyp ranker, exact vs dense."""
    data = synthetic_kg(n_entities=N_ENT, n_relations=5, n_train=500,
                        n_valid=50, n_test=64, seed=4)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=rank,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model(name)(cfg)
    rng = np.random.default_rng(12)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    pack = data.eval_pack("test", direction)
    dense = get_ranking(model, params, pack, batch_size=64)
    ranker = make_pallas_ranker(model, batch_size=64, interpret=True)
    ranks = np.asarray(
        ranker(params, jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx))
    )
    _assert_ranks_match(ranks, dense)


@pytest.mark.parametrize("name,rank", [
    ("RotH", 8), ("RefH", 8), ("AttH", 8), ("IsoH", 8), ("IFFTH", 6),
    ("RotLH", 8), ("HyboNet", 8),
])
@pytest.mark.parametrize("direction", ["rhs", "lhs"])
def test_pallas_hyp_ranker_matches_dense(name, rank, direction):
    from complexhyperbolickge_tpu.kernels import make_pallas_hyp_ranker

    data = synthetic_kg(n_entities=N_ENT, n_relations=5, n_train=500,
                        n_valid=50, n_test=64, seed=8)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=rank,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model(name)(cfg)
    rng = np.random.default_rng(13)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    pack = data.eval_pack("test", direction)
    dense = get_ranking(model, params, pack, batch_size=64)
    ranker = make_pallas_hyp_ranker(model, 64, interpret=True)
    q, f = jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx)
    ranks = np.asarray(ranker(params, q, f))
    _assert_ranks_match(ranks, dense)
    # maskless (subtract-filtered) form: exact vs masked on CPU — the flat
    # subtraction contraction and the family epilogue are the same
    # arithmetic (on-chip the +-1 MXU-tie caveat applies, like chyp)
    maskless = make_pallas_hyp_ranker(model, 64, interpret=True, masked=False)
    np.testing.assert_array_equal(np.asarray(maskless(params, q, f)), ranks)


@pytest.mark.parametrize("direction", ["rhs", "lhs"])
def test_pallas_attrh_ranker_matches_dense(direction):
    """AttRH's dedicated kernel (two single-fold half-space distances with
    learned 2-way weights) must reproduce the dense path exactly in
    interpret mode (round-1 verdict item 8)."""
    from complexhyperbolickge_tpu.kernels import make_pallas_attrh_ranker

    data = synthetic_kg(n_entities=N_ENT, n_relations=5, n_train=500,
                        n_valid=50, n_test=64, seed=8)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("AttRH")(cfg)
    rng = np.random.default_rng(13)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    pack = data.eval_pack("test", direction)
    dense = get_ranking(model, params, pack, batch_size=64)
    ranker = make_pallas_attrh_ranker(model, 64, interpret=True)
    q, f = jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx)
    ranks = np.asarray(ranker(params, q, f))
    _assert_ranks_match(ranks, dense)
    # maskless (subtract-filtered over BOTH half tables, round 4): exact vs
    # masked on CPU — same flat-dot arithmetic + shared two-half epilogue
    maskless = make_pallas_attrh_ranker(model, 64, interpret=True,
                                        masked=False)
    np.testing.assert_array_equal(np.asarray(maskless(params, q, f)), ranks)


def test_best_ranker_selects_attrh_kernel():
    from complexhyperbolickge_tpu.kernels.hyp_rank import PallasAttRHRanker
    from complexhyperbolickge_tpu.train.evaluate import make_best_ranker

    assert isinstance(make_best_ranker(_tiny_model("AttRH", 8), 8, "pallas"),
                      PallasAttRHRanker)


def test_pallas_ranker_pads_entities(setup):
    """n_entities=200 is not a multiple of tile_n=512 — padded rows must stay
    masked (counts unaffected)."""
    data, model, params = setup
    pack = data.eval_pack("test", "rhs")
    ranker = make_pallas_ranker(model, batch_size=64, interpret=True)
    r = np.asarray(
        ranker(params, jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx))
    )
    assert (r >= 1).all() and (r <= N_ENT).all()


# ------------------------- selection + loud failure --------------------------


def _tiny_model(name="FFTRotH", rank=5):
    cfg = ModelConfig(n_entities=32, n_relations=4, rank=rank, multi_c=True,
                      bias="learn", dtype="float32")
    return get_model(name)(cfg)


def test_best_ranker_selects_pallas_when_forced():
    """backend='pallas' must return the fused rankers (interpret mode on
    CPU) for every family that has one — the production selection path,
    not just the kernels called directly."""
    from complexhyperbolickge_tpu.kernels.chyp_rank import PallasChypRanker
    from complexhyperbolickge_tpu.kernels.hyp_rank import PallasHypRanker
    from complexhyperbolickge_tpu.train.evaluate import make_best_ranker

    assert isinstance(make_best_ranker(_tiny_model("FFTRotH"), 8, "pallas"),
                      PallasChypRanker)
    assert isinstance(make_best_ranker(_tiny_model("RotH", 8), 8, "pallas"),
                      PallasHypRanker)
    assert isinstance(make_best_ranker(_tiny_model("RotLH", 8), 8, "pallas"),
                      PallasHypRanker)


def test_best_ranker_pallas_maskless_policy():
    """backend='pallas_maskless': the subtract-filtered fused kernel —
    masked=False for EVERY hyperbolic family (incl. AttRH's two-table
    form), the fastest measured eval path at YAGO scale
    (benchmarks/eval_bench.py, round 4)."""
    from complexhyperbolickge_tpu.kernels.chyp_rank import PallasChypRanker
    from complexhyperbolickge_tpu.kernels.hyp_rank import (
        PallasAttRHRanker,
        PallasHypRanker,
    )
    from complexhyperbolickge_tpu.train.evaluate import make_best_ranker

    r = make_best_ranker(_tiny_model("FFTRotH"), 8, "pallas_maskless")
    assert isinstance(r, PallasChypRanker) and r.masked is False
    for name in ("RotH", "RotLH"):
        r = make_best_ranker(_tiny_model(name, 8), 8, "pallas_maskless")
        assert isinstance(r, PallasHypRanker) and r.masked is False, name
    r = make_best_ranker(_tiny_model("AttRH", 8), 8, "pallas_maskless")
    assert isinstance(r, PallasAttRHRanker) and r.masked is False


def test_best_ranker_auto_policy(monkeypatch):
    """backend='auto' (and 'dense') must return the scatter-free dense
    ranker everywhere: it measures within noise of the fused kernels at
    WN18RR scale and 1.2x faster at YAGO scale (the masked kernels stream a
    (B, N) int8 filter mask that grows with N) — benchmarks/eval_bench.py.
    Pinned behaviorally: with every Pallas builder broken, 'auto' must
    still return a working ranker (i.e. it never touches the kernels).
    Single-device and sharded selectors must agree on the policy."""
    import complexhyperbolickge_tpu.kernels as K
    import complexhyperbolickge_tpu.parallel.ranking as PR
    from complexhyperbolickge_tpu.train.evaluate import make_best_ranker

    def boom(*a, **k):
        raise AssertionError("'auto' must not build a Pallas ranker")

    for name in ("make_pallas_ranker", "make_pallas_hyp_ranker",
                 "make_pallas_attrh_ranker"):
        monkeypatch.setattr(K, name, boom)
    for name in ("make_sharded_pallas_ranker", "make_sharded_hyp_ranker",
                 "make_sharded_attrh_ranker"):
        monkeypatch.setattr(PR, name, boom)

    for backend in ("auto", "dense"):
        assert callable(make_best_ranker(_tiny_model("FFTRotH"), 8, backend))
        assert callable(make_best_ranker(_tiny_model("RotH", 8), 8, backend))

    mesh = jax.make_mesh((1, 2), ("data", "model"))
    sr = PR.make_best_sharded_ranker(_tiny_model("FFTRotH"), mesh, 32, "auto")
    assert callable(sr) and hasattr(sr, "rank_many")


def test_best_ranker_failure_is_loud(monkeypatch, caplog):
    """A broken Pallas path must RAISE under backend='pallas' — never
    degrade silently (round-1 verdict weak item 3)."""
    import logging

    import complexhyperbolickge_tpu.kernels as K
    from complexhyperbolickge_tpu.train.evaluate import make_best_ranker

    def boom(*a, **k):
        raise RuntimeError("deliberate kernel breakage")

    monkeypatch.setattr(K, "make_pallas_ranker", boom)
    model = _tiny_model("FFTRotH")
    with pytest.raises(RuntimeError, match="deliberate kernel breakage"):
        make_best_ranker(model, 8, "pallas")

    # And the no-kernel warning for a model family without a fused ranker
    # (TransE scores by plain dot/distance matmul -- XLA already optimal,
    # no Pallas kernel will exist for it):
    with caplog.at_level(logging.WARNING):
        make_best_ranker(_tiny_model("TransE", 8), 8, "pallas")
    assert any("no fused pallas ranker" in r.message.lower()
               for r in caplog.records)


def test_maskless_gold_tie_exact_at_straddling_shapes():
    """Round-4 regression: the gold's score ties t2 by construction, and the
    tile dot vs the flat subtraction dot round that tie APART at batched
    gemm shapes — even on CPU (this exact fixture shifted 3/32 ranks by -1
    before the in-kernel gold exclusion).  The maskless ranker must now
    reproduce dense filtered ranks exactly here."""
    from complexhyperbolickge_tpu.kernels import make_pallas_hyp_ranker

    data = synthetic_kg(n_entities=49, n_relations=4, n_train=256,
                        n_valid=32, n_test=32, seed=3)
    cfg = ModelConfig(n_entities=49, n_relations=4, rank=6,
                      multi_c=True, dtype="float32")
    model = get_model("RotH")(cfg)
    rng = np.random.default_rng(29)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    pack = data.eval_pack("test", "rhs")
    dense = get_ranking(model, params, pack, batch_size=32)
    maskless = make_pallas_hyp_ranker(model, 32, interpret=True, masked=False)
    r = np.asarray(maskless(params, jnp.asarray(pack.queries),
                            jnp.asarray(pack.filter_idx)))
    np.testing.assert_array_equal(r, dense)


def test_maskless_gold_not_in_filters_adds_one(setup):
    """The maskless kernels exclude the gold row in-tile and add back its
    deterministic contribution: 0 when the gold is in the filter list
    (reference protocol), +1 when it is not.  Strip the gold from the
    filter rows and check both family rankers against the dense path."""
    from complexhyperbolickge_tpu.kernels import make_pallas_hyp_ranker
    from complexhyperbolickge_tpu.kernels.chyp_rank import PallasChypRanker
    from complexhyperbolickge_tpu.train.evaluate import make_ranker

    data, model, params = setup
    pack = data.eval_pack("test", "rhs")
    q = jnp.asarray(pack.queries)
    f = np.array(pack.filter_idx)
    # remap the gold's slot to the pad id (gold no longer filtered)
    gold = np.asarray(pack.queries)[:, 2:3]
    f = np.where(f == gold, model.cfg.n_entities, f)
    f = jnp.asarray(f)

    # dense reference ranks with the stripped filters (self-consistent
    # target -> the gold contributes exactly 1)
    dense = np.asarray(make_ranker(model, len(q))(params, q, f))
    maskless = PallasChypRanker(model, 64, interpret=True, masked=False)
    np.testing.assert_array_equal(np.asarray(maskless(params, q, f)), dense)

    # hyp family too (RotH over the same data)
    cfg = ModelConfig(n_entities=model.cfg.n_entities,
                      n_relations=model.cfg.n_relations, rank=6,
                      multi_c=True, dtype="float32")
    hmodel = get_model("RotH")(cfg)
    rng = np.random.default_rng(41)
    hparams = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in hmodel.param_specs().items()
    }
    hparams["c"] = jnp.abs(hparams["c"]) + 0.5
    hdense = np.asarray(make_ranker(hmodel, len(q))(hparams, q, f))
    hml = make_pallas_hyp_ranker(hmodel, 64, interpret=True, masked=False)
    np.testing.assert_array_equal(np.asarray(hml(hparams, q, f)), hdense)

    # AttRH's two-table form has its own addback path
    from complexhyperbolickge_tpu.kernels import make_pallas_attrh_ranker

    acfg = ModelConfig(n_entities=model.cfg.n_entities,
                       n_relations=model.cfg.n_relations, rank=8,
                       multi_c=True, dtype="float32")
    amodel = get_model("AttRH")(acfg)
    rng = np.random.default_rng(43)
    aparams = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in amodel.param_specs().items()
    }
    aparams["c"] = jnp.abs(aparams["c"]) + 0.5
    adense = np.asarray(make_ranker(amodel, len(q))(aparams, q, f))
    aml = make_pallas_attrh_ranker(amodel, 64, interpret=True, masked=False)
    np.testing.assert_array_equal(np.asarray(aml(aparams, q, f)), adense)


def test_maskless_ranker_matches_masked(setup):
    """The subtract-filtered (maskless) kernel path must equal the dense-mask
    path exactly — same score arithmetic on both sides of the subtraction."""
    from complexhyperbolickge_tpu.kernels.chyp_rank import PallasChypRanker

    data, model, params = setup
    pack = data.eval_pack("test", "rhs")
    masked = PallasChypRanker(model, 64, interpret=True, masked=True)
    maskless = PallasChypRanker(model, 64, interpret=True, masked=False)
    q, f = jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx)
    np.testing.assert_array_equal(
        np.asarray(masked(params, q, f)), np.asarray(maskless(params, q, f))
    )


def test_precision_default_ranker_builds_and_matches_on_cpu(setup):
    """precision='default' (1-pass bf16 MXU on hardware) must build through
    make_best_ranker and rank; on CPU, DEFAULT and HIGHEST dot_generals are
    both true f32, so ranks are exactly equal — this pins the plumbing; the
    numeric deviation story is measured on-chip (~1.08x, MRR delta ~5e-8,
    README perf table)."""
    from complexhyperbolickge_tpu.kernels.chyp_rank import PallasChypRanker
    from complexhyperbolickge_tpu.train.evaluate import make_best_ranker

    data, model, params = setup
    pack = data.eval_pack("test", "rhs")
    q, f = jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx)

    exact = PallasChypRanker(model, 64, interpret=True)
    fast = make_best_ranker(model, 64, backend="pallas", precision="default")
    assert isinstance(fast, PallasChypRanker) and fast.precision == "default"
    np.testing.assert_array_equal(
        np.asarray(fast(params, q, f)), np.asarray(exact(params, q, f))
    )


@pytest.mark.parametrize("name,rank", [("RotH", 8), ("RotLH", 8), ("AttRH", 8)])
def test_precision_default_hyp_family_matches_on_cpu(name, rank):
    """The precision knob threads through the Poincare/Lorentz/AttRH kernels
    too (same CPU-equality pin as the CHYP test above)."""
    from complexhyperbolickge_tpu.train.evaluate import make_best_ranker

    data = synthetic_kg(n_entities=N_ENT, n_relations=5, n_train=500,
                        n_valid=50, n_test=64, seed=4)
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=rank,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model(name)(cfg)
    rng = np.random.default_rng(17)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    if "c" in params:
        params["c"] = jnp.abs(params["c"]) + 0.5
    pack = data.eval_pack("test", "rhs")
    q, f = jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx)

    exact = make_best_ranker(model, 64, backend="pallas")
    fast = make_best_ranker(model, 64, backend="pallas", precision="default")
    assert fast.precision == "default"
    np.testing.assert_array_equal(
        np.asarray(fast(params, q, f)), np.asarray(exact(params, q, f))
    )
