"""utils package tests: MLP / MonotonicMLP behavior and profiling helpers."""

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.utils import MLP, MonotonicMLP, StepTimer


def test_mlp_shapes_and_nonlinearity():
    mlp = MLP(4, 8, 2, num_layers=3)
    p = mlp.init(jax.random.PRNGKey(0))
    x = jnp.ones((5, 4))
    y = mlp.apply(p, x)
    assert y.shape == (5, 2)
    # relu breaks odd symmetry (zero biases keep positive homogeneity, so
    # test f(-x) != -f(x) rather than scaling along a ray)
    y2 = mlp.apply(p, -x)
    assert not np.allclose(np.asarray(y2), -np.asarray(y))


def test_monotonic_mlp_is_monotone():
    m = MonotonicMLP(1, 1, 8)
    p = m.init(jax.random.PRNGKey(1))
    xs = jnp.linspace(-3, 3, 101)[:, None]
    ys = np.asarray(m.apply(p, xs))[:, 0]
    assert (np.diff(ys) >= -1e-6).all()


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t:
            sum(range(1000))
    assert t.rate(100.0) > 0
    assert t.mean_ms >= 0


def test_make_predictor_topk_matches_score_all():
    """Serving path: top-k ids/scores must equal argsort of score_all, and
    filter_idx must remove known tails from the candidates."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from complexhyperbolickge_tpu.models import ModelConfig, get_model
    from complexhyperbolickge_tpu.train.evaluate import make_predictor

    n_ent, n_rel, b, k = 40, 6, 5, 7
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=6,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("RotE")(cfg)
    rng = np.random.default_rng(0)
    params = {
        kk: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for kk, (shape, _) in model.param_specs().items()
    }
    q = jnp.asarray(np.stack([rng.integers(0, n_ent, b),
                              rng.integers(0, n_rel, b)], 1).astype(np.int32))

    ids, scores = make_predictor(model, k=k)(params, q)
    full = np.asarray(model.score_all(params, q))
    expect = np.argsort(-full, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(ids), expect)
    np.testing.assert_allclose(
        np.asarray(scores), np.take_along_axis(full, expect, 1), rtol=1e-6)

    # filtering: mask the unfiltered top-1 of each row -> it must disappear
    fidx = np.asarray(ids)[:, :1].astype(np.int32)
    ids2, _ = make_predictor(model, k=k)(params, q, jnp.asarray(fidx))
    assert all(fidx[i, 0] not in np.asarray(ids2)[i] for i in range(b))


def test_export_cli_roundtrip(tmp_path):
    """kge-export writes every checkpoint parameter as a named .npz array
    that matches the live params."""
    import json

    import numpy as np

    import jax

    from complexhyperbolickge_tpu.cli.export import export
    from complexhyperbolickge_tpu.cli.run import build_parser, train
    from complexhyperbolickge_tpu.train.checkpoint import load_checkpoint

    args = build_parser().parse_args([
        "--dataset", "synthetic", "--model", "FFTRotH", "--rank", "5",
        "--max_epochs", "1", "--valid", "1", "--batch_size", "128",
        "--eval_batch_size", "64", "--neg_sample_size", "5",
        "--optimizer", "Adam", "--learning_rate", "0.01", "--multi_c",
        "--dtype", "float32", "--save_dir", str(tmp_path),
    ])
    train(args)
    out = export(str(tmp_path))
    z = np.load(out)
    st = load_checkpoint(str(tmp_path))
    for k, v in st["params"].items():
        if not isinstance(v, (dict, list, tuple)):
            np.testing.assert_array_equal(z[k], np.asarray(v))
    cfg = json.loads(bytes(z["__config__"]).decode())
    assert cfg["model"] == "FFTRotH"

    # --out without an .npz suffix: np.savez appends it silently; the
    # returned/logged path must be the file that actually exists
    out2 = export(str(tmp_path), str(tmp_path / "emb_noext"))
    assert out2.endswith(".npz")
    import os

    assert os.path.exists(out2)


def test_sampler_env_lib_validation_deferred():
    """A stale KGSAMPLER_LIB must not make the package unimportable
    (export/predict on a serving box never touch the sampler); the hard
    error fires at first sampler use instead."""
    import subprocess
    import sys

    code = (
        "import complexhyperbolickge_tpu.data.sampler as S\n"
        "try:\n"
        "    S._load_lib()\n"
        "except FileNotFoundError as e:\n"
        "    assert 'KGSAMPLER_LIB' in str(e)\n"
        "    print('deferred-error-ok')\n"
    )
    env = dict(__import__("os").environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["KGSAMPLER_LIB"] = "/nonexistent/libkgsampler.so"
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "deferred-error-ok" in r.stdout


def test_filtered_rank_counts_matches_scatter_oracle():
    """The gather-subtract filtered counting must be EXACTLY the scatter
    protocol (set filtered entries to -1e6, count >= target) under the
    eval-pack contract (dedup'd rows, pad = n_entities) — including the
    degenerate regime target <= -1e6 where overwritten entries still count,
    and score matrices carrying -inf pad columns past n_entities."""
    from complexhyperbolickge_tpu.train.evaluate import filtered_rank_counts

    rng = np.random.default_rng(0)
    B, N, L = 17, 53, 9
    for pad_cols in (0, 3):
        for extreme in (False, True):
            scores = rng.normal(size=(B, N + pad_cols)).astype(np.float32)
            if extreme:
                scores -= 2e6  # every score (incl. targets) below -1e6
            if pad_cols:
                scores[:, N:] = -np.inf
            fidx = np.full((B, L), N, dtype=np.int32)
            for i in range(B):
                k = rng.integers(0, L + 1)
                fidx[i, :k] = rng.choice(N, size=k, replace=False)
            tgt_col = rng.integers(0, N, B).astype(np.int32)
            target = np.take_along_axis(scores, tgt_col[:, None], axis=1)

            masked = scores.copy()
            for i in range(B):
                for j in range(L):
                    if fidx[i, j] < N:
                        masked[i, fidx[i, j]] = -1e6
            want = (masked >= target).sum(axis=1)

            got = np.asarray(
                filtered_rank_counts(
                    jnp.asarray(scores), jnp.asarray(target),
                    jnp.asarray(fidx), N,
                )
            )
            np.testing.assert_array_equal(got, want)


def test_get_ranking_device_pack_cache_reuses_and_pins():
    """get_ranking must return identical ranks across repeat calls on the
    same pack (device arrays cached by pack identity) and across distinct
    pack objects with equal contents (fresh upload)."""
    from complexhyperbolickge_tpu.data.dataset import EvalPack
    from complexhyperbolickge_tpu.models import ModelConfig, get_model
    from complexhyperbolickge_tpu.train import evaluate
    from complexhyperbolickge_tpu.train.evaluate import get_ranking, make_ranker

    n_ent, n_rel, nq = 31, 4, 23
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=6,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("RotE")(cfg)
    rng = np.random.default_rng(1)
    params = {
        kk: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), dtype=jnp.float32)
        for kk, (shape, _) in model.param_specs().items()
    }
    qs = np.stack([rng.integers(0, n_ent, nq), rng.integers(0, n_rel, nq),
                   rng.integers(0, n_ent, nq)], 1).astype(np.int32)
    fs = np.full((nq, 5), n_ent, dtype=np.int32)
    for i in range(nq):
        fs[i, :3] = rng.choice(n_ent, size=3, replace=False)
    pack = EvalPack(queries=qs, filter_idx=fs)
    ranker = make_ranker(model, 8)

    r1 = get_ranking(model, params, pack, 8, rank_fn=ranker)
    key = (id(pack), 8)
    assert key in evaluate._DEVICE_PACKS
    assert evaluate._DEVICE_PACKS[key][0] is pack
    r2 = get_ranking(model, params, pack, 8, rank_fn=ranker)
    np.testing.assert_array_equal(r1, r2)

    pack2 = EvalPack(queries=qs.copy(), filter_idx=fs.copy())
    r3 = get_ranking(model, params, pack2, 8, rank_fn=ranker)
    np.testing.assert_array_equal(r1, r3)


# ------------------- eval matmul precision plumbing --------------------------


def test_eval_matmul_precision_context():
    from complexhyperbolickge_tpu.ops.math import (
        eval_matmul_precision,
        mm_precision,
    )

    assert mm_precision() == "highest"
    with eval_matmul_precision("default"):
        assert mm_precision() == "default"
        with eval_matmul_precision("highest"):  # nested no-op keeps default
            assert mm_precision() == "default"
        assert mm_precision() == "default"
    assert mm_precision() == "highest"


def test_dense_ranker_precision_default_matches_on_cpu():
    """precision='default' threads through the dense rankers (CPU DEFAULT ==
    HIGHEST numerically, so ranks are exactly equal — pins the plumbing; the
    bf16 deviation story is measured on-chip).  Covers the plain dense path
    and the GNN cached-encoder path."""
    from complexhyperbolickge_tpu.data.dataset import synthetic_kg
    from complexhyperbolickge_tpu.models import ModelConfig, get_model
    from complexhyperbolickge_tpu.train.evaluate import make_ranker

    data = synthetic_kg(n_entities=60, n_relations=4, n_train=256,
                        n_valid=32, n_test=32, seed=5)
    n_ent, n_rel, _ = data.get_shape()
    pack = data.eval_pack("test", "rhs")
    q, f = jnp.asarray(pack.queries), jnp.asarray(pack.filter_idx)

    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=5,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("FFTRotH")(cfg)
    rng = np.random.default_rng(2)
    params = {
        k: jnp.asarray(rng.uniform(-0.5, 0.5, size=shape), jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5
    exact_fn = make_ranker(model, 16)
    fast_fn = make_ranker(model, 16, precision="default")
    exact = np.asarray(exact_fn(params, q, f))
    fast = np.asarray(fast_fn(params, q, f))
    np.testing.assert_array_equal(exact, fast)

    # STRUCTURAL pin (CPU values can't distinguish): the lowered HLO of the
    # exact ranker carries operand_precision=HIGHEST on its score matmuls;
    # the 'default' trace must carry none
    hi = exact_fn.lower(params, q, f).as_text()
    lo = fast_fn.lower(params, q, f).as_text()
    assert "HIGHEST" in hi.upper()
    assert "HIGHEST" not in lo.upper()

    class _A:
        hidden_dim = 8
        layers = 1
        edge_dropout = 0.0
        dropout = 0.0
        opn = "mult"
        interaction = "distmult"
        basis = 0

    gnn = get_model("CompGCN")(cfg, _A, data)
    gp = gnn.init(jax.random.PRNGKey(3))
    exact = np.asarray(make_ranker(gnn, 16)(gp, q, f))
    fast = np.asarray(make_ranker(gnn, 16, precision="default")(gp, q, f))
    np.testing.assert_array_equal(exact, fast)


def test_user_config_validation_raises_valueerror():
    """User-facing config/input validation must be real exceptions (they'd be
    stripped under python -O if left as asserts — round-2 advisor pattern)."""
    import pytest

    from complexhyperbolickge_tpu.models import ModelConfig, get_model

    odd = ModelConfig(n_entities=20, n_relations=4, rank=33, bias="learn",
                      dtype="float32")
    with pytest.raises(ValueError, match="even rank"):
        get_model("FFTIsoH")(odd)
    with pytest.raises(ValueError, match="even embedding dimension"):
        get_model("ComplEx")(odd)
    with pytest.raises(ValueError, match="rank//2"):
        get_model("IFFTH")(ModelConfig(n_entities=20, n_relations=4, rank=4,
                                       bias="learn", dtype="float32"))

    from complexhyperbolickge_tpu.train.losses import neg_sampling_loss_pooled
    from complexhyperbolickge_tpu.train.trainer import TrainConfig
    from complexhyperbolickge_tpu.train.subgraph import SubgraphTrainer

    cfg = ModelConfig(n_entities=20, n_relations=4, rank=4, bias="learn",
                      dtype="float32")
    model = get_model("TransE")(cfg)
    with pytest.raises(ValueError, match="GNN-only"):
        SubgraphTrainer(model, TrainConfig(neg_sample_size=0), dataset=None)

    params = model.init(jax.random.PRNGKey(0))
    batch = jnp.zeros((4, 3), jnp.int32)
    w = jnp.ones((4,), jnp.float32)
    with pytest.raises(ValueError, match="neg_pool_size"):
        neg_sampling_loss_pooled(model, params, batch, w,
                                 jax.random.PRNGKey(0), n_entities=20, k=64,
                                 double_neg=False, n_rel=4, pool_size=32)


def test_validation_survives_python_dash_O():
    """The point of raising instead of asserting: run the validation under
    python -O (asserts stripped) in a subprocess and confirm it still fires."""
    import os
    import subprocess
    import sys

    code = (
        "from complexhyperbolickge_tpu.models import ModelConfig, get_model\n"
        "cfg = ModelConfig(n_entities=20, n_relations=4, rank=33,\n"
        "                  bias='learn', dtype='float32')\n"
        "try:\n"
        "    get_model('FFTIsoH')(cfg)\n"
        "except ValueError:\n"
        "    print('RAISED')\n"
        "else:\n"
        "    print('SILENT')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never dial the TPU tunnel
    out = subprocess.run([sys.executable, "-O", "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "RAISED", out.stdout + out.stderr


def test_benchmark_modules_are_import_safe():
    """Importing any benchmarks module must be side-effect-free: no jitted
    program built, no TPU dialed, no work executed (gnn_eval_bench and
    subgraph_bench once ran their whole measurement at import — a committed
    regression; keep the whole package guarded behind __main__).

    Runs in a FRESH subprocess so (a) every module is genuinely imported
    (not a no-op on a sys.modules hit from an earlier test) and (b) even
    transient device work that frees its arrays is caught: JAX_PLATFORMS
    names a nonexistent backend, so the LAZY backend init performed by any
    device work at import (jnp literal, device_put, jit dispatch) raises
    RuntimeError — verified live: `jnp.arange(8).sum()` under this env
    fails with \"Unable to initialize backend 'poisoned'\" while plain
    imports succeed."""
    import os
    import pathlib
    import subprocess
    import sys

    import benchmarks

    pkg_dir = pathlib.Path(benchmarks.__file__).parent
    mods = sorted(p.stem for p in pkg_dir.glob("*.py") if p.stem != "__init__")
    assert mods, pkg_dir
    code = (
        "import importlib\n"
        f"for name in {mods!r}:\n"
        "    importlib.import_module(f'benchmarks.{name}')\n"
        "print('IMPORTS_CLEAN')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="poisoned")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never dial the TPU tunnel
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300, env=env,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "IMPORTS_CLEAN", out.stdout + out.stderr


def test_iffth_rank_validation_and_bf16():
    """IFFTH: odd rank passes the n-even check but irfft returns rank-1
    dims (opaque trace-time broadcast crash) — rank must be even too.  And
    jnp.fft.rfft rejects bfloat16 (XLA FFT is f32/f64-only): the bf16 guard
    must round-trip through f32 like ops/fft.py's packed helpers."""
    import pytest

    from complexhyperbolickge_tpu.models import ModelConfig, get_model

    with pytest.raises(ValueError, match="rank"):
        # rank 7 -> n = 4 (even): slipped past the old check
        get_model("IFFTH")(ModelConfig(n_entities=20, n_relations=4, rank=7,
                                       bias="learn", dtype="float32"))

    cfg = ModelConfig(n_entities=20, n_relations=4, rank=6, bias="learn",
                      multi_c=True, dtype="bfloat16")
    m = get_model("IFFTH")(cfg)
    p = m.init(jax.random.PRNGKey(0))
    q = jnp.asarray([[1, 2, 3], [4, 1, 0]], dtype=jnp.int32)
    s = m.score_all(p, q[:, :2])
    assert s.shape == (2, 20)
    assert np.isfinite(np.asarray(s, dtype=np.float32)).all()
