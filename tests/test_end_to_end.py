"""End-to-end training integration tests on a synthetic KG (the reference's
--debug-slice pattern, SURVEY §4), covering each loss path, checkpoint/resume,
and the full CLI protocol."""

import numpy as np
import pytest

import jax

from complexhyperbolickge_tpu.data.dataset import epoch_batches, synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer


@pytest.fixture(scope="module")
def data():
    return synthetic_kg(n_entities=50, n_relations=4, n_train=400, n_valid=60,
                        n_test=60, seed=1)


def _train(data, model_name="FFTRotH", rank=5, epochs=3, **tcfg_kw):
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=rank,
                      multi_c=True, dtype="float32")
    model = get_model(model_name)(cfg)
    tcfg = TrainConfig(learning_rate=0.05, batch_size=64, **tcfg_kw)
    trainer = Trainer(model, tcfg, n_ent, n_rel)
    key = jax.random.PRNGKey(0)
    params, opt_state = trainer.init(key)
    ex = data.get_examples("train")
    labels = None
    if tcfg.neg_sample_size <= 0 and tcfg.loss == "binarycrossentropy":
        ex, labels = data.label_pack("train")
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(epochs):
        b, w, lb = epoch_batches(ex, tcfg.batch_size, rng, labels)
        key, ek = jax.random.split(key)
        params, opt_state, loss = trainer.run_epoch(params, opt_state, b, w, ek,
                                                    labels=lb)
        losses.append(loss)
    return model, trainer, params, opt_state, losses


def test_neg_sampling_training_descends(data):
    _, _, params, _, losses = _train(data, neg_sample_size=10)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    for p in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(p)).all()


def test_double_neg_training(data):
    _, _, _, _, losses = _train(data, neg_sample_size=10, double_neg=True)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_crossentropy_training_descends(data):
    _, _, _, _, losses = _train(data, neg_sample_size=0, loss="crossentropy",
                                smoothing=0.1)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_bce_training_descends(data):
    _, _, _, _, losses = _train(data, neg_sample_size=0,
                                loss="binarycrossentropy", smoothing=0.1)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_update_steps_accumulation(data):
    _, _, _, _, losses = _train(data, neg_sample_size=10, update_steps=3)
    assert np.isfinite(losses).all()


@pytest.mark.parametrize("name,rank", [
    ("RotH", 8), ("AttH", 8), ("RotE", 8), ("ComplEx", 8), ("RotatE", 8),
    ("TransE", 8), ("MurE", 8), ("RefE", 8), ("AttE", 8), ("CP", 8),
    ("Fourier", 8), ("RefH", 8), ("AttRH", 8), ("IsoH", 8), ("IFFTH", 6),
    ("RotLH", 8), ("HyboNet", 8), ("FFTRefH", 5), ("FFTAttH", 5),
    ("FFTIsoH", 6),
])
def test_every_model_trains_one_epoch(data, name, rank):
    _, _, _, _, losses = _train(data, model_name=name, rank=rank, epochs=1,
                                neg_sample_size=5)
    assert np.isfinite(losses).all()


def test_bfloat16_training_smoke(data):
    """bf16 params train finite (TPU-native precision option; ball eps table
    has a bf16 entry, ops/math.py)."""
    n_ent, n_rel, _ = data.get_shape()
    cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=5,
                      multi_c=True, dtype="bfloat16")
    model = get_model("FFTRotH")(cfg)
    tcfg = TrainConfig(learning_rate=0.05, batch_size=64, neg_sample_size=5)
    trainer = Trainer(model, tcfg, n_ent, n_rel)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    b, w, _ = epoch_batches(data.get_examples("train"), 64,
                            np.random.default_rng(0))
    params, _, loss = trainer.run_epoch(params, opt_state, b, w,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(loss)
    for p in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(p, dtype=np.float32)).all()


def test_checkpoint_roundtrip(tmp_path, data):
    model, trainer, params, opt_state, _ = _train(data, epochs=1,
                                                  neg_sample_size=5)
    save_checkpoint(str(tmp_path), params, opt_state, epoch=1, best_mrr=0.5,
                    config={"args": {"model": "FFTRotH"}})
    st = load_checkpoint(str(tmp_path))
    assert st["epoch"] == 1 and st["best_mrr"] == 0.5
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(st["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed state must be usable by the compiled epoch
    ex = data.get_examples("train")
    b, w, _ = epoch_batches(ex, 64, np.random.default_rng(0))
    trainer.run_epoch(st["params"], st["opt_state"], b, w, jax.random.PRNGKey(1))


def test_checkpoint_schema_mismatch_fails_at_load(tmp_path, data):
    """Resuming with a different model shape must fail at LOAD time with the
    offending parameter named, not deep inside the compiled epoch."""
    import pytest

    model, trainer, params, opt_state, _ = _train(data, epochs=1,
                                                  neg_sample_size=5)
    save_checkpoint(str(tmp_path), params, opt_state, epoch=1, best_mrr=0.5)

    n_ent, n_rel, _ = data.get_shape()
    other_cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=9,
                            multi_c=True, dtype="float32")
    other = get_model("FFTRotH")(other_cfg)
    other_params = other.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="entity"):
        load_checkpoint(str(tmp_path), expect_params=other_params)
    # matching shapes still load fine
    load_checkpoint(str(tmp_path), expect_params=params)


def test_cli_resume(tmp_path):
    """--resume restores epoch counter + full optimizer state and continues."""
    from complexhyperbolickge_tpu.cli.run import build_parser, train

    base = [
        "--dataset", "synthetic", "--model", "RotE", "--rank", "6",
        "--valid", "1", "--patience", "5", "--batch_size", "256",
        "--eval_batch_size", "128", "--neg_sample_size", "5",
        "--optimizer", "Adam", "--learning_rate", "0.01",
        "--dtype", "float32", "--save_dir", str(tmp_path),
    ]
    train(build_parser().parse_args(base + ["--max_epochs", "1"]))
    out = train(build_parser().parse_args(
        base + ["--max_epochs", "2", "--resume"]))
    assert 0.0 <= out["test"]["MRR"] <= 1.0


def test_cli_sigterm_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-training finishes the epoch, writes latest.pkl, exits 0;
    --resume continues from the interrupted epoch (cli/run.py signal path,
    previously only driven manually)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    # without this the axon sitecustomize registers the tunneled-TPU backend
    # and the subprocess trains over the tunnel instead of on CPU
    env.pop("PALLAS_AXON_POOL_IPS", None)
    base = [
        sys.executable, "-m", "complexhyperbolickge_tpu.cli.run",
        "--dataset", "synthetic", "--model", "RotE", "--rank", "6",
        "--valid", "1", "--patience", "50", "--batch_size", "256",
        "--eval_batch_size", "128", "--neg_sample_size", "5",
        "--optimizer", "Adam", "--learning_rate", "0.01",
        "--dtype", "float32", "--save_dir", str(tmp_path),
    ]
    log = tmp_path / "run.log"
    with open(log, "w") as lf:
        proc = subprocess.Popen(base + ["--max_epochs", "500"],
                                stdout=lf, stderr=subprocess.STDOUT, env=env)
        try:
            # wait until at least one epoch has trained, then signal
            deadline = time.time() + 300
            while time.time() < deadline:
                if proc.poll() is not None:
                    raise AssertionError(
                        f"training exited early rc={proc.returncode}:\n"
                        + log.read_text()
                    )
                if "average valid loss" in log.read_text():
                    break
                time.sleep(0.5)
            else:
                raise AssertionError("no epoch finished in 300s:\n"
                                     + log.read_text())
            proc.send_signal(signal.SIGTERM)
            rc = proc.wait(timeout=300)
        finally:
            if proc.poll() is None:
                proc.kill()
    text = log.read_text()
    assert rc == 0, text
    assert "Stopped by signal" in text, text
    assert (tmp_path / "latest.pkl").exists(), text

    stopped_epoch = load_checkpoint(str(tmp_path), filename="latest.pkl")["epoch"]
    out = subprocess.run(
        base + ["--max_epochs", str(stopped_epoch + 1), "--resume"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert f"Resumed from epoch {stopped_epoch}" in out.stdout, out.stdout


def test_cli_full_protocol(tmp_path):
    from complexhyperbolickge_tpu.cli.run import build_parser, train
    from complexhyperbolickge_tpu.cli.test import test as eval_cli

    args = build_parser().parse_args([
        "--dataset", "synthetic", "--model", "FFTRotH", "--rank", "5",
        "--max_epochs", "2", "--valid", "1", "--patience", "2",
        "--batch_size", "128", "--eval_batch_size", "64",
        "--neg_sample_size", "10", "--optimizer", "Adam",
        "--learning_rate", "0.01", "--bias", "learn", "--multi_c",
        "--dtype", "float32", "--save_dir", str(tmp_path),
    ])
    out = train(args)
    assert 0.0 <= out["test"]["MRR"] <= 1.0
    assert (tmp_path / "state.pkl").exists()
    assert (tmp_path / "config.json").exists()
    # the log file the reference also writes (minus its double logging)
    assert (tmp_path / "train.log").read_text().count("average train loss") >= 2
    metrics = eval_cli(str(tmp_path))
    np.testing.assert_allclose(metrics["MRR"], out["test"]["MRR"], rtol=1e-5)


def test_cli_gnn_full_protocol(tmp_path):
    """CLI end-to-end for a GNN model WITHOUT a mesh: nested params ('gnn'
    list of per-layer dicts) must survive checkpoint save (keystr schema),
    kge-test reload, and --resume.  Previously any CLI GNN run crashed at
    the first state.pkl write (_schema assumed a flat dict of arrays)."""
    from complexhyperbolickge_tpu.cli.run import build_parser, train
    from complexhyperbolickge_tpu.cli.test import test as eval_cli

    base = [
        "--dataset", "synthetic", "--synthetic_entities", "199",
        "--model", "CompGCN", "--rank", "8", "--hidden_dim", "8",
        "--layers", "1", "--edge_dropout", "0.0", "--dropout", "0.0",
        "--valid", "1", "--patience", "5", "--batch_size", "128",
        "--eval_batch_size", "64", "--neg_sample_size", "8",
        "--optimizer", "Adam", "--learning_rate", "0.01", "--bias", "learn",
        "--dtype", "float32", "--save_dir", str(tmp_path),
    ]
    out = train(build_parser().parse_args(base + ["--max_epochs", "1"]))
    assert 0.0 <= out["test"]["MRR"] <= 1.0
    assert (tmp_path / "state.pkl").exists()
    metrics = eval_cli(str(tmp_path))
    np.testing.assert_allclose(metrics["MRR"], out["test"]["MRR"], rtol=1e-5)
    # resume restores the nested pytree (schema validate + leafwise cast)
    out2 = train(build_parser().parse_args(
        base + ["--max_epochs", "2", "--resume"]))
    assert 0.0 <= out2["test"]["MRR"] <= 1.0

    # the serving entries must handle the nested GNN checkpoint too
    from complexhyperbolickge_tpu.cli.export import export
    from complexhyperbolickge_tpu.cli.predict import predict

    npz_path = export(str(tmp_path))
    arrs = np.load(npz_path)
    assert any(key.startswith("gnn.0.") for key in arrs.files), arrs.files
    preds = predict(str(tmp_path), [(0, 0), (3, 1)], k=5, filter_known=True)
    assert len(preds) == 2 and len(preds[0]["tails"]) == 5


def test_apply_dtype_policy_coerces_f64_on_tpu_only(monkeypatch):
    """kge-test/kge-predict reuse this policy: a config trained with
    --dtype double must coerce to float32 on TPU backends (native or
    tunneled — no f64 FFT there) but stay f64 on CPU/CUDA, which run f64
    natively."""
    import argparse

    from complexhyperbolickge_tpu.cli.run import apply_dtype_policy

    def fake(platform, kind):
        class D:
            pass

        D.platform, D.device_kind = platform, kind
        return D()

    # tunneled TPU: platform may be anything, device_kind names the TPU
    monkeypatch.setattr(jax, "devices", lambda: [fake("axon", "TPU v5 lite")])
    args = argparse.Namespace(dtype="double")
    apply_dtype_policy(args)
    assert args.dtype == "float32"
    # native TPU platform
    monkeypatch.setattr(jax, "devices", lambda: [fake("tpu", "TPU v4")])
    args = argparse.Namespace(dtype="double")
    apply_dtype_policy(args)
    assert args.dtype == "float32"
    # CUDA: f64 is native — keep it (x64 enabled instead)
    monkeypatch.setattr(jax, "devices", lambda: [fake("gpu", "NVIDIA A100")])
    args = argparse.Namespace(dtype="double")
    apply_dtype_policy(args)
    assert args.dtype == "double"
    # non-f64 dtypes pass through untouched
    args2 = argparse.Namespace(dtype="bfloat16")
    apply_dtype_policy(args2)
    assert args2.dtype == "bfloat16"


def test_checkpoint_cast_to_expected_dtype(tmp_path, data):
    """A CPU-trained f64 checkpoint must load (cast) against an f32 model
    when cast_to_expected=True — the eval/serving CLIs' path after the TPU
    dtype-policy coercion; shapes stay strict either way."""
    model, trainer, params, opt_state, _ = _train(data, epochs=1,
                                                  neg_sample_size=5)
    f64 = {k: np.asarray(v, dtype=np.float64) for k, v in params.items()}
    save_checkpoint(str(tmp_path), f64, None, epoch=1, best_mrr=0.1)
    import pytest

    with pytest.raises(ValueError, match="mismatch"):
        load_checkpoint(str(tmp_path), expect_params=params)
    st = load_checkpoint(str(tmp_path), expect_params=params,
                         cast_to_expected=True)
    for k, v in st["params"].items():
        assert np.result_type(v) == np.result_type(params[k]), k
    # shape mismatches still fail even with the cast
    bad = dict(params)
    bad["entity"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="entity"):
        load_checkpoint(str(tmp_path), expect_params=bad,
                        cast_to_expected=True)


def test_sweep_trial_script_end_to_end(tmp_path):
    """scripts/tune_fft.sh (the sweep layer, reference tuning_fft.sh) runs a
    real trial: flock-unique run dir, full CLI protocol, checkpoint +
    config.json landed.  Synthetic dataset + MAX_EPOCHS=2 keep it fast."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # pin CPU (sitecustomize gotcha)
    env["JAX_PLATFORMS"] = "cpu"
    env["SWEEP_DIR"] = str(tmp_path)
    env["MAX_EPOCHS"] = "2"
    r = subprocess.run(
        [os.path.join(repo, "scripts", "tune_fft.sh"),
         "FFTRotH", "synthetic", "N3", "0.0", "Adam", "5", "64", "4",
         "0.01", "0"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    base = tmp_path / "synthetic" / "FFTRotH"
    run_dirs = [p for p in base.iterdir() if p.is_dir()]  # skip .sweep.lock
    assert len(run_dirs) == 1
    assert (run_dirs[0] / "state.pkl").exists()
    assert (run_dirs[0] / "config.json").exists()
    # same-name second trial must acquire a DIFFERENT flock-unique dir
    r2 = subprocess.run(
        [os.path.join(repo, "scripts", "tune_fft.sh"),
         "FFTRotH", "synthetic", "N3", "0.0", "Adam", "5", "64", "4",
         "0.01", "0"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert len([p for p in base.iterdir() if p.is_dir()]) == 2
