"""kge-import: reference torch checkpoints -> native checkpoints.

Builds real reference models (tests/reference_loader), saves their
state_dict + config.json exactly as reference run.py:179-180,237 does, runs
cli/import_ref.py, and asserts (a) f64 score parity between the reference
model and the imported params, and (b) the imported dir works end to end
through kge-test (rebuild + checkpoint load + filtered metrics).
"""

import json
import os

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

from complexhyperbolickge_tpu.cli.import_ref import import_reference
from complexhyperbolickge_tpu.models import ModelConfig, get_model

# (200 entities, 22 predicates) matches --dataset synthetic's shape, so
# kge-test can rebuild the imported model without real pickles
N_ENT, N_REL, B = 200, 22, 16


@pytest.fixture(autouse=True)
def patch_reflection(monkeypatch):
    """Reflection-family models (FFTRefH/FFTAttH/...) are compared under the
    CORRECTED involutive reflection (the reference's typo at
    utils/euclidean.py:73 is a documented divergence this framework fixes —
    imported reflection-model weights score under our fixed semantics)."""
    from tests.test_model_parity import fixed_givens_reflection

    for mod in (ref_hyp_mod, ref_chyp_mod, ref_euc_utils):
        if hasattr(mod, "givens_reflection"):
            monkeypatch.setattr(mod, "givens_reflection",
                                fixed_givens_reflection)
    yield


def _save_reference_run(tmp_path, name, rank, multi_c=True, bias="learn",
                        seed=0):
    """Reference run-dir layout: config.json (vars(args) incl. sizes,
    run.py:161-180) + model.pt (state_dict, run.py:237)."""
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
        ref_model.lift = True  # the working semantics (SURVEY §2.4.1)
    ref_model.eval()
    with torch.no_grad():
        for p in ref_model.parameters():
            p.uniform_(-0.5, 0.5)
        if hasattr(ref_model, "c"):
            ref_model.c.weight.uniform_(0.5, 1.5)

    ref_dir = tmp_path / "refrun"
    ref_dir.mkdir()
    cfg = dict(vars(args))
    cfg.update({
        "model": name, "sizes": list((N_ENT, N_REL, N_ENT)), "rank": rank,
        "multi_c": multi_c, "bias": bias, "dtype": "double",
        # keys our CLIs use downstream; synthetic lets kge-test run dataless
        "dataset": "synthetic", "synthetic_entities": N_ENT,
        "debug": False, "eval_batch_size": 64,
    })
    with open(ref_dir / "config.json", "w") as f:
        json.dump({k: v for k, v in cfg.items()
                   if isinstance(v, (int, float, str, bool, list, type(None)))},
                  f)
    torch.save(ref_model.cpu().state_dict(), ref_dir / "model.pt")
    return str(ref_dir), ref_model


@pytest.mark.parametrize("name,rank", [("FFTRotH", 9), ("RotH", 8),
                                       ("FFTAttH", 9), ("ComplEx", 8),
                                       ("TransE", 8), ("HyboNet", 8)])
def test_import_scores_match_reference(tmp_path, name, rank):
    ref_dir, ref_model = _save_reference_run(tmp_path, name, rank)
    out = str(tmp_path / "imported")
    params = import_reference(ref_dir, out)

    cfg = ModelConfig(n_entities=N_ENT, n_relations=N_REL, rank=rank,
                      multi_c=True, bias="learn", dtype="float64")
    ours = get_model(name)(cfg)
    rng = np.random.default_rng(1)
    q = np.stack([rng.integers(0, N_ENT, B), rng.integers(0, N_REL, B)], 1)
    t = rng.integers(0, N_ENT, (B, 1))

    our_scores = np.asarray(ours.score(
        {k: jnp.asarray(v, jnp.float64) for k, v in params.items()},
        jnp.asarray(q.astype(np.int32)), jnp.asarray(t.astype(np.int32)),
    ))
    tq = torch.from_numpy(np.concatenate([q, t], 1).astype(np.int64))
    with torch.no_grad():  # the parity suite's calling convention
        ref_scores, _ = ref_model(tq[:, :2].unsqueeze(1), tq[:, 2].unsqueeze(1))
    np.testing.assert_allclose(our_scores,
                               ref_scores.squeeze(-1).numpy().reshape(B, 1),
                               rtol=1e-8, atol=1e-10)


def test_imported_dir_runs_kge_test(tmp_path):
    ref_dir, _ = _save_reference_run(tmp_path, "FFTRotH", 9)
    out = str(tmp_path / "imported")
    import_reference(ref_dir, out)
    from complexhyperbolickge_tpu.cli.test import test as kge_test

    m = kge_test(out, split="test")
    assert 0.0 <= m["MRR"] <= 1.0 and np.isfinite(m["MR"])


def test_imported_checkpoint_warm_starts_training(tmp_path):
    """kge-train --resume on a kge-import output fine-tunes the reference
    weights: params from the checkpoint, fresh optimizer state (imported
    checkpoints carry none)."""
    ref_dir, _ = _save_reference_run(tmp_path, "FFTRotH", 9)
    out = str(tmp_path / "imported")
    imported = import_reference(ref_dir, out)

    from complexhyperbolickge_tpu.cli.run import build_parser, train

    args = build_parser().parse_args([
        "--model", "FFTRotH", "--dataset", "synthetic",
        "--synthetic_entities", str(N_ENT), "--rank", "9", "--multi_c",
        "--bias", "learn", "--dtype", "float64", "--max_epochs", "1",
        "--valid", "1", "--patience", "5", "--batch_size", "32",
        "--neg_sample_size", "4", "--learning_rate", "0.01",
        "--save_dir", out, "--resume",
    ])
    metrics = train(args)
    assert np.isfinite(metrics["test"]["MRR"])
    # training moved the weights — this was a warm start, not a no-op reload
    from complexhyperbolickge_tpu.train.checkpoint import load_checkpoint

    after = load_checkpoint(out)["params"]
    assert not np.allclose(np.asarray(after["entity"]),
                           np.asarray(imported["entity"]))


def test_imported_checkpoint_serves_over_http(tmp_path):
    """The full migration story: reference run dir -> kge-import ->
    kge-serve -> predictions over HTTP."""
    import threading
    import urllib.request

    ref_dir, _ = _save_reference_run(tmp_path, "FFTRotH", 9)
    out = str(tmp_path / "imported")
    import_reference(ref_dir, out)

    from complexhyperbolickge_tpu.cli.serve import PredictService, make_server

    service = PredictService(out, k=3, batch=4)
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/predict"
        req = urllib.request.Request(
            url, data=json.dumps({"queries": [[5, 1], [9, 3]]}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req) as r:
            got = json.loads(r.read())
        assert len(got) == 2 and all(len(g["tails"]) == 3 for g in got)
        assert all(np.isfinite(g["scores"]).all() for g in got)
    finally:
        srv.shutdown()


def test_import_refuses_gnn(tmp_path):
    ref_dir = tmp_path / "gnnrun"
    ref_dir.mkdir()
    with open(ref_dir / "config.json", "w") as f:
        json.dump({"model": "CompGCN", "sizes": [10, 4, 10], "rank": 8}, f)
    with pytest.raises(ValueError, match="GNN"):
        import_reference(str(ref_dir), str(tmp_path / "out"))


def test_import_rejects_mismatched_checkpoint(tmp_path):
    """A state_dict whose tables don't fit the config must fail loudly with
    the offending name, not silently import garbage."""
    ref_dir, _ = _save_reference_run(tmp_path, "FFTRotH", 9)
    # lie about the rank in config.json -> every table shape mismatches
    with open(os.path.join(ref_dir, "config.json")) as f:
        cfg = json.load(f)
    cfg["rank"] = 17
    with open(os.path.join(ref_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
    with pytest.raises((ValueError, KeyError)):
        import_reference(ref_dir, str(tmp_path / "out"))
