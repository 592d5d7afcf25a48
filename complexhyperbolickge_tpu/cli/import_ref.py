"""Import a REFERENCE-implementation checkpoint into this framework.

The reference (run.py:237) saves `torch.save(model.cpu().state_dict(),
<save_dir>/model.pt)` next to a `config.json` of its argparse namespace
(run.py:179-180, including `sizes` from the dataset).  Every non-GNN
reference model stores its tables as nn.Embedding attributes whose names
match this framework's param_specs keys exactly (entity, rel, rel_diag, c,
bh, bt, context_vec, ... — the property the f64 parity suite injects
weights through, tests/test_model_parity.py::build_pair), so importing is a
pure rename: `params[name] = state_dict[f"{name}.weight"]`.

The result is written as a native checkpoint + config.json, so `kge-test`,
`kge-predict`, and `kge-export` work on reference-trained weights directly:

    kge-import --ref_dir /path/to/reference/run --out runs/imported \
               --data_path /path/to/KGEmb-data

GNN checkpoints (CompGCN / PoincareGCN / LorentzGCN) are refused loudly:
their state dicts nest conv-layer modules whose semantics the reference
cannot even execute in this image (torch_scatter absent) — import parity
could not be verified, so it is not offered.

Semantics caveat: models that use `givens_reflection` (RefE, RefH, AttE,
AttH, AttRH, FFTRefH, FFTAttH) score imported weights under THIS
framework's corrected involutive reflection — the reference's reflection
has a typo (utils/euclidean.py:73, documented divergence).  Rotation-only
and distance-only models import score-identically (f64 parity,
tests/test_import_ref.py).
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

GNN_MODELS = ("CompGCN", "PoincareGCN", "PoincareGAT", "LorentzGCN")


def import_reference(ref_dir: str, out: str, data_path: str | None = None,
                     eval_batch_size: int | None = None) -> dict:
    """Convert <ref_dir>/{config.json,model.pt} into a native checkpoint at
    `out`.  Returns the imported params dict (host numpy arrays — no device
    backend is touched, so import works on machines without accelerators)."""
    try:
        import torch
    except ImportError as e:  # torch ships in the [test] extra, not core
        raise ImportError(
            "kge-import reads torch checkpoints and needs torch on the "
            "importing machine: pip install torch (CPU build is enough)"
        ) from e

    from complexhyperbolickge_tpu.models import ModelConfig, get_model
    from complexhyperbolickge_tpu.train.checkpoint import save_checkpoint

    with open(os.path.join(ref_dir, "config.json")) as f:
        ref_cfg = json.load(f)
    model_name = ref_cfg["model"]
    if model_name in GNN_MODELS:
        raise ValueError(
            f"{model_name} is a GNN checkpoint; the reference GNN stack "
            "cannot execute here (torch_scatter), so import parity cannot "
            "be verified — retrain with kge-train instead"
        )
    sizes = ref_cfg["sizes"]
    dtype = {"float": "float32", "single": "float32",
             "double": "float64"}.get(ref_cfg.get("dtype", "double"),
                                      ref_cfg.get("dtype", "double"))
    cfg = ModelConfig(
        n_entities=sizes[0], n_relations=sizes[1], rank=ref_cfg["rank"],
        init_size=ref_cfg.get("init_size", 1e-3),
        bias=ref_cfg.get("bias", "learn"),
        gamma=ref_cfg.get("gamma", 0.0),
        multi_c=ref_cfg.get("multi_c", False),
        dtype=dtype,
        dropout=ref_cfg.get("dropout", 0.0),
    )
    model = get_model(model_name)(cfg)

    sd = torch.load(os.path.join(ref_dir, "model.pt"), map_location="cpu",
                    weights_only=True)
    params = {}
    for name, (shape, _) in model.param_specs().items():
        key = f"{name}.weight"
        if key not in sd:
            raise KeyError(
                f"reference state_dict has no '{key}' (keys: "
                f"{sorted(sd.keys())}) — checkpoint/model mismatch?"
            )
        # torch .numpy() aliases the tensor buffer; copy before use.  Stay in
        # NUMPY end to end: jnp.asarray would (a) silently truncate f64 to
        # f32 unless jax_enable_x64 is on — defeating double-checkpoint
        # parity — and (b) initialize the device backend (on this image, a
        # remote-TPU dial) just to convert arrays save_checkpoint converts
        # straight back to host anyway.
        w = np.array(sd[key].detach().to(torch.float64).numpy(), copy=True)
        if tuple(w.shape) != tuple(shape):
            raise ValueError(
                f"{model_name}.{name}: reference shape {tuple(w.shape)} != "
                f"expected {tuple(shape)}"
            )
        params[name] = np.asarray(w, dtype=cfg.dtype)
    unused = sorted(k for k in sd if k.split(".")[0] not in model.param_specs())
    if unused:
        logging.warning("ignored reference state entries: %s", unused)

    # a config our CLIs can rebuild from (argparse-compatible keys; the
    # reference's config already carries most of them verbatim)
    our_args = dict(ref_cfg)
    our_args["dtype"] = dtype
    if data_path:
        our_args["data_path"] = data_path
    else:
        our_args.setdefault("data_path", "data")
    if eval_batch_size:
        our_args["eval_batch_size"] = eval_batch_size
    our_args.setdefault("eval_batch_size", 1000)
    our_args.setdefault("debug", False)
    our_args["save_dir"] = out
    our_args["imported_from"] = os.path.abspath(ref_dir)

    os.makedirs(out, exist_ok=True)
    # save_checkpoint also writes config.json in the {"args": ...} shape
    # kge-test/kge-predict/kge-export read
    save_checkpoint(out, params, opt_state=None, epoch=0, best_mrr=None,
                    config={"args": our_args})
    logging.info("imported %s (%d tables, %s) -> %s", model_name,
                 len(params), dtype, out)
    return params


def main():
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    p = argparse.ArgumentParser(
        description="Import a reference-implementation checkpoint "
                    "(config.json + model.pt) as a native checkpoint",
    )
    p.add_argument("--ref_dir", required=True,
                   help="reference run dir containing config.json + model.pt")
    p.add_argument("--out", required=True, help="output model dir")
    p.add_argument("--data_path", default=None,
                   help="dataset root for later kge-test/kge-predict runs")
    p.add_argument("--eval_batch_size", default=None, type=int)
    import_reference(**vars(p.parse_args()))


if __name__ == "__main__":
    main()
