"""Export trained embeddings from a checkpoint as .npz (serving/downstream).

Beyond the reference (no export entry): writes every parameter table of the
best checkpoint — entity/relation embeddings, biases, curvatures — as plain
numpy arrays keyed by parameter name, plus the config for provenance.

    python -m complexhyperbolickge_tpu.cli.export --model_dir runs/fftroth \
        --out runs/fftroth/embeddings.npz
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

import jax

from complexhyperbolickge_tpu.cli.run import (
    apply_dtype_policy,
    build_model,
    load_dataset,
    setup_logging,
)
from complexhyperbolickge_tpu.train.checkpoint import load_checkpoint, load_config


def export(model_dir: str, out: str | None = None) -> str:
    setup_logging(model_dir)
    cfg = load_config(model_dir)["args"]
    args = argparse.Namespace(**cfg)
    apply_dtype_policy(args)
    dataset = load_dataset(args)
    model = build_model(args, dataset)
    expected = model.init(jax.random.PRNGKey(0))
    params = load_checkpoint(model_dir, expect_params=expected)["params"]

    out = out or os.path.join(model_dir, "embeddings.npz")
    flat = {}

    def add(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                add(f"{prefix}{k}." if prefix else f"{k}.", v)
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                add(f"{prefix}{i}.", v)
        else:
            flat[prefix.rstrip(".")] = np.asarray(tree)

    add("", params)
    np.savez(out, __config__=np.frombuffer(
        json.dumps(cfg).encode(), dtype=np.uint8), **flat)
    logging.info("exported %d arrays to %s", len(flat), out)
    return out


def main():
    p = argparse.ArgumentParser(description="Export checkpoint embeddings")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--out", default=None,
                   help="output .npz path (default <model_dir>/embeddings.npz)")
    a = p.parse_args()
    export(a.model_dir, a.out)


if __name__ == "__main__":
    main()
