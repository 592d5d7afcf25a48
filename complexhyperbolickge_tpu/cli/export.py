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

from complexhyperbolickge_tpu.cli.run import setup_logging
from complexhyperbolickge_tpu.train.checkpoint import load_checkpoint, load_config


def export(model_dir: str, out: str | None = None) -> str:
    setup_logging(model_dir, to_file=False)
    # dataset-independent on purpose (serving boxes don't carry the training
    # data): the checkpoint self-validates against its stored param_schema
    # inside load_checkpoint, which is all an export needs
    st = load_checkpoint(model_dir, device_put=False)
    params = st["params"]
    # provenance: prefer the config stored INSIDE the checkpoint (always
    # consistent with the weights); config.json may describe a newer
    # relaunch whose first checkpoint never landed
    if st.get("config"):
        cfg = st["config"]["args"]
    else:
        cfg = load_config(model_dir)["args"]
        logging.warning(
            "checkpoint carries no embedded config (older format); using "
            "config.json — it may postdate these weights"
        )

    out = out or os.path.join(model_dir, "embeddings.npz")
    if not out.endswith(".npz"):
        # np.savez silently appends '.npz'; normalize up front so the
        # logged/returned path is the file that actually exists
        out += ".npz"
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
