"""Checkpointing: params + optimizer state + step + best-metric bookkeeping.

Strictly more capable than the reference, which only ever torch.saves the
best model state_dict (run.py:237) and cannot resume mid-training (SURVEY
§5.4): here the full training state round-trips, enabling exact resume.

Format: a pickle of numpy-ified pytrees plus a json config next to it —
host-portable, no framework version pinning.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, opt_state=None, epoch: int = 0,
                    best_mrr: float | None = None, config: dict | None = None):
    os.makedirs(path, exist_ok=True)
    state = {
        "params": _to_host(params),
        "opt_state": None if opt_state is None else _to_host(opt_state),
        "epoch": epoch,
        "best_mrr": best_mrr,
    }
    tmp = os.path.join(path, "state.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, os.path.join(path, "state.pkl"))
    if config is not None:
        cfg = {
            k: (dataclasses.asdict(v) if dataclasses.is_dataclass(v) else v)
            for k, v in config.items()
        }
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2)


def load_checkpoint(path: str, device_put: bool = True):
    with open(os.path.join(path, "state.pkl"), "rb") as f:
        state = pickle.load(f)
    if device_put:
        state["params"] = jax.tree.map(jnp.asarray, state["params"])
        if state["opt_state"] is not None:
            state["opt_state"] = jax.tree.map(jnp.asarray, state["opt_state"])
    return state


def load_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)
