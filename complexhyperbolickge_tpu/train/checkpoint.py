"""Checkpointing: params + optimizer state + step + best-metric bookkeeping.

Strictly more capable than the reference, which only ever torch.saves the
best model state_dict (run.py:237) and cannot resume mid-training (SURVEY
§5.4): here the full training state round-trips, enabling exact resume.

Format: a pickle of numpy-ified pytrees plus a json config next to it —
host-portable, no framework version pinning.  A schema record (format
version + per-param shape/dtype) is validated at load time so a mismatched
resume (changed rank, different model) fails with a clear message instead
of a deep scan-time shape error.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def _to_host(tree):
    def host(x):
        # multi-host: a param row-sharded ACROSS hosts is not addressable by
        # np.asarray; allgather it (collective — every process must call)
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(host, tree)


def _schema(params):
    # metadata only — must NOT materialize device arrays (np.asarray would
    # copy whole entity tables to host per save/load just to read a dtype).
    # Flat dict-of-arrays keeps the original key format (existing checkpoints
    # validate unchanged); nested pytrees (GNN params carry a 'gnn' list of
    # per-layer dicts) key by jax keystr path.
    if isinstance(params, dict) and not any(
        isinstance(v, (dict, list, tuple)) for v in params.values()
    ):
        return {
            k: [list(np.shape(v)), str(np.result_type(v))]
            for k, v in params.items()
        }
    return {
        jax.tree_util.keystr(path): [list(np.shape(v)), str(np.result_type(v))]
        for path, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def _n_processes() -> int:
    """Process count WITHOUT initializing a device backend: outside a
    jax.distributed run this must be 1, and jax.process_count() would dial
    the platform backend just to say so — on the axon image that is a
    remote-TPU tunnel connection, which e.g. a host-only kge-import must
    never open (and which hangs outright when the tunnel is down)."""
    from jax._src import distributed

    return 1 if distributed.global_state.client is None else jax.process_count()


def save_checkpoint(path: str, params, opt_state=None, epoch: int = 0,
                    best_mrr: float | None = None, config: dict | None = None,
                    filename: str = "state.pkl", extra: dict | None = None):
    """filename='state.pkl' is the BEST-validation checkpoint (final reload +
    test.py); filename='latest.pkl' is the rolling resume point written at
    validation cadence and on SIGTERM, so interruption never clobbers the
    best weights."""
    os.makedirs(path, exist_ok=True)
    # _to_host may allgather (collective): every process builds the state,
    # but only process 0 touches the filesystem — concurrent writers to the
    # same save_dir would corrupt the .tmp/rename dance
    state = {
        "format_version": FORMAT_VERSION,
        "params": _to_host(params),
        "param_schema": _schema(params),
        "opt_state": None if opt_state is None else _to_host(opt_state),
        "epoch": epoch,
        "best_mrr": best_mrr,
    }
    if extra:
        state.update(extra)
    if config is not None:
        # the config rides INSIDE the checkpoint too: config.json is
        # rewritten at every launch, so it can describe a NEWER run than the
        # weights on disk — consumers needing weights-consistent provenance
        # (kge-export) read this copy
        state["config"] = {
            k: (dataclasses.asdict(v) if dataclasses.is_dataclass(v) else v)
            for k, v in config.items()
        }
    if _n_processes() == 1 or jax.process_index() == 0:
        tmp = os.path.join(path, filename + ".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, os.path.join(path, filename))
        if config is not None:
            cfg = {
                k: (dataclasses.asdict(v) if dataclasses.is_dataclass(v) else v)
                for k, v in config.items()
            }
            with open(os.path.join(path, "config.json"), "w") as f:
                json.dump(cfg, f, indent=2)
    if _n_processes() > 1:
        # barrier so no process reads the file (final reload / --resume)
        # before process 0's rename lands; save_dir must be a SHARED
        # filesystem under multi-host
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt:{filename}:{epoch}")


def load_checkpoint(path: str, device_put: bool = True,
                    expect_params=None, filename: str = "state.pkl",
                    cast_to_expected: bool = False):
    """Load a checkpoint file; validates the stored schema against itself
    and, when `expect_params` (a live params pytree) is given, against the
    caller's expected shapes/dtypes — failing fast with the offending
    parameter named.

    cast_to_expected=True relaxes the dtype check (shapes still strict) and
    casts loaded params to the expected dtypes: the eval/serving CLIs use it
    so a CPU-trained float64 checkpoint evaluates on TPU after the f32
    dtype-policy coercion instead of failing the schema check."""
    with open(os.path.join(path, filename), "rb") as f:
        state = pickle.load(f)
    ver = state.get("format_version", 0)
    if ver > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint at {path} has format_version={ver}, newer than this "
            f"code's {FORMAT_VERSION}"
        )
    schema = state.get("param_schema")
    if schema is not None:
        stored = _schema(state["params"])
        if stored != schema:
            raise ValueError(
                f"checkpoint at {path} is corrupt: stored params do not "
                f"match their recorded schema"
            )
    if expect_params is not None:
        want = _schema(expect_params)
        got = _schema(state["params"])
        if cast_to_expected:  # compare shapes only
            want = {k: v[0] for k, v in want.items()}
            got = {k: v[0] for k, v in got.items()}
        if want != got:
            diffs = [
                f"  {k}: checkpoint {got.get(k)} vs expected {want.get(k)}"
                for k in sorted(set(want) | set(got))
                if want.get(k) != got.get(k)
            ]
            raise ValueError(
                "checkpoint/model mismatch (wrong rank, model, or dtype?):\n"
                + "\n".join(diffs)
            )
        if cast_to_expected:
            # structures match (schema check above passed): cast leafwise
            leaves, treedef = jax.tree.flatten(state["params"])
            want_leaves = jax.tree.leaves(expect_params)
            state["params"] = jax.tree.unflatten(
                treedef,
                [np.asarray(v, dtype=np.result_type(e))
                 for v, e in zip(leaves, want_leaves)],
            )
    if device_put:
        state["params"] = jax.tree.map(jnp.asarray, state["params"])
        if state["opt_state"] is not None:
            state["opt_state"] = jax.tree.map(jnp.asarray, state["opt_state"])
    return state


def load_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)
