"""Device mesh + sharding layout.

The reference has no distributed story at all (SURVEY §2.2: single process,
single GPU; its only multi-device use is an implicit PCIe copy between two
CUDA devices).  The TPU-native design scales through ONE abstraction, a
`jax.sharding.Mesh` with two axes:

  * 'data'  — batch dimension of training batches (pure data parallelism;
    GSPMD inserts the gradient psum over ICI automatically).
  * 'model' — the entity dimension: the entity-embedding / bias tables are
    row-sharded, and at eval time the (B, n_entities) score matrix inherits
    the sharding so each chip scores its slice of candidates; the rank
    reduction becomes a psum of per-shard counts (the workload's analogue of
    sequence parallelism — SURVEY §5.7).

The same code runs on 1 chip (trivial mesh) and on a pod slice; shardings
propagate from committed inputs, so the Trainer/evaluator code is unchanged.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# rows of these params live on the entity axis and shard over 'model'
_ENTITY_PARAMS = ("entity", "bh", "bt")


def make_mesh(shape=None, devices=None) -> Mesh:
    """Mesh over all (or given) devices with axes ('data', 'model').

    Default shape: all devices on 'data', 1 on 'model' — the right layout
    for these dataset scales, where parameters fit per-chip and throughput
    comes from batch parallelism.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    dev_mesh = mesh_utils.create_device_mesh(shape, devices=np.asarray(devices))
    return Mesh(dev_mesh, axis_names=("data", "model"))


def param_shardings(mesh: Mesh, params: dict) -> dict:
    """NamedSharding per param: entity-table rows on 'model', rest replicated."""
    out = {}
    for name, p in params.items():
        if name in _ENTITY_PARAMS and mesh.shape["model"] > 1:
            out[name] = NamedSharding(mesh, P("model", *([None] * (p.ndim - 1))))
        else:
            out[name] = NamedSharding(mesh, P())
    return out


def shard_params(params: dict, mesh: Mesh) -> dict:
    sh = param_shardings(mesh, params)
    return {k: jax.device_put(v, sh[k]) for k, v in params.items()}


def shard_epoch_arrays(mesh: Mesh, batches, weights, labels=None):
    """Commit epoch arrays with the batch dim on 'data' (scan dim unsharded)."""
    bs = NamedSharding(mesh, P(None, "data"))
    ws = NamedSharding(mesh, P(None, "data"))
    out = (jax.device_put(batches, bs), jax.device_put(weights, ws))
    if labels is not None:
        out += (jax.device_put(labels, NamedSharding(mesh, P(None, "data", None))),)
    else:
        out += (None,)
    return out
