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

    Multi-slice (DCN): under multi-process JAX (`jax.distributed.initialize`
    called by the launcher; `jax.process_count() > 1`) the mesh is built with
    `create_hybrid_device_mesh` so the slice boundary lands on the OUTER
    'data' axis — the only cross-slice traffic is then the DP gradient psum,
    while 'model' (entity-sharded gathers + rank-count psums) stays on ICI.
    'data' must be divisible by the number of slices in that case.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices > 1:
        if shape[0] % n_slices != 0:
            # user-config validation: must survive `python -O` (no assert)
            raise ValueError(
                f"'data' axis {shape[0]} must be divisible by {n_slices} "
                "slices (the slice boundary maps onto the data axis)"
            )
        dev_mesh = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(shape[0] // n_slices, shape[1]),
            dcn_mesh_shape=(n_slices, 1),
            devices=devices,
        )
    else:
        dev_mesh = mesh_utils.create_device_mesh(
            shape, devices=np.asarray(devices)
        )
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


def _put(arr, sharding):
    """device_put in single-process; in multi-process JAX every host holds
    the full host array (the data layer is deterministic per epoch seed), so
    build the global array from each process's local slice."""
    if jax.process_count() > 1:
        a = np.asarray(arr)
        # every host passes the FULL array (global_shape == a.shape); jax
        # slices out each device's shard
        return jax.make_array_from_process_local_data(sharding, a, a.shape)
    return jax.device_put(arr, sharding)


def shard_epoch_arrays(mesh: Mesh, batches, weights, labels=None):
    """Commit epoch arrays with the batch dim on 'data' (scan dim unsharded)."""
    bs = NamedSharding(mesh, P(None, "data"))
    ws = NamedSharding(mesh, P(None, "data"))
    out = (_put(batches, bs), _put(weights, ws))
    if labels is not None:
        out += (_put(labels, NamedSharding(mesh, P(None, "data", None))),)
    else:
        out += (None,)
    return out
