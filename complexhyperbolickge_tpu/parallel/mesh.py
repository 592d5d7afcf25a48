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
import jax.numpy as jnp
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
    # DCN granule = TPU slice when the platform reports one; otherwise the
    # PROCESS boundary (multi-process CPU/GPU: cross-process traffic is the
    # network, which the outer 'data' axis should absorb when the layout
    # allows it)
    has_slices = any(getattr(d, "slice_index", None) is not None
                     for d in devices)
    if has_slices:
        granules = {getattr(d, "slice_index", 0) for d in devices}
    else:
        granules = {d.process_index for d in devices}
    n_slices = len(granules)
    if n_slices > 1:
        # the hybrid layout needs equal-size granules, a data axis divisible
        # by the granule count, and each granule able to hold one
        # (data/n_slices, model) tile
        per = len(devices) // n_slices
        fits = (
            len(devices) % n_slices == 0
            and shape[0] % n_slices == 0
            and (shape[0] // n_slices) * shape[1] == per
        )
        if fits:
            dev_mesh = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(shape[0] // n_slices, shape[1]),
                dcn_mesh_shape=(n_slices, 1),
                devices=devices,
                process_is_granule=not has_slices,
            )
            return Mesh(dev_mesh, axis_names=("data", "model"))
        if has_slices:
            # real TPU slices: crossing the DCN boundary on the model axis
            # would put latency-sensitive collectives on the slow fabric —
            # make the user pick a compatible shape.  Must survive
            # `python -O` (no assert).
            raise ValueError(
                f"mesh {shape} cannot be laid out over {n_slices} TPU "
                f"slices of {per} devices: 'data' must be divisible by "
                f"{n_slices} and data/{n_slices} x model must equal {per} "
                "(the slice boundary maps onto the data axis)"
            )
        # process granules (multi-process CPU/GPU): cross-process links may
        # well be fast (single-node, one process per GPU) — fall back to a
        # flat mesh rather than forbid previously-legal layouts like an
        # 8-process 4x2 or a model axis spanning processes
        import logging

        logging.info(
            "mesh %s does not align with %d process granules; building a "
            "flat device mesh (cross-process traffic may land on 'model')",
            shape, n_slices,
        )
    dev_mesh = mesh_utils.create_device_mesh(
        shape, devices=np.asarray(devices)
    )
    return Mesh(dev_mesh, axis_names=("data", "model"))


def padded_rows(n: int, n_shards: int) -> int:
    """Rows after padding n up to a multiple of the model-axis size."""
    return -(-n // n_shards) * n_shards


def _is_entity_leaf(path) -> bool:
    """True when a tree path addresses an entity-table leaf: its innermost
    dict/attr name is one of _ENTITY_PARAMS.  Optimizer-moment trees mirror
    the params dict (optax states hold params-shaped dicts), so the name is
    always present; keying by NAME + shape (not shape alone) keeps a
    coincidentally row-matched leaf — e.g. a 64-row 'rel' table next to a
    63->64-padded entity table — from being padded or truncated."""
    name = None
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            name = k.key
        elif isinstance(k, jax.tree_util.GetAttrKey):
            name = k.name
    return name in _ENTITY_PARAMS


def pad_entity_tree(tree, n_entities: int, np_: int):
    """Zero-pad every entity-table leaf with leading dim n_entities to np_
    rows (leaves selected by name via _is_entity_leaf, then by shape).

    Real datasets have odd entity counts (WN18RR 40,943; FB237 14,541;
    YAGO3-10 123,182 = 2*61,591), while jax sharding requires the sharded
    dim divisible by the mesh axis — so the entity/bh/bt tables (and their
    optimizer moments, which mirror their shapes) are padded with zero rows.
    Zero pad rows are inert by construction: gathers/scatters only touch
    real ids (< n_entities), the N3/F2/L2 regularizers of a zero row are
    zero with zero gradient, and every score_all consumer masks columns
    >= n_entities (train/losses.py::mask helpers, train/evaluate.py,
    parallel/ranking.py) so pad entities never receive gradient — rows
    initialized zero stay zero under Adam/Adagrad/SGD."""
    if np_ == n_entities:
        return tree

    def f(path, x):
        if (_is_entity_leaf(path) and hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] == n_entities):
            widths = [(0, np_ - n_entities)] + [(0, 0)] * (x.ndim - 1)
            return (np.pad if isinstance(x, np.ndarray) else jnp.pad)(x, widths)
        return x

    return jax.tree_util.tree_map_with_path(f, tree)


def unpad_entity_tree(tree, n_entities: int, np_: int):
    """Inverse of pad_entity_tree: slice every np_-row ENTITY-TABLE leaf
    back to n_entities rows (checkpoints stay canonical/portable — test.py,
    export and single-chip eval all see reference shapes).  Leaves are
    selected by name (_is_entity_leaf) + shape: shape alone truncated any
    same-row-count bystander, e.g. a rel table of exactly padded_rows(n)
    rows would silently lose its last rows at every checkpoint write."""
    if np_ == n_entities:
        return tree

    def f(path, x):
        if (_is_entity_leaf(path) and hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] == np_):
            return x[:n_entities]
        return x

    return jax.tree_util.tree_map_with_path(f, tree)


def param_shardings(mesh: Mesh, params: dict) -> dict:
    """NamedSharding per param: entity-table rows on 'model', rest replicated.

    Entity params whose row count does not divide the model axis are
    replicated (callers that want row sharding pad first — shard_params)."""
    n_shards = mesh.shape["model"]
    out = {}
    for name, p in params.items():
        if name in _ENTITY_PARAMS and n_shards > 1 and p.shape[0] % n_shards == 0:
            out[name] = NamedSharding(mesh, P("model", *([None] * (p.ndim - 1))))
        else:
            out[name] = NamedSharding(mesh, P())
    return out


def shard_params(params: dict, mesh: Mesh, pad: bool = True) -> dict:
    """Commit params onto the mesh, entity tables row-sharded over 'model'.

    pad=True (default): entity tables whose row count does not divide the
    model axis are zero-padded to the next multiple (pad_entity_tree) so
    row sharding works at real dataset scales (odd entity counts).  This
    includes GNN models: the full-graph encoder masks pad rows out of its
    batch-norm statistics (models/gnn/models.py::encode node_w), so the
    one workload that NEEDS multi-chip HBM — an encoder table too big for
    one chip — actually row-shards at real entity counts.
    pad=False: such tables are replicated instead (kept as an escape hatch
    for exact unpadded-BN numerics; r03 shipped this as the forced GNN
    policy before the masked-stats path covered the mesh case)."""
    n_shards = mesh.shape["model"]
    if pad and n_shards > 1:
        n_ent = params["entity"].shape[0] if "entity" in params else 0
        if n_ent % n_shards != 0:
            keep = {k for k in _ENTITY_PARAMS if k in params}
            sub = {k: params[k] for k in keep}
            sub = pad_entity_tree(sub, n_ent, padded_rows(n_ent, n_shards))
            params = {**params, **sub}
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
