"""Host-side neighbor sampler producing fixed-shape padded subgraphs.

ctypes wrapper over native/libkgsampler.so (the C++ TPU-native replacement
for the reference's torch_geometric LinkNeighborLoader + make_subgraph
machinery, reference datasets/kg_dataset.py:172-250, utils/pyg_utils.py:
94-145).  Falls back to an equivalent pure-numpy implementation when the
shared library isn't built (`make -C native`).

Output contract per batch (everything static-shape for jit):
  node_ids    (max_nodes,)   int32 global ids, padded with 0 (mask via
                             node_count)
  edges       (max_edges, 3) int32 (local head, type, local tail), pad rows 0
  edge_weight (max_edges,)   float32 1 for real edges else 0
  train_mask  (max_edges,)   float32 1 if the edge is a train edge
  queries     (B, 3)         int32 seed triples in LOCAL ids
  n_nodes, n_edges, overflow ints
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess

import numpy as np

# Search order: env override (an explicit-but-missing path is an ERROR, not
# a silent fallthrough) -> repo-root native/ (source checkouts: `make -C
# native` rebuilds must win over any stale wheel-built copy `pip install .`
# left inside the package) -> package-local copy (installed wheels,
# setup.py::BuildWithSampler).
_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_ENV_LIB = os.environ.get("KGSAMPLER_LIB")
_LIB_CANDIDATES = [
    p
    for p in (
        _ENV_LIB,
        os.path.join(os.path.dirname(os.path.dirname(_PKG_DIR)),
                     "native", "libkgsampler.so"),
        os.path.join(_PKG_DIR, "libkgsampler.so"),
    )
    if p
]
_LIB_PATH = next((p for p in _LIB_CANDIDATES if os.path.exists(p)),
                 _LIB_CANDIDATES[0])

_I64P = ctypes.POINTER(ctypes.c_int64)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def _load_lib():
    # env-override validation happens HERE (first sampler use), not at module
    # import: a stale KGSAMPLER_LIB must not make the whole package
    # unimportable for code paths that never touch the sampler (export/
    # predict on a serving box).  It is still a hard error when reached.
    if _ENV_LIB and not os.path.exists(_ENV_LIB):
        raise FileNotFoundError(f"KGSAMPLER_LIB={_ENV_LIB} does not exist")
    if not os.path.exists(_LIB_PATH):
        src_dir = os.path.dirname(_LIB_PATH)
        if os.path.exists(os.path.join(src_dir, "Makefile")):
            try:
                subprocess.run(["make", "-C", src_dir], check=True,
                               capture_output=True)
            except Exception:
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.kgs_create.restype = ctypes.c_void_p
    lib.kgs_create.argtypes = [_I64P, _I64P, _I64P, _U8P, ctypes.c_int64,
                               ctypes.c_int64]
    lib.kgs_destroy.argtypes = [ctypes.c_void_p]
    lib.kgs_sample.restype = ctypes.c_int64
    lib.kgs_sample.argtypes = [
        ctypes.c_void_p, _I64P, ctypes.c_int64, _I64P, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
        _I64P, _I64P, _U8P, _I64P, _I64P, _I64P, _I64P,
    ]
    return lib


_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        _LIB = _load_lib() or False
    return _LIB or None


@dataclasses.dataclass
class Subgraph:
    node_ids: np.ndarray
    edges: np.ndarray
    edge_weight: np.ndarray
    train_mask: np.ndarray
    queries: np.ndarray
    n_nodes: int
    n_edges: int
    overflow: int
    # 1 per real seed query, 0 for rows padding the final partial batch of an
    # epoch up to batch_size (masked out of the loss by SubgraphTrainer)
    query_weight: np.ndarray | None = None


class NeighborSampler:
    """Samples padded subgraphs around seed-edge batches.

    Graph = train (+ optionally valid) triples WITH inverses, mirroring the
    reference's KGDataset3 graph construction (kg_dataset.py:136-170).
    """

    def __init__(self, dataset, fanouts=(20, 20), max_nodes: int = 4096,
                 max_edges: int = 32768, include_valid: bool = True,
                 force_numpy: bool = False):
        self.fanouts = np.asarray(fanouts, dtype=np.int64)
        self.max_nodes, self.max_edges = max_nodes, max_edges
        n_rel_half = dataset.n_predicates // 2

        def with_inverses(ex):
            inv = ex[:, [2, 1, 0]].copy()
            inv[:, 1] += n_rel_half
            return np.concatenate([ex, inv], axis=0)

        train = with_inverses(dataset.data["train"])
        parts, masks = [train], [np.ones(len(train), np.uint8)]
        if include_valid:
            valid = with_inverses(dataset.data["valid"])
            parts.append(valid)
            masks.append(np.zeros(len(valid), np.uint8))
        self.edges_global = np.concatenate(parts).astype(np.int64)
        self.edge_train_mask = np.concatenate(masks)
        self.n_train_edges = len(train)
        self.n_nodes_global = dataset.n_entities

        self._handle = None
        if not force_numpy:
            lib = _lib()
            if lib is not None:
                e = self.edges_global
                self._handle = lib.kgs_create(
                    e[:, 0].copy().ctypes.data_as(_I64P),
                    e[:, 2].copy().ctypes.data_as(_I64P),
                    e[:, 1].copy().ctypes.data_as(_I64P),
                    self.edge_train_mask.ctypes.data_as(_U8P),
                    len(e), self.n_nodes_global,
                )
        if self._handle is None:
            # numpy fallback: CSR over outgoing edges
            order = np.argsort(self.edges_global[:, 0], kind="stable")
            self._np_idx = order
            self._np_off = np.zeros(self.n_nodes_global + 1, np.int64)
            np.add.at(self._np_off, self.edges_global[:, 0] + 1, 1)
            self._np_off = np.cumsum(self._np_off)

    @property
    def backend(self) -> str:
        return "cpp" if self._handle is not None else "numpy"

    # ------------------------------ sampling --------------------------------

    def sample(self, seed_edge_ids: np.ndarray, seed: int = 0) -> Subgraph:
        seed_edge_ids = np.asarray(seed_edge_ids, dtype=np.int64)
        if self._handle is not None:
            return self._sample_cpp(seed_edge_ids, seed)
        return self._sample_numpy(seed_edge_ids, seed)

    def _sample_cpp(self, seeds, seed):
        lib = _lib()
        b = len(seeds)
        nodes = np.empty(self.max_nodes, np.int64)
        edges = np.empty(self.max_edges * 3, np.int64)
        tmask = np.empty(self.max_edges, np.uint8)
        queries = np.empty(b * 3, np.int64)
        nn = np.zeros(1, np.int64)
        ne = np.zeros(1, np.int64)
        ov = np.zeros(1, np.int64)
        rc = lib.kgs_sample(
            self._handle, seeds.ctypes.data_as(_I64P), b,
            self.fanouts.ctypes.data_as(_I64P), len(self.fanouts),
            self.max_nodes, self.max_edges, seed,
            nodes.ctypes.data_as(_I64P), edges.ctypes.data_as(_I64P),
            tmask.ctypes.data_as(_U8P), queries.ctypes.data_as(_I64P),
            nn.ctypes.data_as(_I64P), ne.ctypes.data_as(_I64P),
            ov.ctypes.data_as(_I64P),
        )
        if rc != 0:  # runtime error from the C++ sampler: must survive python -O
            raise RuntimeError(
                f"kgs_sample failed: rc={rc}"
                + (" (seed endpoints exceed max_nodes; raise max_nodes or lower "
                   "batch_size)" if rc == -2 else "")
            )
        return self._pack(nodes, edges.reshape(-1, 3), tmask,
                          queries.reshape(-1, 3), int(nn[0]), int(ne[0]),
                          int(ov[0]))

    def _sample_numpy(self, seeds, seed):
        rng = np.random.default_rng(seed)
        e = self.edges_global
        local: dict[int, int] = {}
        nodes: list[int] = []

        def add(u):
            if u in local:
                return local[u]
            if len(nodes) >= self.max_nodes:
                return -1
            local[u] = len(nodes)
            nodes.append(u)
            return local[u]

        frontier = []
        for eid in seeds:
            for u in (e[eid, 0], e[eid, 2]):
                if add(int(u)) >= 0:
                    frontier.append(int(u))
        for k in self.fanouts:
            nxt = []
            for u in frontier:
                lo, hi = self._np_off[u], self._np_off[u + 1]
                eids = self._np_idx[lo:hi]
                if len(eids) > k:
                    eids = rng.choice(eids, size=int(k), replace=False)
                for eid in eids:
                    v = int(e[eid, 2])
                    if v not in local:
                        if add(v) < 0:
                            break
                        nxt.append(v)
            frontier = nxt

        node_arr = np.asarray(nodes, np.int64)
        in_set = np.zeros(self.n_nodes_global, bool)
        in_set[node_arr] = True
        is_seed = np.zeros(len(e), bool)
        is_seed[seeds] = True
        emask = in_set[e[:, 0]] & in_set[e[:, 2]] & ~is_seed
        eids = np.nonzero(emask)[0]
        overflow = max(0, len(eids) - self.max_edges)
        if overflow:
            eids = rng.choice(eids, size=self.max_edges, replace=False)

        lut = np.full(self.n_nodes_global, -1, np.int64)
        lut[node_arr] = np.arange(len(node_arr))
        sub_edges = np.stack(
            [lut[e[eids, 0]], e[eids, 1], lut[e[eids, 2]]], axis=1
        )
        tmask = self.edge_train_mask[eids]
        queries = np.stack(
            [lut[e[seeds, 0]], e[seeds, 1], lut[e[seeds, 2]]], axis=1
        )
        if (queries[:, [0, 2]] < 0).any():
            raise RuntimeError(
                "seed endpoints exceed max_nodes; raise max_nodes or lower "
                "batch_size"
            )
        nodes_pad = np.full(self.max_nodes, -1, np.int64)
        nodes_pad[: len(node_arr)] = node_arr
        edges_pad = np.full((self.max_edges, 3), -1, np.int64)
        edges_pad[: len(sub_edges)] = sub_edges
        tmask_pad = np.zeros(self.max_edges, np.uint8)
        tmask_pad[: len(tmask)] = tmask
        return self._pack(nodes_pad, edges_pad, tmask_pad, queries,
                          len(node_arr), len(sub_edges), overflow)

    def _pack(self, nodes, edges, tmask, queries, n_nodes, n_edges, overflow):
        ew = (edges[:, 0] >= 0).astype(np.float32)
        return Subgraph(
            node_ids=np.maximum(nodes, 0).astype(np.int32),
            edges=np.maximum(edges, 0).astype(np.int32),
            edge_weight=ew,
            train_mask=tmask.astype(np.float32) * ew,
            queries=queries.astype(np.int32),
            n_nodes=n_nodes,
            n_edges=n_edges,
            overflow=overflow,
        )

    # ------------------------------ iteration --------------------------------

    def epoch(self, batch_size: int, rng: np.random.Generator, seed_base: int = 0):
        """Shuffled seed-edge batches over the TRAIN edges (the reference's
        LinkNeighborLoader(shuffle=True) over train_mask edges).

        The final partial batch is PADDED to batch_size by repeating its
        first seed, with the padded query rows masked via query_weight — the
        reference's loader yields the ragged tail batch; dropping it (as this
        method once did) silently skipped up to batch_size-1 train edges per
        epoch.

        `seed_base` is an epoch counter; per-batch sampling seeds are
        `seed_base * n_train_edges + batch_offset`, which is injective over
        (epoch, offset) since offsets are < n_train_edges.  (An additive
        `(epoch << K) + offset` scheme collided across epochs on graphs
        with more than 2^K edges and power-of-two batch sizes, repeating
        the neighbor-subsampling RNG stream epoch-to-epoch.)
        """
        order = rng.permutation(self.n_train_edges)
        for i in range(0, self.n_train_edges, batch_size):
            seeds = order[i : i + batch_size]
            n_real = len(seeds)
            if n_real < batch_size:
                seeds = np.concatenate(
                    [seeds, np.broadcast_to(seeds[:1], (batch_size - n_real,))]
                )
            sub = self.sample(seeds, seed=seed_base * self.n_train_edges + i)
            qw = np.ones(batch_size, np.float32)
            qw[n_real:] = 0.0
            sub.query_weight = qw
            yield sub

    def __del__(self):
        if getattr(self, "_handle", None):
            lib = _lib()
            if lib is not None:
                lib.kgs_destroy(self._handle)
