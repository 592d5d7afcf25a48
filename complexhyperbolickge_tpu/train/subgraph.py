"""Subgraph training mode for GNN models.

Counterpart of the reference KGOptimizerSubgraph (optimizers/
kg_optimizer.py:319-431): per batch, a host-side neighbor sampler (C++ or
numpy, data/sampler.py — replacing PyG's LinkNeighborLoader) yields a
FIXED-SHAPE padded subgraph; the compiled step encodes it (train-mask edges
only, kg_optimizer.py:386-387), scores the seed queries against the
subgraph's nodes, and applies CE or label-smoothed BCE over those nodes.

Divergences (documented):
  * the reference indexes head biases with LOCAL node ids (gnnbase.py:106 ->
    base.py via queries[..., 0] after relabeling) — a bug; we use the global
    head ids for both biases.
  * subgraphs are capped at (max_nodes, max_edges) with uniform subsampling
    of overflow so shapes stay static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from complexhyperbolickge_tpu.data.sampler import NeighborSampler, Subgraph
from complexhyperbolickge_tpu.train.trainer import TrainConfig, make_optimizer


def build_subgraph_labels(sub: Subgraph, max_nodes: int) -> np.ndarray:
    """Multi-hot (B, max_nodes) labels: true local tails of each query among
    the subgraph's TRAIN edges, plus the query's own tail (the reference's
    make_labels with queries appended, kg_dataset.py:182-227).

    Vectorized group-by over (head, rel) keys — the label_pack
    sort+searchsorted pattern (data/dataset.py) — instead of a per-edge
    Python dict loop: the label build must not serialize the device step
    (this runs on the producer thread of the double-buffered epoch)."""
    b = len(sub.queries)
    # uint8: the (B, max_nodes) matrix is per-step host->device traffic;
    # the loss casts on device (train/subgraph.py::SubgraphTrainer._loss)
    labels = np.zeros((b, max_nodes), dtype=np.uint8)
    q = np.asarray(sub.queries)
    labels[np.arange(b), q[:, 2]] = 1.0
    tmask = sub.train_mask[: sub.n_edges] > 0
    e = sub.edges[: sub.n_edges][tmask]
    if len(e) == 0:
        return labels
    # (h, r) -> scalar key; multiplier covers both edge and query rel ids
    mult = int(max(e[:, 1].max(), q[:, 1].max())) + 1
    ekey = e[:, 0].astype(np.int64) * mult + e[:, 1]
    qkey = q[:, 0].astype(np.int64) * mult + q[:, 1]
    order = np.argsort(ekey, kind="stable")
    ekey_s = ekey[order]
    tails_s = e[order, 2]
    lo = np.searchsorted(ekey_s, qkey, side="left")
    hi = np.searchsorted(ekey_s, qkey, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total:
        rows = np.repeat(np.arange(b), counts)
        # concatenated [lo_i, hi_i) ranges without a Python loop
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        idx = np.repeat(lo, counts) + offs
        labels[rows, tails_s[idx]] = 1.0
    return labels


class SubgraphTrainer:
    """Sampler-driven training loop for GNNModel instances.

    mesh (optional): a parallel.mesh two-axis Mesh.  The per-step QUERY-dim
    arrays (queries, gqueries, labels, qw) are committed sharded over
    'data' — GSPMD splits the (B, max_nodes) decode/loss across the data
    axis and inserts the gradient psum — while the subgraph structure
    arrays (node_ids, edges, masks) stay replicated: one subgraph per step,
    exactly the single-device math.  The ENTITY tables may simultaneously
    be row-sharded over 'model' (parallel/mesh.py::shard_params): the
    encoder's node_ids row gathers become GSPMD collectives, so the one
    workload subgraph mode exists for — an entity table too big for one
    chip's HBM — actually scales across chips.  The producer thread is
    unchanged (it builds per-step GLOBAL arrays; sharding happens at
    device_put in the consumer)."""

    def __init__(self, model, cfg: TrainConfig, dataset, fanouts=(20, 20),
                 max_nodes: int = 4096, max_edges: int = 32768, mesh=None):
        # user-config validation: must survive python -O
        if not getattr(model, "is_gnn", False):
            raise ValueError("subgraph mode is GNN-only")
        if cfg.neg_sample_size > 0:
            raise ValueError(
                "subgraph mode uses CE/BCE over subgraph nodes "
                "(reference kg_optimizer.py:373-396); set neg_sample_size 0"
            )
        self.mesh = mesh
        self._shardings = None
        self._sync_per_step = False
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if cfg.batch_size % mesh.shape["data"] != 0:
                raise ValueError(
                    f"subgraph batch_size {cfg.batch_size} must divide by "
                    f"the mesh 'data' axis {mesh.shape['data']}"
                )
            rep = NamedSharding(mesh, P())
            dp = lambda nd: NamedSharding(mesh, P("data", *([None] * (nd - 1))))
            # one sharding per _step arg after (params, opt_state):
            # node_ids, edges, edge_w, train_mask, node_w replicated;
            # queries/gqueries (B,3), labels (B,*), qw (B,) on 'data'
            self._shardings = (rep, rep, rep, rep, rep,
                               dp(2), dp(2), dp(2), rep, dp(1))
            # XLA's CPU in-process collectives deadlock when >1 collective
            # program is in flight: each virtual device's all-reduce thunk
            # parks a thread-pool thread in a rendezvous, and concurrently
            # dispatched steps starve it ("Expected N threads to join, but
            # only N-1 arrived" -> SIGABRT).  The full-graph Trainer never
            # hits this (one lax.scan = one program per epoch); subgraph
            # mode dispatches one program per sampled step, so on CPU
            # meshes we block on each step's loss before dispatching the
            # next.  Real TPU runtimes order per-core program execution by
            # dispatch order, so async pipelining stays on for TPU.
            self._sync_per_step = all(
                d.platform == "cpu" for d in mesh.devices.flat
            )
        self.model = model
        self.cfg = cfg
        self.sampler = NeighborSampler(dataset, fanouts=fanouts,
                                       max_nodes=max_nodes, max_edges=max_edges)
        self.max_nodes = max_nodes
        from complexhyperbolickge_tpu.train.regularizers import get_regularizer
        from complexhyperbolickge_tpu.train.trainer import _f32_state_for_bf16

        # same bf16-safe optimizer-state wrapper as the full-graph Trainer
        self.tx = _f32_state_for_bf16(
            make_optimizer(cfg.optimizer, cfg.learning_rate)
        )
        self.reg_fn = get_regularizer(cfg.regularizer)
        self._step = self._build_step()
        # gradient accumulation (reference kg_optimizer.py:347-356: grads
        # SUM over k batches, optimizer steps every k-th and at epoch end)
        self._k_acc = max(1, cfg.update_steps)
        if self._k_acc > 1:
            self._grad_step, self._apply_acc = self._build_acc_steps()

    def init(self, key):
        params = self.model.init(key)
        return params, self.tx.init(params)

    # ------------------------------- compiled -------------------------------

    def _loss(self, params, node_ids, edges, edge_w, train_mask, node_w,
              queries, gqueries, labels, n_nodes, qw, key):
        model, cfg = self.model, self.cfg
        cache = model.encode_subgraph(
            params, node_ids, edges, edge_w * train_mask, node_w,
            key=key, training=True,
        )
        x, _ = cache
        lhs, _ = model.get_queries(params, queries[:, :2], cache)
        s = model.sim(lhs, x, all_pairs=True)  # (B, max_nodes)
        if model.cfg.bias == "learn":
            s = params["bh"][gqueries[:, 0]] + params["bt"][node_ids][None, :, 0] + s
        elif model.cfg.bias == "constant":
            s = s + model.cfg.gamma
        s = jnp.where(node_w[None, :] > 0, s, -1e9)

        if cfg.loss == "crossentropy":
            logp = jax.nn.log_softmax(s, axis=-1)
            nll = -jnp.take_along_axis(logp, queries[:, 2:3], axis=1)[:, 0]
            eps = cfg.smoothing or 0.0
            if eps:
                # smoothing mass over REAL subgraph nodes only (padded
                # columns carry -logp ~ 1e9 and must stay out of the mean)
                smooth = jnp.sum(-logp * node_w[None, :], axis=-1) / n_nodes
                nll = (1 - eps) * nll + eps * smooth
            loss = jnp.sum(qw * nll) / jnp.sum(qw)
        else:  # binarycrossentropy over subgraph nodes
            # labels travel host->device as uint8 (4x less per-step transfer
            # than f32 at (B, max_nodes)); cast on device
            y = labels.astype(s.dtype)
            eps = cfg.smoothing or 0.0
            if eps:
                y = (1 - eps) * y + eps / n_nodes
            # logsig(-x) = logsig(x) - x: one softplus pass over the
            # (B, max_nodes) matrix instead of two (train/losses.py::bce_loss)
            ls = jax.nn.log_sigmoid(s)
            log_p = jnp.maximum(ls, -100.0)
            log_1mp = jnp.maximum(ls - s, -100.0)
            per = -(y * log_p + (1 - y) * log_1mp) * node_w[None, :]
            loss = jnp.sum(per * qw[:, None]) / (jnp.sum(qw) * n_nodes)

        if not cfg.reg:
            # reg weight 0 (every published config): skip the regularizer
            # graph entirely (same rationale as Trainer._loss — XLA cannot
            # fold x*0.0 away under NaN semantics)
            return loss
        factors = self.model.get_factors(params)
        loss = loss + self.reg_fn(factors, cfg.reg, factors[0].shape[0])
        return loss

    def _build_step(self):
        grad_fn = jax.value_and_grad(self._loss)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, node_ids, edges, edge_w, train_mask,
                 node_w, queries, gqueries, labels, n_nodes, qw, key):
            loss, grads = grad_fn(params, node_ids, edges, edge_w, train_mask,
                                  node_w, queries, gqueries, labels, n_nodes,
                                  qw, key)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def _build_acc_steps(self):
        """update_steps > 1: the fused step above would apply the optimizer
        every batch, silently dropping the user's accumulation request.
        Split into a grad-accumulate step and an apply step the host loop
        triggers every k-th batch / at epoch end (the batch count is not
        known up front — the sampler is a stream — so the final partial
        window applies when the queue drains, matching the reference's
        `counter + 1 == len(self.loader)` branch)."""
        grad_fn = jax.value_and_grad(self._loss)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def grad_step(params, acc, node_ids, edges, edge_w, train_mask,
                      node_w, queries, gqueries, labels, n_nodes, qw, key):
            loss, grads = grad_fn(params, node_ids, edges, edge_w, train_mask,
                                  node_w, queries, gqueries, labels, n_nodes,
                                  qw, key)
            return jax.tree.map(jnp.add, acc, grads), loss

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def apply_acc(params, opt_state, acc):
            updates, opt_state = self.tx.update(acc, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, jax.tree.map(jnp.zeros_like, acc)

        return grad_step, apply_acc

    # --------------------------------- epoch ---------------------------------

    def _prep_host(self, sub: Subgraph):
        """ALL host-side numpy prep for one batch (runs on the producer
        thread; the consumer only does device transfers + dispatch)."""
        node_w = (np.arange(self.max_nodes) < sub.n_nodes).astype(np.float32)
        labels = (
            build_subgraph_labels(sub, self.max_nodes)
            if self.cfg.loss == "binarycrossentropy" else
            np.zeros((len(sub.queries), 1), np.float32)
        )
        gq = np.stack(
            [sub.node_ids[sub.queries[:, 0]], sub.queries[:, 1],
             sub.node_ids[sub.queries[:, 2]]], axis=1,
        )
        qw = (
            sub.query_weight
            if sub.query_weight is not None
            else np.ones(len(sub.queries), np.float32)
        )
        return (sub.node_ids, sub.edges, sub.edge_weight, sub.train_mask,
                node_w, sub.queries, gq, labels,
                np.float32(sub.n_nodes), qw)

    def run_epoch(self, params, opt_state, batch_size: int,
                  rng: np.random.Generator, key, epoch_id: int = 0):
        """Double-buffered epoch: a background producer thread runs the
        neighbor sampler + label build (pure numpy) into a 2-deep queue
        while the consumer dispatches compiled steps — the sampler no longer
        serializes the device (the reference gets the same overlap from its
        LinkNeighborLoader num_workers=4, kg_optimizer.py:330).  Per-step
        losses stay ON DEVICE (a float() sync per step would re-serialize
        the pipeline); one sum materializes at epoch end."""
        import queue as _queue
        import threading

        q: _queue.Queue = _queue.Queue(maxsize=2)
        stop = threading.Event()

        def _put(item) -> bool:
            """Bounded put that aborts when the consumer has bailed —
            otherwise a consumer exception (compiled-step error, debug_nans,
            KeyboardInterrupt) would leave the producer blocked on a full
            queue forever, leaking the thread and its prepped batches."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except _queue.Full:
                    continue
            return False

        def produce():
            try:
                for sub in self.sampler.epoch(batch_size, rng,
                                              seed_base=epoch_id):
                    if not _put(self._prep_host(sub)):
                        return
                _put(None)
            except BaseException as e:  # surface sampler errors in-order
                _put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        losses = []
        acc = (jax.tree.map(jnp.zeros_like, params)
               if self._k_acc > 1 else None)
        n_pending = 0
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                (node_ids, edges, edge_w, train_mask, node_w, queries, gq,
                 labels, n_nodes, qw) = item
                key, sk = jax.random.split(key)
                arrs = (node_ids, edges, edge_w, train_mask, node_w,
                        queries, gq, labels)
                if self._shardings is None:
                    args = tuple(jnp.asarray(a) for a in arrs) + (
                        jnp.float32(n_nodes), jnp.asarray(qw), sk)
                else:
                    sh = self._shardings
                    args = tuple(
                        jax.device_put(np.asarray(a), s)
                        for a, s in zip(arrs, sh[:8])
                    ) + (
                        jax.device_put(np.float32(n_nodes), sh[8]),
                        jax.device_put(np.asarray(qw), sh[9]), sk,
                    )
                if self._k_acc == 1:
                    params, opt_state, loss = self._step(
                        params, opt_state, *args)
                else:
                    acc, loss = self._grad_step(params, acc, *args)
                    n_pending += 1
                    if n_pending == self._k_acc:
                        params, opt_state, acc = self._apply_acc(
                            params, opt_state, acc)
                        n_pending = 0
                if self._sync_per_step:
                    # the loss buffer can be ready before the grad
                    # all-reduces retire — block on the WHOLE step output
                    jax.block_until_ready((params, opt_state, acc, loss))
                losses.append(loss)
            if n_pending:  # epoch-end flush of a partial window
                params, opt_state, acc = self._apply_acc(
                    params, opt_state, acc)
        finally:
            stop.set()
            t.join()
        if not losses:
            return params, opt_state, 0.0
        # single host sync for the whole epoch
        total = float(np.asarray(jnp.sum(jnp.stack(losses))))
        return params, opt_state, total / len(losses)
