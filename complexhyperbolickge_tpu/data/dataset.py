"""KG dataset container and TPU-ready packing.

Replaces the reference's KGDataset (datasets/kg_dataset.py:18-73) and the
label-matrix machinery of KGDataset2 (:75-130) with static-shape, device-
friendly structures:

  * triples: one int32 [N, 3] array per split; the train split is augmented
    with inverse triples (swap head/tail, rel += n_relations/2 — reference
    kg_dataset.py:54-60).
  * eval packs: per direction, queries [n, 3] plus a PADDED dense filter
    index array [n, Lmax] (pad value = n_entities, dropped by the masking
    scatter) — replacing the reference's per-query Python dict loop
    (models/base.py:264-268) with one vectorized scatter under jit.
  * BCE label packs: padded true-tail index lists per (head, rel) query
    (reference KGDataset2 builds scipy CSR matrices, kg_dataset.py:108-119;
    padded indices keep shapes static and turn label construction into a
    scatter inside the compiled step).
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import numpy as np

_SPLITS = ("train", "valid", "test")


@dataclasses.dataclass
class EvalPack:
    """Static-shape filtered-ranking inputs for one direction of one split."""

    queries: np.ndarray  # int32 [n, 3] (head, rel, gold-tail)
    filter_idx: np.ndarray  # int32 [n, Lmax] true-entity ids, padded n_entities


def dedup_filter_rows(fidx: np.ndarray, n_entities: int) -> np.ndarray:
    """Replace repeat occurrences within each filter row by the pad id.

    eval_pack rows are deduplicated by construction; synthetic packs (tests,
    benchmarks) must honor the same contract — the count-subtracting rankers
    (filtered_rank_counts, the maskless Pallas forms) subtract once per
    entry, so a duplicated id would be excluded twice.

    Vectorized (sort each row, flag values equal to their left neighbor, map
    the flags back through the sort permutation): the Python set-per-element
    form cost seconds at benchmark scale (20k x 64 rows)."""
    order = np.argsort(fidx, axis=1, kind="stable")
    s = np.take_along_axis(fidx, order, axis=1)
    dup_sorted = np.zeros_like(s, dtype=bool)
    dup_sorted[:, 1:] = s[:, 1:] == s[:, :-1]  # stable: first occurrence kept
    dup = np.zeros_like(dup_sorted)
    np.put_along_axis(dup, order, dup_sorted, axis=1)
    return np.where(dup, n_entities, fidx).astype(fidx.dtype, copy=False)


class KGData:
    """Loads reference-format pickles or takes in-memory split arrays."""

    def __init__(self, data_path: str | None = None, debug: bool = False,
                 splits: dict | None = None, filters: dict | None = None):
        self.debug = debug
        if splits is None:
            assert data_path is not None
            splits = {}
            for s in _SPLITS:
                with open(os.path.join(data_path, s + ".pickle"), "rb") as f:
                    splits[s] = pickle.load(f)
            with open(os.path.join(data_path, "to_skip.pickle"), "rb") as f:
                filters = pickle.load(f)
        self.data = {s: np.asarray(v, dtype=np.int64) for s, v in splits.items()}
        self.to_skip = filters
        self._label_cache: dict = {}
        self._eval_cache: dict = {}
        mx = np.max(self.data["train"], axis=0)
        self.n_entities = int(max(mx[0], mx[2]) + 1)
        # doubled relation count (with inverses), reference kg_dataset.py:39-41
        self.n_predicates = int(mx[1] + 1) * 2
        if filters is None:
            from complexhyperbolickge_tpu.data.preprocess import build_filters

            all_ex = np.concatenate([self.data[s] for s in _SPLITS], axis=0)
            lhs, rhs = build_filters(all_ex, self.n_predicates // 2)
            self.to_skip = {"lhs": lhs, "rhs": rhs}

    # ------------------------------- protocol --------------------------------

    def get_examples(self, split: str, rel_idx: int = -1) -> np.ndarray:
        """Split triples; train is augmented with inverse triples.

        Reference: kg_dataset.py:43-65 (incl. rel_idx filtering and the
        debug truncation to 1000 examples).
        """
        ex = self.data[split]
        if split == "train":
            inv = ex[:, [2, 1, 0]].copy()
            inv[:, 1] += self.n_predicates // 2
            ex = np.concatenate([ex, inv], axis=0)
        if rel_idx >= 0:
            ex = ex[ex[:, 1] == rel_idx]
        if self.debug:
            ex = ex[:1000]
        return ex.astype(np.int32)

    def get_filters(self):
        return self.to_skip

    def get_shape(self):
        return self.n_entities, self.n_predicates, self.n_entities

    # ---------------------------- TPU-ready packs -----------------------------

    def eval_pack(self, split: str, direction: str, rel_idx: int = -1) -> EvalPack:
        """Queries + padded filter arrays for filtered ranking.

        direction 'rhs' ranks tails of (h, r, ?); 'lhs' ranks heads via the
        inverse relation: queries become (t, r + n_rel/2, h)
        (reference models/base.py:313-314).  Every row's filter list gets the
        gold tail appended (base.py:266-267), so the padded array always has
        at least one valid entry.  Cached per (split, direction, rel_idx) —
        compute_metrics is called every --valid epochs.
        """
        ck = (split, direction, rel_idx)
        if ck in self._eval_cache:
            return self._eval_cache[ck]
        ex = self.get_examples(split, rel_idx=rel_idx).astype(np.int64)
        if direction == "lhs":
            ex = np.stack(
                [ex[:, 2], ex[:, 1] + self.n_predicates // 2, ex[:, 0]], axis=1
            )
        skip = self.to_skip[direction]
        lists = [skip.get((int(q[0]), int(q[1])), []) for q in ex]
        # pad to the DIRECTION-GLOBAL max filter length (+1 for the gold
        # tail) so every pack of a dataset shares one static shape — the
        # jitted rankers compile once instead of once per rel_idx/split.
        # Rows are DEDUPLICATED (gold appended exactly once): the maskless
        # Pallas rankers subtract per-filtered-entity counts, so a duplicate
        # id would be subtracted twice.
        lmax = max((len(v) for v in skip.values()), default=0) + 1
        fidx = np.full((len(ex), lmax), self.n_entities, dtype=np.int32)
        for i, l in enumerate(lists):
            gold = int(ex[i, 2])
            u = set(map(int, l))
            u.discard(gold)
            row = list(u)
            fidx[i, : len(row)] = row
            fidx[i, len(row)] = gold
        pack = EvalPack(queries=ex.astype(np.int32), filter_idx=fidx)
        self._eval_cache[ck] = pack
        return pack

    def label_pack(self, split: str):
        """Padded true-tail lists per example, for the BCE loss.

        Row i holds all true tails of query (h_i, r_i).  Label sources match
        the reference KGDataset2 (kg_dataset.py:75-130): the train pack's
        labels come from train facts only (train_filter); the valid pack's
        labels come from train AND valid facts (valid_filter = deep-copied
        train_filter extended with valid examples).  Both directions
        contribute — each raw fact (h, r, t) yields key (h, r) -> t and
        inverse key (t, r + n_rel) -> h.  Padding value = n_entities
        (masked out of the in-step label gather, train/losses.py:bce_loss).

        Fully vectorized (sort + searchsorted group lookup) and cached per
        split — the reference rebuilds scipy CSR matrices per call.
        """
        if split in self._label_cache:
            return self._label_cache[split]
        sources = {"train": ("train",), "valid": ("train", "valid")}[split]
        n_rel = self.n_predicates // 2
        # label SOURCES are never debug-truncated: the reference builds
        # train_filter/valid_filter from the FULL splits in the constructor
        # (kg_dataset.py:77-85); debug only truncates the query rows (:63-64).
        # Truncating sources too would strip even the gold tail from rows.
        ex_src = np.concatenate([self.data[s] for s in sources], axis=0)
        fwd = ex_src
        bwd = np.stack([ex_src[:, 2], ex_src[:, 1] + n_rel, ex_src[:, 0]], axis=1)
        pairs = np.concatenate([fwd, bwd], axis=0).astype(np.int64)
        key_lab = np.unique(  # dedup (query, label) pairs, sorted by key
            np.stack([pairs[:, 0] * self.n_predicates + pairs[:, 1],
                      pairs[:, 2]], axis=1),
            axis=0,
        )
        keys, labels = key_lab[:, 0], key_lab[:, 1]

        rows = self.get_examples(split).astype(np.int64)
        qkeys = rows[:, 0] * self.n_predicates + rows[:, 1]
        starts = np.searchsorted(keys, qkeys, side="left")
        ends = np.searchsorted(keys, qkeys, side="right")
        lens = ends - starts
        lmax = int(lens.max()) if len(lens) else 1
        cols = np.arange(lmax)
        take = np.minimum(starts[:, None] + cols[None, :], len(labels) - 1)
        lab = np.where(
            cols[None, :] < lens[:, None], labels[take], self.n_entities
        ).astype(np.int32)
        out = (rows.astype(np.int32), lab)
        self._label_cache[split] = out
        return out


def synthetic_kg(n_entities: int = 200, n_relations: int = 11,
                 n_train: int = 2000, n_valid: int = 200, n_test: int = 200,
                 seed: int = 0) -> KGData:
    """Random KG with the reference datasets' shape statistics; used by tests
    and by bench.py when no real dataset is on disk (zero-egress image)."""
    rng = np.random.default_rng(seed)
    # every entity/relation id must appear in train (shape maximality below),
    # so train can never be smaller than the id spaces it has to cover
    n_train = max(n_train, n_entities, n_relations)

    def draw(n):
        h = rng.integers(0, n_entities, size=n)
        r = rng.integers(0, n_relations, size=n)
        t = rng.integers(0, n_entities, size=n)
        return np.stack([h, r, t], axis=1).astype(np.int64)

    train = draw(n_train)
    # ensure every entity/relation id appears in train so shapes are maximal
    train[: n_entities, 0] = np.arange(n_entities)
    train[: n_relations, 1] = np.arange(n_relations)
    splits = {"train": train, "valid": draw(n_valid), "test": draw(n_test)}
    return KGData(splits=splits, filters=None)


def epoch_batches(examples: np.ndarray, batch_size: int,
                  rng: np.random.Generator | None, labels: np.ndarray | None = None):
    """Shuffle and pack one epoch into static-shape batches + weight mask.

    Returns (batches [nb, B, 3] int32, weights [nb, B] float32,
    label_batches [nb, B, L] or None).  The final partial batch is padded
    with copies of row 0 and masked to weight 0, so every batch has identical
    shape and the whole epoch can be lax.scan-ned as one XLA program (the
    reference's Python while-loop over slices,
    optimizers/kg_optimizer.py:248-276, becomes one compiled scan).
    rng=None skips shuffling (validation-loss passes).
    """
    n = examples.shape[0]
    ex = examples
    if rng is not None:
        perm = rng.permutation(n)
        ex = examples[perm]
        if labels is not None:
            labels = labels[perm]
    nb = -(-n // batch_size)
    pad = nb * batch_size - n
    weights = np.ones(nb * batch_size, dtype=np.float32)
    if pad:
        ex = np.concatenate([ex, np.broadcast_to(ex[:1], (pad, 3))], axis=0)
        if labels is not None:
            labels = np.concatenate(
                [labels, np.broadcast_to(labels[:1], (pad, labels.shape[1]))], axis=0
            )
        weights[n:] = 0.0
    lab_b = (
        None
        if labels is None
        else labels.reshape(nb, batch_size, labels.shape[1]).astype(np.int32)
    )
    return (
        ex.reshape(nb, batch_size, 3).astype(np.int32),
        weights.reshape(nb, batch_size),
        lab_b,
    )
