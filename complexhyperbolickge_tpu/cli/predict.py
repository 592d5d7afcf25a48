"""Serving CLI: top-k tail prediction from a trained checkpoint.

Beyond the reference (which has no inference entry point — its test.py only
reports ranking metrics): loads a model dir, takes (head, rel) queries, and
prints the top-k candidate tails with scores, optionally filtering out
already-known facts.

    python -m complexhyperbolickge_tpu.cli.predict --model_dir runs/fftroth \
        --queries 12:3 45:0 --k 10 --filter_known
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.cli.run import (
    apply_dtype_policy,
    build_model,
    load_dataset,
    setup_logging,
)
from complexhyperbolickge_tpu.train.checkpoint import load_checkpoint, load_config
from complexhyperbolickge_tpu.train.evaluate import make_predictor


def load_serving_state(model_dir: str):
    """(model, params, dataset) reloaded from a model dir — the shared
    loading path of kge-predict and kge-serve."""
    cfg = load_config(model_dir)["args"]
    args = argparse.Namespace(**cfg)
    apply_dtype_policy(args)  # f64 on CPU; coerced to f32 on TPU
    dataset = load_dataset(args)
    model = build_model(args, dataset)
    expected = model.init(jax.random.PRNGKey(0))
    # cast_to_expected: a CPU-trained f64 checkpoint evaluates on TPU
    # after the dtype-policy f32 coercion (shapes stay strict)
    params = load_checkpoint(model_dir, expect_params=expected,
                             cast_to_expected=True)["params"]
    return model, params, dataset


def max_known_tails(dataset) -> int:
    """Longest known-true-tail list over BOTH filter directions — the padded
    width that guarantees known_tail_filters never truncates (static
    serving shapes, cli/serve.py)."""
    skip = dataset.get_filters()
    return max(
        (len(v) for d in ("rhs", "lhs") for v in skip[d].values()), default=1
    ) or 1


def known_tail_filters(dataset, q, lmax: int | None = None):
    """Padded known-true-tail ids for (head, rel) queries — masks already-
    known facts out of predictions.  rhs filters are keyed by raw relation
    ids; inverse-relation queries (r >= n_rel/2, i.e. head prediction) live
    in the lhs dict, keyed by the offset id directly (preprocess.py:50-64).
    lmax pins the padded width (static serving shapes); a list longer than
    lmax raises rather than silently leaking known facts into predictions —
    size lmax with max_known_tails."""
    skip = dataset.get_filters()
    n_ent = dataset.n_entities
    n_raw = dataset.n_predicates // 2
    lists = [
        skip["rhs" if int(r) < n_raw else "lhs"].get((int(h), int(r)), [])
        for h, r in q
    ]
    widest = max((len(v) for v in lists), default=0)
    if lmax is None:
        lmax = widest or 1
    elif widest > lmax:
        raise ValueError(
            f"known-fact filter list of length {widest} exceeds the padded "
            f"width {lmax}; raise max_filter_len (dataset max: "
            f"{max_known_tails(dataset)})"
        )
    fidx = np.full((len(q), lmax), n_ent, dtype=np.int32)
    for i, l in enumerate(lists):
        fidx[i, : len(l)] = l
    return jnp.asarray(fidx)


def predict(model_dir: str, queries, k: int = 10, filter_known: bool = False):
    setup_logging(model_dir, to_file=False)
    model, params, dataset = load_serving_state(model_dir)

    q = np.asarray(queries, dtype=np.int32)
    # user-input validation: must survive python -O
    if q.ndim != 2 or q.shape[1] != 2:
        raise ValueError("queries must be (B, 2) (head, rel)")
    n_ent = dataset.n_entities
    if not ((q[:, 0] >= 0) & (q[:, 0] < n_ent)).all():
        raise ValueError("head id out of range")
    if not ((q[:, 1] >= 0) & (q[:, 1] < dataset.n_predicates)).all():
        raise ValueError("relation id out of range")

    fidx = known_tail_filters(dataset, q) if filter_known else None
    fn = make_predictor(model, k=k)
    ids, scores = fn(params, jnp.asarray(q), fidx)
    out = []
    for row_q, row_i, row_s in zip(q, np.asarray(ids), np.asarray(scores)):
        out.append({
            "head": int(row_q[0]),
            "rel": int(row_q[1]),
            "tails": [int(x) for x in row_i],
            "scores": [float(x) for x in row_s],
        })
        logging.info("(%d, %d) -> %s", row_q[0], row_q[1],
                     list(zip(out[-1]["tails"], out[-1]["scores"])))
    print(json.dumps(out))
    return out


def main():
    p = argparse.ArgumentParser(description="Top-k tail prediction")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--queries", nargs="+", required=True,
                   help="queries as HEAD:REL id pairs, e.g. 12:3 45:0")
    p.add_argument("--k", default=10, type=int)
    p.add_argument("--filter_known", action="store_true",
                   help="mask tails already known from train/valid/test")
    a = p.parse_args()
    qs = [tuple(int(x) for x in s.split(":")) for s in a.queries]
    predict(a.model_dir, qs, k=a.k, filter_known=a.filter_known)


if __name__ == "__main__":
    main()
