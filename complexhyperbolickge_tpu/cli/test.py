"""Evaluation-only CLI — counterpart of the reference test.py:23-47.

Reloads config.json + checkpoint from a model dir, rebuilds the model, and
reports filtered test metrics.
"""

from __future__ import annotations

import argparse
import logging

import jax

from complexhyperbolickge_tpu.cli.run import (
    apply_dtype_policy,
    build_model,
    load_dataset,
    setup_logging,
)
from complexhyperbolickge_tpu.train.checkpoint import load_checkpoint, load_config
from complexhyperbolickge_tpu.train.evaluate import (
    avg_both,
    compute_metrics,
    format_metrics,
    make_best_ranker,
)


def test(model_dir: str, split: str = "test",
         eval_precision: str | None = None):
    setup_logging(model_dir, to_file=False)
    cfg = load_config(model_dir)["args"]
    args = argparse.Namespace(**cfg)
    if eval_precision is not None:  # CLI override beats the saved config
        args.eval_precision = eval_precision
    if getattr(args, "eval_precision", "highest") != "highest":
        # a training-time throughput opt-in must never silently shape
        # REPORTED metrics: say so, and show how to force exactness
        logging.warning(
            "evaluating with eval_precision=%s (inherited from the run "
            "config; pass --eval_precision highest for exact reference "
            "ranks)", args.eval_precision,
        )
    apply_dtype_policy(args)  # f64 on CPU; coerced to f32 on TPU
    dataset = load_dataset(args)
    model = build_model(args, dataset)
    # schema-check the checkpoint against the rebuilt model's shapes so a
    # stale config/checkpoint mismatch fails with the parameter named
    expected = model.init(jax.random.PRNGKey(0))
    # cast_to_expected: a CPU-trained f64 checkpoint evaluates on TPU
    # after the dtype-policy f32 coercion (shapes stay strict)
    params = load_checkpoint(model_dir, expect_params=expected,
                             cast_to_expected=True)["params"]
    rank_fn = make_best_ranker(model, args.eval_batch_size,
                               getattr(args, "eval_backend", "auto"),
                               precision=getattr(args, "eval_precision",
                                                 "highest"))
    metrics = avg_both(
        compute_metrics(model, params, dataset, split, args.eval_batch_size,
                        rank_fn=rank_fn)
    )
    logging.info(format_metrics(metrics, split=split))
    return metrics


def main():
    p = argparse.ArgumentParser(description="Evaluate a trained KG embedding model")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--split", default="test", choices=["valid", "test"])
    p.add_argument("--eval_precision", default=None,
                   choices=["highest", "default"],
                   help="override the run config's eval precision "
                        "('highest' = exact reference ranks)")
    test(**vars(p.parse_args()))


if __name__ == "__main__":
    main()
