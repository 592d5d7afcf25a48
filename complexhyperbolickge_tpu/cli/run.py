"""Training CLI — flag-compatible with the reference run.py:29-131.

Protocol (reference run.py:134-270): build dataset -> model -> trainer; epoch
loop with per-epoch train/valid loss, filtered-metric validation every
`--valid` epochs, best-MRR checkpointing, patience early stopping; final
best-model reload, valid+test metrics, and per-relation test metrics
(generic over n_relations — the reference hardcodes relations 0..10,
run.py:169,267-270).

Improvements over the reference (documented divergences):
  * single logging handler (reference registers two and logs twice,
    run.py:141-154)
  * full-state checkpointing with --resume (reference cannot resume)
  * per-epoch triples/sec throughput logging (the north-star metric)
  * both KGOptimizer-style (FFT/shallow) and GNN training are first-class
    (reference HEAD can only train GNN models, kg_optimizer.py:325)
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import jax
import numpy as np

from complexhyperbolickge_tpu.data.dataset import KGData, epoch_batches, synthetic_kg
from complexhyperbolickge_tpu.models import ModelConfig, all_models, get_model
from complexhyperbolickge_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from complexhyperbolickge_tpu.train.evaluate import (
    avg_both,
    compute_metrics,
    count_params,
    format_metrics,
    make_best_ranker,
)
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

DATASETS = ["FB15K", "WN", "WN18RR", "FB237", "YAGO3-10", "synthetic"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native KG embedding training")
    p.add_argument("--dataset", default="WN18RR", choices=DATASETS)
    p.add_argument("--data_path", default=os.environ.get("DATA_PATH", "data"))
    p.add_argument("--model", default="FFTRotH", choices=all_models)
    p.add_argument("--regularizer", default="N3", choices=["N3", "F2", "L2"])
    p.add_argument("--reg", default=0.0, type=float)
    p.add_argument("--optimizer", default="Adagrad",
                   choices=["Adagrad", "Adam", "SparseAdam"])
    p.add_argument("--max_epochs", default=50, type=int)
    p.add_argument("--patience", default=10, type=int)
    p.add_argument("--valid", default=3, type=int, help="epochs between validation")
    p.add_argument("--rank", default=1000, type=int)
    p.add_argument("--batch_size", default=1000, type=int)
    # reference default is 500 (run.py:66); 1000 measured +15% on the fused
    # TPU ranker (skinny-K matmul amortizes over more query rows) with
    # bit-identical ranks — results don't depend on this value
    p.add_argument("--eval_batch_size", default=1000, type=int)
    p.add_argument("--update_steps", default=1, type=int)
    p.add_argument("--neg_sample_size", default=50, type=int)
    p.add_argument("--neg_mode", default="per_query",
                   choices=["per_query", "shared", "pool"],
                   help="per_query = reference sampler; shared = one negative"
                        " set per batch (MXU matmul scoring, faster); pool ="
                        " per-query negatives drawn through a per-step"
                        " candidate pool (reference estimator shape, MXU"
                        " scoring — fastest per-query form, measured ~3-4x"
                        " per_query on v5e).  The default stays per_query"
                        " because it is the BITWISE reference sampler (same"
                        " negative-id distribution AND same gather-based"
                        " estimator), which the cross-framework parity gates"
                        " rely on; flip to pool for production throughput —"
                        " it is estimator-equivalent (each query still gets"
                        " i.i.d. uniform negatives) and learning-parity"
                        " tested, just not bitwise-identical")
    p.add_argument("--neg_pool_size", default=512, type=int,
                   help="candidate pool size for --neg_mode pool (512 is the"
                        " measured best on v5e; larger pools add HBM traffic"
                        " without estimator benefit)")
    p.add_argument("--loss", default="crossentropy",
                   choices=["crossentropy", "binarycrossentropy"])
    p.add_argument("--dropout", default=0.0, type=float)
    p.add_argument("--init_size", default=1e-3, type=float)
    p.add_argument("--learning_rate", default=1e-1, type=float)
    p.add_argument("--gamma", default=0.0, type=float)
    p.add_argument("--bias", default="constant", choices=["constant", "learn", "none"])
    p.add_argument("--dtype", default="double",
                   choices=["float", "double", "single", "float32", "float64",
                            "bfloat16"])
    # reference defines this store_true but its sweep passes 0/1
    # (tuning_fft.sh:45 — an argparse crash there); accept both forms.
    p.add_argument("--double_neg", nargs="?", const=True, default=False,
                   type=lambda s: bool(int(s)))
    p.add_argument("--debug", action="store_true")
    p.add_argument("--synthetic_entities", default=200, type=int,
                   help="--dataset synthetic only: entity count (odd values "
                        "exercise the mesh entity-padding path)")
    p.add_argument("--multi_c", action="store_true")
    p.add_argument("--smoothing", default=None, type=float)
    p.add_argument("--save_dir", default=".")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--resume", action="store_true",
                   help="resume from save_dir's checkpoint")
    p.add_argument("--eval_backend", default="auto",
                   choices=["auto", "dense", "pallas", "pallas_maskless"],
                   help="ranking path: auto = dense below 100k entities, "
                        "maskless fused kernel at or above it on TPU "
                        "(measured dMRR ~1e-10, see make_best_ranker); "
                        "dense = scatter-free dense XLA "
                        "(exact tie semantics at every scale); pallas = the "
                        "fused VMEM-resident kernel (loud failure if it "
                        "cannot build); pallas_maskless (every hyperbolic "
                        "family) = subtract-filtered fused kernel, the "
                        "fastest measured path at large N (1.2-1.4x dense "
                        "at YAGO scale), rank-identical to the masked "
                        "kernel on-chip since the in-kernel gold-tie "
                        "exclusion (residual +-1 only on exact non-gold "
                        "f32 ties)")
    p.add_argument("--eval_precision", default="highest",
                   choices=["highest", "default"],
                   help="eval score-matmul MXU precision, all backends: "
                        "'highest' (6-pass f32 emulation, exact reference "
                        "ranks) or 'default' (1-pass bf16 contraction; "
                        "~1.08x on the transcendental-bound geometric "
                        "rankers with MRR deltas ~5e-8 at WN18RR scale, "
                        "larger gains expected on the MXU-bound GNN "
                        "decoder sweep)")
    p.add_argument("--mesh", default=None,
                   help="device mesh 'DATAxMODEL' (e.g. 4x2): shard batches "
                        "over 'data' and the entity table / eval score axis "
                        "over 'model'; default single-device")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() so "
                        "--mesh spans all hosts' devices (slice boundary "
                        "lands on the 'data' axis; launch one process per "
                        "host with the standard JAX coordinator env). "
                        "save_dir must be a SHARED filesystem: process 0 "
                        "writes checkpoints, all processes read them after "
                        "a barrier")
    p.add_argument("--coordinator", default=None,
                   help="--distributed without a cluster manager: coordinator "
                        "host:port (else JAX_COORDINATOR_ADDRESS / "
                        "SLURM-style auto-detection)")
    p.add_argument("--num_processes", default=None, type=int,
                   help="--distributed: total process count (else "
                        "auto-detected from the cluster environment)")
    p.add_argument("--process_id", default=None, type=int,
                   help="--distributed: this process's id (else auto)")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax profiler trace of one epoch here")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN)")
    p.add_argument("--subgraph", action="store_true",
                   help="GNN-only: train on sampled subgraphs instead of the "
                        "full graph (reference KGOptimizerSubgraph mode)")
    # GNN-specific (parity with reference run.py:113-131)
    p.add_argument("--hidden_dim", default=200, type=int)
    p.add_argument("--edge_dropout", default=0.3, type=float)
    p.add_argument("--layers", default=2, type=int)
    p.add_argument("--opn", default="mult", choices=["mult", "add"])
    p.add_argument("--interaction", default="distmult",
                   choices=["distmult", "transe"])
    p.add_argument("--basis", default=0, type=int)
    p.add_argument("--gnn_agg_method", default=1, type=int, choices=[1, 2, 3],
                   help="PoincareGCN aggregation: 1 = tangent + gyro-midpoint"
                        " self-loop mix (reference default), 2 = joint"
                        " gyromidpoint over edges+loops, 3 = per-direction"
                        " 1/deg means (reference poincaregnn.py:195-216)")
    return p


def setup_logging(save_dir: str, to_file: bool = True):
    """stdout + <save_dir>/train.log (the reference writes a log file too,
    run.py:141-155 — minus its duplicated-handler double logging).

    to_file=False (eval/serving CLIs) keeps later runs from appending into
    the model's training record; under multi-process JAX only process 0
    attaches the file handler (N writers would interleave)."""
    handlers = [logging.StreamHandler(sys.stdout)]
    if to_file and jax.process_index() == 0:
        try:
            os.makedirs(save_dir, exist_ok=True)
            handlers.append(
                logging.FileHandler(os.path.join(save_dir, "train.log"))
            )
        except OSError:
            pass  # unwritable dir: stdout-only
    logging.basicConfig(
        format="%(asctime)s %(levelname)-8s %(message)s",
        level=logging.INFO,
        datefmt="%Y-%m-%d %H:%M:%S",
        handlers=handlers,
        force=True,
    )


def apply_dtype_policy(args):
    """f64 on CPU enables x64; on TPU it coerces to float32 with a warning
    (TPU has no native f64 — the FFT HLO won't even compile).  Shared by the
    train/eval/serving CLIs so a CPU-trained double config evaluates on TPU
    instead of failing to compile."""
    from complexhyperbolickge_tpu.utils.platform import is_tpu_backend

    if args.dtype in ("double", "float64"):
        if is_tpu_backend():  # CUDA/CPU run f64 natively
            logging.warning(
                "dtype=double requested on a TPU backend; using float32 "
                "(TPU has no native f64). Pass --dtype float32 to silence."
            )
            args.dtype = "float32"
        else:
            jax.config.update("jax_enable_x64", True)
    return args


def load_dataset(args) -> KGData:
    if args.dataset == "synthetic":
        return synthetic_kg(
            n_entities=getattr(args, "synthetic_entities", 200)
        )
    return KGData(os.path.join(args.data_path, args.dataset), args.debug)


def build_model(args, dataset: KGData):
    n_ent, n_rel, _ = dataset.get_shape()
    cfg = ModelConfig(
        n_entities=n_ent,
        n_relations=n_rel,
        rank=args.rank,
        init_size=args.init_size,
        bias=args.bias,
        gamma=args.gamma,
        multi_c=args.multi_c,
        dtype={"float": "float32", "double": "float64", "single": "float32"}.get(
            args.dtype, args.dtype
        ),
        dropout=args.dropout,
    )
    cls = get_model(args.model)
    from complexhyperbolickge_tpu.models import GNN_MODELS
    if args.model in GNN_MODELS:
        return cls(cfg, args, dataset)
    return cls(cfg)


def train(args) -> dict:
    if getattr(args, "distributed", False):
        # must run before any backend-initializing jax call
        jax.distributed.initialize(
            coordinator_address=getattr(args, "coordinator", None),
            num_processes=getattr(args, "num_processes", None),
            process_id=getattr(args, "process_id", None),
        )
    save_dir = args.save_dir
    os.makedirs(save_dir, exist_ok=True)
    setup_logging(save_dir)
    logging.info("Saving logs in: %s", save_dir)

    # the reference's precision-of-record (double, tuning_fft.sh:34) is
    # preserved on CPU and by the f64 parity suite; TPU runs use float32
    apply_dtype_policy(args)
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)

    dataset = load_dataset(args)
    sizes = dataset.get_shape()
    logging.info("\t %s", str(sizes))

    if jax.process_index() == 0:  # single writer under --distributed
        with open(os.path.join(save_dir, "config.json"), "w") as f:
            json.dump(vars(args), f, indent=2)

    model = build_model(args, dataset)
    tcfg = TrainConfig(
        regularizer=args.regularizer, reg=args.reg, optimizer=args.optimizer,
        learning_rate=args.learning_rate, batch_size=args.batch_size,
        update_steps=args.update_steps, neg_sample_size=args.neg_sample_size,
        neg_mode=getattr(args, "neg_mode", "per_query"),
        neg_pool_size=getattr(args, "neg_pool_size", 512),
        loss=args.loss, smoothing=args.smoothing, double_neg=args.double_neg,
    )
    trainer = Trainer(model, tcfg, sizes[0], sizes[1])

    base_key = jax.random.PRNGKey(args.seed)
    _, init_key = jax.random.split(base_key)
    params, opt_state = trainer.init(init_key)
    logging.info("Total number of parameters %d", count_params(params))
    # canonical (unpadded) param layout: checkpoint schema validation target
    canon_params = params

    mesh = None
    if getattr(args, "mesh", None):
        from complexhyperbolickge_tpu.parallel import make_mesh, shard_params

        d, m = (int(x) for x in args.mesh.lower().split("x"))
        mesh = make_mesh((d, m))
        # entity tables row-shard over 'model' at ANY entity count (odd
        # counts zero-padded); GNN encoders mask pad rows out of their
        # batch-norm statistics (models/gnn/models.py::encode)
        params = shard_params(params, mesh)
        opt_state = trainer.tx.init(params)
        logging.info("Mesh: data=%d model=%d over %d devices", d, m, d * m)

    train_examples = dataset.get_examples("train")
    valid_examples = dataset.get_examples("valid")
    labels, valid_labels = None, None
    if tcfg.neg_sample_size <= 0 and tcfg.loss == "binarycrossentropy":
        _, labels = dataset.label_pack("train")
        # reference calculate_valid_loss takes (examples, labels) tuples for
        # the BCE path (kg_optimizer.py:221-236); valid labels come from
        # train+valid facts (KGDataset2.valid_filter, kg_dataset.py:85)
        _, valid_labels = dataset.label_pack("valid")

    start_epoch, best_mrr, best_epoch, counter = 1, None, None, 0
    if args.resume:
        # prefer the newest of the best checkpoint (state.pkl) and the
        # rolling resume point (latest.pkl, written at validation cadence
        # and on SIGTERM)
        candidates = []
        # latest.pkl FIRST: at equal epochs it wins the max() tie-break —
        # it carries the counter/best_epoch extras state.pkl doesn't
        for fn in ("latest.pkl", "state.pkl"):
            if os.path.exists(os.path.join(save_dir, fn)):
                st = load_checkpoint(save_dir, expect_params=canon_params,
                                     filename=fn)
                candidates.append(st)
        if candidates:
            st = max(candidates, key=lambda s: s["epoch"])
            warm_start = st["opt_state"] is None
            if warm_start:
                # kge-import writes params-only checkpoints: WARM-START —
                # reference-trained weights, fresh optimizer state (the
                # fine-tuning path for imported reference runs).  The fresh
                # opt_state already carries the live layout: it must NOT go
                # through the host-side _fit remap below (np.asarray on a
                # multi-process global array is an error, and single-process
                # it is a pointless device->host->device round trip).
                logging.info(
                    "Checkpoint has no optimizer state (kge-import output?) "
                    "— warm-starting from its params with a fresh optimizer"
                )
                st["opt_state"] = opt_state
            if mesh is not None:
                # re-commit the host-loaded state onto the mesh shardings
                # (the pre-resume params/opt_state carry the target layout;
                # skipping this silently resumes replicated, dropping the
                # model-axis row sharding).  Checkpoints are canonical
                # (unpadded); zero-pad entity-dim leaves back up to the
                # mesh-padded row count the live state carries.
                def _fit(x, ref):
                    x = np.asarray(x)
                    if x.shape != ref.shape:
                        if any(s > r for s, r in zip(x.shape, ref.shape)):
                            raise ValueError(
                                f"checkpoint leaf shape {x.shape} exceeds the "
                                f"live layout {ref.shape}: checkpoints are "
                                "canonical (unpadded) — this one looks like "
                                "it was written with mesh-padded tables"
                            )
                        x = np.pad(x, [(0, r - s)
                                       for s, r in zip(x.shape, ref.shape)])
                    if isinstance(ref.sharding, jax.sharding.NamedSharding):
                        return jax.device_put(x, ref.sharding)
                    # non-mesh leaves (e.g. the optimizer step counter) stay
                    # UNCOMMITTED like tx.init leaves them — committing to a
                    # single local device breaks multi-process jit, whose
                    # other args live on the global mesh
                    import jax.numpy as jnp

                    return jnp.asarray(x)

                st["params"] = jax.tree.map(_fit, st["params"], params)
                if not warm_start:
                    st["opt_state"] = jax.tree.map(_fit, st["opt_state"],
                                                   opt_state)
            params, opt_state = st["params"], st["opt_state"]
            start_epoch = st["epoch"] + 1
            best_mrr = st["best_mrr"]
            counter = st.get("counter", 0)
            best_epoch = st.get("best_epoch", None)
            logging.info("Resumed from epoch %d", st["epoch"])

    def _canon(tree):
        """Slice mesh-padded entity-dim leaves back to canonical rows before
        a checkpoint write — checkpoints stay portable (test.py/export/serving
        see reference shapes regardless of the training mesh)."""
        if mesh is None or tree is None:
            return tree
        from complexhyperbolickge_tpu.parallel import (
            padded_rows,
            unpad_entity_tree,
        )

        return unpad_entity_tree(
            tree, sizes[0], padded_rows(sizes[0], mesh.shape["model"])
        )

    if mesh is not None and mesh.shape["model"] > 1:
        from complexhyperbolickge_tpu.parallel import make_best_sharded_ranker

        # odd entity counts are handled inside the ranker (zero-pad + mask);
        # CHYP models on TPU get the fused Pallas kernel per shard; GNN
        # models shard the ENCODED node table (encoder stays replicated)
        rank_fn = make_best_sharded_ranker(
            model, mesh, sizes[0], getattr(args, "eval_backend", "auto"),
            precision=getattr(args, "eval_precision", "highest"),
        )
    else:
        rank_fn = make_best_ranker(
            model, args.eval_batch_size,
            getattr(args, "eval_backend", "auto"),
            precision=getattr(args, "eval_precision", "highest"),
        )
    vb, vw, vlab = epoch_batches(valid_examples, args.batch_size, None,
                                 valid_labels)

    sub_trainer = None
    if getattr(args, "subgraph", False):
        from complexhyperbolickge_tpu.train.subgraph import SubgraphTrainer

        # composes with --mesh: query-dim arrays shard over 'data' per step
        # and the (padded) entity tables stay row-sharded over 'model' —
        # the encoder-outgrows-one-chip workload gets both HBM scaling and
        # data parallelism (train/subgraph.py docstring)
        sub_trainer = SubgraphTrainer(model, tcfg, dataset, mesh=mesh)

    from complexhyperbolickge_tpu.utils.profiling import trace

    # SIGTERM-safe training: finish the current epoch, write latest.pkl,
    # exit cleanly (resume with --resume); the best checkpoint is untouched
    import signal

    stop_signal = {"flag": False}

    def _on_term(signum, frame):
        stop_signal["flag"] = True
        logging.info("signal %d received: will checkpoint latest state and "
                     "stop at the epoch boundary", signum)

    try:
        signal.signal(signal.SIGTERM, _on_term)
    except ValueError:
        pass  # not the main thread (library use) — feature unavailable

    logging.info("\t Start training")
    epoch = start_epoch - 1
    for epoch in range(start_epoch, args.max_epochs + 1):
        t0 = time.perf_counter()
        # keys and shuffles derive from (seed, epoch), not an advancing
        # stream, so --resume reproduces the exact train/valid sequence a
        # continuous run would produce
        ek = jax.random.fold_in(base_key, 2 * epoch)
        vk = jax.random.fold_in(base_key, 2 * epoch + 1)
        rng = np.random.default_rng([args.seed, epoch])
        # profile the second epoch (first is compile-dominated) — or the
        # first when it's the only one, so --max_epochs 1 still traces
        profile_epoch = (
            start_epoch + 1 if args.max_epochs > start_epoch else start_epoch
        )
        profile_dir = args.profile_dir if (
            getattr(args, "profile_dir", None) and epoch == profile_epoch
        ) else None
        with trace(profile_dir):
            if sub_trainer is not None:
                params, opt_state, train_loss = sub_trainer.run_epoch(
                    params, opt_state, args.batch_size, rng, ek, epoch_id=epoch
                )
            else:
                batches, weights, lab_b = epoch_batches(
                    train_examples, args.batch_size, rng, labels
                )
                if mesh is not None:
                    from complexhyperbolickge_tpu.parallel import (
                        shard_epoch_arrays,
                    )

                    batches, weights, lab_b = shard_epoch_arrays(
                        mesh, np.asarray(batches), np.asarray(weights), lab_b
                    )
                params, opt_state, train_loss = trainer.run_epoch(
                    params, opt_state, batches, weights, ek, labels=lab_b
                )
        dt = time.perf_counter() - t0
        logging.info(
            "\t Epoch %d | average train loss: %.4f | %.0f triples/s",
            epoch, train_loss, len(train_examples) / dt,
        )
        valid_loss = trainer.valid_loss(params, vb, vw, vk, labels=vlab)
        logging.info("\t Epoch %d | average valid loss: %.4f", epoch, valid_loss)

        stopped_early = False
        if epoch % args.valid == 0:
            valid_metrics = avg_both(compute_metrics(
                model, params, dataset, "valid", args.eval_batch_size,
                rank_fn=rank_fn,
            ))
            logging.info(format_metrics(valid_metrics, split="valid"))
            valid_mrr = valid_metrics["MRR"]
            # `is None`, not falsy: a legitimate best MRR of 0.0 must count
            # as set, or the patience counter resets on every validation
            if best_mrr is None or valid_mrr > best_mrr:
                best_mrr, counter, best_epoch = valid_mrr, 0, epoch
                logging.info("\t Saving model at epoch %d in %s", epoch, save_dir)
                save_checkpoint(save_dir, _canon(params), _canon(opt_state), epoch, best_mrr,
                                config={"args": vars(args)})
            else:
                counter += 1
                # >= (not ==): a run resumed from an early-stopped state
                # carries counter == patience already; == would never fire
                # again and the resumed run would train to max_epochs
                if counter >= args.patience:
                    logging.info("\t Early stopping")
                    stopped_early = True
            # rolling resume point, written AFTER best-checkpoint updates so
            # a resumed run restores the post-validation best_mrr/counter
            save_checkpoint(save_dir, _canon(params), _canon(opt_state), epoch, best_mrr,
                            filename="latest.pkl",
                            extra={"counter": counter,
                                   "best_epoch": best_epoch})
        if stopped_early:
            break

        # signal stop AFTER the epoch's validation/best-checkpoint work, so
        # a resumed run's trajectory is identical to a continuous run (an
        # earlier break here skipped the interrupted epoch's validation —
        # losing it permanently if it was the best epoch)
        stop = stop_signal["flag"]
        if jax.process_count() > 1:
            # a SIGTERM may land on one host only; act on the GLOBAL OR of
            # the flags so every process takes the same branch (a local
            # decision would deadlock the save barrier / training
            # collectives across hosts)
            from jax.experimental import multihost_utils

            stop = bool(
                multihost_utils.process_allgather(
                    np.asarray([stop_signal["flag"]])
                ).any()
            )
        if stop:
            save_checkpoint(save_dir, _canon(params), _canon(opt_state), epoch, best_mrr,
                            filename="latest.pkl",
                            extra={"counter": counter,
                                   "best_epoch": best_epoch})
            logging.info("\t Stopped by signal at epoch %d; latest state "
                         "saved — resume with --resume", epoch)
            break

    logging.info("\t Optimization finished")
    if best_mrr is not None:
        logging.info("\t Loading best model saved at epoch %s", best_epoch)
        params = load_checkpoint(save_dir)["params"]
    else:
        # record the LAST COMPLETED epoch, not max_epochs — the run may have
        # stopped early (signal); a wrong epoch here corrupts --resume
        save_checkpoint(save_dir, _canon(params), _canon(opt_state), epoch, None,
                        config={"args": vars(args)})

    valid_metrics = avg_both(compute_metrics(
        model, params, dataset, "valid", args.eval_batch_size, rank_fn=rank_fn))
    logging.info(format_metrics(valid_metrics, split="valid"))
    test_metrics = avg_both(compute_metrics(
        model, params, dataset, "test", args.eval_batch_size, rank_fn=rank_fn))
    logging.info(format_metrics(test_metrics, split="test"))
    for i in range(dataset.n_predicates // 2):
        rel_metrics = compute_metrics(
            model, params, dataset, "test", args.eval_batch_size, rel_idx=i,
            rank_fn=rank_fn,
        )
        logging.info("\t Results for relation %d", i)
        logging.info(format_metrics(avg_both(rel_metrics), split="test"))
    return {"valid": valid_metrics, "test": test_metrics}


def main():
    train(build_parser().parse_args())


if __name__ == "__main__":
    main()
