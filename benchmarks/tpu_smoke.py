"""One train step + one eval scoring for EVERY registered model on the REAL
TPU chip.  Interpret-mode/CPU tests do not prove TPU lowering (a Lorentz
Pallas kernel shipped a round with an unlowerable sinh — CLAUDE.md), so this
smoke compiles+executes each model family's actual XLA programs on hardware.

Run: python -m benchmarks.tpu_smoke   (real TPU; ~20-30 min of compiles)
"""
import numpy as np
import jax, jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import epoch_batches, synthetic_kg
from complexhyperbolickge_tpu.models import (
    GNN_MODELS, ModelConfig, all_models, get_model,
)
from complexhyperbolickge_tpu.train.evaluate import (
    avg_both, compute_metrics, make_best_ranker,
)
from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer


def main():
    data = synthetic_kg(n_entities=301, n_relations=4, n_train=512,
                        n_valid=64, n_test=64, seed=1)
    n_ent, n_rel, _ = data.get_shape()

    class GNNArgs:  # shared by the model sweep and the loss sweep below
        hidden_dim = 8
        layers = 2
        edge_dropout = 0.1
        dropout = 0.1
        opn = "mult"
        interaction = "distmult"
        basis = 0

    ok, failed = [], []
    for name in all_models:
        try:
            # even rank (Givens pairs; AttRH needs even halves); IFFTH
            # additionally requires rank//2 + 1 even (models/hyperbolic.py)
            rank = 6 if name == "IFFTH" else 8
            cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=rank,
                              multi_c=True, bias="learn", dtype="float32")
            # keyed on the registry's own GNN list: a hardcoded trio here
            # silently skipped PoincareGAT's (cfg, args, dataset) signature
            # when it became the 25th model (caught by this smoke, r05)
            if name in GNN_MODELS:
                model = get_model(name)(cfg, GNNArgs, data)
            else:
                model = get_model(name)(cfg)
            tcfg = TrainConfig(optimizer="Adam", learning_rate=1e-3,
                               batch_size=64, neg_sample_size=8)
            tr = Trainer(model, tcfg, n_ent, n_rel)
            params, opt = tr.init(jax.random.PRNGKey(0))
            b, w, _ = epoch_batches(data.get_examples("train")[:128], 64,
                                    np.random.default_rng(0))
            params, opt, loss = tr.run_epoch(params, opt, jnp.asarray(b),
                                             jnp.asarray(w),
                                             jax.random.PRNGKey(1))
            assert np.isfinite(loss), f"loss={loss}"
            # force the fused kernels where they exist (verifying every
            # kernel LOWERS on real hardware is this smoke's purpose —
            # 'auto' now selects the dense ranker); kernel-less families
            # warn and smoke the dense path instead
            rank_fn = make_best_ranker(model, 32, "pallas")
            m = avg_both(compute_metrics(model, params, data, "test", 32,
                                         rank_fn=rank_fn))
            assert 0.0 <= m["MRR"] <= 1.0
            ok.append(name)
            print(f"{name}: loss={loss:.4f} MRR={m['MRR']:.3f} "
                  f"ranker={type(rank_fn).__name__}", flush=True)
        except Exception as e:  # noqa: BLE001 — report the full matrix
            failed.append((name, f"{type(e).__name__}: {e}"))
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
    # the factored all-entity losses (CE / BCE label-gather / signed-CE,
    # train/losses.py) are plain XLA but deserve one real-chip lowering +
    # finiteness check each, on both a dense and a GNN model
    for name, loss_name, labeled in (("FFTRotH", "crossentropy", False),
                                     ("FFTRotH", "binarycrossentropy", True),
                                     ("FFTRotH", "binarycrossentropy", False),
                                     ("CompGCN", "crossentropy", False)):
        tag = f"{name}/{loss_name}{'+labels' if labeled else ''}"
        try:
            cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                              multi_c=True, bias="learn", dtype="float32")
            if name == "CompGCN":
                model = get_model(name)(cfg, GNNArgs, data)
            else:
                model = get_model(name)(cfg)
            tcfg = TrainConfig(optimizer="Adam", learning_rate=1e-3,
                               batch_size=64, neg_sample_size=0,
                               loss=loss_name, smoothing=0.1)
            tr = Trainer(model, tcfg, n_ent, n_rel)
            params, opt = tr.init(jax.random.PRNGKey(0))
            # label rows align 1:1 with get_examples rows — slice together
            lab = data.label_pack("train")[1][:128] if labeled else None
            b, w, lb = epoch_batches(data.get_examples("train")[:128], 64,
                                     np.random.default_rng(0), labels=lab)
            params, opt, loss = tr.run_epoch(
                params, opt, jnp.asarray(b), jnp.asarray(w),
                jax.random.PRNGKey(1),
                labels=None if lb is None else jnp.asarray(lb))
            assert np.isfinite(loss), f"loss={loss}"
            ok.append(tag)
            print(f"{tag}: loss={loss:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001 — report the full matrix
            failed.append((tag, f"{type(e).__name__}: {e}"))
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)

    # the maskless (subtract-filtered) rank kernels are DISTINCT Pallas
    # programs from the masked ones (gold-excluding tile + flat chunked
    # subtraction, kernels/{chyp,hyp}_rank.py) — one real-chip lowering +
    # exactness check per kernel family: chyp (FFTRotH), poincare (RotH),
    # lorentz (RotLH), attrh two-table (AttRH).  With the in-kernel gold
    # exclusion the maskless
    # ranks must EQUAL the masked kernel's (residual risk is exact f32
    # score ties between distinct non-gold entities — measure-zero at
    # random params; on-chip WN18RR measured 500/500 identical).
    from complexhyperbolickge_tpu.train.evaluate import get_ranking

    for name in ("FFTRotH", "RotH", "RotLH", "AttRH"):
        tag = f"{name}/maskless"
        try:
            cfg = ModelConfig(n_entities=n_ent, n_relations=n_rel, rank=8,
                              multi_c=True, bias="learn", dtype="float32")
            model = get_model(name)(cfg)
            tr = Trainer(model, TrainConfig(optimizer="Adam",
                                            learning_rate=1e-3,
                                            batch_size=64,
                                            neg_sample_size=8),
                         n_ent, n_rel)
            params, _ = tr.init(jax.random.PRNGKey(0))
            pack = data.eval_pack("test", "rhs")
            masked = get_ranking(model, params, pack, 32,
                                 rank_fn=make_best_ranker(model, 32,
                                                          "pallas"))
            maskless = get_ranking(model, params, pack, 32,
                                   rank_fn=make_best_ranker(
                                       model, 32, "pallas_maskless"))
            ma = np.asarray(masked)
            ml = np.asarray(maskless)
            n_exact = int((ma == ml).sum())
            # Tolerate the documented residual +-1 class (exact non-gold
            # f32 MXU ties) so a random-param tie at this tiny synthetic
            # scale cannot make the recurring smoke intermittently fail;
            # anything beyond +-1 is a real lowering bug.
            max_shift = int(np.abs(ma - ml).max()) if len(ma) else 0
            assert max_shift <= 1, (
                f"max |masked-maskless| = {max_shift} "
                f"({len(ma) - n_exact}/{len(ma)} ranks differ)")
            ok.append(tag)
            print(f"{tag}: ranks vs masked: {n_exact}/{len(ma)} exact, "
                  f"max shift {max_shift}", flush=True)
        except Exception as e:  # noqa: BLE001 — report the full matrix
            failed.append((tag, f"{type(e).__name__}: {e}"))
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)

    n_total = len(all_models) + 4 + 4
    print(f"\n{len(ok)}/{n_total} model/loss programs OK on TPU", flush=True)
    if failed:
        raise SystemExit(f"failures: {failed}")


if __name__ == "__main__":
    main()
