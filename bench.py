"""Headline benchmark: FFTRotH training throughput (triples/sec) on one chip.

Workload = the reference's published best WN18RR config shape
(/root/reference/README.md:54): rank 33, batch 500, neg_sample_size 100,
Adam, multi_c, bias=learn, at WN18RR scale (40,943 entities / 22 relations
with inverses / 173,670 train triples after inverse augmentation).  Triples
are synthetic at identical shapes — throughput is shape-dependent only.

Negative sampling runs in --neg_mode pool (the production default for
per-query training, round 2): each query still gets its own 100 i.i.d.
uniform negatives, scored through a per-step 512-entity candidate pool as
one MXU matmul + an elementwise window mask (train/losses.py::
neg_sampling_loss_pooled) instead of a 13 MB (B,K,D) row gather + B*K-row
scatter-add backward.  Pool size 512 is the measured best on v5e (ledger:
965k t/s vs 880k at P=1024).  Measured ~3-4x the gather-based per_query
mode, which remains available as the bitwise reference-semantics path and
is reported in the "secondary" tail below, alongside the all-entity
cross-entropy loss mode.

Baseline: the reference PyTorch implementation on CPU (its precision of
record, float64) measured in this container at 1838 triples/s
(f32: 4100 triples/s).  vs_baseline is the speedup over the f64 figure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"secondary"}.  If the TPU tunnel is unreachable, waits up to
BENCH_TUNNEL_WAIT_S (default 3600) for a subprocess probe to round-trip
before measuring, so a transient relay outage at bench time doesn't lose
the run.  Set BENCH_SECONDARY=0 to skip the secondary measurements
(six extra compiles through the remote tunnel: per_query reference-
semantics sampling, all-entity cross-entropy, whole-split filtered eval
(dense + the opt-in maskless fused kernel), full-graph CompGCN training,
and the batch-8000 scaling ceiling).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REF_CPU_TRIPLES_PER_SEC_F64 = 1837.6  # measured: reference FFTRotH, torch 2.13 CPU
N_ENT, N_REL_RAW, RANK, BATCH, NEG = 40943, 11, 33, 500, 100


def wait_for_tunnel(wait_budget_s: float, probe_timeout_s: float = 420.0):
    """Block until a trivial device program completes, or the budget runs out.

    The TPU is reached through a remote-compile tunnel whose relay can go
    down for an hour+ (observed r03): in that state even `arange(8).sum()`
    hangs inside the first compile, so an in-process attempt wedges the
    backend.  Probe in a SUBPROCESS (fresh backend, killable) and only start
    the real measurement once a probe round-trips.  On CPU/GPU images the
    probe completes in seconds, so this is a no-op outside the tunnel.
    """
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "print('PROBE_OK', float(jnp.arange(8.0).sum()))")
    deadline = time.perf_counter() + wait_budget_s
    attempt = 0
    while True:
        attempt += 1
        killed = False
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=probe_timeout_s, capture_output=True)
            if r.returncode == 0 and b"PROBE_OK 28.0" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            killed = True
        remaining = deadline - time.perf_counter()
        if remaining <= 0:
            raise TimeoutError(
                f"device probe failed {attempt}x over "
                f"{wait_budget_s:.0f}s (BENCH_TUNNEL_WAIT_S) — the TPU "
                "tunnel relay is down; retry when it is back")
        # a KILLED (hung) probe itself wedges the relay for minutes
        # (documented tunnel behavior): re-probing straight into the wedge
        # window would self-sustain the outage, so back off long after a
        # kill; clean fast failures (backend init error) retry quickly
        sleep_s = 480.0 if killed else 60.0
        print(f"# bench: device probe {attempt} "
              f"{'hung (killed)' if killed else 'failed'}; tunnel likely "
              f"down, retrying in {sleep_s:.0f}s "
              f"({remaining:.0f}s of wait budget left)",
              file=sys.stderr, flush=True)
        time.sleep(min(sleep_s, max(1.0, remaining)))


def main():
    # An unreachable tunnel must not burn the whole headline watchdog budget
    # on a single doomed compile: wait (bounded) for a healthy probe first.
    wait_for_tunnel(float(os.environ.get("BENCH_TUNNEL_WAIT_S", "3600")))
    # time spent WAITING must not be charged to the measurement budgets
    # below (it would silently skip the secondaries after a recovery)
    t_start = time.perf_counter()

    import jax
    import jax.numpy as jnp

    from complexhyperbolickge_tpu.data.dataset import epoch_batches
    from complexhyperbolickge_tpu.models import ModelConfig, get_model
    from complexhyperbolickge_tpu.train.trainer import TrainConfig, Trainer

    n_rel = 2 * N_REL_RAW
    # 120 batches per epoch: steady-state throughput is per-step and the
    # shorter lax.scan keeps remote-compile latency bounded
    n_train = 120 * BATCH
    cfg = ModelConfig(n_entities=N_ENT, n_relations=n_rel, rank=RANK,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model("FFTRotH")(cfg)

    rng = np.random.default_rng(0)
    ex = np.stack(
        [rng.integers(0, N_ENT, n_train), rng.integers(0, n_rel, n_train),
         rng.integers(0, N_ENT, n_train)], axis=1,
    ).astype(np.int32)
    batches, weights, _ = epoch_batches(ex, BATCH, rng)
    b = jnp.asarray(batches)
    w = jnp.asarray(weights)

    spread = {}  # metric name -> [min, median, max] over intra-session windows

    def _record(name, windows):
        """Keep the per-window spread (round-5 verdict item 5: single-session
        BENCH artifacts need intra-session repeat structure so cross-round
        drift is attributable to the ±15% tunnel band vs a real regression).
        Top-level values stay the median — driver schema unchanged."""
        spread[name] = [round(float(np.min(windows)), 1),
                        round(float(np.median(windows)), 1),
                        round(float(np.max(windows)), 1)]
        return float(np.median(windows))

    def measure(tcfg, n_windows, bb=None, wb=None, use_model=None,
                spread_name=None):
        """Epoch 1 compiles; epochs 2+ measure steady state.  Median of
        timed windows: single-window readings swing ~±15% through the
        remote-compile tunnel.  run_epoch host-materializes the epoch loss
        (block_until_ready alone is unreliable on this link), so every
        window is fenced on all its device work."""
        bb = b if bb is None else bb
        wb = w if wb is None else wb
        n_tr = bb.shape[0] * bb.shape[1]
        trainer = Trainer(model if use_model is None else use_model,
                          tcfg, N_ENT, n_rel)
        params, opt_state = trainer.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        key, k0 = jax.random.split(key)
        params, opt_state, loss = trainer.run_epoch(params, opt_state, bb, wb, k0)
        assert np.isfinite(loss)
        windows = []
        for _ in range(n_windows):
            n_epochs = 2
            t0 = time.perf_counter()
            for _ in range(n_epochs):
                key, k = jax.random.split(key)
                params, opt_state, loss = trainer.run_epoch(
                    params, opt_state, bb, wb, k)
            dt = time.perf_counter() - t0
            assert np.isfinite(loss)
            windows.append(n_epochs * n_tr / dt)
        if spread_name is not None:
            return _record(spread_name, windows)
        return float(np.median(windows))

    # Fail FAST (with a diagnosis) instead of hanging forever if the TPU
    # tunnel is down: a wedged/absent relay makes even trivial programs
    # block indefinitely inside the first compile (r03 saw an hour-plus
    # outage).  SIGALRM converts that into a clear error the driver can
    # record and retry.
    import contextlib
    import signal

    _UNARMED = object()  # sentinel: signal.signal can legitimately return None

    @contextlib.contextmanager
    def watchdog(seconds: float, message: str):
        """SIGALRM-backed timeout; no-op off the main thread."""

        def _on_alarm(signum, frame):
            raise TimeoutError(message)

        old = _UNARMED
        try:
            old = signal.signal(signal.SIGALRM, _on_alarm)
            signal.alarm(int(max(1, seconds)))
        except ValueError:  # not the main thread: never armed
            pass
        try:
            yield
        finally:
            if old is not _UNARMED:  # armed: ALWAYS cancel + restore
                signal.alarm(0)
                signal.signal(signal.SIGALRM,
                              signal.SIG_DFL if old is None else old)

    headline_budget = float(os.environ.get("BENCH_HEADLINE_BUDGET_S", "2700"))
    with watchdog(
        headline_budget,
        f"headline measurement exceeded {headline_budget:.0f}s "
        "(BENCH_HEADLINE_BUDGET_S) — the TPU tunnel is likely down or "
        "wedged; retry when the relay is back",
    ):
        tps = measure(
            TrainConfig(optimizer="Adam", learning_rate=3e-4,
                        batch_size=BATCH, neg_sample_size=NEG,
                        regularizer="N3", reg=0.0,
                        neg_mode="pool", neg_pool_size=512),
            n_windows=3, spread_name="headline",
        )

    secondary = {}
    # Each secondary costs one more compile through the remote tunnel
    # (1-6 min, variable).  The headline is ALREADY measured at this point;
    # nothing below may lose it: a SIGALRM watchdog converts a wedged-tunnel
    # hang into an exception, and any secondary failure is recorded in the
    # tail instead of propagating (measured full run ~25 min nominal).
    # six secondaries now (eval + GNN added round 4 per verdict item 6,
    # maskless eval late round 4): the default budget covers them at
    # nominal tunnel latency; the per-item elapsed gate sheds from the
    # tail (b8000 first) when compiles run long
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2700"))
    if os.environ.get("BENCH_SECONDARY", "1") != "0" \
            and time.perf_counter() - t_start < budget_s * 0.6:
        def _secondaries():
            # bitwise reference-semantics sampling ((B,K,D) row gather)
            secondary["per_query_triples_per_sec"] = round(measure(
                TrainConfig(optimizer="Adam", learning_rate=3e-4,
                            batch_size=BATCH, neg_sample_size=NEG,
                            regularizer="N3", reg=0.0, neg_mode="per_query"),
                n_windows=3, spread_name="per_query_triples_per_sec",
            ), 1)
            if time.perf_counter() - t_start < budget_s:
                # all-entity cross-entropy (kg_optimizer.py:186-191)
                secondary["crossentropy_triples_per_sec"] = round(measure(
                    TrainConfig(optimizer="Adam", learning_rate=3e-4,
                                batch_size=BATCH, neg_sample_size=0,
                                regularizer="N3", reg=0.0,
                                loss="crossentropy"),
                    n_windows=3, spread_name="crossentropy_triples_per_sec",
                ), 1)
            if time.perf_counter() - t_start < budget_s:
                # eval path (round-4 verdict item 6: driver-tracked eval
                # number so a rank-program regression between rounds is
                # visible).  Production form: whole-split scan-compiled
                # filtered ranking (rank_many -> one dispatch per split)
                # with the scatter-free dense ranker at WN18RR shapes.
                from complexhyperbolickge_tpu.data.dataset import (
                    EvalPack, dedup_filter_rows)
                from complexhyperbolickge_tpu.train.evaluate import (
                    get_ranking, make_ranker)

                nq, lmax = 20000, 64
                qs = np.stack(
                    [rng.integers(0, N_ENT, nq), rng.integers(0, n_rel, nq),
                     rng.integers(0, N_ENT, nq)], 1).astype(np.int32)
                fs = rng.integers(0, N_ENT, (nq, lmax)).astype(np.int32)
                fs[:, -1] = qs[:, 2]  # gold always filtered
                fs = dedup_filter_rows(fs, N_ENT)
                pack = EvalPack(queries=qs, filter_idx=fs)
                eval_params, _ = Trainer(
                    model,
                    TrainConfig(optimizer="Adam", learning_rate=3e-4,
                                batch_size=BATCH, neg_sample_size=NEG,
                                regularizer="N3", reg=0.0),
                    N_ENT, n_rel,
                ).init(jax.random.PRNGKey(0))
                rank_fn = make_ranker(model, BATCH)
                # get_ranking returns host arrays: every trial is fenced
                get_ranking(model, eval_params, pack, BATCH, rank_fn=rank_fn)
                etr = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    get_ranking(model, eval_params, pack, BATCH,
                                rank_fn=rank_fn)
                    etr.append(nq / (time.perf_counter() - t0))
                secondary["eval_queries_per_sec"] = round(
                    _record("eval_queries_per_sec", etr), 1)
            if "eval_queries_per_sec" in secondary \
                    and time.perf_counter() - t_start < budget_s:
                # opt-in fast eval path (--eval_backend pallas_maskless):
                # subtract-filtered fused kernel with in-kernel gold-tie
                # exclusion — rank-identical to the masked kernel on-chip,
                # 1.09x dense at WN18RR / 1.35-1.38x at YAGO scan shapes.
                # Driver-tracked so a maskless-kernel regression between
                # rounds is visible; reuses the dense block's pack/params.
                from complexhyperbolickge_tpu.train.evaluate import (
                    make_best_ranker)

                ml_fn = make_best_ranker(model, BATCH, "pallas_maskless")
                get_ranking(model, eval_params, pack, BATCH, rank_fn=ml_fn)
                mtr = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    get_ranking(model, eval_params, pack, BATCH,
                                rank_fn=ml_fn)
                    mtr.append(nq / (time.perf_counter() - t0))
                secondary["eval_maskless_queries_per_sec"] = round(
                    _record("eval_maskless_queries_per_sec", mtr), 1)
            if time.perf_counter() - t_start < budget_s:
                # GNN path (verdict item 6): full-graph CompGCN training at
                # WN18RR scale — the gnn_train_bench.py README-row config
                # (hidden 200, 2 layers, ~174k edges re-encoded per step,
                # b1000/neg50), truncated to 30 steps/epoch (per-step cost
                # is batch-count-independent).
                from complexhyperbolickge_tpu.data.dataset import synthetic_kg

                class _GnnArgs:
                    hidden_dim = 200
                    layers = 2
                    edge_dropout = 0.0
                    dropout = 0.0
                    opn = "mult"
                    interaction = "distmult"
                    basis = 0

                gdata = synthetic_kg(n_entities=N_ENT, n_relations=N_REL_RAW,
                                     n_train=86835, n_valid=500, n_test=500,
                                     seed=0)
                gmodel = get_model("CompGCN")(
                    ModelConfig(n_entities=N_ENT, n_relations=n_rel, rank=32,
                                multi_c=True, bias="learn", dtype="float32"),
                    _GnnArgs, gdata)
                gb, gw, _ = epoch_batches(gdata.get_examples("train"),
                                          1000, rng)
                gb, gw = jnp.asarray(gb[:30]), jnp.asarray(gw[:30])
                secondary["gnn_train_triples_per_sec"] = round(measure(
                    TrainConfig(optimizer="Adam", learning_rate=1e-3,
                                batch_size=1000, neg_sample_size=50,
                                regularizer="N3", reg=0.0),
                    n_windows=3, bb=gb, wb=gw, use_model=gmodel,
                    spread_name="gnn_train_triples_per_sec",
                ), 1)
            if time.perf_counter() - t_start < budget_s:
                # batch-scaling headroom: the b500 step sits at its ~0.35 ms
                # fixed-overhead floor (ledger); throughput scales super-
                # linearly with batch.  Same model/loss at batch 8000 shows
                # the chip's real ceiling (measured ~3.2M triples/s).
                B8 = 8000
                ex8 = np.stack(
                    [rng.integers(0, N_ENT, 30 * B8),
                     rng.integers(0, n_rel, 30 * B8),
                     rng.integers(0, N_ENT, 30 * B8)], axis=1,
                ).astype(np.int32)
                b8_np, w8_np, _ = epoch_batches(ex8, B8, rng)
                secondary["pool_b8000_triples_per_sec"] = round(measure(
                    TrainConfig(optimizer="Adam", learning_rate=3e-4,
                                batch_size=B8, neg_sample_size=NEG,
                                regularizer="N3", reg=0.0,
                                neg_mode="pool", neg_pool_size=512),
                    n_windows=3, bb=jnp.asarray(b8_np), wb=jnp.asarray(w8_np),
                    spread_name="pool_b8000_triples_per_sec",
                ), 1)

        try:
            with watchdog(max(60, budget_s - (time.perf_counter() - t_start)),
                          "secondary measurement exceeded BENCH_BUDGET_S"):
                _secondaries()
        except BaseException as e:  # noqa: BLE001 — headline must survive
            secondary["error"] = f"{type(e).__name__}: {e}"

    print(json.dumps({
        "metric": "fftroth_train_throughput_wn18rr_b500_neg100_rank33_poolneg",
        "value": round(tps, 1),
        "unit": "triples/sec",
        "vs_baseline": round(tps / REF_CPU_TRIPLES_PER_SEC_F64, 2),
        "secondary": secondary,
        # [min, median, max] per metric over intra-session repeat windows:
        # attributes cross-round drift to the ±15% tunnel band vs a real
        # regression (a number outside the previous round's min-max band
        # is signal; inside it is noise)
        "spread": spread,
    }))


if __name__ == "__main__":
    main()
