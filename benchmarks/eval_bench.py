"""Eval-path benchmark: XLA dense ranker vs fused Pallas ranker (real chip).

Workload: WN18RR-scale filtered ranking (40,943 entities, rank 33, batch 500)
with realistic padded-filter lengths.  Reports queries/sec for both paths and
validates they agree exactly.
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.data.dataset import dedup_filter_rows
from complexhyperbolickge_tpu.models import ModelConfig, get_model
from complexhyperbolickge_tpu.train.evaluate import make_ranker

# WN18RR scale by default; EVAL_BENCH_N_ENT=123182 reproduces the YAGO3-10
# README row (the candidate axis is the only scale knob that matters here).
# EVAL_BENCH_MODEL selects the family (FFTRotH default; RotH / RotLH etc.
# exercise the hyp/Lorentz kernels incl. their round-4 maskless forms).
N_ENT = int(os.environ.get("EVAL_BENCH_N_ENT", 40943))
MODEL = os.environ.get("EVAL_BENCH_MODEL", "FFTRotH")
N_REL, RANK, B, LMAX = 22, 33, 500, 64


def main():
    rank = RANK if MODEL.startswith("FFT") else 32  # Givens pairs need even
    cfg = ModelConfig(n_entities=N_ENT, n_relations=N_REL, rank=rank,
                      multi_c=True, bias="learn", dtype="float32")
    model = get_model(MODEL)(cfg)
    rng = np.random.default_rng(0)
    params = {
        k: jnp.asarray(rng.normal(0, 0.1, size=shape), dtype=jnp.float32)
        for k, (shape, _) in model.param_specs().items()
    }
    params["c"] = jnp.abs(params["c"]) + 0.5

    q = np.stack([rng.integers(0, N_ENT, B), rng.integers(0, N_REL, B),
                  rng.integers(0, N_ENT, B)], 1).astype(np.int32)
    fidx = rng.integers(0, N_ENT, (B, LMAX)).astype(np.int32)
    fidx[:, -1] = q[:, 2]  # gold always filtered
    fidx = dedup_filter_rows(fidx, N_ENT)  # pack contract: rows dedup'd
    jq, jf = jnp.asarray(q), jnp.asarray(fidx)

    from complexhyperbolickge_tpu.train.evaluate import make_best_ranker

    dense = make_ranker(model, B)
    pallas = make_best_ranker(model, B, "pallas")

    # selector policy: 'auto' = the scatter-free dense ranker (fastest
    # exact-tie path at every measured scale); 'pallas' must still build
    # the fused kernel (a silent fallback would hide kernel rot)
    if jax.devices()[0].platform != "cpu":
        from complexhyperbolickge_tpu.kernels.chyp_rank import PallasChypRanker
        from complexhyperbolickge_tpu.kernels.hyp_rank import (
            PallasAttRHRanker,
            PallasHypRanker,
        )

        kernel_types = (PallasChypRanker, PallasHypRanker, PallasAttRHRanker)
        best = make_best_ranker(model, B, "auto")
        assert not isinstance(best, kernel_types), (
            "'auto' should select the dense ranker"
        )
        assert isinstance(pallas, kernel_types), (
            f"backend='pallas' built {type(pallas).__name__}"
        )

    r1 = np.asarray(dense(params, jq, jf))
    r2 = np.asarray(pallas(params, jq, jf))
    diff = np.abs(r1 - r2)
    rel = diff / np.maximum(r1, 1)
    print(f"identical ranks: {int((r1 == r2).sum())}/{B}; "
          f"max abs diff {diff.max():.0f}, max rel diff {rel.max():.2e} "
          f"(MXU accumulation-order ties); "
          f"MRR delta {abs(np.mean(1 / r1) - np.mean(1 / r2)):.2e}")
    # a 1-ulp score tie can flip any rank by ±1 regardless of depth (the
    # suite's _assert_ranks_match uses the same |diff| <= 1 allowance);
    # beyond that, require relative agreement
    assert ((diff <= 1) | (rel < 1e-3)).all(), (diff.max(), rel.max())

    def bench(fn, n=20):
        np.asarray(fn(params, jq, jf))  # warm + fence (async dispatch would
        # otherwise bleed the warmup's device time into the timed window)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(params, jq, jf)
        # block_until_ready is unreliable through the axon tunnel; force a
        # host copy of the last output (device work executes in dispatch
        # order, so this fences the whole loop)
        np.asarray(out)
        return n * B / (time.perf_counter() - t0)

    # the remote-compile tunnel makes single trials swing multiples; report
    # the median of interleaved trials
    d_trials, p_trials = [], []
    for _ in range(5):
        d_trials.append(bench(dense))
        p_trials.append(bench(pallas))
    d_qps = float(np.median(d_trials))
    p_qps = float(np.median(p_trials))
    print(f"XLA dense ranker:  {d_qps:,.0f} queries/s "
          f"(trials {', '.join(f'{x/1e3:,.0f}k' for x in d_trials)})")
    print(f"Pallas fused:      {p_qps:,.0f} queries/s  ({p_qps / d_qps:.2f}x) "
          f"(trials {', '.join(f'{x/1e3:,.0f}k' for x in p_trials)})")

    # maskless subtract-filtered kernel (round-4 exact form: the filtered
    # scores now come from the SAME 2-D contraction form as the tile
    # kernel, so ranks should be IDENTICAL to the masked kernel — the old
    # batched-dot subtraction tied-and-shifted ~2% of queries by +-1)
    if os.environ.get("EVAL_BENCH_MASKLESS", "1") != "0":
        maskless = make_best_ranker(model, B, "pallas_maskless")
        assert getattr(maskless, "masked", None) is False, type(maskless)
        r3 = np.asarray(maskless(params, jq, jf))
        n_same = int((r2 == r3).sum())
        print(f"maskless vs masked kernel: identical ranks {n_same}/{B}, "
              f"max |diff| {np.abs(r3 - r2).max():.0f}")
        m_trials = [bench(maskless) for _ in range(5)]
        m_qps = float(np.median(m_trials))
        print(f"Pallas maskless:   {m_qps:,.0f} queries/s  "
              f"({m_qps / d_qps:.2f}x dense) "
              f"(trials {', '.join(f'{x/1e3:,.0f}k' for x in m_trials)})")

    # production path: whole-split scan-compiled ranking (one dispatch per
    # split via rank_many) — this is what compute_metrics actually runs
    from complexhyperbolickge_tpu.data.dataset import EvalPack
    from complexhyperbolickge_tpu.train.evaluate import get_ranking

    nq = 20000
    qs = np.stack([rng.integers(0, N_ENT, nq), rng.integers(0, N_REL, nq),
                   rng.integers(0, N_ENT, nq)], 1).astype(np.int32)
    fs = rng.integers(0, N_ENT, (nq, LMAX)).astype(np.int32)
    fs[:, -1] = qs[:, 2]
    fs = dedup_filter_rows(fs, N_ENT)
    pack = EvalPack(queries=qs, filter_idx=fs)
    split_arms = [("dense", dense), ("pallas", pallas)]
    if os.environ.get("EVAL_BENCH_MASKLESS", "1") != "0":
        split_arms.append(("pallas-maskless", maskless))
    for label, fn in split_arms:
        get_ranking(model, params, pack, B, rank_fn=fn)  # compile
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            get_ranking(model, params, pack, B, rank_fn=fn)
            trials.append(nq / (time.perf_counter() - t0))
        print(f"whole-split scan ({label}): {np.median(trials):,.0f} queries/s "
              f"(trials {', '.join(f'{x/1e3:,.0f}k' for x in trials)})")


if __name__ == "__main__":
    main()
