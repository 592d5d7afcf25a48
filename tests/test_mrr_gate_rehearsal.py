"""Dress rehearsal of the real-dataset MRR gate (round-4 verdict item 5).

The gate file (tests/test_realdata_gate.py) had only ever been
smoke-verified: the zero-egress image has no WN18RR pickles, so its own
code path — raw-file preprocessing, BOTH training legs (our CLI + the
executed reference under the published protocol, run.py:215-270), the
patience/valid model-selection loop, and the 0.5-pt MRR assertion — had
never executed end to end at gate scale.  This test runs the gate file
UNMODIFIED on generated reference-FORMAT data:

1. synthesize a structured KG (permutation relations — perfectly
   learnable, so both stacks' best-valid model selection converges to the
   same filtered-MRR plateau) as raw tab-separated string triples,
2. preprocess it with our kge-preprocess pipeline (data/preprocess.py —
   the same artifact layout the reference's datasets/process.py writes),
3. run `pytest tests/test_realdata_gate.py` in a subprocess with
   DATA_PATH pointing at the generated pickles and MRR_GATE_EPOCHS
   bounding the horizon (the gate's patience loop self-terminates ~150
   epochs after the plateau).

The real-data run on actual WN18RR remains the standing obligation
(BASELINE.md); this proves the gate machinery itself.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from complexhyperbolickge_tpu.data.preprocess import process_dataset

# ~65 min of CPU (the torch-f64 reference leg dominates: ~55 min to its
# ~epoch-265 early stop): opt-in like the realdata gate itself.
# RUN_REHEARSAL=1 python -m pytest tests/test_mrr_gate_rehearsal.py -v -s
# Executed + PASSING 2026-08-19: ours MRR=1.0000, reference MRR=1.0000
# (both saturate; |diff| = 0 < the 0.005 gate band; 1:05:31 wall).
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("RUN_REHEARSAL", "0") != "1",
        reason="gate dress rehearsal is opt-in (RUN_REHEARSAL=1): "
               "~65 min CPU for both training legs",
    ),
]

# Mid-size structured KG: permutation relations over N_ENT entities.  The
# gate's protocol is FIXED (rank 33, batch 500, neg 100, Adam lr 3e-4 from
# a 0.001-scale init, valid every 5, patience 30) — only the epoch horizon
# is tunable — so the KG must satisfy a measured constraint: Adam needs
# ~1-3k steps just to grow embeddings from the 0.001 init to signal scale
# (|Δparam| <= lr per step), and the patience window is 150 epochs, so
# the KG must supply >= ~20 steps/epoch or early stopping fires at chance
# during the warm-up (a 200-entity/6-relation probe with 2 steps/epoch
# early-stopped at MRR 0.02, 2026-08-19).  20 relations x 800 entities
# -> 16k triples, 24 steps/epoch: onset ~epoch 40, patience-safe.
# Measured trajectory (ours leg, 2026-08-19): valid MRR 1.000 by epoch
# ~110, so both stacks' best-valid model selection converges to the SAME
# saturated plateau and the gate's 0.5-pt assertion is robust; patience
# (30 evals x 5) self-terminates ~epoch 265 — 400 is headroom.
N_ENT, N_REL = 800, 20
EPOCHS = int(os.environ.get("REHEARSAL_EPOCHS", "400"))

# Skewed window-noise distribution for the NON-saturating variant (r05
# verdict item 1): tail = head + off_r + u with u ~ P below, each (h, r)
# appearing exactly once in the whole dataset, so filters never hide the
# confusion.  Bayes-optimal filtered MRR = sum_i p_i / (i+1) ~ 0.642 at
# K=4 — a mid-range plateau where a clamp/precision/sampler bug costing
# 1-3 MRR points FAILS the gate's ±0.5-pt band (the saturating variant
# cannot detect that class).  The skew matters: the Bayes-optimal
# within-window ORDER is then systematic (rank by p, geometrically
# representable as a rotation target at offset δ ∈ (0, 0.5) inside the
# window), so both stacks converge to the SAME ordering and cross-stack
# MRR spread stays well inside the band — with UNIFORM noise the
# within-window order is idiosyncratic per stack and the spread (~±1 pt
# at this split size) would blow the band without any bug.
NOISE_P = (0.4, 0.3, 0.2, 0.1)

# Data-generation seed for the per-seed band (REHEARSAL_DATA_SEED=8 ...):
# each seed draws different relation offsets / noise table / split shuffle,
# so running the noisy variant across seeds measures the cross-stack MRR
# spread the ±0.5-pt band must dominate.
DATA_SEED = int(os.environ.get("REHEARSAL_DATA_SEED", "7"))


def write_raw_dataset(root: str, noisy: bool = False) -> None:
    """Reference-format raw files: {train,valid,test} of tab-separated
    string triples under <root>/WN18RR (the gate hardcodes the dataset
    name; format per reference datasets/process.py:10-53)."""
    rng = np.random.default_rng(DATA_SEED)
    k_noise = len(NOISE_P) if noisy else 1
    offsets = rng.choice(np.arange(1, N_ENT - k_noise), size=N_REL,
                         replace=False)
    if noisy:
        u = rng.choice(k_noise, p=NOISE_P, size=(N_REL, N_ENT))
    else:
        u = np.zeros((N_REL, N_ENT), dtype=np.int64)
    triples = [
        (i, k, (i + int(off) + int(u[k, i])) % N_ENT)
        for k, off in enumerate(offsets)
        for i in range(N_ENT)
    ]
    triples = np.asarray(triples, dtype=np.int64)
    triples = triples[rng.permutation(len(triples))]
    n_eval = len(triples) // 12
    splits = {
        "valid": triples[:n_eval],
        "test": triples[n_eval: 2 * n_eval],
        "train": triples[2 * n_eval:],
    }
    ds = os.path.join(root, "WN18RR")
    os.makedirs(ds, exist_ok=True)
    for name, arr in splits.items():
        with open(os.path.join(ds, name), "w") as f:
            for h, r, t in arr:
                f.write(f"/c/en/ent_{h:05d}\t_rel_{r}\t/c/en/ent_{t:05d}\n")


def _run_gate_on(tmp_path, noisy: bool):
    data_path = str(tmp_path / "data")
    write_raw_dataset(data_path, noisy=noisy)
    # our preprocessing pipeline -> the pickle artifacts the gate requires
    examples, filters = process_dataset(os.path.join(data_path, "WN18RR"))
    assert examples["train"].shape[1] == 3
    assert len(filters["rhs"]) > 0

    env = dict(os.environ)
    env.update(
        DATA_PATH=data_path,
        MRR_GATE_EPOCHS=str(EPOCHS),
        # the subprocess collects tests/conftest.py -> CPU pin + x64, but
        # belt-and-braces against the axon sitecustomize (CLAUDE.md): the
        # gate must not reach for the TPU tunnel mid-suite
        JAX_PLATFORMS="cpu",
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         "tests/test_realdata_gate.py", "-x", "-q", "-s",
         "-p", "no:cacheprovider"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=12600,
    )
    tail = (r.stdout or "")[-4000:] + "\n" + (r.stderr or "")[-2000:]
    assert r.returncode == 0, f"gate run failed:\n{tail}"
    assert "1 passed" in r.stdout, tail
    # surface the gate's printed MRRs in -s runs
    mrrs = []
    for line in r.stdout.splitlines():
        if "MRR=" in line:
            print(line)
            mrrs.append(float(line.rsplit("MRR=", 1)[1]))
    return mrrs


def test_gate_file_runs_on_generated_pickles(tmp_path):
    """Saturating variant: both stacks converge to MRR 1.0 on the noiseless
    permutation KG — proves the gate MACHINERY end to end (preprocess, both
    training legs, patience loop, assertion), not parity resolution."""
    _run_gate_on(tmp_path, noisy=False)


def test_gate_nonsaturating_mid_plateau(tmp_path):
    """DISCRIMINATING variant (r05 verdict item 1): skewed window noise
    gives a mid-range Bayes plateau (~0.64), so the gate's ±0.5-pt band can
    actually fail for the bug class it targets (a straight-through-clamp /
    precision / sampler bug costs points here instead of still hitting 1.0).

    Execution record (per-seed band):

    - seed 7 (2026-08-20, 2:11:24 wall): PASSED at the non-saturated
      plateau — reference MRR=0.6068 (vs the ~0.642 Bayes estimate), ours
      within the ±0.5-pt band by the gate's assertion.  Caveat in the
      original run: a stray SIGTERM from session cleanup hit OUR leg ~19
      min in; it checkpointed and stopped at the epoch boundary (the
      SIGTERM-safe path), so ours trained on a TRUNCATED horizon and its
      exact MRR print was lost.  COMPLETED same day via
      scripts/rehearsal_ours_leg.py (same seed-7 dataset, full horizon,
      10.4 min wall uncontended): ours MRR=0.6108 — |Δ| = 0.40 pt,
      inside the band at full budget on both legs.
    - seed 8 (2026-08-20, 1:49:13 wall, CLEAN — both legs full-horizon):
      PASSED — ours MRR=0.6136, reference MRR=0.6110, |Δ| = 0.26 pt,
      about half the ±0.5-pt band, at the non-saturated plateau.
    - Per-seed band: the reference plateau moved 0.6068 → 0.6110 across
      seeds (different noise tables / splits); cross-stack deltas at the
      two full-horizon seeds are 0.40 pt (seed 7) and 0.26 pt (seed 8) —
      the ±0.5-pt band dominates the measured cross-stack spread (1.25-2x
      margin), and the plateau sits where a 1-3-pt bug class is
      resolvable.  Runs are ~2 h CPU each (the torch-f64 reference leg
      dominates; our leg alone is ~10 min uncontended —
      scripts/rehearsal_ours_leg.py re-runs just it).
    - Within-stack noise floor (2026-08-20, data seed 7 FIXED, our leg
      swept over training seeds via --train_seed): MRR 0.6108 / 0.6084 /
      0.6093 / 0.6111 at train seeds 0-3 — a 0.27-pt range from PRNG
      draw alone (init + negative sampling + shuffles).  The cross-stack
      deltas above (0.26-0.40 pt) are therefore comparable to
      single-stack seed noise — no evidence of systematic cross-stack
      bias (reference 0.6068 sits 0.16 pt below the lowest ours seed) —
      and the ±0.5-pt band is calibrated at ~2x that floor: tight enough
      to catch the 1-3-pt bug class, loose enough not to flag seed luck.
    """
    mrrs = _run_gate_on(tmp_path, noisy=True)
    # non-saturation guard: the whole point of this variant is a plateau
    # the band can resolve — if data/protocol drift ever saturates it
    # (MRR ~ 1.0) or collapses it to chance, the rehearsal stops proving
    # anything and must fail loudly, not silently pass
    assert mrrs, "gate printed no MRR lines"
    assert all(0.30 <= m <= 0.90 for m in mrrs), mrrs
