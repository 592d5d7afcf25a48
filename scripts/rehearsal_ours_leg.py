"""Run ONLY the 'ours' training leg of the MRR-gate rehearsal.

Purpose: complete a per-seed rehearsal record when one leg's result was
lost (e.g. the seed-7 noisy run of 2026-08-20: a stray SIGTERM truncated
our leg and its test-MRR print was lost while the full-horizon reference
leg recorded 0.6068 — see tests/test_mrr_gate_rehearsal.py's changelog).
Re-running just our leg on the SAME generated dataset (the data seed
fully determines it) recovers the missing number without paying for the
~55-90 min torch-f64 reference leg again.

Usage (from the repo root; CPU-pinned like the rehearsal itself):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/rehearsal_ours_leg.py --seed 7 --noisy

Prints the final `ours MRR=...` line in the same format the gate does.
Protocol is the gate's, unmodified (tests/test_realdata_gate.py:
published FFTRotH WN18RR config, reference run.py:215-270).
"""

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=7,
                    help="rehearsal data seed (REHEARSAL_DATA_SEED)")
    ap.add_argument("--noisy", action="store_true",
                    help="use the non-saturating skewed-window-noise KG")
    ap.add_argument("--epochs", type=int, default=400,
                    help="epoch horizon (the gate's patience loop "
                         "self-terminates well before this)")
    ap.add_argument("--train_seed", type=int, default=0,
                    help="OUR leg's training PRNG seed (gate default 0); "
                         "sweep it at a fixed data seed to measure the "
                         "within-stack MRR spread the gate band must "
                         "dominate")
    args = ap.parse_args()

    # The rehearsal/gate module globals are read from env at import time.
    os.environ["REHEARSAL_DATA_SEED"] = str(args.seed)
    os.environ["MRR_GATE_EPOCHS"] = str(args.epochs)
    os.environ["MRR_GATE_TRAIN_SEED"] = str(args.train_seed)

    from complexhyperbolickge_tpu.data.preprocess import process_dataset
    from tests.test_mrr_gate_rehearsal import write_raw_dataset

    with tempfile.TemporaryDirectory() as tmp:
        data_path = os.path.join(tmp, "data")
        write_raw_dataset(data_path, noisy=args.noisy)
        process_dataset(os.path.join(data_path, "WN18RR"))
        os.environ["DATA_PATH"] = data_path

        # Import AFTER DATA_PATH is set: the gate module resolves its
        # dataset location at import.
        from tests.test_realdata_gate import _train_ours

        t0 = time.time()

        class _P:  # tmp_path stand-in: the gate only does tmp_path / "ours"
            def __truediv__(self, name):
                return os.path.join(tmp, name)

        mrr = _train_ours(_P())
        dt = time.time() - t0
        print(f"\n[rehearsal_ours_leg] seed={args.seed} noisy={args.noisy} "
              f"train_seed={args.train_seed} epochs<={args.epochs} "
              f"wall={dt/60:.1f} min")
        print(f"WN18RR FFTRotH ours: MRR={mrr:.4f}")


if __name__ == "__main__":
    main()
