#!/usr/bin/env bash
# Hyperparameter sweep driver: pipes tuples into tune_fft.sh, PARALLEL
# trials at a time (equivalent of reference run_tuning_fft.sh:5-17; on TPU
# parallel trials time-share one chip — prefer PARALLEL=1 per chip).
#
#   PARALLEL=1 ./scripts/run_tune_fft.sh
set -euo pipefail
PARALLEL=${PARALLEL:-1}

# MODEL DATASET REG_NAME REG OPT RANK BATCH NEG LR DOUBLE_NEG
# (the reference's published best configs, README.md:52-62)
# -L 1: one tuple LINE per invocation (xargs -L N bundles N lines; the
# previous -L 10 packed all six tuples into a single call that only read
# its first ten positionals — one trial ran, five were silently skipped)
xargs -L 1 -P "${PARALLEL}" "$(dirname "$0")/tune_fft.sh" <<EOF
FFTRotH WN18RR N3 0.0 Adam 33 500 100 3e-4 1
FFTRefH WN18RR N3 0.0 Adam 33 500 100 3e-4 1
FFTAttH WN18RR N3 0.0 Adam 33 500 100 4e-4 1
FFTRotH FB237 N3 0.0 Adam 33 100 100 2e-4 0
FFTRefH FB237 N3 0.0 Adagrad 33 500 250 2e-2 0
FFTAttH FB237 N3 0.0 Adagrad 33 500 100 3e-2 0
EOF
