#!/usr/bin/env bash
# One sweep trial: train an FFT model with a hyperparameter tuple.
# Equivalent of reference tuning_fft.sh (fixed args at :5-14: multi_c,
# max_epochs 500, patience 30, valid every 5, init 1e-3, gamma 0,
# bias learn); called by run_tune_fft.sh via xargs.
#
# Args: MODEL DATASET REGULARIZER REG OPTIMIZER RANK BATCH NEG LR DOUBLE_NEG
set -euo pipefail
source "$(dirname "$0")/lock_utils.sh"

MODEL=$1; DATASET=$2; REGULARIZER=$3; REG=$4; OPTIMIZER=$5
RANK=$6; BATCH=$7; NEG=$8; LR=$9; DOUBLE_NEG=${10}

SAVE_BASE=${SWEEP_DIR:-sweeps}/${DATASET}/${MODEL}
SAVE_DIR=$(acquire_run_dir "${SAVE_BASE}")
echo "run dir: ${SAVE_DIR}"

# MAX_EPOCHS override exists for smoke tests (tests/test_end_to_end.py runs
# one real trial on the synthetic dataset); sweeps use the reference budget
python -m complexhyperbolickge_tpu.cli.run \
  --model "${MODEL}" --dataset "${DATASET}" \
  --regularizer "${REGULARIZER}" --reg "${REG}" \
  --optimizer "${OPTIMIZER}" --rank "${RANK}" \
  --batch_size "${BATCH}" --neg_sample_size "${NEG}" \
  --learning_rate "${LR}" --double_neg "${DOUBLE_NEG}" \
  --multi_c --max_epochs "${MAX_EPOCHS:-500}" --patience 30 --valid 5 \
  --init_size 0.001 --gamma 0.0 --bias learn --dtype float32 \
  --save_dir "${SAVE_DIR}"
