#!/usr/bin/env bash
# One-command real-dataset MRR parity gate (round-2 verdict item 7).
#
# In any data-present environment:
#   ./scripts/mrr_gate.sh
# downloads + preprocesses the KGEmb bundle if absent, then trains the
# published WN18RR FFTRotH config on BOTH stacks (this framework and the
# reference at /root/reference, executed in-process) and asserts final
# test MRR within 0.5 points.  See tests/test_realdata_gate.py for the
# protocol and expected wall-clock; MRR_GATE_EPOCHS=N shortens both legs
# for smoke runs.
set -euo pipefail
cd "$(dirname "$0")/.."
DATA_PATH=${DATA_PATH:-data}
export DATA_PATH

if [ ! -f "${DATA_PATH}/WN18RR/train.pickle" ]; then
  echo "WN18RR pickles not found under ${DATA_PATH} — fetching + preprocessing"
  ./scripts/download_data.sh   # zero-egress images fail loudly here
fi

exec python -m pytest tests/test_realdata_gate.py -v -s "$@"
