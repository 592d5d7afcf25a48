#!/usr/bin/env bash
# Fetch + preprocess the standard KGEmb dataset bundle (WN18RR, FB237, FB15K,
# WN, YAGO3-10) — counterpart of reference datasets/download.sh.
# Usage: DATA_PATH=./data ./scripts/download_data.sh
set -euo pipefail
DATA_PATH=${DATA_PATH:-data}
mkdir -p "${DATA_PATH}"
curl -L https://dl.fbaipublicfiles.com/kbc/data.tar.gz | tar xz -C "${DATA_PATH}" --strip-components=1
DATA_PATH="${DATA_PATH}" python -m complexhyperbolickge_tpu.data.preprocess
