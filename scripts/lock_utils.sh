#!/usr/bin/env bash
# flock-protected unique run-directory allocation for parallel sweeps
# (equivalent of reference lock_utils.sh:3-25: prevents checkpoint-dir
# collisions between concurrently launched sweep processes).

acquire_run_dir() {
  local base="$1"
  local lock="${base}/.sweep.lock"
  mkdir -p "${base}"
  (
    flock -x 200
    local i=0
    while [ -e "${base}/run_${i}" ]; do i=$((i + 1)); done
    mkdir "${base}/run_${i}"
    echo "${base}/run_${i}"
  ) 200>"${lock}"
}
