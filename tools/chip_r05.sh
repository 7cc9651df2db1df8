#!/bin/bash
# Round-5 final bench session: every BASELINE config, atomically
# recorded in benchmarks/r05.json, loud failure on any missing row.
#   ./tools/chip_r05.sh [logfile]
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/chip_r05.log}
export JAX_COMPILATION_CACHE_DIR=.jax_cache
python tools/chip_r05.py 2>&1 | tee -a "$LOG"
