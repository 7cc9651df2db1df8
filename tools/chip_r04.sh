#!/bin/bash
# Round-4 final bench session: official BENCH rows + the DPM++-25 fast
# preset evidence.  Writes to $1 (default /tmp/chip_r04.log).
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/chip_r04.log}
: > "$LOG"
export JAX_COMPILATION_CACHE_DIR=.jax_cache
run() { echo "=== $1 ===" >> "$LOG"; shift; "$@" >> "$LOG" 2>&1; }

run "bench single"        timeout 2400 python bench.py
run "bench single dpm++25" env BENCH_SAMPLER=dpm++ BENCH_DIFF_STEPS=25 \
    timeout 2400 python bench.py
run "bench batch8"        env BENCH_MODE=batch BENCH_BATCH=8 \
    timeout 2400 python bench.py
run "bench batch16"       env BENCH_MODE=batch BENCH_BATCH=16 \
    timeout 2400 python bench.py
run "bench batch16 percall" env BENCH_MODE=batch BENCH_BATCH=16 \
    BENCH_BATCH_PERCALL=1 timeout 2400 python bench.py
run "bench batch16 dpm++25" env BENCH_MODE=batch BENCH_BATCH=16 \
    BENCH_SAMPLER=dpm++ BENCH_DIFF_STEPS=25 timeout 2400 python bench.py
run "bench candidates16"  env BENCH_MODE=candidates timeout 2400 \
    python bench.py
echo "=== R04 DONE ===" >> "$LOG"
