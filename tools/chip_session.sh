#!/bin/bash
# Round-4 queued chip measurement session (run by relay_watch.sh when
# the axon relay answers, or directly).  Writes to $1 (default
# /tmp/chip_session.log).
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/chip_session.log}
: > "$LOG"
run() { echo "=== $1 ===" >> "$LOG"; shift; "$@" >> "$LOG" 2>&1; }

run "bench single" timeout 1800 python bench.py

run "bench batch8 pipelined (stage timing)" env TTS_STAGE_TIMING=1 \
    BENCH_MODE=batch BENCH_BATCH=8 timeout 1800 python - <<'EOF'
import logging; logging.basicConfig(level=logging.INFO)
import runpy, sys
sys.argv = ["bench.py"]
runpy.run_path("bench.py", run_name="__main__")
EOF

run "bench batch16 pipelined (stage timing)" env TTS_STAGE_TIMING=1 \
    BENCH_MODE=batch BENCH_BATCH=16 timeout 1800 python - <<'EOF'
import logging; logging.basicConfig(level=logging.INFO)
import runpy, sys
sys.argv = ["bench.py"]
runpy.run_path("bench.py", run_name="__main__")
EOF

run "bench batch16 percall" env BENCH_BATCH_PERCALL=1 BENCH_MODE=batch \
    BENCH_BATCH=16 timeout 1800 python bench.py

run "bench candidates16" env BENCH_MODE=candidates timeout 1800 \
    python bench.py

run "train bench full-AR 55 steps" timeout 3000 python \
    tools/train_bench.py --steps 55 --batch 8

run "train bench LoRA 55 steps" timeout 3000 python \
    tools/train_bench.py --steps 55 --batch 8 --lora

echo "=== SESSION DONE ===" >> "$LOG"
