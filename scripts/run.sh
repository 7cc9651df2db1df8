#!/usr/bin/env bash
# Crash-retry supervision loop (reference scripts/run.sh): re-runs the
# given command until it exits 0, e.g.
#   ./scripts/run.sh python -m tortoise_tts_tpu.train --yaml cfg.yaml
until "$@"; do echo "retrying: $*"; sleep 1; done
