#!/bin/bash
# Trimmed priority-ordered A/B session: denoiser + vocoder variants first
# (the remaining perf headroom), then decode variants.  Logs to $1.
cd "$(dirname "$0")/.."
L=${1:-/tmp/chip_trim.log}
: > "$L"
run() { echo "=== $*" | tee -a "$L"; timeout 900 env "${@:2}" \
        python tools/perf_lab.py "$1" 2>&1 | grep -v '^WARNING' | tee -a "$L"; }

# denoiser: XLA default vs vt attention vs fused resblock vs both
run denoiser TTS_DENOISER_T=896
run denoiser TTS_DENOISER_T=896 TTS_FLASH_VT=1
run denoiser TTS_DENOISER_T=896 TTS_FLASH_VT=1 TTS_FLASH_VT_EXP2=1
run denoiser TTS_DENOISER_T=896 TTS_FUSED_RESBLOCK=1
run denoiser TTS_DENOISER_T=896 TTS_FLASH_VT=1 TTS_FUSED_RESBLOCK=1

# vocoder: exact sin (default) vs poly sin2
run vocoder
run vocoder TTS_SNAKE_SIN=poly

# decode: int8 (current default) vs w8a8, LN fusion on top
run decode TTS_DECODE_QUANT=int8
run decode TTS_DECODE_QUANT=int8 TTS_QGEMV_LN=1
run decode TTS_DECODE_QUANT=w8a8
echo "=== done" | tee -a "$L"
