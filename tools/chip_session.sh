#!/bin/bash
# One-shot measurement session for round-3 perf candidates (run when
# the axon relay is up).  Each variant is a separate process so env
# gates are read fresh; compiles cache under .jax_cache.
cd "$(dirname "$0")/.."
L=${1:-/tmp/chip_session.log}
: > "$L"
run() { echo "=== $*" | tee -a "$L"; timeout 900 env "${@:2}" \
        python tools/perf_lab.py "$1" 2>&1 | grep -v WARNING | tee -a "$L"; }

# 1. decode: int8 vs w8a8 GEMV roofs + ablation decomposition
run roofq
run roofw8a8
run decablate TTS_DECODE_QUANT=int8 TTS_ABLATE_DEC=noattn
run decode    TTS_DECODE_QUANT=int8
run decode    TTS_DECODE_QUANT=int8 TTS_QGEMV_LN=1
run decode    TTS_DECODE_QUANT=w8a8
run decode    TTS_DECODE_QUANT=w8a8 TTS_QGEMV_LN=1
run decode    TTS_DECODE_QUANT=w8a8 TTS_QGEMV_LN=1 TTS_DECODE_UNROLL=4

# 2. denoiser: XLA default vs vt attention vs fused resblock vs both
run denoiser TTS_DENOISER_T=896
run denoiser TTS_DENOISER_T=896 TTS_FLASH_VT=1
run denoiser TTS_DENOISER_T=896 TTS_FUSED_RESBLOCK=1
run denoiser TTS_DENOISER_T=896 TTS_FLASH_VT=1 TTS_FUSED_RESBLOCK=1
run denoiser TTS_DENOISER_T=896 TTS_FLASH_VT=1 TTS_FLASH_VT_EXP2=1

# 3. vocoder: exact sin (default) vs poly sin2
run vocoder
run vocoder TTS_SNAKE_SIN=poly

echo "=== bench int8 (baseline config)" | tee -a "$L"
timeout 1800 python bench.py 2>&1 | grep -v WARNING | tee -a "$L"
echo "=== bench w8a8" | tee -a "$L"
timeout 1800 env BENCH_QUANT=w8a8 python bench.py 2>&1 | grep -v WARNING | tee -a "$L"
