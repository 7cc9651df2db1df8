"""Round-5 round-end measurement driver (VERDICT r4 next #2).

Runs EVERY BASELINE config on the real chip and atomically records the
results in benchmarks/r05.json — failing LOUDLY (exit 1 + explicit
MISSING list) when any row did not produce a number, so a half-empty
record can never be committed silently again (the r4 failure mode).

    python tools/chip_r05.py [--out benchmarks/r05.json] [--only row,...]

Rows (BASELINE.md configs #1-#5):
  single_rtf                      bench.py (AR-200, DDIM-50 cond-free,
                                  BigVGAN, int8 decode)
  single_rtf_dpmpp25              fast preset (opt-in; see PARITY.md)
  batch8/16 pipelined + per-call  bench.py BENCH_MODE=batch
  candidates16_rtf                bench.py BENCH_MODE=candidates
  stream_first_chunk_ms           bench.py BENCH_MODE=stream
  decode_b1/b8/b16                perf_lab decode (int8)
  training                        tools/train_bench.py --steps 55
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run(argv, env=None, timeout=5400):
    e = dict(os.environ)
    e.setdefault("JAX_COMPILATION_CACHE_DIR", str(ROOT / ".jax_cache"))
    e.update(env or {})
    t0 = time.time()
    print(f"--- {' '.join(argv)} env={env or {}}", flush=True)
    try:
        out = subprocess.run(argv, cwd=ROOT, env=e, timeout=timeout,
                             capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print(f"    TIMEOUT after {timeout}s", flush=True)
        return None
    print(f"    rc={out.returncode} {time.time()-t0:.0f}s", flush=True)
    if out.returncode != 0:
        print(out.stdout[-2000:], out.stderr[-2000:], flush=True)
        return None
    return out.stdout


def _bench_json(stdout):
    """Last JSON object line in a bench run's stdout."""
    if stdout is None:
        return None
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _decode_tok_s(stdout):
    if stdout is None:
        return None
    m = re.search(r"= ([\d.]+) ms/token = (\d+) mel-tokens/s/chip",
                  stdout)
    return ({"ms_per_token": float(m.group(1)),
             "mel_tokens_per_s": int(m.group(2))} if m else None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(ROOT / "benchmarks" / "r05.json"))
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    py = sys.executable
    bench = [py, "bench.py"]
    rows = {
        "single_rtf": (bench, {}, "value"),
        "single_rtf_dpmpp25": (bench, {"BENCH_SAMPLER": "dpm++",
                                       "BENCH_DIFF_STEPS": "25"}, "value"),
        "batch8_audio_sec_per_s": (bench, {"BENCH_MODE": "batch",
                                           "BENCH_BATCH": "8"}, "value"),
        "batch8_audio_sec_per_s_percall": (
            bench, {"BENCH_MODE": "batch", "BENCH_BATCH": "8",
                    "BENCH_BATCH_PERCALL": "1"}, "value"),
        "batch16_audio_sec_per_s": (bench, {"BENCH_MODE": "batch",
                                            "BENCH_BATCH": "16"}, "value"),
        "batch16_audio_sec_per_s_percall": (
            bench, {"BENCH_MODE": "batch", "BENCH_BATCH": "16",
                    "BENCH_BATCH_PERCALL": "1"}, "value"),
        "candidates16_rtf": (bench, {"BENCH_MODE": "candidates"}, "value"),
        "stream_first_chunk_ms": (bench, {"BENCH_MODE": "stream"}, None),
        "decode_b1": ([py, "tools/perf_lab.py", "decode"],
                      {"TTS_DECODE_B": "1", "TTS_DECODE_QUANT": "int8"},
                      _decode_tok_s),
        "decode_b8": ([py, "tools/perf_lab.py", "decode"],
                      {"TTS_DECODE_B": "8", "TTS_DECODE_QUANT": "int8"},
                      _decode_tok_s),
        "decode_b16": ([py, "tools/perf_lab.py", "decode"],
                       {"TTS_DECODE_B": "16", "TTS_DECODE_QUANT": "int8"},
                       _decode_tok_s),
        "training": ([py, "tools/train_bench.py", "--steps", "55",
                      "--batch", "8"], {}, "json"),
    }

    result = {
        "round": 5,
        "hardware": "TPU v5e (1 chip, axon relay)",
        "budgets": {"ar_steps": 200, "diffusion": "ddim-50 cond_free",
                    "vocoder": "bigvgan", "decode_quant": "int8"},
        "configs": {},
    }
    # --only reruns merge into the existing record instead of
    # clobbering the other rows
    out_path = Path(args.out)
    if out_path.exists():
        try:
            prev = json.loads(out_path.read_text())
            result["configs"] = prev.get("configs", {})
            if "training" in prev:
                result["training"] = prev["training"]
        except json.JSONDecodeError:
            pass
    missing = []
    for name, (argv, env, how) in rows.items():
        if only and name not in only:
            continue
        out = _run(argv, env)
        if callable(how):
            val = how(out)
        else:
            j = _bench_json(out)
            if j is None:
                val = None
            elif how == "json":
                val = j
            elif how is None:
                val = {k: v for k, v in j.items() if k != "metric"}
            else:
                val = j.get(how)
        if val is None:
            missing.append(name)
            print(f"!!! {name}: MISSING", flush=True)
        else:
            print(f"+++ {name}: {val}", flush=True)
        key = "training" if name == "training" else name
        tgt = result if name == "training" else result["configs"]
        tgt[key] = val
        # write-through after every row: a crashed later row never
        # loses earlier measurements (atomic replace)
        tmp = Path(args.out).with_suffix(".tmp")
        tmp.parent.mkdir(parents=True, exist_ok=True)
        result["missing"] = _missing_rows(result, rows)
        tmp.write_text(json.dumps(result, indent=2) + "\n")
        os.replace(tmp, args.out)

    # the fail-loud verdict comes from the MERGED record, not just the
    # rows this invocation ran: a --only rerun must not report "all
    # recorded" while an earlier null (or a never-run row) persists
    missing = _missing_rows(result, rows)
    print(json.dumps(result, indent=2))
    if missing:
        print(f"FAILED: missing rows: {missing}", file=sys.stderr)
        return 1
    print("ALL ROWS RECORDED:", args.out)
    return 0


def _missing_rows(result, rows):
    out = []
    for name in rows:
        val = (result.get("training") if name == "training"
               else result["configs"].get(name))
        if val is None:
            out.append(name)
    return out


if __name__ == "__main__":
    sys.exit(main())
