#!/usr/bin/env python
"""The test gate: run the whole suite sharded over FRESH interpreters.

    python tests/run_all.py            # the documented gate
    python tests/run_all.py --jobs 1   # serial (quieter logs)

Why not one `pytest tests/`: accumulating a few hundred XLA-CPU
compiles in one interpreter reliably segfaults a LATER compile
(`backend_compile_and_load` SIGSEGV ~170-180 tests in — a cumulative
compiler/allocator-state issue, not a test bug; every module passes in
isolation, and the full-scale census hit the same wall first — see
tests/test_zz_fullscale.py and memory/xla-cpu-compile-segfault.md).
Sharding the files over a few fresh interpreters keeps every process
far below the crash threshold while running the exact same tests.

Shard layout: the compile-heaviest modules run one-per-interpreter;
the rest are round-robined into --groups shards by size.  Exit code is
non-zero if ANY shard fails; the summary line totals pass/fail counts
across shards.
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# modules that compile large programs (e2e pipelines, vocoder grads,
# webui generate) — each gets its own interpreter
HEAVY = (
    "test_webui.py",
    "test_vocoders.py",
    "test_inference_e2e.py",
    "test_training.py",
    "test_sharded_inference.py",
)


def partition(files, n_groups: int):
    heavy = [f for f in files if f.name in HEAVY]
    light = [f for f in files if f.name not in HEAVY]
    groups = [[f] for f in heavy]
    light_groups = [[] for _ in range(max(1, n_groups))]
    # round-robin by descending size so shards stay balanced
    for i, f in enumerate(sorted(light, key=lambda p: -p.stat().st_size)):
        light_groups[i % len(light_groups)].append(f)
    return groups + [g for g in light_groups if g]


def run_group(idx: int, files, extra):
    cmd = [sys.executable, "-m", "pytest", "-q", "--tb=short",
           "-p", "no:cacheprovider", *extra,
           *[str(f) for f in files]]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                          timeout=3600)
    out = proc.stdout + proc.stderr
    passed = sum(int(m) for m in re.findall(r"(\d+) passed", out))
    failed = sum(int(m) for m in re.findall(r"(\d+) failed", out))
    errors = sum(int(m) for m in re.findall(r"(\d+) error", out))
    names = ", ".join(f.name for f in files)
    status = "ok" if proc.returncode == 0 else f"rc={proc.returncode}"
    print(f"[shard {idx}] {status:>6} {passed:>4} passed "
          f"{failed + errors:>2} failed  {time.time() - t0:6.1f}s  {names}",
          flush=True)
    if proc.returncode != 0:
        tail = "\n".join(out.splitlines()[-40:])
        print(f"[shard {idx}] ---- failure tail ----\n{tail}", flush=True)
    return proc.returncode, passed, failed + errors


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=5,
                    help="shards for the non-heavy modules")
    ap.add_argument("--jobs", type=int, default=2,
                    help="shards run concurrently")
    ap.add_argument("pytest_args", nargs="*",
                    help="extra args passed to every pytest shard")
    args = ap.parse_args(argv)

    files = sorted((ROOT / "tests").glob("test_*.py"))
    groups = partition(files, args.groups)
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=max(1, args.jobs)) as ex:
        results = list(ex.map(
            lambda ig: run_group(ig[0], ig[1], args.pytest_args),
            enumerate(groups)))
    # a shard killed by a signal returns a NEGATIVE code and prints no
    # "N failed" summary — max() would mask exactly the segfault class
    # this runner exists to catch
    bad = any(r[0] != 0 for r in results)
    passed = sum(r[1] for r in results)
    failed = sum(r[2] for r in results)
    print(f"==== {passed} passed, {failed} failed across {len(groups)} "
          f"shards in {time.time() - t0:.1f}s ====", flush=True)
    return 1 if bad or failed else 0


if __name__ == "__main__":
    sys.exit(main())
