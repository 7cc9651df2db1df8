"""Subprocess wrapper for the full-scale census + int8 guardrail.

tests/fullscale_census.py instantiates every reference model at
published-checkpoint scale; running those multi-GB torch+jax programs
in the same interpreter as the rest of the suite reliably segfaulted a
LATER XLA CPU compile (three different sites, always ~170 tests in — a
cumulative compiler/allocator-state issue, not a test bug; each module
passes in isolation).  A fresh interpreter sidesteps it deterministically.
"""

import os
import subprocess
import sys
from pathlib import Path


def test_fullscale_census_subprocess():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    root = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, "-m", "pytest",
         str(root / "tests" / "fullscale_census.py"), "-q", "--tb=short"],
        cwd=root, env=env, capture_output=True, text=True, timeout=2400)
    tail = "\n".join(proc.stdout.splitlines()[-15:])
    assert proc.returncode == 0, \
        f"full-scale census failed (rc={proc.returncode}):\n{tail}\n" \
        f"{proc.stderr[-2000:]}"
    assert " passed" in proc.stdout
