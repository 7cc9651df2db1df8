"""Profiling / tracing helpers (SURVEY §5 aux subsystems).

Replaces the reference's DeepSpeed flops profiler + wall-clock timer
(config.py:549-556, utils/utils.py:89-104) with jax.profiler traces and
a simple timer context.
"""

from __future__ import annotations

import contextlib
import logging
import time
from pathlib import Path

_logger = logging.getLogger(__name__)


@contextlib.contextmanager
def timer(name: str = "", callback=None):
    """Wall-clock timer context (reference utils/utils.py:89-104)."""
    t0 = time.time()
    try:
        yield
    finally:
        # log even when the timed block raises — failing runs are the
        # ones whose timing matters most
        dt = time.time() - t0
        if callback:
            callback(dt)
        else:
            _logger.info("%s took %.3fs", name or "block", dt)


@contextlib.contextmanager
def trace(log_dir: str | Path = "logs/trace"):
    """jax.profiler trace context — view with tensorboard/xprof."""
    import jax
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        _logger.info("profiler trace written to %s", log_dir)


def estimate_flops_per_token(layers: int, model_dim: int) -> int:
    """Dense-transformer FLOPs/token (fwd) — flops-profiler stand-in."""
    return 2 * layers * (4 * model_dim * model_dim      # qkv+proj
                         + 8 * model_dim * model_dim)   # mlp 4x


class WandbLogger:
    """Optional wandb metric sink (reference engines/__init__.py:308-338);
    silently disabled when wandb is not installed."""

    def __init__(self, project: str = "tortoise-tts-tpu", name: str = "",
                 config: dict | None = None, enabled: bool = True):
        self._run = None
        if not enabled:
            return
        try:
            import wandb
            self._run = wandb.init(project=project, name=name or None,
                                   config=config or {})
        except Exception:
            _logger.info("wandb unavailable; metrics logged locally only")

    def log(self, metrics: dict, step: int | None = None):
        if self._run is not None:
            self._run.log(metrics, step=step)

    def finish(self):
        if self._run is not None:
            self._run.finish()
