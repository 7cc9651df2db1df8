"""Multi-engine orchestrator (reference Engines, engines/base.py:319-656).

A dict of named (TrainState, step_fn) pairs stepped together per batch,
with flattened/averaged metric aggregation, joint checkpointing and
export — the reference's dict-of-engines behavior over pure states.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from .state import TrainState, export_weights, load_checkpoint, \
    save_checkpoint

_logger = logging.getLogger(__name__)


class Engines:
    def __init__(self):
        self._engines: Dict[str, Dict[str, Any]] = {}

    def add(self, name: str, state: TrainState, step_fn: Callable,
            batch_selector: Optional[Callable] = None,
            config: Optional[dict] = None):
        """step_fn(state, batch) -> (state, metrics); batch_selector maps
        the global batch to this engine's batch (feeder role)."""
        self._engines[name] = {
            "state": state, "step": step_fn,
            "select": batch_selector or (lambda b: b),
            "config": config or {},
        }

    def __getitem__(self, name: str) -> TrainState:
        return self._engines[name]["state"]

    def __contains__(self, name):
        return name in self._engines

    def names(self):
        return list(self._engines)

    @property
    def global_step(self) -> int:
        return max((int(e["state"].step) for e in self._engines.values()),
                   default=0)

    def step(self, batch) -> Dict[str, float]:
        """Step every engine on (its view of) the batch; metrics are
        namespaced `engine.metric` plus flat averages
        (engines/base.py:508-656)."""
        metrics: Dict[str, float] = {}
        for name, e in self._engines.items():
            state, m = e["step"](e["state"], e["select"](batch))
            e["state"] = state
            for k, v in m.items():
                metrics[f"{name}.{k}"] = float(v)
        # averaged top-level loss across engines
        losses = [v for k, v in metrics.items() if k.endswith(".loss")]
        if losses:
            metrics["loss"] = float(np.mean(losses))
        return metrics

    def save_checkpoint(self, ckpt_dir: Path, keep_last: int = 0,
                        is_leader: bool = True):
        for name, e in self._engines.items():
            save_checkpoint(ckpt_dir, name, e["state"],
                            int(e["state"].step), keep_last=keep_last,
                            is_leader=is_leader)

    def load_checkpoint(self, ckpt_dir: Path, strict: bool = True):
        for name, e in self._engines.items():
            try:
                e["state"] = load_checkpoint(ckpt_dir, name, e["state"],
                                             strict=strict)
                _logger.info("%s resumed at step %d", name,
                             int(e["state"].step))
            except FileNotFoundError:
                pass

    def export(self, ckpt_dir: Path, weights_format: str = "sft"):
        """Deployable fp32 export per engine (engines/base.py:356-400)."""
        for name, e in self._engines.items():
            export_weights(e["state"].params,
                           Path(ckpt_dir) / name / f"fp32.{weights_format}",
                           config={"name": name, **e["config"]},
                           stats={"step": int(e["state"].step)})
