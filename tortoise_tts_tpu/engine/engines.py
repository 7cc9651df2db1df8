"""Multi-engine orchestrator (reference Engines, engines/base.py:319-656).

A dict of named (TrainState, step_fn) pairs stepped together per batch,
with flattened/averaged metric aggregation, joint checkpointing and
export — the reference's dict-of-engines behavior over pure states.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from .state import AsyncCheckpointer, TrainState, export_weights, \
    load_checkpoint, save_checkpoint

_logger = logging.getLogger(__name__)


def _any_rank(flag: bool) -> bool:
    """All-rank agreement that *any* rank raised a flag (reference OOM
    vote, engines/base.py:541-597) — used both for the skip decision
    and for the donated-state rewind decision so every rank takes the
    same branch.  psum over hosts via multihost_utils; single-process
    is a no-op."""
    import jax
    if jax.process_count() <= 1:
        return flag
    from jax.experimental import multihost_utils
    votes = multihost_utils.process_allgather(
        np.asarray([1 if flag else 0], np.int32))
    return bool(np.asarray(votes).sum() > 0)


def _state_intact(state: TrainState) -> bool:
    """True when every device buffer of the state is still alive.

    Train steps donate the input TrainState (donate_argnums=(0,)); a
    step that dies mid-execution (RESOURCE_EXHAUSTED) may already have
    consumed the donated buffers, so the pre-step state object cannot
    be reused for the next batch."""
    import jax
    for leaf in jax.tree_util.tree_leaves(state):
        if isinstance(leaf, jax.Array) and leaf.is_deleted():
            return False
    return True


class Engines:
    def __init__(self):
        self._engines: Dict[str, Dict[str, Any]] = {}
        # last checkpoint location — the recovery source when an OOM'd
        # donated step invalidates an engine's live state
        self._ckpt_dir: Optional[Path] = None
        # background checkpoint writer (save_checkpoint mode="async")
        self._saver = AsyncCheckpointer()

    def add(self, name: str, state: TrainState, step_fn: Callable,
            batch_selector: Optional[Callable] = None,
            config: Optional[dict] = None):
        """step_fn(state, batch) -> (state, metrics); batch_selector maps
        the global batch to this engine's batch (feeder role)."""
        self._engines[name] = {
            "state": state, "step": step_fn,
            "select": batch_selector or (lambda b: b),
            "config": config or {},
            # host-side mirror of state.step: reading the device scalar
            # costs a ~50-100 ms relay fetch per engine per access
            "host_step": int(state.step),
        }

    def __getitem__(self, name: str) -> TrainState:
        return self._engines[name]["state"]

    def __contains__(self, name):
        return name in self._engines

    def names(self):
        return list(self._engines)

    @property
    def global_step(self) -> int:
        return max((e["host_step"] for e in self._engines.values()),
                   default=0)

    def step(self, batch, fetch_metrics: bool = True) -> Dict[str, float]:
        """Step every engine on (its view of) the batch; metrics are
        namespaced `engine.metric` plus flat averages, with per-engine
        elapsed time and grad-norm aggregation
        (engines/base.py:508-656).

        ``fetch_metrics=False`` dispatches the step but leaves every
        metric on device and returns ``{}`` — through the remote relay
        a device->host fetch is a ~50-100 ms round trip per engine per
        step, so the trainer fetches only on its log cadence
        (trainer.log_frequency).

        OOM semantics (engines/base.py:541-597): a RESOURCE_EXHAUSTED
        during an engine's forward/step raises a local OOM flag; all
        ranks vote, and on agreement the batch is skipped for that
        engine (metrics mark ``skipped``) instead of aborting training.
        """
        metrics: Dict[str, float] = {}
        grad_norms = []
        for name, e in self._engines.items():
            t0 = time.time()
            oom = False
            try:
                state, m = e["step"](e["state"], e["select"](batch))
            except Exception as exc:
                msg = str(exc)
                if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg:
                    oom = True
                    m = {}
                else:
                    raise
            if _any_rank(oom):
                _logger.error("OOM during %s step — skipping batch", name)
                metrics[f"{name}.skipped"] = 1.0
                # donation hazard (engine/train_step.py donate_argnums):
                # the failed call may have consumed the donated state
                # buffers, so "keep using e['state']" is only safe when
                # they are all still alive.  The rewind decision must be
                # ALL-RANK AGREED (same allgather pattern as the OOM
                # vote): if only the ranks that lost buffers reloaded
                # the checkpoint, params/step would silently diverge
                # across hosts.  Reference semantics: OOM -> save/skip
                # and keep training valid (engines/base.py:538-597).
                if _any_rank(not _state_intact(e["state"])):
                    self._recover_state(name, e)
                continue
            if oom:
                # this rank OOM'd but others did not: there is no local
                # post-step state to continue from — abort rather than
                # silently reusing a stale one (ref engines/base.py:597)
                raise RuntimeError(
                    f"rank-local OOM in {name} without all-rank "
                    "agreement; aborting step")
            e["state"] = state
            e["host_step"] += 1
            if not fetch_metrics:
                continue
            # one device->host transfer for the engine's metric dict
            # (float(v) per scalar costs a ~50-100 ms relay fetch each)
            import jax
            m = jax.device_get(m)
            for k, v in m.items():
                metrics[f"{name}.{k}"] = float(v)
            metrics[f"{name}.elapsed_time"] = time.time() - t0
            if "grad_norm" in m:
                grad_norms.append(float(m["grad_norm"]))
            if e.get("wandb") is not None:
                try:
                    e["wandb"].log({k: float(v) for k, v in m.items()},
                                   step=e["host_step"])
                except Exception:
                    pass
        # averaged top-level loss across engines
        losses = [v for k, v in metrics.items() if k.endswith(".loss")]
        if losses:
            metrics["loss"] = float(np.mean(losses))
        if grad_norms:
            metrics["grad_norm"] = float(np.mean(grad_norms))
        return metrics

    def _recover_state(self, name: str, e: Dict[str, Any]):
        """Rebuild an engine's TrainState after a donated step died
        mid-execution: reload the last checkpoint (the step counter
        rewinds to it — the reference's OOM story is likewise
        checkpoint-based, save_on_oom + run.sh retry)."""
        if self._ckpt_dir is None:
            raise RuntimeError(
                f"engine {name}: state buffers were donated to a step "
                "that OOM'd, and no checkpoint has been written yet — "
                "cannot continue.  Save a checkpoint before training "
                "(trainer.save_frequency) or build the train step with "
                "donate=False (trainer.donate_train_state: false).")
        # an async save may still be writing the checkpoint we are
        # about to read back — join it first (also surfaces its errors)
        self.finish_saves()
        try:
            restored = load_checkpoint(self._ckpt_dir, name, e["state"],
                                       strict=True)
        except FileNotFoundError:
            raise RuntimeError(
                f"engine {name}: state buffers were donated to a step "
                f"that OOM'd and no checkpoint exists under "
                f"{self._ckpt_dir} — cannot continue.") from None
        if not _state_intact(restored):
            # an incomplete checkpoint left template (dead) leaves in
            # the restored tree — continuing would crash on first use
            raise RuntimeError(
                f"engine {name}: checkpoint under {self._ckpt_dir} did "
                "not cover every state leaf; cannot rebuild the donated "
                "state after OOM.")
        e["state"] = restored
        e["host_step"] = int(e["state"].step)
        _logger.warning("%s: state restored from checkpoint at step %d "
                        "after OOM invalidated the live buffers",
                        name, e["host_step"])

    def shard(self, mesh, mode: str = "replicated"):
        """Lay every engine's TrainState out on `mesh` per
        trainer.param_sharding: 'replicated' = DDP (+ megatron TP when
        the mesh has a model axis) with ZeRO-1 optimizer sharding;
        'fsdp' = ZeRO-3-role param sharding over 'data'."""
        import jax
        from ..parallel import mesh as pmesh
        rep = None
        for name, e in self._engines.items():
            s = e["state"]
            ps = pmesh.train_param_shardings(mesh, s.params, mode)
            oss = pmesh.opt_state_shardings(mesh, s.opt_state, s.params,
                                            mode=mode)
            if rep is None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                rep = NamedSharding(mesh, P())
            e["state"] = TrainState(
                jax.device_put(s.params, ps),
                jax.device_put(s.opt_state, oss),
                jax.device_put(s.step, rep),
                jax.device_put(s.samples_processed, rep),
                jax.device_put(s.tokens_processed, rep))
            _logger.info("%s: state sharded (%s) over %s", name, mode,
                         dict(mesh.shape))

    def set_lr(self, rate: float):
        """Apply `lr <x>` (reference engines.set_lr via trainer REPL):
        rewrites every engine's mutable LR scale so the *effective* LR
        becomes ``rate`` (exact for constant-LR configs; proportional
        scale under schedules)."""
        from .optim import set_lr_scale
        for name, e in self._engines.items():
            base = e["config"].get("base_lr")
            if not base:
                _logger.warning("%s: no base_lr recorded; skipping", name)
                continue
            s = e["state"]
            e["state"] = TrainState(s.params,
                                    set_lr_scale(s.opt_state, rate / base),
                                    s.step, s.samples_processed,
                                    s.tokens_processed)
            _logger.info("%s: lr -> %g (scale %.4g)", name, rate,
                         rate / base)

    def attach_wandb(self, project_prefix: str = "", wandb_params=None):
        """Per-engine wandb runs (reference engines/__init__.py:308-338
        incl. DDP run grouping)."""
        try:
            import wandb
        except ImportError:
            _logger.info("wandb not installed; logging disabled")
            return
        import jax
        for name, e in self._engines.items():
            kwargs = {"id": f"{project_prefix}{name}-run",
                      "resume": "allow",
                      "config": dict(e["config"])}
            if jax.process_count() > 1:
                kwargs["id"] = f"{project_prefix}{name}-run-" \
                               f"{jax.process_index()}"
                kwargs["group"] = "DDP-run"
            if wandb_params:
                kwargs.update(wandb_params)
            try:
                e["wandb"] = wandb.init(project=name, **kwargs)
            except Exception as exc:
                _logger.warning("wandb init failed for %s: %s", name, exc)
                e["wandb"] = None

    def save_checkpoint(self, ckpt_dir: Path, keep_last: int = 0,
                        is_leader: bool = True, mode: str = "sync"):
        """``mode="async"``: snapshot each engine's state on device and
        write in a background thread — the train loop stalls for the
        HBM copy only (the synchronous full-AR save measured 124.9 s of
        dead chip through the relay, round 4).  ``mode="sync"`` blocks
        until files are on disk — the right call for save_on_quit / OOM
        paths.  Call ``finish_saves()`` before process exit or reads of
        the latest checkpoint."""
        self._ckpt_dir = Path(ckpt_dir)
        if mode == "async":
            if not is_leader:
                return
            # snapshot every engine NOW (the only part that must see
            # the pre-donation buffers; step read from the host mirror
            # — no relay fetch), then one worker writes them all
            from .state import snapshot_state
            snaps = [(name, snapshot_state(e["state"]), e["host_step"],
                      None, None) for name, e in self._engines.items()]
            self._saver.submit(ckpt_dir, snaps, keep_last=keep_last)
            return
        self.finish_saves()
        for name, e in self._engines.items():
            save_checkpoint(ckpt_dir, name, e["state"],
                            int(e["state"].step), keep_last=keep_last,
                            is_leader=is_leader)

    def finish_saves(self):
        """Join any in-flight async checkpoint write (re-raises a
        writer-thread error here)."""
        self._saver.wait()

    def load_checkpoint(self, ckpt_dir: Path, strict: bool = True):
        self._ckpt_dir = Path(ckpt_dir)
        for name, e in self._engines.items():
            try:
                e["state"] = load_checkpoint(ckpt_dir, name, e["state"],
                                             strict=strict)
                e["host_step"] = int(e["state"].step)
                _logger.info("%s resumed at step %d", name, e["host_step"])
            except FileNotFoundError:
                pass

    def export(self, ckpt_dir: Path, weights_format: str = "sft",
               userdata: Optional[dict] = None):
        """Deployable fp32 export per engine (engines/base.py:356-400).
        schedule-free states export the x-average, not the y-iterates
        (optim.eval_params)."""
        from .optim import eval_params
        for name, e in self._engines.items():
            export_weights(eval_params(e["state"].params,
                                       e["state"].opt_state),
                           Path(ckpt_dir) / name / f"fp32.{weights_format}",
                           config={"name": name, **e["config"]},
                           stats={"step": int(e["state"].step)},
                           userdata=userdata)
