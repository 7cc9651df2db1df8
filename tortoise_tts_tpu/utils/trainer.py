"""Training loop (capability-parity with reference utils/trainer.py).

- infinite-epoch batch iterator, per-step jitted engine step,
- JSON metric log lines (consumed by plot.py; trainer.py:190-194),
- non-blocking stdin command REPL: ``save``, ``quit``, ``eval``,
  ``lr <x>`` (trainer.py:64-101), broadcast to all hosts,
- save/eval scheduling by frequency (trainer.py:258-288).
"""

from __future__ import annotations

import json
import logging
import selectors
import sys
import time
from pathlib import Path
from typing import Callable, Dict, Iterator, Optional

import numpy as np

from ..config import Config
from ..parallel.mesh import is_leader

_logger = logging.getLogger(__name__)

_sel: Optional[selectors.BaseSelector] = None


def _non_blocking_input() -> str:
    """trainer.py:64-101: poll stdin without blocking, agree across hosts."""
    global _sel
    result = ""
    if is_leader() and sys.stdin is not None and not sys.stdin.closed:
        try:
            if _sel is None:
                _sel = selectors.DefaultSelector()
                _sel.register(sys.stdin, selectors.EVENT_READ)
            events = _sel.select(timeout=0)
            for key, _ in events:
                result = key.fileobj.readline().strip()
        except (ValueError, OSError, PermissionError):
            return ""
    try:
        import jax
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            # fixed-size buffer on EVERY host (a longer leader-side
            # line would give followers a differently-shaped array and
            # abort the collective); truncate consistently
            buf = result.encode()[:1024].ljust(1024)
            result = multihost_utils.broadcast_one_to_all(
                np.frombuffer(buf, dtype=np.uint8))
            result = bytes(result).decode().strip("\x00").strip()
    except Exception:
        pass
    return result


def train_engines(cfg: Config,
                  dataset,
                  engines,
                  eval_fn: Optional[Callable] = None,
                  save_fn: Optional[Callable] = None,
                  log_path: Optional[Path] = None,
                  max_iterations: Optional[int] = None):
    """Engines-based training loop (reference trainer.py:133-292).

    Full stdin REPL: ``save``, ``quit``, ``eval``, ``export``,
    ``lr <x>``, ``time [to N]``, deferred ``<cmd>@<step>`` events,
    ``event show`` / ``event clear``.  Commands are read on the leader
    and broadcast to all hosts; deferred events fire when the global
    step reaches their trigger.  ``loss_scale`` is accepted and noted
    (bf16 training has no loss scale — reference uses it for fp16).
    """
    tcfg = cfg.trainer
    it = max_iterations if max_iterations is not None else tcfg.iterations
    log_f = open(log_path, "a") if (log_path and is_leader()) else None

    if tcfg.wandb:
        engines.attach_wandb()

    events: list = []
    last_save_step = engines.global_step
    last_eval_step = -1
    start = time.time()

    def do_save():
        if save_fn:
            save_fn(engines, engines.global_step)

    def do_export():
        from ..tokenizer import get_phone_symmap
        engines.export(cfg.ckpt_dir, cfg.weights_format,
                       userdata={"symmap": get_phone_symmap()})

    # pre-loop command (reference trainer.py:161-166)
    pre = _non_blocking_input()
    if pre in ("eval", "eval_quit") and eval_fn:
        eval_fn(engines)
    if pre in ("quit", "eval_quit"):
        return engines

    propagating = False
    try:
        log_every = max(1, getattr(tcfg, "log_frequency", 1))
        for batch in dataset.batches():
            if engines.global_step >= it:
                break
            step_start = time.time()
            # fetch metrics only on the log cadence: each device->host
            # fetch is a ~50-100 ms relay round trip per engine, which
            # would otherwise cap the step rate
            will_log = (engines.global_step + 1) % log_every == 0
            metrics = engines.step(batch, fetch_metrics=will_log)
            step = engines.global_step
            elapsed = time.time() - step_start
            if will_log:
                metrics.update({
                    "it": step,
                    "epoch": step * cfg.hyperparameters.batch_size
                    / max(1, len(dataset)),
                    "elapsed_time": elapsed,
                })
                line = json.dumps(metrics)
                if is_leader():
                    _logger.info(line)
                    if log_f:
                        log_f.write(line + "\n")
                        log_f.flush()

            command = _non_blocking_input()
            # deferred events: `<cmd>@<step>` (trainer.py:198-207)
            if "@" in command:
                what, _, when = command.rpartition("@")
                try:
                    events.append((what, int(when)))
                    _logger.info("event %s registered", command)
                except ValueError as e:
                    _logger.error("bad event %r: %s", command, e)
                command = ""

            events = [e for e in events if e[1] >= step]
            commands = [command] + [e[0] for e in events if e[1] == step]

            for command in commands:
                if not command:
                    continue
                if command in ("event show", "event"):
                    _logger.info("events:\n%s", "\n".join(
                        f"{w}@{s}" for w, s in events))
                elif command == "event clear":
                    events.clear()
                elif command.startswith("time"):
                    # remaining-time estimate (trainer.py:218-227)
                    target = it
                    if " to " in command:
                        try:
                            target = int(command.split(" to ")[-1])
                        except ValueError:
                            pass
                    rem = max(0, target - step + 1) * elapsed
                    _logger.info("est. remaining: %.1f h (%.0f s)",
                                 rem / 3600, rem)
                elif command.startswith("lr "):
                    try:
                        engines.set_lr(float(command.split()[-1]))
                    except (ValueError, IndexError) as e:
                        _logger.warning("bad lr command: %s", e)
                elif command.startswith("loss_scale"):
                    _logger.info("bf16 training has no loss scale; noted")
                elif command == "export":
                    do_save()
                    last_save_step = step
                    if is_leader():
                        do_export()
                elif command == "save":
                    do_save()
                    last_save_step = step
                elif command == "eval" and eval_fn:
                    last_eval_step = step
                    eval_fn(engines)
                elif command == "quit":
                    if tcfg.save_on_quit:
                        do_save()
                    return engines

            save_every = tcfg.save_frequency or cfg.evaluation.frequency
            if (step != last_save_step and save_every
                    and step % save_every == 0):
                do_save()
                last_save_step = step
                if tcfg.export_on_save and is_leader():
                    do_export()
            if (eval_fn and cfg.evaluation.frequency
                    and step % cfg.evaluation.frequency == 0
                    and step != last_eval_step):
                last_eval_step = step
                eval_fn(engines)
    except KeyboardInterrupt:
        if tcfg.save_on_quit:
            do_save()
    except BaseException:
        # explicit flag, NOT sys.exc_info() in the finally: exc_info
        # also reports an OUTER exception being handled by the caller
        # (train_engines inside a retry wrapper's except block), which
        # would silently demote a writer error on a CLEAN run to a log
        # line — "success" with a broken final checkpoint
        propagating = True
        raise
    finally:
        # join any in-flight async checkpoint write before the process
        # (and its daemon writer thread) can exit — but never let a
        # writer error mask a propagating training exception or skip
        # the log close (finally-raise would replace the root cause)
        if hasattr(engines, "finish_saves"):
            try:
                engines.finish_saves()
            except BaseException:
                if not propagating:     # clean exit: stay fail-loud
                    if log_f:
                        log_f.close()
                    raise
                _logger.exception("async checkpoint write failed")
        if log_f:
            log_f.close()
    _logger.info("training done in %.1fs", time.time() - start)
    return engines


def train(cfg: Config,
          dataset,
          step_fn: Callable,
          state,
          eval_fn: Optional[Callable] = None,
          save_fn: Optional[Callable] = None,
          log_path: Optional[Path] = None,
          max_iterations: Optional[int] = None):
    """Run the training loop; returns the final TrainState.

    step_fn(state, batch) -> (state, metrics dict of scalars).
    save_fn(state, step) persists a checkpoint; eval_fn(state) evaluates.
    """
    tcfg = cfg.trainer
    it = max_iterations if max_iterations is not None else tcfg.iterations
    log_f = open(log_path, "a") if (log_path and is_leader()) else None

    last_save_step = int(state.step)
    host_step = last_save_step
    log_every = max(1, getattr(tcfg, "log_frequency", 1))
    start = time.time()
    try:
        for batch in dataset.batches():
            step_start = time.time()
            try:
                state, metrics = step_fn(state, batch)
            except Exception as e:
                # HBM OOM resilience (reference OOM catch + checkpoint,
                # engines/base.py:538-597): on TPU an allocation failure
                # surfaces as RESOURCE_EXHAUSTED
                if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
                    _logger.error("OOM during step: %s", e)
                    if tcfg.save_on_oom and save_fn:
                        try:
                            save_fn(state, int(state.step))
                        except RuntimeError as se:
                            # the jitted step donates the TrainState
                            # buffers; after an execution-time OOM they
                            # may already be invalidated — the last
                            # periodic checkpoint is then the best state
                            _logger.error(
                                "emergency save failed (state buffers "
                                "donated to the failed step): %s", se)
                    raise
                raise
            # host-side step mirror; metrics are fetched only on the log
            # cadence — and then as ONE device->host transfer (each relay
            # fetch costs ~50-100 ms; float(v) per scalar is a fetch per
            # metric, and a per-step fetch caps the real TPU step rate)
            host_step += 1
            step = host_step
            if step % log_every == 0:
                import jax as _jax
                metrics = {k: float(v) for k, v in
                           _jax.device_get(metrics).items()}
                metrics.update({
                    "it": step,
                    "epoch": step * cfg.hyperparameters.batch_size
                    / max(1, len(dataset)),
                    "elapsed_time": time.time() - step_start,
                })
                line = json.dumps(metrics)
                if is_leader():
                    _logger.info(line)
                    if log_f:
                        log_f.write(line + "\n")
                        log_f.flush()

            cmd = _non_blocking_input()
            if cmd == "quit":
                if tcfg.save_on_quit and save_fn:
                    save_fn(state, step)
                break
            if cmd == "save" and save_fn:
                save_fn(state, step)
                last_save_step = step
            if cmd == "eval" and eval_fn:
                eval_fn(state)
            if cmd.startswith("lr "):
                _logger.warning("runtime lr override requires a mutable "
                                "schedule; set hyperparameters.learning_rate "
                                "and restart (noted: %s)", cmd)

            if (save_fn and tcfg.save_frequency
                    and step % tcfg.save_frequency == 0
                    and step != last_save_step):
                save_fn(state, step)
                last_save_step = step
            if (eval_fn and cfg.evaluation.frequency
                    and step % cfg.evaluation.frequency == 0):
                eval_fn(state)
            if step >= it:
                if save_fn:
                    save_fn(state, step)
                break
    except KeyboardInterrupt:
        if tcfg.save_on_quit and save_fn:
            save_fn(state, int(state.step))
    finally:
        if log_f:
            log_f.close()
    _logger.info("training done in %.1fs", time.time() - start)
    return state
