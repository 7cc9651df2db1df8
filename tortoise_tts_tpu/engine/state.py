"""TrainState + checkpointing (reference Engine/Engines, engines/base.py).

Design delta (SURVEY §7.4): the reference's Engine class hierarchy
(module/optimizer/scaler mutation, DeepSpeed subclass) collapses into an
immutable ``TrainState`` pytree + pure update functions; 'Engines' (the
dict-of-engines orchestrator) becomes a plain dict of TrainStates.

Checkpoint layout mirrors the reference (engines/base.py:141-213):
``ckpt/<name>/<step>/state.sft`` + a ``latest`` tag file, leader-only
writes, ``keep_last_checkpoints`` pruning, and fp32 export with embedded
config/stats metadata (engines/base.py:356-400).
"""

from __future__ import annotations

import json
import logging
import shutil
import threading
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.io import load_state_dict, save_state_dict

_logger = logging.getLogger(__name__)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray             # global micro-step
    samples_processed: jnp.ndarray
    tokens_processed: jnp.ndarray


def init_state(params, tx) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                      jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# pytree <-> flat dict
# ---------------------------------------------------------------------------


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = prefix + "/".join(_path_str(p) for p in path)
        out[name] = np.asarray(leaf)
    return out


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def unflatten_like(tree, flat: Dict[str, np.ndarray],
                   prefix: str = "", strict: bool = True):
    """Fill `tree`'s leaves from the flat dict (by identical flattening
    order/naming)."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in paths:
        name = prefix + "/".join(_path_str(p) for p in path)
        if name in flat:
            arr = flat[name]
            if strict and tuple(arr.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"shape mismatch for {name}: {arr.shape} vs "
                    f"{np.shape(leaf)}")
            leaves.append(jnp.asarray(arr).astype(leaf.dtype)
                          if hasattr(leaf, "dtype") else arr)
        else:
            if strict:
                raise KeyError(f"missing key in checkpoint: {name}")
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: Path, name: str, state: TrainState,
                    step: int, keep_last: int = 0,
                    extra_state: Optional[Dict[str, np.ndarray]] = None,
                    userdata: Optional[dict] = None,
                    is_leader: bool = True) -> Optional[Path]:
    """engines/base.py:141-169 equivalent; returns the ckpt path."""
    if not is_leader:
        return None
    d = Path(ckpt_dir) / name / str(step)
    d.mkdir(parents=True, exist_ok=True)
    meta = {"step": step, **(userdata or {})}
    save_state_dict(flatten_tree(state.params), d / "module.sft",
                    metadata=meta)
    opt_flat = flatten_tree(state.opt_state)
    opt_flat["__step__"] = np.asarray(int(state.step))
    opt_flat["__samples__"] = np.asarray(int(state.samples_processed))
    opt_flat["__tokens__"] = np.asarray(int(state.tokens_processed))
    if extra_state:
        opt_flat.update({f"extra/{k}": v for k, v in extra_state.items()})
    save_state_dict(opt_flat, d / "optimizer.sft")
    (Path(ckpt_dir) / name / "latest").write_text(str(step))
    if keep_last > 0:
        _prune_checkpoints(Path(ckpt_dir) / name, keep_last)
    _logger.info("saved checkpoint %s", d)
    return d


@jax.jit
def _device_copy(tree):
    """Fresh device buffers holding a copy of every leaf.

    The train step donates the live TrainState (donate_argnums=(0,)),
    so an async save must never read the live buffers after the next
    step is dispatched.  A jitted select produces NEW output buffers
    (XLA only aliases outputs onto inputs under explicit donation) in
    one on-device program — an HBM->HBM copy at memory bandwidth, vs
    the ~125 s the synchronous full-AR save spent fetching leaves
    through the relay one np.asarray at a time (round-4 measurement)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.where(jnp.ones((), bool), x, x), tree)


def snapshot_state(state: TrainState) -> TrainState:
    """Device-side snapshot of a TrainState.

    Returns a state whose leaves are fresh device buffers; the writer
    thread's per-leaf np.asarray starts each host transfer LAZILY.
    Chip-measured (round 5): eagerly `copy_to_host_async`ing ~2 GB of
    leaves at snapshot time floods the relay and the train steps that
    overlap the write run ~80x slower (~9 s/step); lazy per-leaf
    transfers let step dispatches interleave.  Terminal saves
    (save_on_quit, OOM) use the synchronous save_checkpoint path."""
    return _device_copy(state)


class AsyncCheckpointer:
    """Background checkpoint writer (reference engines/base.py:141-169
    role without stalling the loop): the caller snapshots each state on
    device (snapshot_state — microseconds of stall) and ``submit``
    hands the transfer + file write to a worker thread; training
    continues while the relay drains the D2H copies.  One save is in
    flight at a time; ``wait`` joins the writer and re-raises any write
    error on the caller thread.

    The synchronous ``save_checkpoint`` remains the right call for
    terminal saves (save_on_quit, OOM recovery) where the process may
    not outlive a background writer."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None
        # wall time of the last completed background write (transfer +
        # file IO) — perf observability (tools/train_bench.py)
        self.last_write_s: Optional[float] = None

    @property
    def pending(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def submit(self, ckpt_dir: Path, snaps, keep_last: int = 0) -> None:
        """Write a list of already-snapshotted engines in one worker.

        ``snaps``: [(name, snapshot_state(state), step, extra_state,
        userdata), ...] — snapshot on the CALLER thread first (it is
        the only part that must see the pre-donation buffers), then
        every engine's transfer+write happens off-thread."""
        self.wait()                       # serialize saves

        def _write():
            import time as _time
            t0 = _time.perf_counter()
            try:
                for name, snap, step, extra, userdata in snaps:
                    save_checkpoint(ckpt_dir, name, snap, step,
                                    keep_last=keep_last,
                                    extra_state=extra,
                                    userdata=userdata)
                self.last_write_s = _time.perf_counter() - t0
            except BaseException as exc:  # surfaced by the next wait()
                self._err = exc

        self._thread = threading.Thread(target=_write, daemon=True,
                                        name="ckpt-write")
        self._thread.start()


def _prune_checkpoints(base: Path, keep_last: int) -> None:
    """engines/base.py:427-438: remove all but the newest N step dirs."""
    steps = sorted((int(p.name) for p in base.iterdir()
                    if p.is_dir() and p.name.isdigit()))
    for s in steps[:-keep_last]:
        shutil.rmtree(base / str(s), ignore_errors=True)


def latest_checkpoint(ckpt_dir: Path, name: str) -> Optional[Path]:
    tag = Path(ckpt_dir) / name / "latest"
    if not tag.exists():
        return None
    return Path(ckpt_dir) / name / tag.read_text().strip()


def load_checkpoint(ckpt_dir: Path, name: str, state: TrainState,
                    step: Optional[int] = None,
                    load_states: bool = True,
                    strict: bool = True) -> TrainState:
    """engines/base.py:171-213 equivalent."""
    d = (Path(ckpt_dir) / name / str(step) if step is not None
         else latest_checkpoint(ckpt_dir, name))
    if d is None or not d.exists():
        raise FileNotFoundError(f"no checkpoint for {name} in {ckpt_dir}")
    params = unflatten_like(state.params, load_state_dict(d / "module.sft"),
                            strict=strict)
    opt_state, st, sm, tk = state.opt_state, state.step, \
        state.samples_processed, state.tokens_processed
    opt_path = d / "optimizer.sft"
    if load_states and opt_path.exists():
        flat = load_state_dict(opt_path)
        def _scalar(key):
            v = flat.pop(key, None)
            return 0 if v is None else int(np.asarray(v).reshape(-1)[0])

        st = jnp.asarray(_scalar("__step__"), jnp.int32)
        sm = jnp.asarray(_scalar("__samples__"), jnp.int32)
        tk = jnp.asarray(_scalar("__tokens__"), jnp.int32)
        flat = {k: v for k, v in flat.items() if not k.startswith("extra/")}
        opt_state = unflatten_like(state.opt_state, flat, strict=False)
    return TrainState(params, opt_state, st, sm, tk)


def export_weights(params, path: Path, config: Optional[dict] = None,
                   stats: Optional[dict] = None,
                   userdata: Optional[dict] = None,
                   lora_split: bool = False) -> None:
    """Deployable fp32 export (engines/base.py:356-400, export.py).
    ``userdata`` mirrors the reference's embedded userdata (e.g. the
    phone symmap, engines/base.py:380-400)."""
    flat = flatten_tree(jax.tree_util.tree_map(
        lambda x: np.asarray(x, dtype=np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x),
        params))
    meta = {"config": config or {}, "stats": stats or {},
            "userdata": userdata or {}}
    if lora_split:
        lora = {k: v for k, v in flat.items() if "lora" in k}
        rest = {k: v for k, v in flat.items() if "lora" not in k}
        save_state_dict(rest, path, metadata=meta)
        if lora:
            save_state_dict(lora, path.parent / f"lora.{path.suffix[1:]}")
    else:
        save_state_dict(flat, path, metadata=meta)
