"""Optimizer / scheduler zoo (capability-parity with reference
engines/__init__.py:109-206 + utils/ml.py:29-58).

The reference offers AdamW/SGD/Prodigy/Adafactor/Adagrad/Muon/Apollo and
schedulefree/onecycle/cosine/noam/warmup schedulers; here the same names
map onto optax (incl. optax.contrib.prodigy / muon / schedule_free) with
gradient clipping and accumulation composed in.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from ..config import Hyperparameters


# ---------------------------------------------------------------------------
# Runtime-mutable LR scale — backs the trainer REPL's ``lr <x>`` command
# (reference trainer.py:229-236 engines.set_lr).  Appended *last* in the
# optimizer chain so it scales the final updates (pre-scaling gradients
# would be normalized away by Adam).  ``set_lr_scale`` rewrites the state
# out-of-jit; exact for constant-LR configs, proportional under schedules.
# ---------------------------------------------------------------------------


class MutableScaleState(NamedTuple):
    scale: chex.Array


def mutable_lr_scale() -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return MutableScaleState(jnp.ones((), jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda g: g * state.scale.astype(g.dtype), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def set_lr_scale(opt_state, scale: float):
    """Return opt_state with every MutableScaleState set to ``scale``."""
    def rec(s):
        if isinstance(s, MutableScaleState):
            return MutableScaleState(jnp.asarray(scale, jnp.float32))
        if isinstance(s, tuple) and hasattr(s, "_fields"):
            return type(s)(*[rec(x) for x in s])
        if isinstance(s, (tuple, list)):
            return type(s)(rec(x) for x in s)
        if isinstance(s, dict):
            return {k: rec(v) for k, v in s.items()}
        return s
    return rec(opt_state)


def get_lr_scale(opt_state) -> Optional[float]:
    found = []

    def rec(s):
        if isinstance(s, MutableScaleState):
            found.append(float(s.scale))
        elif isinstance(s, tuple):
            for x in s:
                rec(x)
        elif isinstance(s, (list,)):
            for x in s:
                rec(x)
        elif isinstance(s, dict):
            for x in s.values():
                rec(x)
    rec(opt_state)
    return found[0] if found else None


# ---------------------------------------------------------------------------
# APOLLO — low-rank projected AdamW with norm-scaling correction
# (reference utils/ext/apollo.py:15-430, re-derived for optax).
#
# Per 2D parameter: the gradient is projected onto a rank-r subspace
# (random Gaussian projector by default, refreshed every
# ``update_proj_gap`` steps; SVD projector optional), Adam moments live
# in the low-rank space, and the resulting low-rank Adam direction is
# converted back by *scaling the full-rank gradient* with per-channel
# (or per-tensor) norm ratios ||adam(low)|| / ||low||, with Fira's
# norm-growth limiter.  1D params fall back to plain Adam moments.
# ---------------------------------------------------------------------------


class _ApolloLeafState(NamedTuple):
    proj: chex.Array        # projector matrix (or size-0 placeholder)
    exp_avg: chex.Array
    exp_avg_sq: chex.Array
    scaling_norm: chex.Array  # Fira limiter state (scalar; -1 = unset)
    seed: chex.Array


class ApolloState(NamedTuple):
    count: chex.Array
    leaves: any


def _proj_orientation(shape, rank: int, proj_type: str) -> str:
    """'right' -> low = g @ P.T with P (r, cols); 'left' -> P.T @ g."""
    rows, cols = shape[0], shape[1]
    if proj_type == "std":
        return "right" if rows >= cols else "left"
    if proj_type == "reverse_std":
        return "left" if rows >= cols else "right"
    return proj_type


def apollo(learning_rate, b1: float = 0.9, b2: float = 0.999,
           eps: float = 1e-6, weight_decay: float = 0.0,
           rank: int = 256, proj: str = "random",
           scale_type: str = "channel", scale: float = 1.0,
           update_proj_gap: int = 1, proj_type: str = "std",
           seed: int = 0) -> optax.GradientTransformation:
    """APOLLO optimizer (apollo.py:265-430 semantics) as a pure optax
    GradientTransformation; memory ~ rank/min(dim) of AdamW for 2D
    params."""

    def _is_projected(g):
        return g.ndim == 2 and rank > 0

    def _make_proj(key, g, w=None):
        orient = _proj_orientation(g.shape, rank, proj_type)
        if proj == "random":
            if orient == "right":
                return (jax.random.normal(key, (rank, g.shape[1]),
                                          jnp.float32)
                        / math.sqrt(rank))
            return (jax.random.normal(key, (g.shape[0], rank), jnp.float32)
                    / math.sqrt(rank))
        # svd projector (GaLoreProjector.get_orthogonal_matrix)
        u, s, vh = jnp.linalg.svd(g.astype(jnp.float32),
                                  full_matrices=False)
        if orient == "right":
            return vh[:rank, :]
        return u[:, :rank]

    def _project(p_mat, g):
        orient = _proj_orientation(g.shape, rank, proj_type)
        if orient == "right":
            return g @ p_mat.T            # (rows, r)
        return p_mat.T @ g                # (r, cols)

    def init_fn(params):
        def leaf(g):
            if _is_projected(g):
                orient = _proj_orientation(g.shape, rank, proj_type)
                low_shape = ((g.shape[0], rank) if orient == "right"
                             else (rank, g.shape[1]))
                proj_shape = ((rank, g.shape[1]) if orient == "right"
                              else (g.shape[0], rank))
                return _ApolloLeafState(
                    jnp.zeros(proj_shape, jnp.float32),
                    jnp.zeros(low_shape, jnp.float32),
                    jnp.zeros(low_shape, jnp.float32),
                    jnp.full((), -1.0, jnp.float32),
                    jnp.zeros((), jnp.uint32))
            return _ApolloLeafState(
                jnp.zeros((0,), jnp.float32),
                jnp.zeros(g.shape, jnp.float32),
                jnp.zeros(g.shape, jnp.float32),
                jnp.full((), -1.0, jnp.float32),
                jnp.zeros((), jnp.uint32))
        leaves = jax.tree_util.tree_map(leaf, params)
        return ApolloState(jnp.zeros((), jnp.int32), leaves)

    def update_fn(updates, state, params=None):
        count = state.count + 1
        step0 = state.count  # projector refreshed when step0 % gap == 0
        lr = (learning_rate(count) if callable(learning_rate)
              else learning_rate)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        step_size = lr * jnp.sqrt(bc2) / bc1

        # per-leaf unique key stream (GradientProjector seed per param)
        leaf_ix = [0]

        def leaf(g, ls, p):
            g32 = g.astype(jnp.float32)
            if not _is_projected(g):
                ea = b1 * ls.exp_avg + (1 - b1) * g32
                es = b2 * ls.exp_avg_sq + (1 - b2) * g32 * g32
                direction = ea / (jnp.sqrt(es) + eps)
                upd = -step_size * direction
                if weight_decay > 0 and p is not None:
                    upd = upd - lr * weight_decay * p.astype(jnp.float32)
                return upd.astype(g.dtype), _ApolloLeafState(
                    ls.proj, ea, es, ls.scaling_norm, ls.seed)

            leaf_ix[0] += 1
            base = jax.random.fold_in(jax.random.PRNGKey(seed), leaf_ix[0])

            def refresh(_):
                k = jax.random.fold_in(base, ls.seed)
                return (_make_proj(k, g32), ls.seed + 1)

            def keep(_):
                return (ls.proj, ls.seed)

            if proj == "random":
                p_mat, new_seed = jax.lax.cond(
                    (step0 % update_proj_gap) == 0, refresh, keep, None)
            else:  # svd projector: data-dependent refresh
                p_mat, new_seed = jax.lax.cond(
                    (step0 % update_proj_gap) == 0,
                    lambda _: (_make_proj(base, g32), ls.seed + 1),
                    keep, None)

            low = _project(p_mat, g32)
            ea = b1 * ls.exp_avg + (1 - b1) * low
            es = b2 * ls.exp_avg_sq + (1 - b2) * low * low
            norm_grad = ea / (jnp.sqrt(es) + eps)

            if scale_type == "channel":
                norm_dim = 0 if g.shape[0] < g.shape[1] else 1
                sf = (jnp.linalg.norm(norm_grad, axis=norm_dim)
                      / (jnp.linalg.norm(low, axis=norm_dim) + 1e-8))
                if norm_dim == 1:
                    sf = sf[:, None]
            else:  # tensor
                sf = (jnp.linalg.norm(norm_grad)
                      / (jnp.linalg.norm(low) + 1e-8))

            scaling_grad = g32 * sf
            # Fira norm-growth limiter (apollo.py:411-424)
            sg_norm = jnp.linalg.norm(scaling_grad)
            limiter = jnp.maximum(sg_norm / (ls.scaling_norm + 1e-8),
                                  1.01) / 1.01
            use_limiter = ls.scaling_norm >= 0
            scaling_grad = jnp.where(use_limiter,
                                     scaling_grad / limiter, scaling_grad)
            new_norm = jnp.where(use_limiter, sg_norm / limiter, sg_norm)

            direction = scaling_grad * math.sqrt(scale)
            upd = -step_size * direction
            if weight_decay > 0 and p is not None:
                upd = upd - lr * weight_decay * p.astype(jnp.float32)
            return upd.astype(g.dtype), _ApolloLeafState(
                p_mat, ea, es, new_norm, new_seed)

        params_tree = params if params is not None else updates
        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_s = treedef.flatten_up_to(state.leaves)
        flat_p = jax.tree_util.tree_leaves(params_tree)
        outs = [leaf(g, s, p) for g, s, p in zip(flat_u, flat_s, flat_p)]
        new_updates = jax.tree_util.tree_unflatten(
            treedef, [o[0] for o in outs])
        new_leaves = jax.tree_util.tree_unflatten(
            treedef, [o[1] for o in outs])
        return new_updates, ApolloState(count, new_leaves)

    return optax.GradientTransformation(init_fn, update_fn)


def make_schedule(hp: Hyperparameters):
    name = (hp.scheduler or "").lower()
    lr = hp.learning_rate
    if name in ("", "constant"):
        if hp.warmup_steps > 0:
            return optax.linear_schedule(0.0, lr, hp.warmup_steps)
        return lr
    if name == "warmup":
        return optax.linear_schedule(0.0, lr, hp.warmup_steps)
    if name == "cosine" or name == "cosine_annealing":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, hp.warmup_steps, max(1, getattr(hp, "decay_steps", 0)
                                          or 1_000_000))
    if name == "noam":
        # NoamLR (ml.py:29-41): lr * warmup^.5 * min(s^-.5, s*warmup^-1.5)
        import jax.numpy as jnp

        def sched(step):
            s = step + 1.0
            return lr * (hp.warmup_steps ** 0.5) * jnp.minimum(
                s ** -0.5, s * hp.warmup_steps ** -1.5)
        return sched
    if name == "onecycle":
        return optax.cosine_onecycle_schedule(
            max(1, getattr(hp, "decay_steps", 0) or 1_000_000), lr)
    if name == "schedulefree":
        return lr  # handled by the schedule_free wrapper in make_optimizer
    raise ValueError(f"unknown scheduler {hp.scheduler}")


def make_optimizer(hp: Hyperparameters) -> optax.GradientTransformation:
    name = hp.optimizer.lower()
    sched = make_schedule(hp)
    # schedule-free interpolates its own momentum-like averaging; the
    # base optimizer's momentum must be OFF (optax.contrib.schedule_free
    # docs; double-applied momentum otherwise)
    sfree = (hp.scheduler or "").lower() == "schedulefree"
    b1 = 0.0 if sfree else 0.9
    if name == "adamw":
        opt = optax.adamw(sched, b1=b1, b2=0.96, weight_decay=0.01)
    elif name == "adam":
        opt = optax.adam(sched, b1=b1)
    elif name == "sgd":
        opt = optax.sgd(sched, momentum=0.0 if sfree else 0.9)
    elif name == "adagrad":
        opt = optax.adagrad(sched)
    elif name == "adafactor":
        opt = optax.adafactor(sched)
    elif name == "prodigy":
        opt = optax.contrib.prodigy(sched if not callable(sched) else
                                    hp.learning_rate)
    elif name == "muon":
        opt = optax.contrib.muon(sched)
    elif name == "dadaptation":
        opt = optax.contrib.dadapt_adamw(hp.learning_rate)
    elif name in ("apollo", "apollo-mini"):
        # reference parameterization: engines/__init__.py:134-146
        mini = name == "apollo-mini"
        opt = apollo(sched, rank=1 if mini else 256, proj="random",
                     scale_type="tensor" if mini else "channel",
                     scale=128.0 if mini else 1.0, update_proj_gap=1,
                     proj_type="std", weight_decay=0.01)
    else:
        raise ValueError(f"unknown optimizer {hp.optimizer}")

    chain = []
    if hp.gradient_clipping and hp.gradient_clipping > 0:
        chain.append(optax.clip_by_global_norm(hp.gradient_clipping))
    chain.append(opt)
    chain.append(mutable_lr_scale())   # trainer REPL `lr <x>` backing
    tx = optax.chain(*chain)
    if sfree:
        tx = optax.contrib.schedule_free(tx, learning_rate=hp.learning_rate)
    if hp.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, hp.gradient_accumulation_steps)
    return tx


def eval_params(params, opt_state):
    """Evaluation/export weights for a TrainState.

    schedule-free configs circulate the y-iterates in ``params``; the
    model that should be evaluated/shipped is the x-average held in the
    ScheduleFreeState (optax.contrib.schedule_free_eval_params).  For
    every other optimizer this is the identity."""
    states = [opt_state]
    while states:
        s = states.pop()
        if isinstance(s, optax.contrib.ScheduleFreeState):
            return optax.contrib.schedule_free_eval_params(s, params)
        if isinstance(s, (tuple, list)):
            states.extend(s)
        elif hasattr(s, "inner_opt_state"):   # MultiSteps wrapper
            states.append(s.inner_opt_state)
    return params
