"""Optimizer / scheduler zoo (capability-parity with reference
engines/__init__.py:109-206 + utils/ml.py:29-58).

The reference offers AdamW/SGD/Prodigy/Adafactor/Adagrad/Muon/Apollo and
schedulefree/onecycle/cosine/noam/warmup schedulers; here the same names
map onto optax (incl. optax.contrib.prodigy / muon / schedule_free) with
gradient clipping and accumulation composed in.
"""

from __future__ import annotations

import math
from typing import Optional

import optax

from ..config import Hyperparameters


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
    if name == "adamw":
        opt = optax.adamw(sched, b1=0.9, b2=0.96, weight_decay=0.01)
    elif name == "adam":
        opt = optax.adam(sched)
    elif name == "sgd":
        opt = optax.sgd(sched, momentum=0.9)
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
    else:
        raise ValueError(f"unknown optimizer {hp.optimizer}")

    chain = []
    if hp.gradient_clipping and hp.gradient_clipping > 0:
        chain.append(optax.clip_by_global_norm(hp.gradient_clipping))
    chain.append(opt)
    tx = optax.chain(*chain)
    if (hp.scheduler or "").lower() == "schedulefree":
        tx = optax.contrib.schedule_free(tx, learning_rate=hp.learning_rate)
    if hp.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, hp.gradient_accumulation_steps)
    return tx
