"""Optimizer/scheduler zoo coverage (engine/optim.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tts_tpu.config import Hyperparameters
from tortoise_tts_tpu.engine import optim


@pytest.mark.parametrize("name", ["AdamW", "Adam", "SGD", "Adagrad",
                                  "Adafactor", "Prodigy", "Muon",
                                  "dadaptation"])
def test_optimizer_zoo_step(name):
    hp = Hyperparameters(optimizer=name, learning_rate=1e-2,
                         gradient_accumulation_steps=1, warmup_steps=0)
    tx = optim.make_optimizer(hp)
    params = {"w": jnp.ones((8, 8)), "b": jnp.zeros((8,))}
    state = tx.init(params)

    def loss(p):
        return jnp.sum((p["w"] @ jnp.ones((8,)) + p["b"]) ** 2)

    import optax
    new = params
    for _ in range(8):
        grads = jax.grad(loss)(new)
        updates, state = tx.update(grads, state, new)
        new = optax.apply_updates(new, updates)
    assert np.isfinite(np.asarray(new["w"])).all()
    if name not in ("Prodigy", "dadaptation"):
        # adaptive-lr methods start with a ~0 distance estimate and may
        # not move within a few steps; finiteness suffices for them
        assert not np.allclose(np.asarray(new["w"]),
                               np.asarray(params["w"]))


@pytest.mark.parametrize("sched", ["", "warmup", "cosine", "noam",
                                   "onecycle"])
def test_schedules_finite(sched):
    hp = Hyperparameters(scheduler=sched, learning_rate=1e-3,
                         warmup_steps=10)
    s = optim.make_schedule(hp)
    if callable(s):
        vals = [float(s(i)) for i in [0, 5, 10, 100, 10_000]]
        assert all(np.isfinite(v) and v >= 0 for v in vals)
    else:
        assert s > 0


def test_schedule_free_wrapper():
    hp = Hyperparameters(optimizer="AdamW", scheduler="schedulefree",
                         learning_rate=1e-3, warmup_steps=0,
                         gradient_accumulation_steps=1)
    tx = optim.make_optimizer(hp)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}
    updates, state = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
