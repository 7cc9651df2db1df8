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


@pytest.mark.parametrize("name", ["apollo", "apollo-mini"])
def test_apollo_converges(name):
    """Apollo (low-rank projected AdamW, apollo.py:265-430) reduces a
    least-squares loss at a rate comparable to AdamW."""
    import optax
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(16, 16), jnp.float32)
    target = jnp.asarray(rng.randn(16, 4), jnp.float32)

    def loss(p):
        return jnp.mean((A @ p["w"] - target) ** 2) + jnp.mean(p["b"] ** 2)

    def run(tx, steps=60):
        params = {"w": jnp.zeros((16, 4)), "b": jnp.ones((4,))}
        state = tx.init(params)
        for _ in range(steps):
            grads = jax.grad(loss)(params)
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        return float(loss(params))

    hp = Hyperparameters(optimizer=name, learning_rate=3e-2,
                         gradient_accumulation_steps=1, warmup_steps=0,
                         gradient_clipping=0)
    l_apollo = run(optim.make_optimizer(hp))
    l0 = float(loss({"w": jnp.zeros((16, 4)), "b": jnp.ones((4,))}))
    assert np.isfinite(l_apollo)
    assert l_apollo < 0.5 * l0


def test_apollo_svd_projector_step():
    tx = optim.apollo(1e-2, rank=2, proj="svd", update_proj_gap=4)
    params = {"w": jnp.ones((8, 6))}
    state = tx.init(params)
    grads = {"w": jnp.ones((8, 6)) * 0.1}
    for _ in range(6):
        updates, state = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
    assert not np.allclose(np.asarray(updates["w"]), 0)


def test_mutable_lr_scale():
    """`lr <x>` REPL backing: set_lr_scale rewrites the chained scale."""
    import optax
    hp = Hyperparameters(optimizer="AdamW", learning_rate=1e-2,
                         gradient_accumulation_steps=1, warmup_steps=0)
    tx = optim.make_optimizer(hp)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}
    u1, _ = tx.update(grads, state, params)
    state2 = optim.set_lr_scale(state, 0.5)
    assert optim.get_lr_scale(state2) == 0.5
    u2, _ = tx.update(grads, state2, params)
    np.testing.assert_allclose(np.asarray(u2["w"]),
                               0.5 * np.asarray(u1["w"]), rtol=1e-5)
