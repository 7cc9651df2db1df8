from . import engines, optim, state, train_step  # noqa: F401
