from . import optim, state, train_step  # noqa: F401
