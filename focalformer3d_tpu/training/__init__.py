from . import losses, optim, train_step  # noqa: F401
