from .dataset import Dataset, create_train_val_dataloader  # noqa: F401
