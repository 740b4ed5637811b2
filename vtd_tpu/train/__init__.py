from .losses import bce_loss, dice_loss, db_loss
from .trainer import ModelTrainer, TextDetectionDataset, create_train_state

__all__ = [
    "bce_loss",
    "dice_loss",
    "db_loss",
    "ModelTrainer",
    "TextDetectionDataset",
    "create_train_state",
]
