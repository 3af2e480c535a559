from .checkpoint import load_checkpoint, save_checkpoint
from .loop import (
    TrainConfig,
    make_eval_step,
    make_optimizer,
    make_train_step,
    train,
    validate,
)
