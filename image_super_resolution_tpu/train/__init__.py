from .checkpoint import (
    checkpoint_exists,
    checkpoint_name,
    load_any_checkpoint,
    load_checkpoint,
    resume_state,
    save_checkpoint,
    warm_start_generator,
)
from .state import (
    EMAState,
    TrainState,
    build_optimizer,
    create_train_state,
    ema_decay,
    ema_update,
    init_ema,
)
from .steps import (
    make_denoise_train_step,
    make_eval_step,
    make_gan_train_step,
    make_pixel_train_step,
)

__all__ = [
    "checkpoint_exists",
    "checkpoint_name",
    "load_any_checkpoint",
    "load_checkpoint",
    "resume_state",
    "save_checkpoint",
    "warm_start_generator",
    "EMAState",
    "TrainState",
    "build_optimizer",
    "create_train_state",
    "ema_decay",
    "ema_update",
    "init_ema",
    "make_denoise_train_step",
    "make_eval_step",
    "make_gan_train_step",
    "make_pixel_train_step",
]
