from wavemamba_tpu.train.schedules import (
    build_scheduler,
    cosine_annealing_restart,
    cosine_annealing_restart_cyclic,
    multistep_restart,
)
from wavemamba_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    loss_fn,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "TrainConfig",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "make_optimizer",
    "loss_fn",
    "build_scheduler",
    "cosine_annealing_restart",
    "cosine_annealing_restart_cyclic",
    "multistep_restart",
]
