from dreamllm_tpu.train.optim import (
    OptimizerConfig,
    make_optimizer,
    make_lr_schedule,
)
from dreamllm_tpu.train.step import TrainState, make_train_step, init_train_state
from dreamllm_tpu.train.split_step import make_split_train_step
from dreamllm_tpu.train.hp_search import (
    BestRun,
    HPDim,
    default_compute_objective,
    default_hp_space,
    hyperparameter_search,
)
