from recnet_tpu.training.optim import torch_adam, clip_by_global_norm
from recnet_tpu.training.step import (
    TrainState, init_train_state, build_train_step, build_val_step)
