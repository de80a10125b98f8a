from llavamod_tpu.train.config import TrainConfig
from llavamod_tpu.train.optim import build_optimizer, TrainState
from llavamod_tpu.train.steps import (
    make_pretrain_step,
    make_align_step,
    make_dpo_step,
)
