from newtonnet_tpu.train.loss import get_loss_by_string
from newtonnet_tpu.train.optimizer import (
    get_optimizer_by_string,
    get_scheduler_by_string,
)
from newtonnet_tpu.train.trainer import Trainer
