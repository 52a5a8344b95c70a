"""train — jit-compiled chain training over a device mesh.

Replaces the reference's plain single-GPU torch loop ([R]
example/train.py, SURVEY.md section 3) with: a flax TrainState carrying
batchnorm stats, a global-batch jitted train step (GSPMD collectives
inserted by XLA), periodic semi-orthogonal constraint application (TDNN-F),
structured metrics, and orbax checkpointing.
"""

from torchain_tpu.train.ngsgd import NGOptions, natural_gradient
from torchain_tpu.train.state import ChainTrainState, create_train_state
from torchain_tpu.train.step import make_eval_step, make_train_step
from torchain_tpu.train.trainer import Trainer, TrainerConfig

__all__ = [
    "ChainTrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "natural_gradient",
    "NGOptions",
    "Trainer",
    "TrainerConfig",
]
