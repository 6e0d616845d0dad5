"""Training loop: losses, generic jit/pjit train step, Trainer driver."""

from tfrec_tpu.train.losses import make_loss  # noqa: F401
from tfrec_tpu.train.step import TrainStepBuilder, init_state  # noqa: F401
