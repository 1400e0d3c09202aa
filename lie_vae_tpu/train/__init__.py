"""Training harness (reference: lie_vae/experiments/unsupervised.py, main.py)."""
from lie_vae_tpu.train.loop import UnsupervisedExperiment  # noqa: F401
from lie_vae_tpu.train.logging import MetricWriter  # noqa: F401
from lie_vae_tpu.train.schedules import (  # noqa: F401
    ConstantSchedule, LinearSchedule, get_beta_schedule)
from lie_vae_tpu.train.state import TrainState, make_optimizer  # noqa: F401
