"""Training stack: loss/metrics, EMA, data-parallel train loop, checkpoints.

TPU-native replacement for the reference's external training framework
(PyTorch Lightning ``EMALightningModule`` + ``EnergyForceLoss`` +
``EnergyForceMetrics`` + DDP, ``configs/tutorial.yaml:31-64``): a jitted
optax train step, data parallelism via batch sharding over a
``jax.sharding.Mesh`` (XLA inserts the gradient all-reduce), exponential
moving average of weights, and orbax checkpoints.
"""

from .loss import EnergyForceLoss, EnergyForceMetrics
from .loop import Trainer, TrainState, shard_stack
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "EnergyForceLoss",
    "EnergyForceMetrics",
    "Trainer",
    "TrainState",
    "shard_stack",
    "save_checkpoint",
    "load_checkpoint",
]
