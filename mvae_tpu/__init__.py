"""mvae-tpu: TPU-native mixed-curvature variational autoencoders.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
oskopek/mvae (ICLR 2020). See README.md for the tour; PARITY.md maps every
reference component to its home here.
"""

__version__ = "0.1.0"

from . import components, data, distributions, models, ops, parallel, train
from .components import Component, parse_components
from .models import VAEConfig
from .ops import Manifold
from .train import TrainConfig, Trainer

__all__ = [
    "__version__", "ops", "distributions", "components", "models", "train",
    "data", "parallel", "Manifold", "Component", "parse_components",
    "VAEConfig", "TrainConfig", "Trainer",
]
