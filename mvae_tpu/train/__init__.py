"""Training loop (L5): jitted epoch scan, curvature burn-in, stats, metrics."""
from .metrics import MetricsLogger
from .stats import EpochStats
from .trainer import (TrainConfig, Trainer, make_eval_elbo, make_eval_ll,
                      make_optimizer, make_train_epoch)

__all__ = ["TrainConfig", "Trainer", "make_optimizer", "make_train_epoch",
           "make_eval_elbo", "make_eval_ll", "EpochStats", "MetricsLogger"]
