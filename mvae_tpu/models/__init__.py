"""Models (L4): mixed-curvature VAE with MLP/conv encoder-decoder."""
from . import nets, vae
from .vae import (VAEConfig, elbo, forward, generate, init_params,
                  log_likelihood, loss_fn, reconstruct)

__all__ = ["nets", "vae", "VAEConfig", "init_params", "forward", "elbo",
           "loss_fn", "log_likelihood", "generate", "reconstruct"]
