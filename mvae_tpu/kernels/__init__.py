"""Pallas TPU kernels (native compute path) with jnp fallbacks."""
from .manifold_kernels import (lorentz_distance, stereo_distance, use_pallas,
                               wrapped_sample_stereo)

__all__ = ["stereo_distance", "lorentz_distance", "wrapped_sample_stereo",
           "use_pallas"]
