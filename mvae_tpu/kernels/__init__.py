"""Pallas TPU kernels (native compute path) with jnp fallbacks."""
from .decoder_kernels import fused_decode_bce, use_fused_decoder
from .manifold_kernels import (lorentz_distance, stereo_distance, use_pallas,
                               wrapped_sample_stereo)

__all__ = ["stereo_distance", "lorentz_distance", "wrapped_sample_stereo",
           "use_pallas", "fused_decode_bce", "use_fused_decoder"]
