"""Pallas TPU kernels (native compute path) with jnp fallbacks."""
from .decoder_kernels import (fused_decode_bce, fused_decode_bce_t,
                              use_fused_decoder)
from .manifold_kernels import (lorentz_distance, stereo_distance, use_pallas,
                               use_fused_reparam, wrapped_reparam_stereo_t)

__all__ = ["stereo_distance", "lorentz_distance", "wrapped_reparam_stereo_t",
           "use_pallas", "use_fused_reparam", "fused_decode_bce",
           "fused_decode_bce_t", "use_fused_decoder"]
