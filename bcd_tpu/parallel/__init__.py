"""Device-mesh scale-out layer.

The reference is a single-node, single-process program whose only
parallelism is an OpenMP loop over pixels with per-thread output buffers
(reference Denoiser.cpp:149-194) and an optional per-pixel CUDA kernel
launch (CudaHistogramDistance.cu:214-239). The TPU-native equivalents:

- :mod:`bcd_tpu.parallel.frames`  — renderfarm mode: a batch of frames
  data-parallel over the mesh (many 4K frames per slice).
- :mod:`bcd_tpu.parallel.spatial` — one huge frame spatially sharded over
  the mesh columns with ring halo exchange (``jax.lax.ppermute`` over ICI)
  of searchWindowRadius+patchRadius pixels; the sequence-parallel analog.
"""

from bcd_tpu.parallel.frames import denoise_frames
from bcd_tpu.parallel.spatial import (
    denoise_monoscale_spatial,
    denoise_multiscale_spatial,
)

__all__ = [
    "denoise_frames",
    "denoise_monoscale_spatial",
    "denoise_multiscale_spatial",
]
