"""Device kernels (reference DenoisingUnit / CudaHistogramDistance /
SamplesAccumulator / SpikeRemovalFilter / MultiscaleDenoiser resampling)."""

from bcd_tpu.ops.accumulator import SamplesAccumulator, accumulate_samples
from bcd_tpu.ops.cov3x3 import (
    blockdiag_add,
    blockdiag_expand,
    blockdiag_matmul,
    cov6_to_mat3,
    mat3_to_cov6,
)
from bcd_tpu.ops.spike_removal import spike_removal
from bcd_tpu.ops.sym_eigh import jacobi_eigh, sym_apply

__all__ = [
    "SamplesAccumulator",
    "accumulate_samples",
    "blockdiag_add",
    "blockdiag_expand",
    "blockdiag_matmul",
    "cov6_to_mat3",
    "mat3_to_cov6",
    "spike_removal",
    "jacobi_eigh",
    "sym_apply",
]
