"""Core denoiser drivers (reference bcdcore)."""

from bcd_tpu.core.api import (
    Denoiser,
    DenoiserInputs,
    DenoiserOutputs,
    IDenoiser,
    MultiscaleDenoiser,
)
from bcd_tpu.core.monoscale import denoise_monoscale
from bcd_tpu.core.multiscale import denoise_multiscale
from bcd_tpu.core.pipeline import denoise_pipeline, sanitize_output

__all__ = [
    "Denoiser",
    "DenoiserInputs",
    "DenoiserOutputs",
    "IDenoiser",
    "MultiscaleDenoiser",
    "denoise_monoscale",
    "denoise_multiscale",
    "denoise_pipeline",
    "sanitize_output",
]
