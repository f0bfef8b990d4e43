"""bcd_tpu — TPU-native Bayesian Collaborative Denoising framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the BCD
reference implementation (Boughida & Boubekeur, EGSR 2017): a post-process
denoiser for Monte-Carlo path-traced renders driven by per-pixel sample
statistics (mean color, RGB sample covariance, per-channel luminance
histograms).

Public surface (mirrors the reference's bcdcore/bcdio split):

- :mod:`bcd_tpu.params`   — parameter dataclasses + ``.bcd.json`` presets
  (reference: include/bcd/core/IDenoiser.h, include/bcd/io/ParametersIO.h)
- :mod:`bcd_tpu.core`     — denoiser drivers (mono/multiscale) and the
  renderer-facing in-memory API (reference: Denoiser, MultiscaleDenoiser,
  IDenoiser)
- :mod:`bcd_tpu.ops`      — the device kernels: histogram distance, patch
  statistics, batched symmetric eigensolver, Bayesian filter, resampling,
  spike removal, sample accumulation (reference: DenoisingUnit,
  CudaHistogramDistance, SpikeRemovalFilter, SamplesAccumulator)
- :mod:`bcd_tpu.io`       — EXR codec and image adapters (reference: bcdio)
- :mod:`bcd_tpu.parallel` — device-mesh scale-out (frame batching and
  spatially-sharded single frames); no analog in the single-node reference.
"""

from bcd_tpu.params import (
    DenoiserParameters,
    HistogramParameters,
    PipelineParameters,
    PrefilteringParameters,
)

__version__ = "0.1.0"

__all__ = [
    "DenoiserParameters",
    "HistogramParameters",
    "PipelineParameters",
    "PrefilteringParameters",
    "__version__",
]


def __getattr__(name):
    # lazy re-exports that pull in jax only when actually used
    if name in ("DenoiserInputs", "DenoiserOutputs", "Denoiser",
                "MultiscaleDenoiser", "IDenoiser", "denoise_pipeline"):
        import bcd_tpu.core as core

        return getattr(core, name)
    raise AttributeError(name)
