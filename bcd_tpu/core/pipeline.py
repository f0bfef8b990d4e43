"""Top-level denoise pipeline (the CLI's launch path, reference
src/cli/main.cpp:422-476): optional spike-removal prefilter, mono- or
multiscale denoise, NaN/negative output sanitization."""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from bcd_tpu.core.multiscale import denoise_multiscale
from bcd_tpu.core.monoscale import denoise_monoscale
from bcd_tpu.ops.spike_removal import spike_removal
from bcd_tpu.params import PipelineParameters


def sanitize_output(image: jnp.ndarray) -> jnp.ndarray:
    """Zero out negative / NaN / Inf values (reference
    checkAndPutToZeroNegativeInfNaNValues, cli/main.cpp:389-420)."""
    bad = (image < 0) | jnp.isnan(image) | jnp.isinf(image)
    return jnp.where(bad, 0.0, image)


def denoise_pipeline(
    colors,
    nb_of_samples,
    histograms,
    sample_covariances,
    pipeline_params: Optional[PipelineParameters] = None,
    tile: Optional[int] = None,
    progress_callback: Optional[Callable[[float], None]] = None,
    skip_stride: int = 1,
    stats=None,
) -> np.ndarray:
    """Full pipeline on in-memory arrays; returns (H, W, 3) float32 numpy.

    ``skip_stride`` > 1 solves only every skip_stride-th patch center (the
    deterministic analog of the reference's skip-marking heuristic,
    DenoisingUnit.cpp:163-173) — a quality/throughput trade; 1 = exact.

    ``stats``: optional :class:`bcd_tpu.chrono.PhaseStats` — phase timers
    (prefilter / pyramid / per-scale denoise / merge) + the reference's
    DenoisingStatistics pixel counters (DenoisingUnit.cpp:56-69), at the
    cost of one device sync per phase."""
    import contextlib

    p = pipeline_params or PipelineParameters()

    color = jnp.asarray(colors, jnp.float32)
    nb = jnp.asarray(nb_of_samples, jnp.float32)
    histo = jnp.asarray(histograms, jnp.float32)
    cov = jnp.asarray(sample_covariances, jnp.float32)

    if p.prefiltering.perform_spike_removal:
        ctx = (stats.phase("spike-removal prefilter") if stats is not None
               else contextlib.nullcontext())
        with ctx:
            color, nb, histo, cov = spike_removal(
                color, nb, histo, cov,
                jnp.float32(
                    p.prefiltering.spike_removal_threshold_stdev_factor),
            )
            if stats is not None:
                float(jnp.sum(color))  # sync for honest phase timing

    if p.denoiser.nb_of_scales > 1:
        out = denoise_multiscale(
            color, nb, histo, cov, p.denoiser.monoscale,
            nb_of_scales=p.denoiser.nb_of_scales, tile=tile,
            progress_callback=progress_callback, skip_stride=skip_stride,
            stats=stats,
        )
    else:
        out = denoise_monoscale(color, nb, histo, cov, p.denoiser.monoscale,
                                tile=tile, skip_stride=skip_stride,
                                progress_callback=progress_callback,
                                stats=stats)
        if progress_callback is not None:
            progress_callback(1.0)

    return np.asarray(sanitize_output(out))
