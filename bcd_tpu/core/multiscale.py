"""Multiscale denoiser (reference src/core/MultiscaleDenoiser.cpp).

Runs the monoscale engine at ``nb_of_scales`` resolutions. Pyramid
construction (reference :41-53): colors by 2x2 average, nbOfSamples and
histograms by 2x2 sum, sample covariance by the weighted sum
w_i = (1/16) * sum(N) / N_i. Coarsest scale is denoised first, then each
finer scale is denoised and merged as
``merged = H - interpolate(downscale(H)) + interpolate(L)``
(reference :121-126, :453-466). Progress is re-weighted by the 4^s
per-scale cost model (reference :103-112).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from bcd_tpu.core.monoscale import denoise_monoscale
from bcd_tpu.ops import resample
from bcd_tpu.params import DenoiserParameters


def _scale_progress_mapper(nb_of_scales: int, scale: int):
    """Map per-scale progress to global progress with the 4^s cost model:
    the work of scales s..coarsest is (4^(s+1) - 1)/3 units out of
    (4^nbOfScales - 1)/3 total (reference MultiscaleDenoiser.cpp:103-112)."""
    s = nb_of_scales - 1 - scale
    factor = 1.0 / float(((1 << (2 * nb_of_scales)) - 1) // 3)
    lo = factor * float(((1 << (2 * s)) - 1) // 3)
    hi = factor * float(((1 << (2 * (s + 1))) - 1) // 3)
    return lambda p: lo + p * (hi - lo)


def denoise_multiscale(
    color,
    nb,
    histo,
    cov,
    params: DenoiserParameters,
    nb_of_scales: int = 3,
    tile: Optional[int] = None,
    progress_callback: Optional[Callable[[float], None]] = None,
    skip_stride: int = 1,
    use_fused: Optional[bool] = None,
    use_pallas: Optional[bool] = None,
    stats=None,
):
    """Full multiscale denoise; returns a jax array (H, W, 3).

    ``stats``: optional :class:`bcd_tpu.chrono.PhaseStats`; records pyramid
    build/merge times and per-scale engine phases + DenoisingStatistics
    counters (adds one sync per phase — a profiling mode, not the
    production path)."""
    import contextlib

    color = jnp.asarray(color, jnp.float32)
    nb = jnp.asarray(nb, jnp.float32)
    histo = jnp.asarray(histo, jnp.float32)
    cov = jnp.asarray(cov, jnp.float32)

    ctx = (stats.phase("pyramid build") if stats is not None
           else contextlib.nullcontext())
    with ctx:
        inputs = [(color, nb, histo, cov)]
        for _ in range(nb_of_scales - 1):
            c, n, h, sc = inputs[-1]
            inputs.append(
                (
                    resample.downscale_average(c),
                    resample.downscale_sum(n),
                    resample.downscale_sum(h),
                    resample.downscale_sample_covariance_sum(sc, n),
                )
            )
        if stats is not None and nb_of_scales > 1:
            float(jnp.sum(inputs[-1][0]))  # sync for honest phase timing

    merged = None
    for scale in range(nb_of_scales - 1, -1, -1):
        c, n, h, sc = inputs[scale]
        mapper = _scale_progress_mapper(nb_of_scales, scale)
        scale_cb = None
        if progress_callback is not None:
            progress_callback(mapper(0.0))
            scale_cb = lambda p, m=mapper: progress_callback(m(p))  # noqa: E731
        out = denoise_monoscale(c, n, h, sc, params, tile=tile,
                                skip_stride=skip_stride,
                                use_fused=use_fused, use_pallas=use_pallas,
                                progress_callback=scale_cb, stats=stats)
        if progress_callback is not None:
            progress_callback(mapper(1.0))
        if merged is None:
            merged = out
        elif stats is not None:
            with stats.phase("merge"):
                merged = resample.merge_outputs(out, merged)
                float(jnp.sum(merged))  # sync for honest phase timing
        else:
            merged = resample.merge_outputs(out, merged)
    return merged
