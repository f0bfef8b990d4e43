"""Parity tests for the native C++ CPU engine (native/bcd_cpu.cpp) against
the float64 oracle and the JAX engine."""

import numpy as np
import pytest

from bcd_tpu.params import DenoiserParameters
from tests import reference_impl as oracle
from tests.test_ops_vs_oracle import make_stats


def inputs(rng, h=16, w=14, spp=16):
    _, stats = make_stats(rng, h=h, w=w, spp=spp)
    return [
        stats["mean"].astype(np.float32),
        stats["nb_of_samples"].astype(np.float32),
        stats["histo"].astype(np.float32),
        stats["cov"].astype(np.float32),
    ]


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a, np.float64) - b) ** 2)))


def test_native_monoscale_matches_oracle(rng):
    from bcd_tpu.native_ref import denoise_monoscale_cpu

    args = inputs(rng)
    params = DenoiserParameters(search_window_radius=3)
    ref = oracle.denoise_monoscale(*args, params)
    out = denoise_monoscale_cpu(*args, params)
    assert rmse(out, ref) < 1e-5


def test_native_multithreaded_deterministic(rng):
    from bcd_tpu.native_ref import denoise_monoscale_cpu

    args = inputs(rng, h=20, w=18)
    params = DenoiserParameters(search_window_radius=2)
    # same thread count -> bitwise reproducible
    a = denoise_monoscale_cpu(*args, params, n_threads=4)
    b = denoise_monoscale_cpu(*args, params, n_threads=4)
    np.testing.assert_array_equal(a, b)
    # different thread counts only reorder the per-thread buffer reduction
    # (same property as the reference's finalAggregation): ULP-level drift
    c = denoise_monoscale_cpu(*args, params, n_threads=1)
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)


def test_native_multiscale_matches_oracle(rng):
    from bcd_tpu.native_ref import denoise_multiscale_cpu

    args = inputs(rng, h=24, w=20)
    params = DenoiserParameters(search_window_radius=2)
    ref = oracle.denoise_multiscale(*args, params, 2)
    out = denoise_multiscale_cpu(*args, params, nb_of_scales=2)
    assert rmse(out, ref) < 1e-5


def test_native_matches_jax_engine(rng):
    from bcd_tpu.core.monoscale import denoise_monoscale
    from bcd_tpu.native_ref import denoise_monoscale_cpu

    args = inputs(rng, h=18, w=16)
    params = DenoiserParameters(search_window_radius=3)
    cpu = denoise_monoscale_cpu(*args, params)
    tpu = np.asarray(denoise_monoscale(*args, params, tile=8))
    assert rmse(tpu, cpu.astype(np.float64)) < 1e-4
