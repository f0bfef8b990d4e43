"""Golden-image regression tests: the JAX engine against committed outputs
of the native CPU engine (SURVEY.md §4 strategy; regenerate with
``make golden`` only when an intentional numerics change lands)."""

import os

import numpy as np
import pytest

from bcd_tpu.io import image_io
from bcd_tpu.params import DenoiserParameters

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="golden fixtures not generated"
)


def _inputs():
    mean = image_io.load_multi_channels_exr(
        os.path.join(GOLDEN_DIR, "in_color.exr"))
    hc = image_io.load_multi_channels_exr(
        os.path.join(GOLDEN_DIR, "in_hist.exr"))
    histo, nb = image_io.separate_nb_of_samples_from_histogram(hc)
    cov = image_io.load_multi_channels_exr(
        os.path.join(GOLDEN_DIR, "in_cov.exr"))
    return mean, nb, histo, cov


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a, np.float64) - b) ** 2)))


def test_monoscale_matches_golden():
    from bcd_tpu.core.monoscale import denoise_monoscale

    mean, nb, histo, cov = _inputs()
    golden = image_io.load_multi_channels_exr(
        os.path.join(GOLDEN_DIR, "out_mono_b6.exr"))
    out = denoise_monoscale(mean, nb, histo, cov,
                            DenoiserParameters(search_window_radius=6),
                            tile=16)
    assert rmse(out, golden) < 1e-4


def test_multiscale_matches_golden():
    from bcd_tpu.core.multiscale import denoise_multiscale

    mean, nb, histo, cov = _inputs()
    golden = image_io.load_multi_channels_exr(
        os.path.join(GOLDEN_DIR, "out_multi2_b6.exr"))
    out = denoise_multiscale(mean, nb, histo, cov,
                             DenoiserParameters(search_window_radius=6),
                             nb_of_scales=2, tile=16)
    assert rmse(out, golden) < 1e-4
