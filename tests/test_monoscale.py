"""Golden tests: the TPU monoscale/multiscale engine vs the float64 oracle."""

import numpy as np
import pytest

from bcd_tpu.params import DenoiserParameters
from tests import reference_impl as oracle
from tests.test_ops_vs_oracle import make_stats


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a, np.float64) - b) ** 2)))


def small_inputs(rng, h=16, w=14, spp=16):
    _, stats = make_stats(rng, h=h, w=w, spp=spp)
    return (
        stats["mean"].astype(np.float32),
        stats["nb_of_samples"].astype(np.float32),
        stats["histo"].astype(np.float32),
        stats["cov"].astype(np.float32),
    )


class TestMonoscale:
    def test_matches_oracle_small(self, rng):
        from bcd_tpu.core.monoscale import denoise_monoscale

        color, nb, histo, cov = small_inputs(rng)
        params = DenoiserParameters(search_window_radius=3)
        ref = oracle.denoise_monoscale(color, nb, histo, cov, params)
        out = denoise_monoscale(color, nb, histo, cov, params, tile=8)
        assert rmse(out, ref) < 1e-4

    def test_tile_size_invariance(self, rng):
        from bcd_tpu.core.monoscale import denoise_monoscale

        color, nb, histo, cov = small_inputs(rng, h=20, w=17)
        params = DenoiserParameters(search_window_radius=2)
        a = denoise_monoscale(color, nb, histo, cov, params, tile=8)
        b = denoise_monoscale(color, nb, histo, cov, params, tile=16)
        assert rmse(a, np.asarray(b, np.float64)) < 1e-6

    def test_high_threshold_defaults(self, rng):
        # threshold large enough that every window candidate is selected:
        # exercises the main (non-fallback) path everywhere
        from bcd_tpu.core.monoscale import denoise_monoscale

        color, nb, histo, cov = small_inputs(rng, h=14, w=12)
        params = DenoiserParameters(
            search_window_radius=3, histogram_distance_threshold=1e6
        )
        ref = oracle.denoise_monoscale(color, nb, histo, cov, params)
        out = denoise_monoscale(color, nb, histo, cov, params, tile=8)
        assert rmse(out, ref) < 1e-4

    def test_low_threshold_fallback_path(self, rng):
        # zero threshold: only the self patch (distance exactly 0) is
        # selected -> fallback everywhere; output equals the input color
        from bcd_tpu.core.monoscale import denoise_monoscale

        color, nb, histo, cov = small_inputs(rng, h=12, w=12)
        params = DenoiserParameters(
            search_window_radius=3, histogram_distance_threshold=0.0
        )
        ref = oracle.denoise_monoscale(color, nb, histo, cov, params)
        out = denoise_monoscale(color, nb, histo, cov, params, tile=8)
        assert rmse(out, ref) < 1e-5

    def test_patch_radius_2(self, rng):
        from bcd_tpu.core.monoscale import denoise_monoscale

        color, nb, histo, cov = small_inputs(rng, h=14, w=14, spp=24)
        params = DenoiserParameters(patch_radius=2, search_window_radius=2)
        ref = oracle.denoise_monoscale(color, nb, histo, cov, params)
        out = denoise_monoscale(color, nb, histo, cov, params, tile=8)
        assert rmse(out, ref) < 1e-4

    def test_patch_radius_2_pallas_path(self, rng):
        """patch_radius=2 through the candidate-stack Pallas kernel (the
        accelerator default for r != 1), interpret mode on CPU. Pins the
        d=75/npx=25 geometry: solve_filter was silently called with the
        default npx=9 before round 3 — wrong block-diagonal noise on any
        accelerator r=2 run."""
        from bcd_tpu.core.monoscale import denoise_monoscale

        color, nb, histo, cov = small_inputs(rng, h=14, w=14, spp=24)
        params = DenoiserParameters(patch_radius=2, search_window_radius=2)
        ref = oracle.denoise_monoscale(color, nb, histo, cov, params)
        out = denoise_monoscale(color, nb, histo, cov, params, tile=8,
                                use_pallas=True, use_fused=False)
        assert rmse(out, ref) < 1e-4


class TestMultiscale:
    def test_matches_oracle(self, rng):
        from bcd_tpu.core.multiscale import denoise_multiscale

        color, nb, histo, cov = small_inputs(rng, h=24, w=20, spp=16)
        params = DenoiserParameters(search_window_radius=2)
        ref = oracle.denoise_multiscale(color, nb, histo, cov, params, 2)
        out = denoise_multiscale(
            color, nb, histo, cov, params, nb_of_scales=2, tile=8
        )
        assert rmse(out, ref) < 2e-4

    def test_progress_monotone(self, rng):
        from bcd_tpu.core.multiscale import denoise_multiscale

        color, nb, histo, cov = small_inputs(rng, h=16, w=16)
        params = DenoiserParameters(search_window_radius=2)
        seen = []
        denoise_multiscale(
            color, nb, histo, cov, params, nb_of_scales=2, tile=8,
            progress_callback=seen.append,
        )
        assert seen == sorted(seen) and seen[0] == 0.0 and seen[-1] == 1.0


class TestPipeline:
    def test_end_to_end_sanitized(self, rng):
        from bcd_tpu.core.pipeline import denoise_pipeline
        from bcd_tpu.params import PipelineParameters

        color, nb, histo, cov = small_inputs(rng, h=16, w=16)
        p = PipelineParameters()
        p.denoiser.nb_of_scales = 2
        p.denoiser.monoscale.search_window_radius = 2
        out = denoise_pipeline(color, nb, histo, cov, p, tile=8)
        assert out.shape == color.shape
        assert np.all(np.isfinite(out)) and np.all(out >= 0)

    def test_odd_dimensions_full_pyramid(self, rng):
        """Odd H and W through 3 scales: the floor-size downscale drops the
        trailing row/column (MultiscaleDenoiser.cpp:243-295 uses floor sizes
        with clamped quad reads; equivalent for all retained pixels) and the
        magic-kernel merge upsamples back to the odd sizes. Pins the
        end-to-end equivalence against the float64 oracle."""
        from bcd_tpu.core.multiscale import denoise_multiscale

        color, nb, histo, cov = small_inputs(rng, h=21, w=19, spp=16)
        params = DenoiserParameters(search_window_radius=2)
        ref = oracle.denoise_multiscale(color, nb, histo, cov, params, 3)
        out = denoise_multiscale(
            color, nb, histo, cov, params, nb_of_scales=3, tile=8
        )
        assert out.shape == (21, 19, 3)
        assert rmse(out, ref) < 2e-4
