"""Unit tests: JAX ops vs the float64 NumPy oracle (reference semantics)."""

import numpy as np
import pytest

from bcd_tpu.params import HistogramParameters
from tests import reference_impl as oracle


def make_stats(rng, h=12, w=10, spp=8, spike=False):
    """Synthesize a sample dump and its accumulated statistics (oracle)."""
    base = rng.random((h, w, 1, 3)) * 1.5
    samples = base + 0.3 * rng.standard_normal((h, w, spp, 3))
    samples = np.abs(samples).astype(np.float32)
    if spike:
        samples[h // 2, w // 2] *= 40.0  # firefly
    stats = oracle.accumulate_samples(samples)
    return samples, stats


class TestAccumulator:
    def test_matches_oracle(self, rng):
        from bcd_tpu.ops.accumulator import accumulate_samples

        samples, ref = make_stats(rng)
        nb, mean, cov, histo = accumulate_samples(samples)
        np.testing.assert_allclose(nb, ref["nb_of_samples"], rtol=1e-6)
        np.testing.assert_allclose(mean, ref["mean"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(cov, ref["cov"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(histo, ref["histo"], rtol=1e-4, atol=1e-4)

    def test_streaming_chunks_match_oneshot(self, rng):
        from bcd_tpu.ops.accumulator import SamplesAccumulator, accumulate_samples

        samples, _ = make_stats(rng, h=9)
        ref = accumulate_samples(samples)
        acc = SamplesAccumulator(9, 10, HistogramParameters())
        acc.add_samples(samples[:4], row0=0)
        acc.add_samples(samples[4:], row0=4)
        out = acc.extract_samples_statistics()
        for a, b in zip(out, ref):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_weighted_samples(self, rng):
        from bcd_tpu.ops.accumulator import accumulate_samples

        samples, _ = make_stats(rng, h=6, w=7, spp=5)
        weights = rng.random((6, 7, 5)).astype(np.float32) + 0.5
        ref = oracle.accumulate_samples(samples, weights=weights)
        nb, mean, cov, histo = accumulate_samples(samples, weights=weights)
        np.testing.assert_allclose(nb, ref["nb_of_samples"], rtol=1e-5)
        np.testing.assert_allclose(mean, ref["mean"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(cov, ref["cov"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(histo, ref["histo"], rtol=1e-4, atol=1e-4)

    def test_saturated_samples_hit_top_bins(self):
        from bcd_tpu.ops.accumulator import accumulate_samples

        # value far above max_value lands in the top two bins
        samples = np.full((1, 1, 4, 3), 50.0, dtype=np.float32)
        ref = oracle.accumulate_samples(samples)
        _, _, _, histo = accumulate_samples(samples)
        np.testing.assert_allclose(histo, ref["histo"], rtol=1e-5, atol=1e-5)
        hist3 = np.asarray(histo).reshape(1, 1, 3, 20)
        assert np.all(hist3[..., :19] == 0)  # fully saturated -> all weight
        assert np.all(hist3[..., 19] > 0)  # lands in the top bin


class TestSpikeRemoval:
    def test_matches_oracle(self, rng):
        from bcd_tpu.ops.spike_removal import spike_removal

        samples, stats = make_stats(rng, spike=True)
        color = stats["mean"].astype(np.float32)
        nb = stats["nb_of_samples"].astype(np.float32)
        histo = stats["histo"].astype(np.float32)
        cov = stats["cov"].astype(np.float32)

        ref = oracle.spike_removal(color, nb, histo, cov, 2.0)
        out = spike_removal(color, nb, histo, cov, 2.0)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5, atol=1e-6)
        # the firefly actually got replaced
        assert not np.allclose(np.asarray(out[0])[6, 5], color[6, 5])

    def test_border_pixels_use_clamped_windows(self, rng):
        from bcd_tpu.ops.spike_removal import spike_removal

        color = np.abs(rng.standard_normal((5, 6, 3))).astype(np.float32)
        color[0, 0] = 30.0  # corner spike
        nb = np.ones((5, 6, 1), np.float32)
        histo = rng.random((5, 6, 60)).astype(np.float32)
        cov = rng.random((5, 6, 6)).astype(np.float32)
        ref = oracle.spike_removal(color, nb, histo, cov, 1.5)
        out = spike_removal(color, nb, histo, cov, 1.5)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5, atol=1e-6)


class TestResample:
    @pytest.mark.parametrize("h,w", [(8, 10), (9, 11)])
    def test_downscales(self, rng, h, w):
        from bcd_tpu.ops import resample

        img = rng.random((h, w, 5)).astype(np.float32)
        nb = rng.random((h, w, 1)).astype(np.float32) + 0.5
        np.testing.assert_allclose(
            np.asarray(resample.downscale_sum(img)),
            oracle.downscale_sum(img), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(resample.downscale_average(img)),
            oracle.downscale_average(img), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(resample.downscale_sample_covariance_sum(img[..., :6] if img.shape[-1] >= 6 else img, nb)),
            oracle.downscale_sample_covariance_sum(img[..., :6] if img.shape[-1] >= 6 else img, nb),
            rtol=1e-5)

    @pytest.mark.parametrize("up_h,up_w", [(8, 10), (9, 11)])
    def test_interpolate(self, rng, up_h, up_w):
        from bcd_tpu.ops import resample

        img = rng.random((up_h // 2, up_w // 2, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(resample.interpolate(img, up_h, up_w)),
            oracle.interpolate(img, up_h, up_w), rtol=1e-5, atol=1e-7)

    def test_merge(self, rng):
        from bcd_tpu.ops import resample

        high = rng.random((10, 14, 3)).astype(np.float32)
        low = rng.random((5, 7, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(resample.merge_outputs(high, low)),
            oracle.merge_outputs(high, low), rtol=1e-5, atol=1e-6)

    def test_constant_image_merge_identity(self):
        from bcd_tpu.ops import resample

        # merging a constant high-res with its own downscale is the identity
        high = np.full((8, 8, 3), 0.7, np.float32)
        low = np.full((4, 4, 3), 0.7, np.float32)
        np.testing.assert_allclose(
            np.asarray(resample.merge_outputs(high, low)), high, rtol=1e-6)
