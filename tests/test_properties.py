"""Property tests (SURVEY.md §4): invariances the denoiser must satisfy."""

import numpy as np

from bcd_tpu.params import DenoiserParameters
from bcd_tpu.ops.accumulator import accumulate_samples


def test_constant_image_is_identity():
    """A render whose samples are exactly constant has zero sample variance:
    the noise covariance is zero, the Bayesian filter reduces to the
    identity, and every histogram distance is zero (all patches similar).
    The output must equal the input."""
    from bcd_tpu.core.monoscale import denoise_monoscale

    h, w, spp = 14, 12, 8
    value = np.array([0.4, 0.7, 0.2], np.float32)
    samples = np.broadcast_to(value, (h, w, spp, 3)).copy()
    nb, mean, cov, histo = accumulate_samples(samples)
    params = DenoiserParameters(search_window_radius=3)
    out = np.asarray(denoise_monoscale(mean, nb, histo, cov, params, tile=8))
    np.testing.assert_allclose(out, mean, atol=1e-5)


def test_output_independent_of_input_scramble_of_offsets():
    """Determinism: repeated runs produce bitwise-identical output (the
    reference's output depends on thread scheduling and rand())."""
    from bcd_tpu.core.monoscale import denoise_monoscale
    from tests.test_ops_vs_oracle import make_stats

    rng = np.random.default_rng(11)
    _, st = make_stats(rng, h=12, w=12, spp=8)
    args = [st[k].astype(np.float32)
            for k in ("mean", "nb_of_samples", "histo", "cov")]
    params = DenoiserParameters(search_window_radius=2)
    a = np.asarray(denoise_monoscale(*args, params, tile=8))
    b = np.asarray(denoise_monoscale(*args, params, tile=8))
    np.testing.assert_array_equal(a, b)


def test_cli_matches_native_engine(tmp_path):
    """End-to-end cross-engine parity: the JAX CLI pipeline and the native
    C++ engine agree on the same EXR inputs (spike prefilter off)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_test_scene import render_clean, sample_noisy
    from bcd_tpu import cli
    from bcd_tpu.io import image_io
    from bcd_tpu.native_ref import denoise_multiscale_cpu
    from bcd_tpu.ops.accumulator import accumulate_samples as acc

    clean = render_clean(24, 20)
    samples = sample_noisy(clean, spp=12, seed=3)
    nb, mean, cov, histo = acc(samples)

    stem = str(tmp_path / "scene")
    image_io.write_exr(mean, stem + ".exr")
    image_io.write_multi_channels_exr(
        image_io.merge_histogram_and_nb_of_samples(histo, nb),
        stem + "_hist.exr")
    image_io.write_multi_channels_exr(cov, stem + "_cov.exr")

    out_path = str(tmp_path / "out.exr")
    rc = cli.launch(["-i", stem + ".exr", "-o", out_path,
                     "-s", "2", "-b", "2", "-p", "0", "--tile", "8"])
    assert rc == 0
    jax_out = image_io.load_exr(out_path)

    # the native engine consumes the same (half-quantized) on-disk inputs
    color_in = image_io.load_exr(stem + ".exr")
    hc = image_io.load_multi_channels_exr(stem + "_hist.exr")
    histo_in, nb_in = image_io.separate_nb_of_samples_from_histogram(hc)
    cov_in = image_io.load_multi_channels_exr(stem + "_cov.exr")
    params = DenoiserParameters(search_window_radius=2)
    cpu_out = denoise_multiscale_cpu(color_in, nb_in, histo_in, cov_in,
                                     params, nb_of_scales=2)
    cpu_out = np.maximum(np.nan_to_num(cpu_out), 0.0)
    # jax_out went through HALF quantization on write; compare at half res
    rmse = np.sqrt(np.mean(
        (jax_out - cpu_out.astype(np.float16).astype(np.float32)) ** 2))
    assert rmse < 1e-3, rmse
