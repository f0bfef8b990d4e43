"""Independent-oracle parity: bcd_tpu vs the reference's own compiled C++.

Unlike every other parity test (which compares against
tests/reference_impl.py — same author as the engine), this one builds the
UPSTREAM reference core (/root/reference/src/core/*.cpp, CPU path) with the
tensorflow wheel's vendored Eigen and diffs real outputs. See
scripts/independent_check.py for the build recipe and protocol.

Marked slow: the one-time g++ build of the Eigen-heavy core takes ~2 min
(cached across runs in /tmp/bcd_ref_build). `make verify` runs it.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.fixture(scope="module")
def ref_exe():
    from independent_check import build_reference

    exe = build_reference(verbose=False)
    if exe is None:
        pytest.skip("reference core not buildable on this host "
                    "(missing /root/reference or Eigen headers)")
    return exe


def _scene(h, w, spp=6, seed=3):
    from make_test_scene import render_clean, sample_noisy
    from bcd_tpu.ops.accumulator import SamplesAccumulator
    from bcd_tpu.params import HistogramParameters

    clean = render_clean(h, w)
    acc = SamplesAccumulator(h, w, HistogramParameters())
    acc.add_samples(sample_noisy(clean, spp=spp, seed=seed))
    nb, mean, cov, histo = acc.extract_samples_statistics()
    return (mean.astype(np.float32), nb.astype(np.float32),
            histo.astype(np.float32), cov.astype(np.float32))


@pytest.mark.slow
@pytest.mark.parametrize("scales,size", [(1, (64, 96)), (3, (96, 128))])
def test_engine_matches_upstream_cpp(ref_exe, scales, size):
    from independent_check import run_reference
    from bcd_tpu.core.multiscale import denoise_multiscale
    from bcd_tpu.params import DenoiserParameters

    h, w = size
    color, nb, histo, cov = _scene(h, w)
    params = DenoiserParameters()

    ref = run_reference(ref_exe, color, nb, histo, cov, params,
                        scales=scales)
    ours = np.asarray(
        denoise_multiscale(color, nb, histo, cov, params,
                           nb_of_scales=scales, tile=32)
    )
    scale = float(np.sqrt(np.mean(ref ** 2)) + 1e-12)
    rms = float(np.sqrt(np.mean((ref - ours) ** 2))) / scale
    assert rms < 2e-4, f"engine diverges from upstream C++: rms {rms:.3e}"


@pytest.mark.slow
@pytest.mark.parametrize("kwargs", [
    dict(patch_radius=2),               # 75-dim patches, XLA engine path
    dict(search_window_radius=3),       # smaller window
    dict(histogram_distance_threshold=0.5),  # stricter similar sets
    dict(min_eigen_value=1e-4),         # the reference's commented default
])
def test_parameter_variants_match_upstream_cpp(ref_exe, kwargs):
    """Non-default parameter surfaces against the upstream C++ — pins the
    -w/-b/-d/-e flag semantics, not just the default configuration."""
    from independent_check import run_reference
    from bcd_tpu.core.multiscale import denoise_multiscale
    from bcd_tpu.params import DenoiserParameters

    color, nb, histo, cov = _scene(48, 64, spp=8, seed=7)
    params = DenoiserParameters(**kwargs)

    ref = run_reference(ref_exe, color, nb, histo, cov, params, scales=1)
    ours = np.asarray(
        denoise_multiscale(color, nb, histo, cov, params,
                           nb_of_scales=1, tile=32)
    )
    scale = float(np.sqrt(np.mean(ref ** 2)) + 1e-12)
    rms = float(np.sqrt(np.mean((ref - ours) ** 2))) / scale
    assert rms < 2e-4, f"{kwargs}: diverges from upstream C++ ({rms:.3e})"


@pytest.mark.slow
def test_ingest_matches_upstream_accumulator(ref_exe):
    """Round-3 verdict item 6: feed the SAME weighted sample stream through
    bcd_tpu's device binning and the upstream SamplesAccumulator
    (reference SamplesAccumulator.cpp:44-141 via ref_driver --acc) and diff
    all four statistics images — pins the raw2bcd ingest semantics (gamma
    companding, two-bin splat, saturation bins, bias-corrected covariance,
    non-unit weights) against the upstream C++ itself."""
    from independent_check import run_reference_accumulator
    from make_test_scene import render_clean, sample_noisy
    from bcd_tpu.ops.accumulator import accumulate_samples
    from bcd_tpu.params import HistogramParameters

    h, w, spp = 40, 56, 5
    clean = render_clean(h, w)
    samples = sample_noisy(clean, spp=spp, seed=13)
    rng = np.random.default_rng(17)
    weights = (0.5 + rng.random((h, w, spp))).astype(np.float32)

    ref_nb, ref_mean, ref_cov, ref_histo = run_reference_accumulator(
        ref_exe, samples, weights)
    nb, mean, cov, histo = accumulate_samples(
        samples, HistogramParameters(), weights=weights)

    def rel_rms(a, b):
        scale = float(np.sqrt(np.mean(np.asarray(b) ** 2)) + 1e-12)
        return float(np.sqrt(np.mean((np.asarray(a) - b) ** 2))) / scale

    errs = {
        "nb": rel_rms(nb[..., 0], ref_nb),
        "mean": rel_rms(mean, ref_mean),
        "cov": rel_rms(cov, ref_cov),
        "histo": rel_rms(histo, ref_histo),
    }
    bad = {k: v for k, v in errs.items() if v > 1e-5}
    assert not bad, f"ingest diverges from upstream C++: {bad} (all {errs})"


@pytest.mark.slow
def test_accumulator_feeds_upstream_identically(ref_exe):
    """The statistics arrays our SamplesAccumulator produces are accepted
    verbatim by the upstream core (layout + conventions match): covered by
    the tests above, but this pins the spike-removal prefilter too."""
    from independent_check import run_reference
    from bcd_tpu.core.pipeline import denoise_pipeline
    from bcd_tpu.params import (
        DenoiserParameters, MultiscaleDenoiserParameters, PipelineParameters,
    )

    h, w = 64, 96
    color, nb, histo, cov = _scene(h, w, spp=8, seed=11)
    params = DenoiserParameters()

    # upstream has no prefilter flag in the core API; SpikeRemovalFilter is
    # applied by the CLI before denoising (main.cpp). Mirror that: run our
    # prefilter, hand the filtered stats to the upstream core.
    from bcd_tpu.ops.spike_removal import spike_removal

    f_color, f_nb, f_histo, f_cov = spike_removal(
        color, nb, histo, cov, np.float32(2.0)
    )
    ref = run_reference(
        ref_exe, np.asarray(f_color), np.asarray(f_nb),
        np.asarray(f_histo), np.asarray(f_cov), params, scales=1,
    )
    pp = PipelineParameters(
        denoiser=MultiscaleDenoiserParameters(nb_of_scales=1)
    )
    ours = np.asarray(denoise_pipeline(color, nb, histo, cov, pp, tile=32))
    scale = float(np.sqrt(np.mean(ref ** 2)) + 1e-12)
    rms = float(np.sqrt(np.mean((ref - ours) ** 2))) / scale
    assert rms < 2e-4, f"prefilter path diverges: rms {rms:.3e}"
