"""In-scale progress reporting (reference Denoiser.cpp:179-192: integer-
percent callbacks *within* a scale, not just at scale boundaries)."""

import numpy as np

from bcd_tpu.core.monoscale import denoise_monoscale
from bcd_tpu.core.multiscale import denoise_multiscale
from bcd_tpu.params import DenoiserParameters
from tests.test_ops_vs_oracle import make_stats


def _params():
    return DenoiserParameters(search_window_radius=2)


def test_monoscale_inscale_progress(rng):
    _, st = make_stats(rng, h=40, w=40, spp=8)
    seen = []
    out = denoise_monoscale(
        st["mean"], st["nb_of_samples"], st["histo"], st["cov"], _params(),
        tile=8, progress_callback=seen.append)
    assert np.isfinite(np.asarray(out)).all()
    # 25 tiles -> 25 monotone in-scale ticks at <= 5% granularity
    assert len(seen) >= 20, seen
    assert seen == sorted(seen), "progress must be monotone"
    assert seen[-1] == 1.0
    assert max(np.diff([0.0] + seen)) <= 0.05 + 1e-6


def test_monoscale_progress_does_not_change_output(rng):
    _, st = make_stats(rng, h=16, w=16, spp=8)
    args = (st["mean"], st["nb_of_samples"], st["histo"], st["cov"],
            _params())
    base = np.asarray(denoise_monoscale(*args, tile=8))
    withp = np.asarray(denoise_monoscale(
        *args, tile=8, progress_callback=lambda p: None))
    np.testing.assert_array_equal(base, withp)


def test_progress_fallback_without_injit_callbacks(rng, monkeypatch):
    """On platforms where in-jit debug.callback hangs XLA compilation
    (the axon TPU tunnel — see _injit_callbacks_supported), progress must
    degrade to host-side scale-boundary steps, never to silence."""
    monkeypatch.setenv("BCD_INJIT_PROGRESS", "0")
    _, st = make_stats(rng, h=32, w=32, spp=8)
    seen = []
    denoise_multiscale(
        st["mean"], st["nb_of_samples"], st["histo"], st["cov"], _params(),
        nb_of_scales=2, tile=8, progress_callback=seen.append)
    assert seen == sorted(seen)
    assert seen[0] == 0.0 and seen[-1] == 1.0
    # one 0 -> 1 step per scale through the 4^s mapper: the coarse scale's
    # completion (0.2) must be reported before the fine scale runs
    assert 0.2 in seen, seen


def test_multiscale_progress_spans_scales(rng):
    _, st = make_stats(rng, h=32, w=32, spp=8)
    seen = []
    denoise_multiscale(
        st["mean"], st["nb_of_samples"], st["histo"], st["cov"], _params(),
        nb_of_scales=2, tile=8, progress_callback=seen.append)
    assert seen == sorted(seen)
    assert seen[0] == 0.0 and seen[-1] == 1.0
    # in-scale ticks must exist inside BOTH scales' progress windows
    # (coarse scale maps to [0, 0.2], fine to [0.2, 1.0] by the 4^s model)
    assert any(0.0 < p < 0.2 for p in seen), seen
    assert any(0.2 < p < 1.0 for p in seen), seen
