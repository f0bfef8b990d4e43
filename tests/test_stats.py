"""PhaseStats wiring: per-phase timers + the reference's DenoisingStatistics
pixel counters (DenoisingUnit.cpp:56-69 — managed pixels, main-path solves,
mean-patch fallbacks), collected on device by the engine when a PhaseStats
is passed, printed by `bcd-cli --stats` and `bench.py --phases`."""

import numpy as np

from bcd_tpu.chrono import PhaseStats
from bcd_tpu.core.monoscale import denoise_monoscale
from bcd_tpu.core.pipeline import denoise_pipeline
from bcd_tpu.params import (
    DenoiserParameters, MultiscaleDenoiserParameters, PipelineParameters,
)
from tests.test_ops_vs_oracle import make_stats


def _params():
    return DenoiserParameters(search_window_radius=2)


def test_counters_match_engine_paths_and_interior(rng):
    h, w = 40, 40
    _, st = make_stats(rng, h=h, w=w, spp=8)
    args = (st["mean"], st["nb_of_samples"], st["histo"], st["cov"],
            _params())

    s_xla, s_fused = PhaseStats(), PhaseStats()
    o1 = denoise_monoscale(*args, tile=16, stats=s_xla, use_fused=False)
    o2 = denoise_monoscale(*args, tile=16, stats=s_fused, use_fused=True)

    r = _params().patch_radius
    interior = (h - 2 * r) * (w - 2 * r)
    assert s_xla.counters["pixels: managed"] == interior
    # the fused kernels' in-kernel gates count exactly like the XLA engine
    assert dict(s_xla.counters) == dict(s_fused.counters)
    assert (s_xla.counters["pixels: main-path solves"]
            + s_xla.counters["pixels: fallback (mean patch)"] == interior)
    assert s_xla.timers, "phase timers must be recorded"
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=5e-4)


def test_stats_do_not_change_output(rng):
    _, st = make_stats(rng, h=32, w=28, spp=8)
    args = (st["mean"], st["nb_of_samples"], st["histo"], st["cov"],
            _params())
    plain = denoise_monoscale(*args, tile=16)
    with_stats = denoise_monoscale(*args, tile=16, stats=PhaseStats())
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(with_stats))


def test_pipeline_phase_tree(rng):
    _, st = make_stats(rng, h=32, w=32, spp=8)
    stats = PhaseStats()
    pp = PipelineParameters(
        denoiser=MultiscaleDenoiserParameters(
            nb_of_scales=2, monoscale=_params()),
    )
    denoise_pipeline(st["mean"], st["nb_of_samples"], st["histo"],
                     st["cov"], pp, tile=16, stats=stats)
    names = set(stats.timers)
    assert "spike-removal prefilter" in names
    assert "pyramid build" in names
    assert "merge" in names
    assert sum(1 for n in names if n.startswith("denoise ")) == 2
    report = stats.report()
    assert "pixels: managed" in report and "Chronometers:" in report
