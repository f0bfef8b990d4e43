"""Generate the committed golden fixtures in tests/golden/.

The goldens are outputs of the NATIVE CPU engine (validated to ~5e-8 RMSE
against the float64 oracle) on a deterministic synthetic scene — the
replacement for running the unported reference `bcd_cli` (SURVEY.md §4's
golden-image strategy). tests/test_golden.py asserts the JAX engine stays
within tolerance of these files, so numerical regressions are caught
without recomputing oracles.
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

GOLDEN_DIR = os.path.join(os.path.dirname(HERE), "tests", "golden")


def build_scene():
    from make_test_scene import render_clean, sample_noisy
    from bcd_tpu.ops.accumulator import accumulate_samples

    clean = render_clean(32, 28)
    samples = sample_noisy(clean, spp=16, seed=42)
    return accumulate_samples(samples)


def main() -> int:
    from bcd_tpu.io import image_io
    from bcd_tpu.native_ref import denoise_monoscale_cpu, denoise_multiscale_cpu
    from bcd_tpu.params import DenoiserParameters

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    nb, mean, cov, histo = build_scene()

    image_io.write_multi_channels_exr(mean, os.path.join(GOLDEN_DIR, "in_color.exr"))
    image_io.write_multi_channels_exr(
        image_io.merge_histogram_and_nb_of_samples(histo, nb),
        os.path.join(GOLDEN_DIR, "in_hist.exr"))
    image_io.write_multi_channels_exr(cov, os.path.join(GOLDEN_DIR, "in_cov.exr"))

    params = DenoiserParameters(search_window_radius=3)
    mono = denoise_monoscale_cpu(mean, nb, histo, cov, params)
    multi = denoise_multiscale_cpu(mean, nb, histo, cov, params,
                                   nb_of_scales=2)
    image_io.write_multi_channels_exr(
        mono, os.path.join(GOLDEN_DIR, "out_mono_b3.exr"))
    image_io.write_multi_channels_exr(
        multi, os.path.join(GOLDEN_DIR, "out_multi2_b3.exr"))
    print(f"wrote goldens to {GOLDEN_DIR}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
