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

    # 64x56 @ 64 spp: large/smooth enough that a healthy fraction of
    # pixels has a full similar set (n >= d+1 = 28, the MAIN solve path)
    # while edges/fireflies still exercise the fallback — the original
    # 32x28 @ 16 spp fixture had n = 1 EVERYWHERE, so the goldens never
    # touched the Bayesian solve at all
    clean = render_clean(64, 56)
    samples = sample_noisy(clean, spp=64, seed=42)
    return accumulate_samples(samples)


def check_main_path_fraction(histo, nb, threshold=1.0, r=1, b=6):
    """Assert the scene exercises BOTH the main solve path and the
    fallback; returns the main-path fraction."""
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(HERE), "tests"))
    import reference_impl as oracle

    h64 = histo.astype(np.float64)
    n64 = nb.astype(np.float64)
    H, W = histo.shape[:2]
    nbins = histo.shape[-1]
    counts = []
    for y in range(r + 1, H - r - 1, 3):
        for x in range(r + 1, W - r - 1, 3):
            n = 0
            for dy in range(-b, b + 1):
                for dx in range(-b, b + 1):
                    cy, cx = y + dy, x + dx
                    if not (r <= cy < H - r and r <= cx < W - r):
                        continue
                    dist = oracle._histogram_patch_distance(
                        h64, n64, (y, x), (cy, cx), r, nbins)
                    if dist <= threshold:
                        n += 1
            counts.append(n)
    counts = np.asarray(counts)
    frac = float((counts >= 28).mean())
    assert 0.15 <= frac <= 0.98, (
        f"test scene is unrepresentative: main-path fraction {frac:.2f} "
        f"(median similar-set size {np.median(counts)})")
    return frac


def main() -> int:
    from bcd_tpu.io import image_io
    from bcd_tpu.native_ref import denoise_monoscale_cpu, denoise_multiscale_cpu
    from bcd_tpu.params import DenoiserParameters

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    nb, mean, cov, histo = build_scene()
    frac = check_main_path_fraction(
        __import__("numpy").asarray(histo), __import__("numpy").asarray(nb))
    print(f"main-path pixel fraction: {frac:.2f}")

    image_io.write_multi_channels_exr(mean, os.path.join(GOLDEN_DIR, "in_color.exr"))
    image_io.write_multi_channels_exr(
        image_io.merge_histogram_and_nb_of_samples(histo, nb),
        os.path.join(GOLDEN_DIR, "in_hist.exr"))
    image_io.write_multi_channels_exr(cov, os.path.join(GOLDEN_DIR, "in_cov.exr"))

    # the reference DEFAULT window (b=6, 169 candidates): at the
    # chi^2 threshold 1.0 ~half of same-distribution neighbors pass,
    # so b=3's 49 candidates cannot reach n >= 28 even on flat walls
    params = DenoiserParameters(search_window_radius=6)
    mono = denoise_monoscale_cpu(mean, nb, histo, cov, params)
    multi = denoise_multiscale_cpu(mean, nb, histo, cov, params,
                                   nb_of_scales=2)
    image_io.write_multi_channels_exr(
        mono, os.path.join(GOLDEN_DIR, "out_mono_b6.exr"))
    image_io.write_multi_channels_exr(
        multi, os.path.join(GOLDEN_DIR, "out_multi2_b6.exr"))
    print(f"wrote goldens to {GOLDEN_DIR}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
