"""Synthesize a Monte-Carlo-like raw sample dump for tests and benchmarks.

The reference ships (and its README documents) a ``data/raw/test.raw``
worked example that is stripped from the snapshot; this script generates an
equivalent fixture: a noisy render of a procedural scene with
varying-frequency structure, emissive highlights (to exercise histogram
saturation and the spike filter) and per-pixel sample noise whose variance
varies across the image.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_clean(height: int, width: int) -> np.ndarray:
    """Procedural 'ground truth' HDR image, (H, W, 3) float32.

    Mix of content classes a real render has: piecewise-FLAT diffuse
    panels (where neighboring pixels share a sample distribution, so the
    chi^2 similarity test accepts them — the denoiser's MAIN path), a
    smooth lighting gradient, a high-frequency checker band (detail /
    fallback content), and an emissive blob (histogram saturation +
    spike-filter food). An earlier everything-is-gradient version made
    every patch statistically unique and silently pushed the WHOLE image
    down the fallback path."""
    y, x = np.meshgrid(
        np.linspace(0, 1, height), np.linspace(0, 1, width), indexing="ij"
    )
    # 3x2 flat diffuse panels with distinct albedos
    palette = np.array([
        [0.75, 0.25, 0.20], [0.25, 0.55, 0.25], [0.22, 0.30, 0.70],
        [0.65, 0.60, 0.20], [0.55, 0.25, 0.60], [0.60, 0.60, 0.60],
    ], np.float32)
    panel = (np.minimum(np.floor(x * 3), 2)
             + 3 * np.minimum(np.floor(y * 2), 1)).astype(np.int32)
    img = palette[panel]
    # smooth lighting gradient over the panels
    img = img * (0.7 + 0.5 * x + 0.2 * y)[..., None]
    # high-frequency checker band along the bottom quarter
    checker = ((np.floor(x * 24) + np.floor(y * 16)) % 2)[..., None]
    band = (y > 0.75)[..., None]
    img = np.where(band, img * (0.5 + 0.5 * checker), img)
    # emissive blob
    blob = np.exp(-(((x - 0.7) ** 2 + (y - 0.3) ** 2) / 0.004))[..., None]
    img = img + 6.0 * blob
    return img.astype(np.float32)


def sample_noisy(clean: np.ndarray, spp: int, seed: int = 0,
                 firefly_rate: float = 2e-4) -> np.ndarray:
    """Per-pixel samples around the clean image: multiplicative gamma-ish
    noise with spatially varying variance plus rare fireflies.
    Returns (H, W, spp, 3) float32."""
    rng = np.random.default_rng(seed)
    h, w, _ = clean.shape
    # spatially SMOOTH noise level: real renderers' variance varies with
    # scene content, not i.i.d. per pixel — per-pixel-random sigma makes
    # every patch's histogram distribution unique, so the chi^2 test
    # rejects all neighbors and the whole image silently takes the
    # fallback path (caught via the on-TPU gate: golden tests never
    # exercised the solve)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    sigma = (0.3 + 0.25 * np.sin(2 * np.pi * xx) *
             np.cos(2 * np.pi * yy))[..., None, None]
    # zero-mean multiplicative noise (lognormal with E[x] = 1), so the
    # sample mean is an unbiased estimator of the clean image
    noise = rng.lognormal(mean=-0.5, sigma=1.0, size=(h, w, spp, 3)) - 1.0
    samples = clean[:, :, None, :] * (1.0 + sigma * noise * 0.8)
    samples = np.maximum(samples, 0.0)
    fireflies = rng.random((h, w, spp, 1)) < firefly_rate
    samples = np.where(fireflies, samples + 50.0 * rng.random((h, w, spp, 3)),
                       samples)
    return samples.astype(np.float32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("output", help="output .raw path")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--clean-exr", help="also write the clean reference EXR")
    args = ap.parse_args()

    clean = render_clean(args.height, args.width)
    samples = sample_noisy(clean, args.spp, args.seed)

    from bcd_tpu.io import raw

    raw.write_raw(args.output, samples)
    print(f"wrote {args.output}: {args.width}x{args.height}, {args.spp} spp")
    if args.clean_exr:
        from bcd_tpu.io import image_io

        image_io.write_exr(clean, args.clean_exr)
        print(f"wrote {args.clean_exr}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
