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
    """Procedural 'ground truth' HDR image, (H, W, 3) float32."""
    y, x = np.meshgrid(
        np.linspace(0, 1, height), np.linspace(0, 1, width), indexing="ij"
    )
    r = 0.5 + 0.5 * np.sin(8 * np.pi * x) * np.cos(6 * np.pi * y)
    g = 0.4 + 0.4 * np.cos(14 * np.pi * (x + y))
    b = 0.3 + 0.6 * (np.sin(3 * np.pi * x * y) ** 2)
    img = np.stack([r, g, b], axis=-1)
    # checkerboard albedo + a bright emissive blob
    checker = ((np.floor(x * 12) + np.floor(y * 8)) % 2)[..., None]
    img = img * (0.6 + 0.4 * checker)
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
    sigma = 0.2 + 0.6 * rng.random((h, w, 1, 1))
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
