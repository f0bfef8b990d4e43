"""DeepImage-equivalent EXR adapters (reference src/io/ImageIO.cpp).

Image convention throughout bcd_tpu: numpy/jax arrays of shape (H, W, D),
row-major, channel innermost — matching the reference DeepImage layout
(reference DeepImage.hpp:386-396). Covariance channel order is
xx, yy, zz, yz, xz, xy (reference CovarianceMatrix.h:18-28).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from bcd_tpu.io import exr


def load_exr(path: str) -> np.ndarray:
    """Load an RGB EXR as (H, W, 3) float32; collapse to (H, W, 1) when all
    three planes are identical (grayscale auto-detection, reference
    ImageIO.cpp:42-51). Missing G/B channels read as 0 like the reference's
    fill value."""
    channels, info = exr.read_exr(path)
    h, w = info["height"], info["width"]
    zero = np.zeros((h, w), dtype=np.float32)
    r = channels.get("R", zero)
    g = channels.get("G", zero)
    b = channels.get("B", zero)
    if np.array_equal(r, g) and np.array_equal(r, b):
        return r[..., None].copy()
    return np.stack([r, g, b], axis=-1)


def load_multi_channels_exr(path: str) -> np.ndarray:
    """Load a multi-channel stat buffer stored as ``Bin_%04d`` FLOAT channels
    (reference io_exr.cpp readMultiImageEXR: probe Bin_0000, Bin_0001, ...
    until a name is missing). Returns (H, W, D) float32."""
    channels, info = exr.read_exr(path)
    planes = []
    index = 0
    while f"Bin_{index:04d}" in channels:
        planes.append(channels[f"Bin_{index:04d}"])
        index += 1
    if not planes:
        raise exr.ExrError(f"no Bin_%04d channels found in {path}")
    return np.stack(planes, axis=-1)


def write_exr(image: np.ndarray, path: str) -> None:
    """Write an (H, W, 3) or (H, W, 1) image as an RGBA HALF EXR (the
    reference writes color output via OpenEXR's RgbaOutputFile, which stores
    half-precision RGBA; reference io_exr.cpp writeImageEXR). A 1-channel
    image is replicated to RGB (reference ImageIO.cpp:87-118)."""
    image = np.asarray(image)
    if image.ndim == 2:
        image = image[..., None]
    if image.shape[-1] == 1:
        image = np.repeat(image, 3, axis=-1)
    if image.shape[-1] != 3:
        raise ValueError(f"write_exr expects 1 or 3 channels, got {image.shape}")
    h, w, _ = image.shape
    exr.write_exr(
        path,
        {
            "R": image[..., 0],
            "G": image[..., 1],
            "B": image[..., 2],
            "A": np.ones((h, w), dtype=np.float32),
        },
        pixel_types={name: exr.HALF for name in "RGBA"},
    )


def write_multi_channels_exr(image: np.ndarray, path: str) -> None:
    """Write an (H, W, D) buffer as D FLOAT channels named ``Bin_%04d``
    (reference io_exr.cpp writeMultiImageEXR channel-name contract)."""
    image = np.asarray(image, dtype=np.float32)
    if image.ndim != 3:
        raise ValueError(f"expected (H, W, D), got {image.shape}")
    exr.write_exr(
        path,
        {f"Bin_{z:04d}": image[..., z] for z in range(image.shape[-1])},
    )


def separate_nb_of_samples_from_histogram(
    histo_and_count: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """The on-disk histogram EXR stores the sample count as one extra channel
    after the 3*nbOfBins histogram channels (reference Utils.cpp:21-46).
    Returns ``(histogram (H,W,3*bins), nb_of_samples (H,W,1))``."""
    return histo_and_count[..., :-1], histo_and_count[..., -1:]


def merge_histogram_and_nb_of_samples(
    histogram: np.ndarray, nb_of_samples: np.ndarray
) -> np.ndarray:
    """Inverse of :func:`separate_nb_of_samples_from_histogram`
    (reference Utils.cpp:48-77)."""
    if nb_of_samples.ndim == 2:
        nb_of_samples = nb_of_samples[..., None]
    return np.concatenate([histogram, nb_of_samples], axis=-1)
