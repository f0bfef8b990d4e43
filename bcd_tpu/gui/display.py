"""Display mapping for the viewer: exposure/gamma tonemapping for color
images and cubehelix colormapping for scalar images (the reference GUI
renders these in GLSL shaders — GuiWindow.h:238-255; cov-trace display is
sqrt(xx+yy+zz), GuiWindow.cpp:297-312)."""

from __future__ import annotations

import numpy as np


def tonemap_color(img: np.ndarray, exposure: float = 0.0,
                  gamma: float = 2.2) -> np.ndarray:
    """(H, W, 3) HDR float -> (H, W, 3) uint8 with 2^exposure scaling and
    gamma companding."""
    v = np.maximum(np.asarray(img, np.float32), 0.0) * (2.0 ** exposure)
    v = np.clip(v, 0.0, 1.0) ** (1.0 / max(gamma, 1e-3))
    return (v * 255.0 + 0.5).astype(np.uint8)


def cov_trace(cov: np.ndarray) -> np.ndarray:
    """sqrt(xx + yy + zz) of a (H, W, 6) covariance image."""
    return np.sqrt(np.maximum(cov[..., 0] + cov[..., 1] + cov[..., 2], 0.0))


def cubehelix(scalar: np.ndarray, exposure: float = 0.0,
              gamma: float = 1.0) -> np.ndarray:
    """Green's cubehelix colormap of a scalar image -> (H, W, 3) uint8.
    Standard parameters (start 0.5, rotations -1.5, hue 1.2)."""
    v = np.maximum(np.asarray(scalar, np.float32), 0.0) * (2.0 ** exposure)
    v = np.clip(v, 0.0, 1.0) ** (1.0 / max(gamma, 1e-3))
    start, rots, hue = 0.5, -1.5, 1.2
    angle = 2.0 * np.pi * (start / 3.0 + rots * v)
    amp = hue * v * (1.0 - v) / 2.0
    c, s = np.cos(angle), np.sin(angle)
    r = v + amp * (-0.14861 * c + 1.78277 * s)
    g = v + amp * (-0.29227 * c - 0.90649 * s)
    b = v + amp * (1.97294 * c)
    rgb = np.stack([r, g, b], axis=-1)
    return (np.clip(rgb, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
