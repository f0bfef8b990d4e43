"""Numpy pyramid ops for the native CPU path (same math as
bcd_tpu.ops.resample, float32; reference MultiscaleDenoiser.cpp)."""

from __future__ import annotations

import numpy as np


def _quads(img):
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    v = img[: 2 * h2, : 2 * w2]
    return v[0::2, 0::2], v[1::2, 0::2], v[0::2, 1::2], v[1::2, 1::2]


def downscale_sum(img):
    a, b, c, d = _quads(np.asarray(img, np.float32))
    return a + b + c + d


def downscale_average(img):
    return 0.25 * downscale_sum(img)


def downscale_cov_sum(cov, nb):
    cov = np.asarray(cov, np.float32)
    nb2 = np.asarray(nb, np.float32)
    if nb2.ndim == 3:
        nb2 = nb2[..., 0]
    cq = _quads(cov)
    nq = _quads(nb2)
    nsum = sum(nq)
    out = np.zeros_like(cq[0])
    for ci, ni in zip(cq, nq):
        out += (nsum / (16.0 * ni))[..., None] * ci
    return out


def interpolate(img, up_h, up_w):
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    ul = np.arange(up_h)
    uc = np.arange(up_w)
    line = np.minimum(ul // 2, h - 1)
    col = np.minimum(uc // 2, w - 1)
    adj_line = np.clip(ul // 2 + ((ul % 2) * 2 - 1), 0, h - 1)
    adj_col = np.clip(uc // 2 + ((uc % 2) * 2 - 1), 0, w - 1)
    main = img[line[:, None], col[None, :]]
    right = img[line[:, None], adj_col[None, :]]
    down = img[adj_line[:, None], col[None, :]]
    diag = img[adj_line[:, None], adj_col[None, :]]
    return (
        np.float32(9 / 16) * main
        + np.float32(3 / 16) * (right + down)
        + np.float32(1 / 16) * diag
    )


def merge_outputs(high, low):
    high = np.asarray(high, np.float32)
    up_h, up_w = high.shape[:2]
    low_pass = interpolate(downscale_average(high), up_h, up_w)
    return high - low_pass + interpolate(low, up_h, up_w)
