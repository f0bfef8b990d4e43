"""Pyramid resampling ops — pure XLA (reference MultiscaleDenoiser.cpp).

- ``downscale_sum``/``downscale_average``: 2x2 block reductions
  (reference :243-295); odd trailing row/column dropped (floor sizes).
- ``downscale_sample_covariance_sum``: weighted 2x2 sum with
  w_i = (1/16) * sum(N) / N_i (reference :297-334).
- ``interpolate``: fixed 9/16-3/16-1/16 "magic kernel" 2x upsample with
  edge clamping (reference :473-512); handles odd target sizes.
- ``merge_outputs``: merged = H - interpolate(downscale(H)) + interpolate(L)
  (reference :453-466, 541-548).
"""

from __future__ import annotations

import jax.numpy as jnp


def _quads(img: jnp.ndarray):
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    v = img[: 2 * h2, : 2 * w2]
    return v[0::2, 0::2], v[1::2, 0::2], v[0::2, 1::2], v[1::2, 1::2]


def downscale_sum(img: jnp.ndarray) -> jnp.ndarray:
    a, b, c, d = _quads(img)
    return a + b + c + d


def downscale_average(img: jnp.ndarray) -> jnp.ndarray:
    return 0.25 * downscale_sum(img)


def downscale_sample_covariance_sum(cov: jnp.ndarray, nb: jnp.ndarray):
    """cov: (H, W, 6); nb: (H, W, 1) or (H, W)."""
    if nb.ndim == 3:
        nb = nb[..., 0]
    cov_quads = _quads(cov)
    nb_quads = _quads(nb)
    nsum = sum(nb_quads)
    out = jnp.zeros_like(cov_quads[0])
    for ci, ni in zip(cov_quads, nb_quads):
        out = out + (nsum / (16.0 * ni))[..., None] * ci
    return out


def interpolate(img: jnp.ndarray, up_h: int, up_w: int) -> jnp.ndarray:
    """2x magic-kernel upsample of (H, W, C) to (up_h, up_w, C), where
    H == up_h // 2 and W == up_w // 2."""
    h, w = img.shape[:2]
    assert h == up_h // 2 and w == up_w // 2, (img.shape, up_h, up_w)

    ul = jnp.arange(up_h)
    uc = jnp.arange(up_w)
    line = jnp.minimum(ul // 2, h - 1)
    col = jnp.minimum(uc // 2, w - 1)
    adj_line = jnp.clip(ul // 2 + ((ul % 2) * 2 - 1), 0, h - 1)
    adj_col = jnp.clip(uc // 2 + ((uc % 2) * 2 - 1), 0, w - 1)

    main = img[line[:, None], col[None, :]]
    right = img[line[:, None], adj_col[None, :]]
    down = img[adj_line[:, None], col[None, :]]
    diag = img[adj_line[:, None], adj_col[None, :]]
    return (9.0 / 16.0) * main + (3.0 / 16.0) * (right + down) + (1.0 / 16.0) * diag


def merge_outputs(high: jnp.ndarray, low: jnp.ndarray) -> jnp.ndarray:
    """Replace the low-frequency band of ``high`` with the (denoised)
    coarser-scale image ``low``."""
    up_h, up_w = high.shape[:2]
    low_pass = interpolate(downscale_average(high), up_h, up_w)
    return high - low_pass + interpolate(low, up_h, up_w)
