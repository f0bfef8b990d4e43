"""Firefly (spike) removal prefilter — pure XLA (reference SpikeRemovalFilter).

For every pixel, over a 3x3 neighborhood centered at the *clamped* center
position (so border pixels reuse the nearest fully-interior window, NOT an
edge-replicated window — reference SpikeRemovalFilter.cpp:45-48): compute
per-channel mean/stddev; if any channel of the pixel deviates by more than
``threshold_factor * sigma``, replace its color, sample count, histogram and
covariance with those of the neighborhood's 3D median — the neighbor
minimizing the total L1 distance in RGB over the window, first minimum wins
(reference SpikeRemovalFilter.cpp:94-116). Reads come from copies, so the
filter is order-independent, as in the reference (.cpp:29-32).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _window_stack(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(H, W, C) -> (H, W, K*K, C): the K*K window around each pixel's
    clamped center. Only positions whose window is fully in-bounds are
    built directly; border pixels gather their clamped-center neighbor's
    window."""
    h, w = img.shape[:2]
    k = 2 * radius + 1
    # windows for interior centers, then replicate outward via edge-pad of
    # the *stacked* array — this reproduces clamped-center semantics exactly.
    shifts = []
    for dy in range(k):
        for dx in range(k):
            shifts.append(img[dy : h - 2 * radius + dy, dx : w - 2 * radius + dx])
    stack = jnp.stack(shifts, axis=2)  # (H-2r, W-2r, K*K, C)
    pad = ((radius, radius), (radius, radius), (0, 0), (0, 0))
    return jnp.pad(stack, pad, mode="edge")


@partial(jax.jit, static_argnames=())
def spike_removal(color, nb, histo, cov, threshold_factor):
    """Returns filtered (color, nb, histo, cov). Shapes: (H, W, C) each."""
    color = color.astype(jnp.float32)
    radius = 1
    k = 2 * radius + 1
    n = k * k
    win = _window_stack(color, radius)  # (H, W, 9, 3)

    mean = jnp.mean(win, axis=2)  # (H, W, 3)
    var = jnp.sum((win - mean[:, :, None, :]) ** 2, axis=2) / (n - 1)
    std = jnp.sqrt(var)
    is_spike = jnp.any(
        jnp.abs(color - mean) > threshold_factor * std, axis=-1
    )  # (H, W)

    # 3D median by total L1 distance; first minimum wins (strict '<' scan)
    pair_l1 = jnp.sum(
        jnp.abs(win[:, :, :, None, :] - win[:, :, None, :, :]), axis=(2, 4)
    )  # (H, W, 9): total L1 from each candidate to all others
    median_idx = jnp.argmin(pair_l1, axis=-1)  # first min, like the reference

    # median window slot -> absolute pixel coordinates
    h, w = color.shape[:2]
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    center_r = jnp.clip(rows, radius, h - 1 - radius)
    center_c = jnp.clip(cols, radius, w - 1 - radius)
    med_r = center_r - radius + median_idx // k
    med_c = center_c - radius + median_idx % k

    def replace(img):
        img = img.astype(jnp.float32)
        gathered = img[med_r, med_c]  # (H, W, C)
        return jnp.where(is_spike[..., None], gathered, img)

    return replace(color), replace(nb), replace(histo), replace(cov)
