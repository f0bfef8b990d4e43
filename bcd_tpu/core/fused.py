"""Fully fused tile pipeline: K1 (masks+moments) -> K2 (solve) -> K4
(filter+scatter), all Pallas, with only per-pixel MOMENTS and FILTER
MATRICES ever touching HBM.

This is the round-2 replacement for the engine's candidate-stack path
(monoscale.denoise_tile): that path materializes (2b+1)^2 candidate patch
vectors and filtered fields per pixel (~190 KB/pixel of HBM traffic,
DESIGN.md §8); here the candidates live only in VMEM inside the spatial
kernels (ops/fused_pallas.py) and the per-pixel hot state is
O(d^2) = 2.9 KB/pixel (the 27x27 moment/filter matrices), a ~65x traffic
reduction. The math is identical (reference DenoisingUnit.cpp semantics;
every stage is oracle-tested independently, and the full tile is pinned
against the XLA engine path).

Data flow per (tp x tp) halo-padded tile, tp = tile + 2*(b+r):

  to_flat          (tp,tp,C) -> (ROWS,C) flat sublane slabs
  K1 masks_moments -> per-offset masks (VMEM-correlated chi^2 distances)
                      + raw masked moments M2, msum, nov, n per pixel
  lane marshal      core pixels only: (t*t, d*d) -> (d, d, P) lane batch
  K2 solve_matrices -> per-pixel A2^T, b2 (Jacobi clamp + Cholesky solves)
  embed + to_flat   filter maps back onto the flat grid (zeros off-core)
  K4 apply_scatter  -> overlap-add contribution (out color sums, counts)
  from_flat         -> (tp, tp, 4) apron-inclusive tile contribution
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bcd_tpu.core.monoscale import _stride_center_mask
from bcd_tpu.ops.fused_pallas import (
    flat_geometry, from_flat, masks_moments, apply_scatter, to_flat,
    tri_geometry)
from bcd_tpu.ops.solve_filter_pallas import LANES, solve_matrices


def denoise_tile_fused(cfg, color_pad, nb_pad, histo_pad, pixcov_pad,
                       gy, gx, ly, lx, core_h, core_w, height, width,
                       threshold, min_eigen, interpret: bool = False,
                       sweeps: int = 6):
    """Denoise one tile with the fused kernels. Same contract as
    monoscale.denoise_tile: inputs are (T+2h, T+2h, C) slabs, returns
    (out_sum (T+2h, T+2h, 3), count (T+2h, T+2h)) apron-inclusive
    contributions for global overlap-add."""
    t, r, b = cfg.tile, cfg.patch_radius, cfg.search_radius
    h = cfg.halo
    tp = t + 2 * h
    npx, d = cfg.npx, cfg.d
    tps, _, _ = flat_geometry(tp, b, r)

    # --- validity maps in GLOBAL coordinates (padded coord i <-> global
    # gy + i - h), exactly as monoscale._distance_masks evaluates them ----
    rows_g = gy - h + jnp.arange(tp)[:, None]
    cols_g = gx - h + jnp.arange(tp)[None, :]
    interior = (
        (rows_g >= r) & (rows_g <= height - 1 - r)
        & (cols_g >= r) & (cols_g <= width - 1 - r)
    )
    iy = jnp.arange(tp)[:, None]
    ix = jnp.arange(tp)[None, :]
    in_core = (iy >= h) & (iy < h + t) & (ix >= h) & (ix < h + t)
    owned = ((ly + iy - h) < core_h) & ((lx + ix - h) < core_w)
    center_valid = interior & in_core & owned
    stride = _stride_center_mask(cfg, rows_g, cols_g, height, width)
    if stride is not None:
        center_valid = center_valid & stride
    valid = jnp.stack(
        [center_valid, interior], axis=-1).astype(jnp.float32)

    # --- K1: masks + raw masked moments -----------------------------------
    color_f = to_flat(color_pad, b, r)
    masks, m2, misc = masks_moments(
        to_flat(histo_pad, b, r),
        to_flat(nb_pad, b, r, fill=1.0),
        color_f,
        to_flat(pixcov_pad, b, r),
        to_flat(valid, b, r),
        threshold, tp=tp, r=r, b=b, interpret=interpret,
    )

    # --- lane marshaling: core pixels only --------------------------------
    p_raw = t * t
    p_pad = -(-p_raw // LANES) * LANES
    pad_px = p_pad - p_raw

    core2d = lambda a: a.reshape(tp, tps, a.shape[-1])[  # noqa: E731
        h : h + t, h : h + t]
    _, tri_expand, dtri = tri_geometry(d)
    m2_c = core2d(m2).reshape(p_raw, dtri)
    misc_c = core2d(misc)
    msum_c = misc_c[..., 0:d].reshape(p_raw, d)
    nov_c = misc_c[..., d : d + 6 * npx].reshape(p_raw, 6 * npx)
    n_c = misc_c[..., d + 6 * npx].reshape(p_raw)

    lanes = lambda a: jnp.moveaxis(  # noqa: E731
        jnp.pad(a, ((0, pad_px), (0, 0))), 0, -1)
    # expand the triangle-packed moments AFTER the lane transpose (the
    # transpose moves half the data; the row gather is a cheap major-axis
    # copy)
    m2_t = lanes(m2_c)[jnp.asarray(tri_expand)].reshape(d, d, p_pad)
    msum_t = lanes(msum_c)
    nov_t = lanes(nov_c)
    n_t = jnp.pad(n_c, ((0, pad_px),), constant_values=1.0)[None]

    # --- K2: per-pixel filter matrices ------------------------------------
    a2t_l, b2_l = solve_matrices(
        m2_t, msum_t, nov_t, n_t, min_eigen, npx=npx, sweeps=sweeps,
        interpret=interpret,
    )
    a2t_px = jnp.moveaxis(
        a2t_l.reshape(d * d, p_pad)[:, :p_raw], -1, 0).reshape(t, t, d * d)
    b2_px = jnp.moveaxis(b2_l[0][:, :p_raw], -1, 0).reshape(t, t, d)

    # --- gates + fallback maps (DenoisingUnit.cpp:182-191, 455-481) -------
    cv_core = center_valid[h : h + t, h : h + t]
    n_map = n_c.reshape(t, t)
    is_main = (n_map >= d + 1) & cv_core
    is_fb = cv_core & ~is_main
    gate = is_main.astype(jnp.float32)[..., None]
    m_map = msum_c.reshape(t, t, d) / jnp.maximum(n_map, 1.0)[..., None]
    fbm = jnp.concatenate(
        [is_fb[..., None] * m_map, is_fb[..., None].astype(jnp.float32)],
        axis=-1)

    embed = lambda a: jnp.pad(  # noqa: E731
        a, ((h, tp - h - t), (h, tp - h - t), (0, 0)))

    # --- K4: filter application + patch aggregation -----------------------
    out_f = apply_scatter(
        masks,
        to_flat(embed(a2t_px), b, r),
        to_flat(embed(b2_px), b, r),
        to_flat(embed(gate), b, r),
        to_flat(embed(fbm), b, r),
        color_f,
        tp=tp, r=r, b=b, interpret=interpret,
    )
    out = from_flat(out_f, tp, b, r)  # (tp, tp, 4)
    return out[..., 0:3], out[..., 3]
