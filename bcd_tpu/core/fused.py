"""Fully fused tile pipeline: K1 (masks+moments) -> K2 (solve) -> K4
(filter+scatter), all Pallas, with only per-pixel MOMENTS and FILTER
MATRICES ever touching HBM.

Round-2 replaced the engine's candidate-stack path (~190 KB/pixel of HBM
traffic) with VMEM-resident spatial kernels (2.9 KB/pixel). Round 3
removed the XLA marshaling BETWEEN the kernels (measured ~4 ms/tile at
tile=48 — to_flat x5, the K1->K2 lane transpose + triangle expansion,
and the K2->K4 un-transpose + embed + re-flatten): with the halo padded
to a multiple of 8 (ops/fused_pallas.pm_halo) the (tp, tp, C) tile slab
reshaped row-major IS the flat layout, K1 emits compact core-pixel-major
moment rows, K2 transposes them on the MXU in-kernel (bit-exact
identity/expansion dots) and emits the filter back in pixel-major rows,
and K4 re-expands those onto the flat grid inside its own init step.
The XLA glue that remains is this file: validity maps and two reshapes.

The math is identical (reference DenoisingUnit.cpp semantics; every
stage is oracle-tested independently, and the full tile is pinned
against the XLA engine path).

Data flow per (tp x tp) halo-padded tile, tp = tile + 2*pm_halo:

  reshape            (tp,tp,C) -> (tp*tp,C) flat slabs (free)
  K1 masks_moments2  -> per-offset masks (VMEM-correlated chi^2
                       distances) + compact pixel-major raw moments
  K2 solve_matrices_pm -> pixel-major A2^T rows + packed [b2, gate,
                       fb*mean, fb] (Jacobi clamp + Cholesky solves;
                       MXU lane transposes in/out)
  K4 apply_scatter2  -> overlap-add contribution (out color sums, counts)
  reshape            -> (tp, tp, 4) apron-inclusive tile contribution
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bcd_tpu.core.monoscale import _stride_center_mask
from bcd_tpu.ops.fused_pallas import (
    apply_scatter2, masks_moments2, pm_halo)
from bcd_tpu.ops.solve_filter_pallas import solve_matrices_pm


def denoise_tile_fused(cfg, color_pad, nb_pad, histo_pad, pixcov_pad,
                       gy, gx, ly, lx, core_h, core_w, height, width,
                       threshold, min_eigen, interpret: bool = False,
                       sweeps: int = 6, collect_stats: bool = False):
    """Denoise one tile with the fused kernels. Same contract as
    monoscale.denoise_tile: inputs are (T+2h, T+2h, C) slabs, returns
    (out_sum (T+2h, T+2h, 3), count (T+2h, T+2h)) apron-inclusive
    contributions for global overlap-add."""
    t, r, b = cfg.tile, cfg.patch_radius, cfg.search_radius
    h = cfg.halo
    assert h == pm_halo(r, b), (h, r, b)
    tp = t + 2 * h

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

    flat = lambda a: a.reshape(tp * tp, a.shape[-1])  # noqa: E731

    # --- K1: masks + raw masked moments (compact pixel-major) -------------
    color_f = flat(color_pad)
    masks, m2, misc = masks_moments2(
        flat(histo_pad), flat(nb_pad), color_f, flat(pixcov_pad),
        flat(valid), threshold, t=t, r=r, b=b, interpret=interpret,
    )

    # --- K2: per-pixel filter matrices + gates, pixel-major ---------------
    a2t_pm, small_pm = solve_matrices_pm(
        m2, misc, min_eigen, npx=cfg.npx, sweeps=sweeps,
        interpret=interpret,
    )

    # --- K4: filter application + patch aggregation -----------------------
    out = apply_scatter2(
        masks, a2t_pm, small_pm, color_f,
        t=t, r=r, b=b, interpret=interpret,
    ).reshape(tp, tp, 4)
    if collect_stats:
        # K2's packed small rows carry the per-pixel gates (main-path gate
        # at column d, fallback flag at column 2d+1 — both 0 on padded and
        # invalid rows), so the DenoisingStatistics counters are free sums
        d = 3 * cfg.npx
        tile_counts = jnp.stack([
            jnp.sum(small_pm[:, d]), jnp.sum(small_pm[:, 2 * d + 1])])
        return out[..., 0:3], out[..., 3], tile_counts
    return out[..., 0:3], out[..., 3]
