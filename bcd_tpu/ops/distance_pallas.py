"""Pallas TPU kernel for the chi^2 histogram patch-distance maps.

Computes, for one halo-padded tile, the per-offset similar-patch masks that
``bcd_tpu.core.monoscale._distance_masks`` produces in XLA (reference
semantics: DenoisingUnit.cpp histogramPatchDistance — chi^2 terms per bin
with the b1+b2 <= 1 gate, patch distance = summed numerator over the total
count of non-gated bins in the (2r+1)^2 patch footprint).

Layout: the tile's spatial plane is FLATTENED onto the lane axis — arrays
are (channels, tp*tp) — so a spatial shift by (dy, dx) is one flat lane
shift by dy*tp + dx. No wrap correction is needed: for center pixels
x = (y, c) with c in [h-r, h+t+r) and |dx| <= b the shifted column index
c+dx stays inside [0, tp), so flat indexing never crosses a row boundary
for any element that is kept. Offsets are visited by a fori_loop whose
shift comes from an SMEM table; everything stays in VMEM.

Status: EXPERIMENTAL, not wired into the engine. The math is validated
against the float64 oracle in interpret mode (tests/test_distance_pallas.py)
but Mosaic rejects the flat-on-lanes layout on hardware: dynamic lane-axis
slices must be 128-aligned ("cannot statically prove that index in
dimension 1 is a multiple of 128"). Round-2 fix: put the flat spatial axis
on SUBLANES (arrays (L, nbins)) where dynamic offsets are unrestricted, or
pre-materialize the 15 dx-shifted stacks with static slices and index only
dy dynamically. Kept because the no-wrap flat-shift analysis and the
oracle-checked chi^2/box-sum formulation carry over unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


OFFS_PER_STEP = 8  # output block sublane granularity


def _distance_kernel(shift_ref, histo_ref, nb_ref, thr_ref, dist_ref,
                     *, n_offsets, tp, t, r, nbins, l_pad):
    """Grid: (n_offsets // 8,). Per step, 8 offsets' patch-distance maps.

    histo_ref: (nbins, L) flat histograms, L = tp*tp padded to lanes
    nb_ref:    (1, L) flat sample counts
    shift_ref: (n_offsets, 1) SMEM flat shifts (dy*tp + dx)
    dist_ref:  (8, t*t) these offsets' patch distances at the core pixels
    """
    g = pl.program_id(0)
    L = tp * tp
    h = (tp - t) // 2

    hist_c = histo_ref[:, l_pad : l_pad + L]  # (nbins, L)
    nb_c = nb_ref[:, l_pad : l_pad + L]  # (1, L)

    for i in range(OFFS_PER_STEP):
        shift = shift_ref[g * OFFS_PER_STEP + i, 0]
        hist_n = histo_ref[:, pl.ds(l_pad + shift, L)]
        nb_n = nb_ref[:, pl.ds(l_pad + shift, L)]

        hsum = hist_c + hist_n
        keep = (hsum > 1.0).astype(jnp.float32)
        diff = nb_n * hist_c - nb_c * hist_n
        denom = nb_c * nb_n * hsum
        denom = jnp.where(denom == 0.0, 1.0, denom)
        num_px = jnp.sum(keep * diff * diff / denom, axis=0, keepdims=True)
        cnt_px = jnp.sum(keep, axis=0, keepdims=True)  # (1, L)

        # (2r+1)^2 box sum over the patch footprint via flat shifts; the
        # no-wrap argument holds (|q| <= r on top of |o| <= b fits the halo)
        num_box = jnp.zeros_like(num_px)
        cnt_box = jnp.zeros_like(cnt_px)
        both = jnp.concatenate([num_px, cnt_px], axis=0)  # (2, L)
        padded = jnp.pad(both, ((0, 0), (l_pad, l_pad)))
        for qy in range(-r, r + 1):
            for qx in range(-r, r + 1):
                q = qy * tp + qx
                sl = padded[:, l_pad + q : l_pad + q + L]
                num_box = num_box + sl[:1]
                cnt_box = cnt_box + sl[1:]

        dist = jnp.where(cnt_box > 0.0, num_box / jnp.maximum(cnt_box, 1.0),
                         jnp.inf)  # (1, L)
        # keep only the core pixels (flat layout is row-contiguous, so the
        # core is a 2-D slice after a free reshape)
        core = jax.lax.slice(dist.reshape(tp, tp), (h, h), (h + t, h + t))
        dist_ref[i : i + 1, :] = core.reshape(1, t * t)


@functools.partial(jax.jit, static_argnames=("tp", "t", "r", "interpret"))
def distance_maps(histo_flat, nb_flat, shifts, threshold,
                  tp: int, t: int, r: int, interpret: bool = False):
    """Per-offset patch-distance maps for one tile.

    histo_flat: (nbins, l_pad + tp*tp + l_pad) zero-padded flat histograms
    nb_flat:    (1, same) flat sample counts (pad value 1.0)
    shifts:     (n_offsets, 1) int32 flat shifts dy*tp+dx
    Returns (n_offsets, t*t) float32 distances at the core pixels.
    """
    nbins = histo_flat.shape[0]
    n_offsets = shifts.shape[0]
    total = histo_flat.shape[1]
    l_pad = (total - tp * tp) // 2

    # pad the offset list to a multiple of the per-step group (dummy shift 0
    # rows are computed and discarded by the caller)
    n_pad = -(-n_offsets // OFFS_PER_STEP) * OFFS_PER_STEP
    if n_pad != n_offsets:
        shifts = jnp.concatenate(
            [shifts, jnp.zeros((n_pad - n_offsets, 1), jnp.int32)])

    kernel = functools.partial(
        _distance_kernel, n_offsets=n_pad, tp=tp, t=t, r=r,
        nbins=nbins, l_pad=l_pad)

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // OFFS_PER_STEP,),
        in_specs=[
            pl.BlockSpec((n_pad, 1), lambda o: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nbins, total), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, total), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda o: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((OFFS_PER_STEP, t * t), lambda o: (o, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, t * t), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(shifts, histo_flat, nb_flat,
      jnp.asarray(threshold, jnp.float32).reshape(1, 1))
    return out[:n_offsets]
