"""Fused spatial Pallas TPU kernels for the denoiser hot path.

Round-2 step change (DESIGN.md §8): the XLA engine materializes per-tile
candidate tensors (~190 KB/pixel of HBM traffic); these kernels keep the
whole distance -> moments -> filter -> scatter chain VMEM-resident.

Layout (the round-3 "pm" contract): the halo is padded to a multiple of
8 (``pm_halo``), so the tile side tp = tile + 2*halo is a multiple of 8
and the (tp, tp, C) slab's row-major reshape IS the flat kernel layout —
arrays are (tp*tp, C) with flat index z = y*tp + x, NO row padding. A
spatial shift by (dy, dx) then decomposes into a PROVABLY 8-ALIGNED
dynamic part (dy*tp, constructed as 8*q so Mosaic's alignment check
passes — large dynamic sublane loads require it; this is what sank the
round-1 lane-flat kernel) plus a small STATIC part dx handled as a
sub-slice of the loaded value. The offset loop is grid-over-dy with an
unrolled static dx loop; the strict halo margin (pm_halo > b + r) keeps
every window in bounds without sentinel rows.

No wrap correction is needed: contributions that cross a row boundary
under flat shifting come from non-core or non-interior positions whose
masks are identically zero (the halo is at least b + r + 1 wide).

The kernels hand data to each other in COMPACT CORE-PIXEL-MAJOR rows
(tile^2, C): K1 repacks its core band on emit, K2 consumes/emits pixel
rows directly (MXU in-kernel transposes), K4 re-expands onto its padded
flat scratch. No XLA marshaling runs between them (round-2 VERDICT
item 1a: that marshal cost ~4 ms of a ~10 ms tile).

Two kernels:

- ``masks_moments2`` (K1): per (dy, dx) window offset: the chi^2
  histogram patch-distance map (reference semantics
  DenoisingUnit.cpp:336-386 — the b1+b2 <= 1 bin gate, patch distance =
  summed numerator / count of non-gated bins), the similar-patch mask,
  and mask-weighted accumulation of everything the per-pixel solve
  needs:
      M2[p]    += mask * G[p + o]          (G = patch outer products)
      msum[p]  += mask * Pc[p + o]         (Pc = color patch vectors)
      nov[p]   += mask * Pcov[p + o]       (patch pixel-cov vectors)
      n[p]     += mask
  The masked second moment is a spatial CORRELATION of the mask maps
  with the patch-outer-product field — computing it as shifted
  lane-wide FMAs is the TPU-native replacement for gathering 169
  candidate vectors per pixel (the reference gathers per-thread,
  DenoisingUnit.cpp:483-536).

- ``apply_scatter2`` (K4): the per-pixel filter
  field_p,o = A2[p] c_{p+o} + b2[p] aggregated at candidate centers
  (DenoisingUnit.cpp:672-693) is, summed over p, a correlation of the
  gated masks with the per-pixel filter matrices:
      WA[z]  = sum_o mask[z-o, o] * gate[z-o] * A2[z-o]
      wb[z]  = sum_o mask[z-o, o] * gate[z-o] * b2[z-o]
      cnt[z] = sum_o mask[z-o, o] * gate[z-o]
  followed by F[z] = WA[z] c-patch[z] + wb[z] (+ fallback mean patches)
  and the static patch shifts that turn candidate-center fields into
  the per-pixel output sum / estimate count.

The per-pixel solve between them (Jacobi clamp + Cholesky inversions)
stays in the lane-batched kernel ``ops/solve_filter_pallas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _align8(n: int) -> int:
    return -(-n // 8) * 8


@functools.lru_cache(maxsize=None)
def tri_geometry(d: int):
    """Upper-triangle channel packing of a symmetric (d, d) matrix.

    The masked second moment M2 is symmetric, so K1 accumulates only the
    d(d+1)/2 unique entries (729 -> 378 channels for d=27 — half the FMA
    work and half the VMEM accumulator traffic). Returns
    (bases, expand_idx, dtri): channel of (k, j<=k... ) is
    bases[k] + (j - k) for k <= j, and ``expand_idx`` (d*d,) row-gathers
    the packed triangle back to the full row-major matrix."""
    bases = np.zeros(d, np.int32)
    acc = 0
    for k in range(d):
        bases[k] = acc
        acc += d - k
    idx = np.empty((d, d), np.int32)
    for k in range(d):
        for j in range(d):
            a, b = (k, j) if k <= j else (j, k)
            idx[k, j] = bases[a] + (b - a)
    return bases, idx.reshape(-1), acc


# perf-bisection toggles (dev only; see scripts/bisect_fused.py)
import os as _os

_SKIP = set(_os.environ.get("BCD_FUSED_SKIP", "").split(","))

# dx terms fused into ONE accumulator update expression in K1/K4 (measured
# widest that compiles without vreg spill at tile=48; 13 spills)
_DX_CHUNK = 7


def _split3_bf16(src_s, d1_s, d2_s, d3_s, nrows, ch=512):
    """Chunked 3-term bf16 split: src = d1 + d2 + d3 exactly (fp32's 24
    mantissa bits = 3 x bf16's 8). Chunking bounds the kernel's value
    temporaries (~3 x ch x CH-lane fp32 live at a time) — a whole-array
    split materializes 2 full fp32 temps and blows the scoped-VMEM
    stack. Chunks must be 8-row aligned."""
    assert ch % 8 == 0 and nrows % 8 == 0, (nrows, ch)
    f32 = jnp.float32
    for b0 in range(0, nrows, ch):
        e = min(b0 + ch, nrows)
        gs = src_s[b0:e]
        g1 = gs.astype(jnp.bfloat16)
        r1 = gs - g1.astype(f32)
        g2 = r1.astype(jnp.bfloat16)
        d1_s[b0:e] = g1
        d2_s[b0:e] = g2
        d3_s[b0:e] = (r1 - g2.astype(f32)).astype(jnp.bfloat16)


def _patch_offsets(r: int, tps: int):
    return [(qy * tps + qx)
            for qy in range(-r, r + 1) for qx in range(-r, r + 1)]


def _pack_cols(cols):
    """Pack a list of (npix, 1) values into (npix, len(cols)) lanes.

    jnp.concatenate is unusable here: the values inherit mismatched
    sublane phases from misaligned static slices and Mosaic's concat
    lowering rejects offset mismatches on the non-concat dimension;
    where-against-iota forces supported relayouts instead."""
    npix = cols[0].shape[0]
    ci = jax.lax.broadcasted_iota(jnp.int32, (npix, len(cols)), 1)
    out = jnp.zeros((npix, len(cols)), cols[0].dtype)
    for i, c in enumerate(cols):
        out = jnp.where(ci == i, c, out)
    return out


# ---------------------------------------------------------------------------
# v2 ("pm") pipeline: marshal-free kernel contracts.
#
# Round-3 redesign (VERDICT r2 item 1a): with the halo padded to a multiple
# of 8 the tile side tp = tile + 2*halo is itself a multiple of 8, so the
# flat layout needs NO padding at all — a (tp, tp, C) slab reshaped to
# (tp*tp, C) IS the flat slab (row stride tp, zero copies), every dynamic
# dy window offset is provably 8-aligned, and the core rows start 8-aligned
# too. K1 therefore emits its moments REPACKED to compact core-pixel-major
# rows (tile^2, C) which K2 consumes directly (transposing on the MXU
# in-kernel) and K4 re-expands into its flat scratch — the three XLA
# marshal stages between the kernels (measured ~4 ms/tile at tile=48:
# to_flat x5 1.3 + K1->K2 1.3 + K2->K4 1.6) are gone entirely.
# ---------------------------------------------------------------------------


def pm_halo(r: int, b: int) -> int:
    """Fused-pipeline halo: smallest multiple of 8 STRICTLY greater than
    b + r (the strict margin keeps the -8 row of every aligned dynamic
    window in bounds)."""
    return _align8(b + r + 1)


def pm_geometry(t: int, r: int, b: int):
    """Row geometry of the pm layout. Returns (h, tp, cb0, ncore, ch0,
    nchi): halo, padded tile side (= row stride), core-band start row and
    length, chi-band start row and length. Flat index z = y*tp + x.

    The chi band extends b rows BELOW the core (rows [h-r, h+t+b+r)): the
    chi^2-mirror optimisation derives the distance maps of positive-dy
    grid steps from the stored maps of negative-dy steps via
    dist_o[z] = dist_{-o}[z + o], whose reads reach dy*tp + dx below the
    core. The strict pm halo (h > b + r) keeps the extended band inside
    the slab: h + t + b + r <= tp - 1."""
    assert t % 16 == 0, f"fused tile must be a multiple of 16, got {t}"
    h = pm_halo(r, b)
    tp = t + 2 * h
    return h, tp, h * tp, t * tp, (h - r) * tp, (t + b + 2 * r) * tp


def _aligned_win(ref, base8, nrows):
    """Load rows [base8*8, base8*8 + nrows + 16): an 8-aligned dynamic
    window; callers sub-slice [8+shift : 8+shift+nrows] for |shift| <= 8."""
    return ref[pl.ds(8 * base8, nrows + 16), :]


# combined K1 source/accumulator channel map (one MXU dot per row block
# accumulates ALL masked moments): [0:dtri] G (triangle-packed patch outer
# products), [dtri:dtri+d] Pc, [dtri+d:dtri+d+6*npx] Pcov, [dtri+d+6*npx]
# ones (-> n). 460 live channels for d=27, padded to 512 lanes.
K1_SRC_CH = 512


def _masks_moments2_kernel(thr_ref, histo_ref, nb_ref, color_ref,
                           pixcov_ref, valid_ref, band_ref,
                           mask_ref, m2_ref, misc_ref,
                           gsrc_s, g1_s, g2_s, g3_s, acc_s, dist_s,
                           m13_s,
                           *, t, r, b):
    h, tp, cb0, ncore, ch0, nchi = pm_geometry(t, r, b)
    npix = tp * tp
    d = 3 * (2 * r + 1) ** 2
    npatch = (2 * r + 1) ** 2
    tri_base, _, dtri = tri_geometry(d)
    f32 = jnp.float32
    o = pl.program_id(0)
    dy = o - b
    qs = r * tp + r  # static patch-build reach
    nd = 2 * b + 1
    blk = band_ref.shape[1]

    @pl.when(o == 0)
    def _build():
        # combined MXU source rows [G | Pc | Pcov | 1] (K1_SRC_CH map).
        # Patch stacks: Pc[z, 3*qi+c] = color[z + q_qi, c] (the reference's
        # patch vector layout, DenoisingUnit.cpp:483-498); valid on
        # [qs, npix-qs) which covers every row the correlations read.
        # The ones column is safe on every row: the band weights (masks)
        # are zero outside the core.
        ci = jax.lax.broadcasted_iota(jnp.int32, (npix, K1_SRC_CH), 1)
        gsrc_s[:] = jnp.where(ci == dtri + d + 6 * npatch, 1.0, 0.0)
        if "gbuild" not in _SKIP:
            # Pc is built straight into its gsrc_s channel slot
            # [dtri, dtri+d) — a separate aligned staging buffer would
            # cost 2 MB of scoped VMEM the bf16 split planes need
            for qi, q in enumerate(_patch_offsets(r, tp)):
                gsrc_s[qs : npix - qs,
                       dtri + 3 * qi : dtri + 3 * qi + 3] = (
                    color_ref[qs + q : npix - qs + q, :])
                gsrc_s[qs : npix - qs,
                       dtri + d + 6 * qi : dtri + d + 6 * qi + 6] = (
                    pixcov_ref[qs + q : npix - qs + q, :])
            # patch outer products, upper triangle only (M2 is symmetric):
            # G[z, tri(k, j)] = Pc[z,k] * Pc[z,j], j >= k
            pc_all = gsrc_s[:, dtri : dtri + d]
            for k in range(d):
                tb = int(tri_base[k])
                gsrc_s[:, tb : tb + d - k] = (
                    pc_all[:, k : k + 1] * pc_all[:, k:])
        # 3-term bf16 split of the source rows: v = g1 + g2 + g3 exactly
        # (fp32's 24 mantissa bits = 3 x bf16's 8). The banded dots below
        # then run as THREE single-pass bf16 MXU dots instead of one
        # 6-pass HIGHEST dot — exact for the same reason HIGHEST was
        # (bmat entries are exactly 0/1 in bf16; each product 1.0 * g_i
        # is exact in fp32; fp32 accumulation as before) at half the MXU
        # passes.
        _split3_bf16(gsrc_s, g1_s, g2_s, g3_s, npix)
        acc_s[:] = jnp.zeros((ncore, K1_SRC_CH), f32)

    thr = thr_ref[0, 0]

    # core-band window for validity (8-aligned dynamic base)
    q8m = (cb0 - 8) // 8 + dy * (tp // 8)
    valid_w = _aligned_win(valid_ref, q8m, ncore)
    center_valid = valid_ref[cb0 : cb0 + ncore, 0:1]

    next_rows = (t + b) * tp  # dist band rows [h, h+t+b), see pm_geometry
    rows_pad = _align8(next_rows + 24)  # slot stride incl. window guard

    if "masks" in _SKIP:  # machinery bisect: constant masks, no distances
        mask13 = jnp.broadcast_to(center_valid, (ncore, nd))
    else:
        # --- chi^2 MIRROR: dist is symmetric, dist_o[z] = dist_{-o}[z+o]
        # (DenoisingUnit.cpp's histogramPatchDistance is symmetric in its
        # two pixels, and the (2r+1)^2 box commutes with the shift).
        # Negative-dy grid steps run first, computing distances over the
        # extended band and storing them in a VMEM slot; positive-dy steps
        # (and the positive-dx half of dy = 0) DERIVE their distance maps
        # by shifted reads of the mirrored slot instead of recomputing —
        # 84 of 169 chi^2+box passes disappear. The round-2 version of
        # this idea died on an HBM mask hand-off between two kernel
        # phases; the VMEM dist store inside the one kernel is the cheap
        # hand-off that makes it pay (DESIGN.md 7b "TRIED AND REVERTED").

        def chi2_dist(dxs_sub):
            """(next_rows, len(dxs_sub)) boxed distances for given dxs.

            Only called from the dy <= 0 branches: the chi-band windows
            read rows [ch0 + dy*tp - 8, ch0 + dy*tp + nchi + 8), which
            stay inside the slab exactly because dy <= 0 (the extended
            band bottom h + t + b + r is < tp by the strict pm halo)."""
            q8c = (ch0 - 8) // 8 + dy * (tp // 8)
            hist_w = _aligned_win(histo_ref, q8c, nchi)
            nb_w = _aligned_win(nb_ref, q8c, nchi)
            hist_c = histo_ref[ch0 : ch0 + nchi, :]
            nb_c = nb_ref[ch0 : ch0 + nchi, :]
            ndc = len(dxs_sub)
            num_cols = []
            cnt_cols = []
            for dx in dxs_sub:
                s = 8 + dx  # static sub-slice start in the aligned window
                if "chi2" in _SKIP:
                    num_cols.append(jnp.zeros((nchi, 1), f32))
                    cnt_cols.append(jnp.ones((nchi, 1), f32))
                    continue
                hist_n = hist_w[s : s + nchi, :]
                nb_n = nb_w[s : s + nchi, :]
                hsum = hist_c + hist_n
                keep = hsum > 1.0  # "TEMPORARY" gate, DenoisingUnit.cpp:379
                diff = nb_n * hist_c - nb_c * hist_n
                denom = jnp.where(keep, nb_c * nb_n * hsum, 1.0)
                denom = jnp.where(denom == 0.0, 1.0, denom)
                num_cols.append(jnp.sum(
                    jnp.where(keep, diff * diff / denom, 0.0), axis=1,
                    keepdims=True))
                cnt_cols.append(jnp.sum(keep.astype(f32), axis=1,
                                        keepdims=True))
            # patch box sum for all dx at once (lane-batched); chi-band
            # row r*tp + i + q is the patch pixel q of band center i
            ncat = _pack_cols(num_cols + cnt_cols)  # (nchi, 2*ndc)
            if "box" in _SKIP:
                boxed = ncat[r * tp : r * tp + next_rows, :]
            else:
                padded = jnp.pad(ncat, ((qs, qs), (0, 0)))
                boxed = jnp.zeros((next_rows, 2 * ndc), f32)
                for q in _patch_offsets(r, tp):
                    boxed = boxed + padded[
                        qs + r * tp + q : qs + r * tp + q + next_rows, :]
            num_box, cnt_box = boxed[:, :ndc], boxed[:, ndc:]
            return jnp.where(cnt_box > 0.0,
                             num_box / jnp.maximum(cnt_box, 1.0),
                             jnp.inf)  # (next_rows, ndc)

        @pl.when(o < b)
        def _compute_all():  # dy < 0: compute + store all 13 columns
            dist = chi2_dist(list(range(-b, b + 1)))
            dist_s[pl.ds(8 * (o * (rows_pad // 8)), next_rows), :] = dist
            m13_s[:] = (dist[:ncore] <= thr).astype(f32)

        @pl.when(o == b)
        def _compute_half():  # dy = 0: compute dx <= 0, mirror dx > 0
            dist = chi2_dist(list(range(-b, 1)))  # (next_rows, b+1)
            base = b * rows_pad  # own slot, static
            dist_s[base : base + next_rows, 0 : b + 1] = dist
            cols = [dist[:ncore, dxi : dxi + 1] for dxi in range(b + 1)]
            for dxi in range(b + 1, nd):
                dx = dxi - b
                # dist_(0,dx)[z] = dist_(0,-dx)[z + dx]: static shifted read
                cols.append(dist_s[base + dx : base + dx + ncore,
                                   nd - 1 - dxi : nd - dxi])
            m13_s[:] = (_pack_cols(cols) <= thr).astype(f32)

        @pl.when(o > b)
        def _derive():  # dy > 0: mirror slot 2b - o, shift dy*tp + dx
            slot = 2 * b - o
            q8 = slot * (rows_pad // 8) + dy * (tp // 8) - 1
            win = _aligned_win(dist_s, q8, ncore)  # (ncore + 16, nd)
            cols = [win[8 + (dxi - b) : 8 + (dxi - b) + ncore,
                        nd - 1 - dxi : nd - dxi]
                    for dxi in range(nd)]
            m13_s[:] = (_pack_cols(cols) <= thr).astype(f32)

        # --- gates, all dx lanes (every step) ------------------------------
        int_cols = [valid_w[8 + dx : 8 + dx + ncore, 1:2]
                    for dx in range(-b, b + 1)]
        interior_n = _pack_cols(int_cols)  # (ncore, nd)
        mask13 = m13_s[:] * interior_n * center_valid
        # the self offset is always selected for valid centers (its
        # distance is identically 0 but can be 0/0 -> inf when every bin
        # is gated)
        col = jax.lax.broadcasted_iota(jnp.int32, (ncore, nd), 1)
        is_self = jnp.logical_and(dy == 0, col == b)
        mask13 = jnp.where(is_self, center_valid, mask13)

    mask_ref[0:cb0, :] = jnp.zeros((cb0, nd), f32)
    mask_ref[cb0 + ncore :, :] = jnp.zeros((npix - cb0 - ncore, nd), f32)
    mask_ref[cb0 : cb0 + ncore, :] = mask13

    # --- masked moment accumulation as banded MXU dots --------------------
    # For one flat row block of the core band, sum_dx mask[z, dxi] *
    # src[z + o] is B @ S with B[x, xs] = band(xs - x == dx) * mask13[x,
    # dxi] — mask is indexed at the OUTPUT row (center), so B needs no
    # transpose — and S the source row block of [G | Pc | Pcov | 1].
    # 0/1 mask weights make the HIGHEST dot a selection-sum (exact per
    # term, fp32 accumulation); n rides the ones column and stays an
    # exact small integer. Cross-image-row terms are dropped by the band
    # masks' same-row condition exactly where the old shifted-FMA form
    # multiplied them by a zero mask (non-core centers).
    if "m2" not in _SKIP:
        for blk0 in range(0, ncore, blk):
            m13blk = mask13[blk0 : blk0 + blk]  # (blk, nd)
            bmat = band_ref[0] * m13blk[:, 0:1]
            for dxi in range(1, nd):
                bmat = bmat + band_ref[dxi] * m13blk[:, dxi : dxi + 1]
            bmat16 = bmat.astype(jnp.bfloat16)  # 0/1: exact
            base = pl.multiple_of(cb0 + blk0 + dy * tp, 8)  # all terms 8-aligned
            contrib = sum(
                jax.lax.dot_general(
                    bmat16, gk[pl.ds(base, blk)],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                for gk in (g1_s, g2_s, g3_s))
            acc_s[blk0 : blk0 + blk] = acc_s[blk0 : blk0 + blk] + contrib

    @pl.when(o == 2 * b)
    def _emit():
        # repack the core band to compact core-pixel-major rows: band row
        # y*tp + h + x -> compact row y*t + x. Both src (h = 0 mod 8,
        # tp = 0 mod 8) and dst (t = 0 mod 16) offsets stay 8-aligned, so
        # the t static copies need no relayout.
        for y in range(t):
            src = y * tp + h
            dst = y * t
            m2_ref[dst : dst + t, :] = acc_s[src : src + t, 0:dtri]
            misc_ref[dst : dst + t, 0:d] = (
                acc_s[src : src + t, dtri : dtri + d])
            misc_ref[dst : dst + t, d : d + 6 * npatch] = (
                acc_s[src : src + t, dtri + d : dtri + d + 6 * npatch])
            misc_ref[dst : dst + t, d + 6 * npatch : d + 6 * npatch + 1] = (
                acc_s[src : src + t,
                      dtri + d + 6 * npatch : dtri + d + 6 * npatch + 1])
            misc_ref[dst : dst + t, d + 6 * npatch + 1 :
                     d + 6 * npatch + 2] = (
                valid_ref[cb0 + src : cb0 + src + t, 0:1])
            misc_ref[dst : dst + t, d + 6 * npatch + 2 :] = jnp.zeros(
                (t, misc_ref.shape[1] - d - 6 * npatch - 2), f32)


@functools.partial(
    jax.jit, static_argnames=("t", "r", "b", "interpret"))
def masks_moments2(histo_f, nb_f, color_f, pixcov_f, valid_f,
                   threshold, t: int, r: int, b: int,
                   interpret: bool = False):
    """K1 v2: per-offset similar-patch masks + masked moment sums.

    Inputs are (tp*tp, C) pm-flat slabs (tp = t + 2*pm_halo(r, b); a
    (tp, tp, C) tile slab reshaped row-major, NO padding):
      histo_f (tp^2, nbins), nb_f (tp^2, 1), color_f (tp^2, 3),
      pixcov_f (tp^2, 6), valid_f (tp^2, 2) = [center_valid & owned,
      candidate-interior].

    Returns:
      masks (2b+1, tp^2, 2b+1): similar-set masks indexed [dyi, z, dxi]
          (zero outside the core band),
      m2    (t^2, d(d+1)/2): raw masked second moments, COMPACT core-
          pixel-major rows (z = y*t + x), upper-triangle packed,
      misc  (t^2, 128): [0:d] masked color-patch sums, [d:d+6*npx] masked
          patch-cov sums, [d+6*npx] n, [d+6*npx+1] center_valid.
    """
    h, tp, cb0, ncore, ch0, nchi = pm_geometry(t, r, b)
    npix = tp * tp
    assert histo_f.shape[0] == npix, (histo_f.shape, npix)
    nbins = histo_f.shape[1]
    d = 3 * (2 * r + 1) ** 2
    npatch = (2 * r + 1) ** 2
    nd = 2 * b + 1
    _, _, dtri = tri_geometry(d)
    assert d + 6 * npatch + 2 <= 128, "misc channel budget (r=1 only)"

    kernel = functools.partial(_masks_moments2_kernel, t=t, r=r, b=b)

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda o: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    band = band_masks(tp, b, ncore, sign=-1)
    blk = band.shape[1]

    masks, m2, misc = pl.pallas_call(
        kernel,
        grid=(nd,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda o: (0, 0), memory_space=pltpu.SMEM),
            const((npix, nbins)),
            const((npix, 1)),
            const((npix, 3)),
            const((npix, 6)),
            const((npix, 2)),
            const((nd, blk, blk)),
        ],
        out_specs=[
            pl.BlockSpec((npix, nd), lambda o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t * t, dtri), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t * t, 128), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nd * npix, nd), jnp.float32),
            jax.ShapeDtypeStruct((t * t, dtri), jnp.float32),
            jax.ShapeDtypeStruct((t * t, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((npix, K1_SRC_CH), jnp.float32),     # gsrc_s
            pltpu.VMEM((npix, K1_SRC_CH), jnp.bfloat16),    # g1_s
            pltpu.VMEM((npix, K1_SRC_CH), jnp.bfloat16),    # g2_s
            pltpu.VMEM((npix, K1_SRC_CH), jnp.bfloat16),    # g3_s
            pltpu.VMEM((ncore, K1_SRC_CH), jnp.float32),    # acc_s
            pltpu.VMEM(((b + 1) * _align8((t + b) * tp + 24), nd),
                       jnp.float32),                        # dist_s
            pltpu.VMEM((ncore, nd), jnp.float32),           # m13_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(threshold, jnp.float32).reshape(1, 1),
      histo_f, nb_f, color_f, pixcov_f, valid_f, jnp.asarray(band))
    return masks.reshape(nd, npix, nd), m2, misc


def k4_geometry(t: int, r: int, b: int):
    """Candidate-band geometry of K4. The filtered field is indexed by
    CANDIDATE position z = center + o, which reaches b rows beyond the
    core band on both sides: ca0/ncand are that band's start/length. The
    windowed reads z - o then reach up to 2b rows above the core — past
    row 0 of the unpadded pm layout — so K4's source slabs (A2/small/
    masks) live in scratch with p0 pad rows on each side."""
    h, tp, cb0, ncore, _, _ = pm_geometry(t, r, b)
    ca0 = (h - b) * tp
    ncand = (t + 2 * b) * tp
    p0 = _align8(b * tp + b + 8)
    return ca0, ncand, p0


# combined K4 source/output channel map (one MXU dot per row block
# accumulates ALL of WA / wb / cnt): [0:d*d] A2^T k-major, [d*d:d*d+d] b2,
# [d*d+d] ones (-> cnt). 757 live channels for d=27, padded to 768 lanes.
K4_SRC_CH = 768


def band_masks(tp: int, b: int, nrows: int, sign: int) -> np.ndarray:
    """Static 0/1 band selectors for the banded-MXU accumulates:
    band[dxi][x, xs] = 1 iff sign*(x - xs) = dx within the SAME image row
    (|dx| <= b < tp, so a flat row block of blk rows never mixes rows;
    cross-row terms carry zero mask weight in the shifted-FMA form and
    are simply dropped here — identical sums). sign=+1 is K4's source
    indexing (xs = x - dx), sign=-1 is K1's (xs = x + dx). Returns
    (2b+1, blk, blk) float32 with blk = 128 when 128 is a whole number
    of tp-rows dividing nrows, else tp (one image row)."""
    blk = 128 if (128 % tp == 0 and nrows % 128 == 0) else tp
    assert nrows % blk == 0, (nrows, blk)
    ri, ci = np.meshgrid(np.arange(blk), np.arange(blk), indexing="ij")
    same_row = (ri // tp) == (ci // tp)
    out = np.stack(
        [(sign * (ri - ci) == dx) & same_row for dx in range(-b, b + 1)]
    ).astype(np.float32)
    return out


def _apply_scatter2_kernel(masks_ref, a2t_ref, small_ref, color_ref,
                           band_ref, out_ref,
                           src_s, smf_s, wg_s, acc_s,
                           fp_s,
                           *, t, r, b):
    from bcd_tpu.ops.solve_filter_pallas import SMALL_CH, _mxu_t

    h, tp, cb0, ncore, _, _ = pm_geometry(t, r, b)
    ca0, ncand, p0 = k4_geometry(t, r, b)
    npix = tp * tp
    srows = npix + 2 * p0
    d = 3 * (2 * r + 1) ** 2
    f32 = jnp.float32
    o = pl.program_id(0)
    nd = 2 * b + 1
    qs = r * tp + r
    qs_a = _align8(qs)
    blk = band_ref.shape[1]  # row block of the banded dots (see
    #                          k4_band_masks); ncand % blk == 0

    @pl.when(o == 0)
    def _init():
        # re-expand K2's compact pixel-major maps onto the PADDED flat row
        # grid (the inverse of K1's emit repack; same aligned t-copy
        # structure), building the combined MXU source rows
        # [A2^T | b2 | 1] (K4_SRC_CH map). The zero fill keeps 0 * garbage
        # out of the windowed reads and stands in for the out-of-tile rows
        # the windows reach; the ones column is harmless there because the
        # band weights w are identically zero outside the core.
        smf_s[:] = jnp.zeros((srows, SMALL_CH), f32)
        # chunked fills: whole-array iota/zeros temporaries at srows x
        # 768 are ~15 MB of scoped-VMEM stack each (the iota is built per
        # chunk size — slicing a sublane-replicated value crashes
        # Mosaic's layout pass)
        for b0 in range(0, srows, 512):
            e = min(b0 + 512, srows)
            ci = jax.lax.broadcasted_iota(jnp.int32, (e - b0, K4_SRC_CH), 1)
            src_s[b0:e] = jnp.where(ci == d * d + d, 1.0, 0.0)
        for y in range(t):
            src = y * t
            dst = p0 + cb0 + y * tp + h
            src_s[dst : dst + t, 0 : d * d] = a2t_ref[src : src + t, :]
            src_s[dst : dst + t, d * d : d * d + d] = (
                small_ref[src : src + t, 0:d])
            smf_s[dst : dst + t, :] = small_ref[src : src + t, :]
        wg_s[0:p0, :] = jnp.zeros((p0, nd), f32)
        wg_s[p0 + npix :, :] = jnp.zeros((p0, nd), f32)
        for b0 in range(0, ncand, 512):
            e = min(b0 + 512, ncand)
            acc_s[b0:e] = jnp.zeros((e - b0, K4_SRC_CH), f32)

    # the grid has nd+1 steps: steps [0, nd) accumulate, step nd emits.
    # Emitting in its OWN step keeps the accumulate windows out of the
    # emit block's register region (round-2: sharing one step spilled
    # ~108 MB of vregs at tile=48).
    @pl.when(o < nd)
    def _accumulate():
        dy = o - b
        # Banded correlation as MXU dots (the round-3 K4 redesign):
        # WA[z] = sum_dx w[z-o] A2^T[z-o] restricted to one flat row block
        # is B @ S with B[x, xs] = w[rowbase + xs, dxi(x - xs)] — a 0/1
        # band matrix — and S the source row block. 0/1 weights make the
        # HIGHEST-precision dot a selection-sum (exact per term, fp32
        # accumulation; same argument as the in-kernel transposes,
        # scripts/probe_transpose.py). wb and cnt ride along as extra
        # source columns (K4_SRC_CH map), so one dot per block accumulates
        # everything the emit step needs.
        if "k4acc" in _SKIP:
            return
        # w = mask * gate at SOURCE rows, on the padded row grid (the
        # main-path gate is smf column d, solve_filter_pallas.SMALL_CH map)
        wg_s[p0 : p0 + npix, :] = (
            masks_ref[:] * smf_s[p0 : p0 + npix, d : d + 1])
        for blk0 in range(0, ncand, blk):
            # source rows for output rows [ca0 + blk0, +blk): z - dy*tp
            base = pl.multiple_of(p0 + ca0 + blk0 - dy * tp, 8)  # 8-aligned
            # wg is 0/1, so a DEFAULT-precision (single-pass) permutation
            # dot transposes it exactly
            wgT = _mxu_t(wg_s[pl.ds(base, blk)],
                         precision=jax.lax.Precision.DEFAULT)  # (nd, blk)
            bmat = band_ref[0] * wgT[0:1]
            for dxi in range(1, nd):
                bmat = bmat + band_ref[dxi] * wgT[dxi : dxi + 1]
            # HIGHEST here (not the bf16x3 split K1 uses): K4's three
            # split planes cost 22.5 MB of scoped VMEM the kernel does
            # not have at tile=48 (the flat padded-row source grid is
            # srows=4896 rows); a compact-source redesign is the way to
            # afford it, not a bigger budget
            contrib = jax.lax.dot_general(
                bmat, src_s[pl.ds(base, blk)],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=f32)
            acc_s[blk0 : blk0 + blk] = acc_s[blk0 : blk0 + blk] + contrib

    @pl.when(o == nd)
    def _emit():
        # candidate-center field F[z] = WA[z] c-patch[z] + wb[z] + fb-mean;
        # fallback pixels deposit their mean patch at z = p only
        # (DenoisingUnit.cpp:455-481); smf carries [b2, gate, fb*m, fb]
        f = (acc_s[:, d * d : d * d + d]
             + smf_s[p0 + ca0 : p0 + ca0 + ncand, d + 1 : 2 * d + 1])
        cnt2 = (acc_s[:, d * d + d : d * d + d + 1]
                + smf_s[p0 + ca0 : p0 + ca0 + ncand,
                        2 * d + 1 : 2 * d + 2])
        # F[:, j] += c-patch[:, k] * WA^T[:, k*d + j] for all j at once
        # (c-patch[z, k] = color[z + q_k], read as shifted color columns —
        # the candidate band's patch reach stays inside the unpadded slab;
        # WA^T columns read straight from the scratch ref to keep the live
        # set small)
        if "k4fil" not in _SKIP:
            for qi, q in enumerate(_patch_offsets(r, tp)):
                for c in range(3):
                    k = 3 * qi + c
                    ck = color_ref[ca0 + q : ca0 + q + ncand, c : c + 1]
                    f = f + ck * acc_s[:, k * d : (k + 1) * d]
        # aggregate: pixel y receives component group q of the candidate
        # field at y - q (Denoiser.cpp:434-470 semantics, one pass). The
        # output band [ca0 - qs_a, ca0 + ncand + qs_a) is 8-aligned on
        # both sides (qs_a = align8(patch reach)); rows outside it are
        # zero. The padded field lives in a scratch REF (a value-level
        # jnp.pad of the 27-lane field hits a Mosaic concat limitation);
        # the shifted reads are static ref slices.
        pa = 2 * qs_a
        # only the pad bands need clearing — rows [pa, pa+ncand) are
        # overwritten in full just below (advisor round-3 finding)
        fp_s[0:pa, :] = jnp.zeros((pa, fp_s.shape[1]), f32)
        fp_s[pa + ncand :, :] = jnp.zeros(
            (fp_s.shape[0] - pa - ncand, fp_s.shape[1]), f32)
        fp_s[pa : pa + ncand, 0:d] = f
        fp_s[pa : pa + ncand, d : d + 1] = cnt2
        nb_rows = ncand + 2 * qs_a
        acc = jnp.zeros((nb_rows, 3), f32)
        cacc = jnp.zeros((nb_rows, 1), f32)
        for qi, q in enumerate(_patch_offsets(r, tp)):
            acc = acc + fp_s[qs_a - q : qs_a - q + nb_rows,
                             3 * qi : 3 * qi + 3]
            cacc = cacc + fp_s[qs_a - q : qs_a - q + nb_rows, d : d + 1]
        out_ref[0 : ca0 - qs_a, :] = jnp.zeros((ca0 - qs_a, 4), f32)
        out_ref[ca0 - qs_a : ca0 - qs_a + nb_rows, 0:3] = acc
        out_ref[ca0 - qs_a : ca0 - qs_a + nb_rows, 3:4] = cacc
        out_ref[ca0 - qs_a + nb_rows :, :] = jnp.zeros(
            (npix - ca0 + qs_a - nb_rows, 4), f32)


@functools.partial(jax.jit, static_argnames=("t", "r", "b", "interpret"))
def apply_scatter2(masks, a2t_pm, small_pm, color_f,
                   t: int, r: int, b: int, interpret: bool = False):
    """K4 v2: correlation-form filter application + patch aggregation.

    masks:    (2b+1, tp^2, 2b+1) from ``masks_moments2``; entries MUST be
              exactly 0/1 (so must small_pm's gate column) — the kernel's
              DEFAULT-precision MXU transpose of masks*gate is only exact
              for 0/1 values; soft/weighted masks would silently lose
              mantissa bits
    a2t_pm:   (t^2, d*d) A2^T maps (k-major), compact pixel-major rows
    small_pm: (t^2, 64) packed [b2, gate, fb*mean-patch, fb] rows
    color_f:  (tp^2, 3) color slab (same as K1)
    Returns (tp^2, 4): [output color sums, estimate counts] in flat rows —
    the apron-inclusive overlap-add contribution of this tile.
    """
    from bcd_tpu.ops.solve_filter_pallas import SMALL_CH

    h, tp, cb0, ncore, _, _ = pm_geometry(t, r, b)
    ca0, ncand, p0 = k4_geometry(t, r, b)
    npix = tp * tp
    srows = npix + 2 * p0
    d = 3 * (2 * r + 1) ** 2
    nd = 2 * b + 1
    qs_a = _align8(r * tp + r)

    kernel = functools.partial(_apply_scatter2_kernel, t=t, r=r, b=b)

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda o: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    band = band_masks(tp, b, ncand, sign=+1)
    blk = band.shape[1]

    out = pl.pallas_call(
        kernel,
        grid=(nd + 1,),  # steps [0, nd) accumulate; step nd emits
        in_specs=[
            pl.BlockSpec((npix, nd),
                         lambda o: (jnp.minimum(o, nd - 1), 0),
                         memory_space=pltpu.VMEM),
            const((t * t, d * d)),
            const((t * t, SMALL_CH)),
            const((npix, 3)),
            const((nd, blk, blk)),
        ],
        out_specs=pl.BlockSpec((npix, 4), lambda o: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npix, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((srows, K4_SRC_CH), jnp.float32),  # src_s
            pltpu.VMEM((srows, SMALL_CH), jnp.float32),   # smf_s
            pltpu.VMEM((srows, nd), jnp.float32),         # wg_s
            pltpu.VMEM((ncand, K4_SRC_CH), jnp.float32),  # acc_s
            pltpu.VMEM((ncand + 4 * qs_a, d + 1), jnp.float32),  # fp_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(masks.reshape(nd * npix, nd), a2t_pm, small_pm, color_f,
      jnp.asarray(band))
    return out
