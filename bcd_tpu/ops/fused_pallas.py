"""Fused spatial Pallas TPU kernels for the denoiser hot path.

Round-2 step change (DESIGN.md §8): the XLA engine materializes per-tile
candidate tensors (~190 KB/pixel of HBM traffic); these kernels keep the
whole distance -> moments -> filter -> scatter chain VMEM-resident.

Layout: the tile's (tp, tp) spatial plane is FLATTENED onto the SUBLANE
axis with a stride padded to a multiple of 8 — arrays are (ROWS, C) with
flat index z = y*TPS + x (TPS = align8(tp)) stored at row R0 + z. A
spatial shift by (dy, dx) then decomposes into a PROVABLY 8-ALIGNED
dynamic part (dy*TPS, constructed as 8*q so Mosaic's alignment check
passes — large dynamic sublane loads require it; this is what sank both
the round-1 lane-flat kernel and the first draft of this one) plus a
small STATIC part dx handled as a sub-slice of the loaded value. The
offset loop is therefore grid-over-dy with an unrolled static dx loop.

No wrap correction is needed: contributions that cross a row boundary
under flat shifting come from non-core or non-interior positions whose
masks are identically zero (columns [tp, TPS) are zero-filled and never
valid).

Two kernels:

- ``masks_moments`` (K1): per (dy, dx) window offset: the chi^2
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

- ``apply_scatter`` (K4): the per-pixel filter
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


# perf-bisection toggles (dev only; see scripts/smoke_fused_tpu.py)
import os as _os

_SKIP = set(_os.environ.get("BCD_FUSED_SKIP", "").split(","))

# dx terms fused into ONE accumulator update expression in K1/K4 (measured
# widest that compiles without vreg spill at tile=48; 13 spills)
_DX_CHUNK = 7


def flat_geometry(tp: int, b: int, r: int):
    """Row geometry of the flat layout: (TPS, R0, ROWS).

    TPS is the padded row stride; R0 (a multiple of 8) is the row of flat
    index 0. The pads of R0 rows on each side keep every aligned dynamic
    load window (|dy|*TPS + 8 margin) and every static patch-build slice
    in bounds."""
    tps = _align8(tp)
    r0 = _align8(b * tps + b + r * tps + r + 16)
    rows = _align8(2 * r0 + tp * tps)
    return tps, r0, rows


def _patch_offsets(r: int, tps: int):
    return [(qy * tps + qx)
            for qy in range(-r, r + 1) for qx in range(-r, r + 1)]


def to_flat(img, b: int, r: int, fill: float = 0.0):
    """(tp, tp, C) -> (ROWS, C) flat slab with flat index z at row R0+z."""
    tp = img.shape[0]
    tps, r0, rows = flat_geometry(tp, b, r)
    img = jnp.pad(img, ((0, 0), (0, tps - tp), (0, 0)),
                  constant_values=fill)
    flat = img.reshape(tp * tps, img.shape[-1])
    return jnp.pad(flat, ((r0, rows - r0 - tp * tps), (0, 0)),
                   constant_values=fill)


def from_flat(flat, tp: int, b: int, r: int):
    """(ROWS, C) -> (tp, tp, C): inverse of ``to_flat``."""
    tps, r0, _ = flat_geometry(tp, b, r)
    return flat[r0 : r0 + tp * tps].reshape(
        tp, tps, flat.shape[-1])[:, :tp]


def _aligned_window(ref, q8, npix, lo=None, hi=None):
    """Load rows [8*q8 - 8 + 8, ...): a (npix+16, C) window at a provably
    8-aligned dynamic offset; the caller sub-slices [8+dx : 8+dx+npix]."""
    return ref[pl.ds(8 * q8, npix + 16), lo:hi] if lo is not None else (
        ref[pl.ds(8 * q8, npix + 16), :])


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


def _masks_moments_kernel(thr_ref, histo_ref, nb_ref, color_ref,
                          pixcov_ref, valid_ref, mask_ref, m2_ref, misc_ref,
                          pc_s, pcov_s, g_s, m2acc_s, macc_s, novacc_s,
                          nacc_s,
                          *, tp, r, b, r0, tps, rows, self_dy):
    npix = tp * tps
    d = 3 * (2 * r + 1) ** 2
    npatch = (2 * r + 1) ** 2
    tri_base, _, dtri = tri_geometry(d)
    f32 = jnp.float32
    o = pl.program_id(0)
    dy = o - b
    qs = r * tps + r  # static patch-build reach

    @pl.when(o == 0)
    def _build():
        # patch stacks: Pc[z, 3*qi+c] = color[z + q_qi, c] (the reference's
        # patch vector layout, DenoisingUnit.cpp:483-498); valid on
        # [qs, rows-qs) which covers every row the correlations read
        if "gbuild" not in _SKIP:
            pc_s[:] = jnp.zeros((rows, d), f32)
            pcov_s[:] = jnp.zeros((rows, 6 * npatch), f32)
            for qi, q in enumerate(_patch_offsets(r, tps)):
                pc_s[qs : rows - qs, 3 * qi : 3 * qi + 3] = (
                    color_ref[qs + q : rows - qs + q, :])
                pcov_s[qs : rows - qs, 6 * qi : 6 * qi + 6] = (
                    pixcov_ref[qs + q : rows - qs + q, :])
            # patch outer products, upper triangle only (M2 is symmetric):
            # G[z, tri(k, j)] = Pc[z,k] * Pc[z,j], j >= k
            pc_all = pc_s[:]
            for k in range(d):
                tb = int(tri_base[k])
                g_s[:, tb : tb + d - k] = (
                    pc_all[:, k : k + 1] * pc_all[:, k:])
        m2acc_s[:] = jnp.zeros((npix, dtri), f32)
        macc_s[:] = jnp.zeros((npix, d), f32)
        novacc_s[:] = jnp.zeros((npix, 6 * npatch), f32)
        nacc_s[:] = jnp.zeros((npix, 1), f32)

    thr = thr_ref[0, 0]

    # per-dy aligned windows (base row r0 - 8 + dy*tps, provably 8-aligned)
    q8 = (r0 - 8) // 8 + dy * (tps // 8)
    hist_w = _aligned_window(histo_ref, q8, npix)
    nb_w = _aligned_window(nb_ref, q8, npix)
    valid_w = _aligned_window(valid_ref, q8, npix)
    g_w = _aligned_window(g_s, q8, npix)
    pc_w = _aligned_window(pc_s, q8, npix)
    pcov_w = _aligned_window(pcov_s, q8, npix)

    hist_c = histo_ref[r0 : r0 + npix, :]
    nb_c = nb_ref[r0 : r0 + npix, :]
    center_valid = valid_ref[r0 : r0 + npix, 0:1]

    nd = 2 * b + 1

    if "masks" in _SKIP:  # machinery bisect: constant masks, no distances
        mask13 = jnp.broadcast_to(center_valid, (npix, nd))
    else:
        # --- chi^2 per-pixel numerator / kept-bin count, all dx lanes -----
        num_cols = []
        cnt_cols = []
        int_cols = []
        for dx in range(-b, b + 1):
            s = 8 + dx  # static sub-slice start within the aligned window
            int_cols.append(valid_w[s : s + npix, 1:2])
            if "chi2" in _SKIP:
                num_cols.append(jnp.zeros((npix, 1), f32))
                cnt_cols.append(jnp.ones((npix, 1), f32))
                continue
            hist_n = hist_w[s : s + npix, :]
            nb_n = nb_w[s : s + npix, :]
            hsum = hist_c + hist_n
            keep = hsum > 1.0  # "TEMPORARY" bin gate, DenoisingUnit.cpp:379
            diff = nb_n * hist_c - nb_c * hist_n
            denom = jnp.where(keep, nb_c * nb_n * hsum, 1.0)
            denom = jnp.where(denom == 0.0, 1.0, denom)
            num_cols.append(jnp.sum(
                jnp.where(keep, diff * diff / denom, 0.0), axis=1,
                keepdims=True))
            cnt_cols.append(jnp.sum(keep.astype(f32), axis=1, keepdims=True))

        # --- patch box sum for all dx at once (lane-batched) ---------------
        ncat = _pack_cols(num_cols + cnt_cols)  # (npix, 2*nd)
        if "box" in _SKIP:
            boxed = ncat
        else:
            padded = jnp.pad(ncat, ((qs, qs), (0, 0)))
            boxed = jnp.zeros((npix, 2 * nd), f32)
            for q in _patch_offsets(r, tps):
                boxed = boxed + padded[qs + q : qs + q + npix, :]
        num_box, cnt_box = boxed[:, :nd], boxed[:, nd:]
        dist = jnp.where(cnt_box > 0.0, num_box / jnp.maximum(cnt_box, 1.0),
                         jnp.inf)  # (npix, nd)

        # --- similar-set masks, all dx lanes -------------------------------
        interior_n = _pack_cols(int_cols)  # (npix, nd)
        mask13 = (dist <= thr).astype(f32) * interior_n * center_valid
        # the self offset is always selected for valid centers (its
        # distance is identically 0 but can be 0/0 -> inf when every bin
        # is gated)
        col = jax.lax.broadcasted_iota(jnp.int32, (npix, nd), 1)
        is_self = jnp.logical_and(dy == self_dy, col == b)
        mask13 = jnp.where(is_self, center_valid, mask13)

    mask_ref[0:r0, :] = jnp.zeros((r0, nd), f32)
    mask_ref[r0 + npix :, :] = jnp.zeros((rows - r0 - npix, nd), f32)
    mask_ref[r0 : r0 + npix, :] = mask13

    # --- masked moment accumulation (shifted lane-wide FMAs) ---------------
    # dx contributions are summed as fused expressions so the big
    # (npix, dtri) accumulator is read+written once per CHUNK of dx
    # instead of once per dx. Chunking caps the live value: a full
    # 13-term chain on a d*d-wide accumulator spills vregs at tile>=48
    # (the round-1 107 MB failure mode); _DX_CHUNK-wide chunks compile
    # and still cut accumulator VMEM traffic ~6x.
    dxs = list(range(-b, b + 1))
    if "m2" not in _SKIP:
        for c0 in range(0, len(dxs), _DX_CHUNK):
            m2c = None
            for dxi in range(c0, min(c0 + _DX_CHUNK, len(dxs))):
                s = 8 + dxs[dxi]
                t = mask13[:, dxi : dxi + 1] * g_w[s : s + npix, :]
                m2c = t if m2c is None else m2c + t
            m2acc_s[:] = m2acc_s[:] + m2c
    if "small" not in _SKIP:
        mc = novc = None
        for dxi, dx in enumerate(dxs):
            s = 8 + dx
            mask = mask13[:, dxi : dxi + 1]
            t = mask * pc_w[s : s + npix, :]
            mc = t if mc is None else mc + t
            t = mask * pcov_w[s : s + npix, :]
            novc = t if novc is None else novc + t
        macc_s[:] = macc_s[:] + mc
        novacc_s[:] = novacc_s[:] + novc
    nacc_s[:] += jnp.sum(mask13, axis=1, keepdims=True)

    @pl.when(o == 2 * b)
    def _emit():
        m2_ref[:] = m2acc_s[:]
        misc_ref[:, 0:d] = macc_s[:]
        misc_ref[:, d : d + 6 * npatch] = novacc_s[:]
        misc_ref[:, d + 6 * npatch : d + 6 * npatch + 1] = nacc_s[:]
        misc_ref[:, d + 6 * npatch + 1 :] = jnp.zeros(
            (npix, misc_ref.shape[1] - d - 6 * npatch - 1), f32)


@functools.partial(
    jax.jit, static_argnames=("tp", "r", "b", "interpret"))
def masks_moments(histo_f, nb_f, color_f, pixcov_f, valid_f,
                  threshold, tp: int, r: int, b: int,
                  interpret: bool = False):
    """K1: per-offset similar-patch masks + masked moment sums for one tile.

    Inputs are flat tp-grid slabs (ROWS, C) from ``to_flat`` (pads zero,
    nb pad 1.0):
      histo_f  (ROWS, 3*nbins), nb_f (ROWS, 1), color_f (ROWS, 3),
      pixcov_f (ROWS, 6), valid_f (ROWS, 2) = [center_valid & owned,
      candidate-interior].

    Returns:
      masks (2b+1, ROWS, 2b+1): similar-set masks indexed [dyi, :, dxi]
          (rows outside the tp grid are zero),
      m2    (tp*TPS, d(d+1)/2): raw masked second moments sum_o w c c^T,
          upper-triangle packed (expand with ``tri_geometry(d)[1]``),
      misc  (tp*TPS, 128): [0:d] masked color-patch sums, [d:d+6*npx]
          masked patch-cov sums, [d+6*npx] similar-set sizes n.
    """
    tps, r0, rows = flat_geometry(tp, b, r)
    assert histo_f.shape[0] == rows, (histo_f.shape, rows)
    nbins = histo_f.shape[1]
    npix = tp * tps
    d = 3 * (2 * r + 1) ** 2
    npatch = (2 * r + 1) ** 2
    nd = 2 * b + 1
    _, _, dtri = tri_geometry(d)

    kernel = functools.partial(
        _masks_moments_kernel, tp=tp, r=r, b=b, r0=r0, tps=tps, rows=rows,
        self_dy=0)

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda o: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    masks, m2, misc = pl.pallas_call(
        kernel,
        grid=(nd,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda o: (0, 0), memory_space=pltpu.SMEM),
            const((rows, nbins)),
            const((rows, 1)),
            const((rows, 3)),
            const((rows, 6)),
            const((rows, 2)),
        ],
        out_specs=[
            pl.BlockSpec((rows, nd), lambda o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npix, dtri), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npix, 128), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nd * rows, nd), jnp.float32),
            jax.ShapeDtypeStruct((npix, dtri), jnp.float32),
            jax.ShapeDtypeStruct((npix, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, d), jnp.float32),            # pc_s
            pltpu.VMEM((rows, 6 * npatch), jnp.float32),   # pcov_s
            pltpu.VMEM((rows, dtri), jnp.float32),         # g_s
            pltpu.VMEM((npix, dtri), jnp.float32),         # m2acc_s
            pltpu.VMEM((npix, d), jnp.float32),            # macc_s
            pltpu.VMEM((npix, 6 * npatch), jnp.float32),   # novacc_s
            pltpu.VMEM((npix, 1), jnp.float32),            # nacc_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(threshold, jnp.float32).reshape(1, 1),
      histo_f, nb_f, color_f, pixcov_f, valid_f)
    return masks.reshape(nd, rows, nd), m2, misc


def _apply_scatter_kernel(masks_ref, a2t_ref, b2_ref, gate_ref,
                          fbm_ref, color_ref, out_ref,
                          wa_s, wb_s, cnt_s,
                          *, tp, r, b, r0, tps, rows):
    npix = tp * tps
    d = 3 * (2 * r + 1) ** 2
    f32 = jnp.float32
    o = pl.program_id(0)
    nd = 2 * b + 1
    qs = r * tps + r

    @pl.when(o == 0)
    def _init():
        wa_s[:] = jnp.zeros((npix, d * d), f32)
        wb_s[:] = jnp.zeros((npix, d), f32)
        cnt_s[:] = jnp.zeros((npix, 1), f32)

    # the grid has nd+1 steps: steps [0, nd) accumulate, step nd emits.
    # Emitting in its OWN step keeps the accumulate windows (a 14 MB
    # (npix, d*d) value among them) out of the emit block's register
    # region — with both in one step the allocator spilled 108 MB of
    # vregs at tile=48 even though each half fits comfortably alone.
    @pl.when(o < nd)
    def _accumulate():
        dy = o - b
        # WA^T[z] += mask[z-o, o] * gate[z-o] * A2^T[z-o]: shifts are
        # NEGATED relative to K1. a2t_ref packs A2 TRANSPOSED,
        # a2t[p, k*d+j] = A2[p][j, k], so the contraction against the
        # patch stack below is per-k contiguous.
        q8 = (r0 - 8) // 8 - dy * (tps // 8)
        a2_w = _aligned_window(a2t_ref, q8, npix)
        b2_w = _aligned_window(b2_ref, q8, npix)
        gate_w = _aligned_window(gate_ref, q8, npix)

        # fused multi-term expressions per grid step (see the K1 note):
        # the big (npix, d*d) accumulator is read+written once per CHUNK
        # of dx instead of once per dx. The chunk size (_DX_CHUNK) caps
        # the live value the register allocator must carry — a full
        # 13-term chain on the d*d accumulator spills vregs (round 1's
        # failure mode); _DX_CHUNK-wide chunks compile and still cut
        # accumulator traffic ~6x.
        mask_w = _aligned_window(masks_ref, q8, npix)  # (npix+16, 2b+1)
        if "k4acc" in _SKIP:
            return
        dxs = list(range(-b, b + 1))
        ws = {}
        wbc = cc = None
        for dxi, dx in enumerate(dxs):
            s = 8 - dx  # negated static remainder
            w = (mask_w[s : s + npix, dxi : dxi + 1]
                 * gate_w[s : s + npix, :])
            ws[dxi] = (s, w)
            tb = w * b2_w[s : s + npix, :]
            wbc = tb if wbc is None else wbc + tb
            cc = w if cc is None else cc + w
        wb_s[:] = wb_s[:] + wbc
        cnt_s[:] = cnt_s[:] + cc
        for c0 in range(0, len(dxs), _DX_CHUNK):
            wac = None
            for dxi in range(c0, min(c0 + _DX_CHUNK, len(dxs))):
                s, w = ws[dxi]
                ta = w * a2_w[s : s + npix, :]
                wac = ta if wac is None else wac + ta
            wa_s[:] = wa_s[:] + wac

    @pl.when(o == nd)
    def _emit():
        # candidate-center field F[z] = WA[z] c-patch[z] + wb[z] + fb-mean;
        # fallback pixels deposit their mean patch at z = p only
        # (DenoisingUnit.cpp:455-481); fbm_ref carries [fb * m, fb].
        f = wb_s[:] + fbm_ref[r0 : r0 + npix, 0:d]
        cnt2 = cnt_s[:] + fbm_ref[r0 : r0 + npix, d : d + 1]
        # F[:, j] += c-patch[:, k] * WA^T[:, k*d + j] for all j at once
        # (c-patch[z, k] = color[z + q_k], read as shifted color columns;
        # WA^T columns read straight from the scratch ref to keep the live
        # set small)
        if "k4fil" not in _SKIP:
            for qi, q in enumerate(_patch_offsets(r, tps)):
                for c in range(3):
                    k = 3 * qi + c
                    ck = color_ref[r0 + q : r0 + q + npix, c : c + 1]
                    f = f + ck * wa_s[:, k * d : (k + 1) * d]
        # aggregate: pixel y receives component group q of the candidate
        # field at y - q (Denoiser.cpp:434-470 semantics, one pass)
        out_ref[0:r0, :] = jnp.zeros((r0, 4), f32)
        out_ref[r0 + npix :, :] = jnp.zeros(
            (out_ref.shape[0] - r0 - npix, 4), f32)
        fpad = jnp.pad(f, ((qs, qs), (0, 0)))
        cpad = jnp.pad(cnt2, ((qs, qs), (0, 0)))
        acc = jnp.zeros((npix, 3), f32)
        cacc = jnp.zeros((npix, 1), f32)
        for qi, q in enumerate(_patch_offsets(r, tps)):
            acc = acc + fpad[qs - q : qs - q + npix, 3 * qi : 3 * qi + 3]
            cacc = cacc + cpad[qs - q : qs - q + npix, :]
        out_ref[r0 : r0 + npix, 0:3] = acc
        out_ref[r0 : r0 + npix, 3:4] = cacc


@functools.partial(jax.jit, static_argnames=("tp", "r", "b", "interpret"))
def apply_scatter(masks, a2t_f, b2_f, gate_f, fbm_f, color_f,
                  tp: int, r: int, b: int, interpret: bool = False):
    """K4: correlation-form filter application + patch aggregation.

    masks:  (2b+1, ROWS, 2b+1) from ``masks_moments``
    a2t_f:  (ROWS, d*d) A2^T maps (k-major packing), zero off-core
    b2_f:   (ROWS, d) b2 maps, zero off-core
    gate_f: (ROWS, 1) main-path gate (center_valid & n >= d+1)
    fbm_f:  (ROWS, d+1) [fallback * mean-patch, fallback flag]
    color_f:(ROWS, 3) color slab (same as K1)
    Returns (ROWS, 4): [output color sums, estimate counts] in flat rows —
    the apron-inclusive overlap-add contribution of this tile.
    """
    tps, r0, rows = flat_geometry(tp, b, r)
    d = 3 * (2 * r + 1) ** 2
    nd = 2 * b + 1

    kernel = functools.partial(
        _apply_scatter_kernel, tp=tp, r=r, b=b, r0=r0, tps=tps, rows=rows)

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda o: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(nd + 1,),  # steps [0, nd) accumulate; step nd emits
        in_specs=[
            pl.BlockSpec((rows, nd),
                         lambda o: (jnp.minimum(o, nd - 1), 0),
                         memory_space=pltpu.VMEM),
            const((rows, d * d)),
            const((rows, d)),
            const((rows, 1)),
            const((rows, d + 1)),
            const((rows, 3)),
        ],
        out_specs=pl.BlockSpec((rows, 4), lambda o: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tp * tps, d * d), jnp.float32),  # wa_s
            pltpu.VMEM((tp * tps, d), jnp.float32),      # wb_s
            pltpu.VMEM((tp * tps, 1), jnp.float32),      # cnt_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(masks.reshape(nd * masks.shape[1], nd), a2t_f, b2_f,
      gate_f, fbm_f, color_f)
    return out
