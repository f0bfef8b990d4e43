"""Monoscale Bayesian collaborative denoiser — the TPU-native engine.

Reference semantics (src/core/Denoiser.cpp + src/core/DenoisingUnit.cpp),
re-architected for XLA: instead of the reference's sequential per-pixel loop
with variable-length similar-patch lists, per-thread scratch images and
order-dependent skip marking, every interior pixel is processed in fixed-
shape batched form:

1.  For each of the (2b+1)^2 window offsets o, a per-pixel chi^2 histogram
    distance map between pixel x and x+o (DenoisingUnit.cpp:360-386:
    bins with h1+h2 <= 1 are skipped), then patch distances via a
    (2r+1)^2 box filter of the per-pixel numerators and skipped-bin counts
    (patch distance = summed numerator / total non-skipped bins,
    DenoisingUnit.cpp:336-358). This replaces the reference's per-pixel
    CUDA kernel launches (CudaHistogramDistance.cu:214-239) with one
    batched computation for the whole image.
2.  The similar set is the fixed-size boolean mask D <= threshold over
    offsets, restricted to the interior (the reference truncates the
    search window at a patchRadius border, DeepImage.hpp:112-120, and
    only denoises interior centers, Denoiser.cpp:136-146).
3.  Masked patch statistics (27-dim mean, 27x27 covariance with 1/(n-1),
    block-diagonal noise covariance mean) as batched contractions
    (DenoisingUnit.cpp:400-419, 500-536).
4.  Two-step Bayesian MAP filter (DenoisingUnit.cpp:421-453):
      step 1: clamp eigenvalues of (Cemp - N) at 0, invert (Cc + N) with
              eigenvalue floor minEigenValue, A1 = I - N (Cc+N)^-1.
      step 2: the denoised patches are the affine image A1 x_i + b1 of the
              noisy ones, so their empirical mean equals m and their
              empirical covariance equals A1 Cemp A1^T in exact arithmetic
              (the reference recomputes both numerically; we use the closed
              form — no eigenvalue clamp in step 2, matching
              DenoisingUnit.cpp:445-446). Then A2 = I - N (A1 Cemp A1^T+N)^-1
              and every candidate patch is filtered as A2 x_i + N inv2 m.
5.  Pixels whose similar set is smaller than 3(2r+1)^2+1 fall back to the
    mean patch over the set, deposited at the main patch location only
    (DenoisingUnit.cpp:182-191, 455-481). Note that mean patch is exactly
    the masked mean m.
6.  Deterministic scatter-add aggregation of every filtered candidate patch
    at the candidate's location plus an estimate count, finalized as
    sum/count (DenoisingUnit.cpp:672-693, Denoiser.cpp:434-470). This is
    bitwise-deterministic and artifact-free, equivalent to the reference's
    best-quality -m 0 path; the -r/-m order-dependent heuristics exist only
    to mitigate artifacts of its sequential skipping and are intentionally
    not reproduced (documented divergence).

The image is processed in fixed-size tiles with a halo of
(searchWindowRadius + patchRadius) pixels so arbitrarily large frames run
in bounded memory; tiles are scanned sequentially on one device (the
parallel layer shards tiles/frames across a mesh).
"""

from __future__ import annotations

import contextlib
import math
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bcd_tpu.ops.cov3x3 import blockdiag_expand, cov6_to_mat3
from bcd_tpu.params import DenoiserParameters

HIGHEST = jax.lax.Precision.HIGHEST


# In-scale progress reporting (reference Denoiser.cpp:179-192: atomic pixel
# counter + integer-percent callback from thread 0). The engine's scan emits
# one host callback per tile chunk via jax.debug.callback; the active
# consumer is registered here because jitted functions cannot close over
# Python callables as arguments.
_progress_consumer: Optional[Callable[[float], None]] = None


def _injit_callbacks_supported() -> bool:
    """Whether jax.debug.callback inside jit is safe on this backend.

    On experimental tunneled platforms (axon remote TPU) XLA compilation
    of a module containing host callbacks HANGS indefinitely — measured: a
    64x64 engine variant with one debug.callback per tile chunk never
    finished compiling in 25 minutes, while the callback-free twin
    compiled in ~30 s. Only first-class backends get in-jit per-chunk
    progress; everything else falls back to host-side progress at scale
    boundaries (multiscale's 4^s mapper still reports per-scale steps).
    Override with BCD_INJIT_PROGRESS=0/1 for testing."""
    import os

    forced = os.environ.get("BCD_INJIT_PROGRESS")
    if forced is not None:
        return forced not in ("0", "false")
    return jax.default_backend() in ("cpu", "tpu", "gpu", "cuda", "rocm")


@contextlib.contextmanager
def progress_scope(callback: Callable[[float], None]):
    """Route in-scale progress fractions (monotone, in [0, 1]) to
    ``callback`` for the duration of the scope."""
    global _progress_consumer
    prev, _progress_consumer = _progress_consumer, callback
    try:
        yield
    finally:
        _progress_consumer = prev


def _emit_progress(done, total):
    cb = _progress_consumer
    if cb is not None:
        cb(float(done) / float(total))


class MonoscaleConfig(NamedTuple):
    """Static (compile-time) configuration of the engine."""

    patch_radius: int = 1
    search_radius: int = 6
    tile: int = 32  # core tile side, in pixels
    eigh_impl: str = "jacobi"  # "jacobi" (batched fixed-schedule, TPU-fast)
    #                            or "lax" (jnp.linalg.eigh)
    use_pallas: bool = False  # fused solve+filter kernel for the per-pixel
    #                           hot path (ops/solve_filter_pallas.py)
    use_fused: bool = False  # fully fused K1->K2->K4 spatial pipeline
    #                          (core/fused.py): candidates never leave VMEM
    solve_sweeps: int = 4  # Jacobi sweeps in the fused clamp (accuracy knob:
    #                        4 is 4e-5 output-RMSE from sweeps=6, well inside
    #                        the 1e-4 oracle budget; measured on v5e)
    report_progress: bool = False  # emit one host progress callback per
    #                                tile chunk (jax.debug.callback into
    #                                progress_scope's consumer)
    skip_stride: int = 1  # solve only every skip_stride-th center (both
    #                       axes): the deterministic analog of the
    #                       reference's skip-marking speed heuristic
    #                       (DenoisingUnit.cpp:163-173). 1 = exact -m 0
    #                       semantics; must stay <= 2*patch_radius+1 so the
    #                       patch aggregation still covers every pixel.
    tile_batch: int = 1  # tiles processed together per scan step (bigger
    #                      XLA op shapes; memory grows linearly)
    collect_stats: bool = False  # also accumulate (main-path, fallback)
    #                              pixel counts on device — the analog of
    #                              the reference's DenoisingStatistics
    #                              counters (DenoisingUnit.cpp:56-69)

    @property
    def halo(self) -> int:
        if self.use_fused:
            # the fused pipeline pads the halo to the next multiple of 8
            # STRICTLY above b + r: the tile side tp = tile + 2*halo is
            # then a multiple of 8, which makes the (tp, tp) slab's
            # row-major reshape the flat kernel layout with every dynamic
            # window offset provably 8-aligned (ops/fused_pallas.pm_halo)
            from bcd_tpu.ops.fused_pallas import pm_halo

            return pm_halo(self.patch_radius, self.search_radius)
        return self.patch_radius + self.search_radius

    @property
    def k(self) -> int:  # patch side
        return 2 * self.patch_radius + 1

    @property
    def npx(self) -> int:  # pixels per patch
        return self.k * self.k

    @property
    def d(self) -> int:  # color patch dimension
        return 3 * self.npx

    @property
    def n_offsets(self) -> int:
        return (2 * self.search_radius + 1) ** 2


def _offsets(cfg: MonoscaleConfig) -> np.ndarray:
    b = cfg.search_radius
    dy, dx = np.meshgrid(np.arange(-b, b + 1), np.arange(-b, b + 1), indexing="ij")
    return np.stack([dy.ravel(), dx.ravel()], axis=1).astype(np.int32)


def _self_offset_index(cfg: MonoscaleConfig) -> int:
    b = cfg.search_radius
    return (2 * b + 1) * b + b


def _stride_center_mask(cfg: MonoscaleConfig, rows_g, cols_g, height, width):
    """Solved-center mask for ``skip_stride`` > 1 (broadcasts over the
    given global row/column index arrays).

    Deterministic replacement for the reference's order-dependent skip
    marking (Denoiser.cpp:161-162 + DenoisingUnit.cpp:163-173, 690): solve
    centers on a regular stride grid, anchored so the FIRST and LAST
    interior row/column are always centers. With stride <= 2r+1 every
    interior pixel lies within patch_radius of a solved center, so the
    patch scatter covers the whole image; the estimate-count normalization
    already averages whatever coverage each pixel gets."""
    s = cfg.skip_stride
    if s <= 1:
        return None
    assert s <= cfg.k, (s, cfg.k)
    r = cfg.patch_radius

    def on(v, size):
        return ((v - r) % s == 0) | (v == size - 1 - r)

    return on(rows_g, height) & on(cols_g, width)


def _patchify(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(H, W, C) -> (H-2r, W-2r, (2r+1)^2 * C): per-pixel patch vectors,
    patch-pixel-major (line then column), channel innermost — the
    reference's color patch vector layout (DenoisingUnit.cpp:483-498)."""
    h, w = img.shape[:2]
    k = 2 * radius + 1
    slices = [
        img[dy : h - 2 * radius + dy, dx : w - 2 * radius + dx]
        for dy in range(k)
        for dx in range(k)
    ]
    return jnp.concatenate(slices, axis=-1)


def _zeros_like_varying(shape, like: jnp.ndarray) -> jnp.ndarray:
    """Zeros that inherit ``like``'s device-varying type: under shard_map,
    a plain jnp.zeros is an unvarying (replicated) constant and cannot be a
    scan carry that gets updated with per-shard data."""
    return jnp.zeros(shape, like.dtype) + like.reshape(-1)[0] * 0


def _box_sum(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """Valid-mode k x k box sum over the two leading spatial dims."""
    out = img
    for axis in (0, 1):
        n = out.shape[axis]
        idx = [slice(None)] * out.ndim
        acc = None
        for s in range(k):
            idx[axis] = slice(s, n - k + 1 + s)
            piece = out[tuple(idx)]
            acc = piece if acc is None else acc + piece
        out = acc
    return out


def _distance_masks(cfg, histo_pad, nb_pad, gy, gx, ly, lx, core_h, core_w,
                    height, width, threshold):
    """Boolean similar-patch masks for one tile.

    Returns (n_offsets, T, T) float32 masks. Distances follow
    DenoisingUnit.cpp histogramPatchDistance exactly; candidates outside
    the *global* interior are rejected (window truncation); the self offset
    is always selected for valid centers (its distance is identically 0).
    Centers are additionally restricted to the owned core (ly/lx local tile
    origin, core_h/core_w owned-slab size) so sharded slabs never denoise
    centers owned by a neighbor."""
    t = cfg.tile
    r, b, h = cfg.patch_radius, cfg.search_radius, cfg.halo
    offs = jnp.asarray(_offsets(cfg))

    # center-side slabs, (T+2r, T+2r, ...)
    hist_c = jax.lax.dynamic_slice(
        histo_pad, (h - r, h - r, 0), (t + 2 * r, t + 2 * r, histo_pad.shape[-1])
    )
    nb_c = jax.lax.dynamic_slice(nb_pad, (h - r, h - r), (t + 2 * r, t + 2 * r))

    def one_offset(o):
        dy, dx = o[0], o[1]
        hist_n = jax.lax.dynamic_slice(
            histo_pad,
            (h - r + dy, h - r + dx, 0),
            (t + 2 * r, t + 2 * r, histo_pad.shape[-1]),
        )
        nb_n = jax.lax.dynamic_slice(
            nb_pad, (h - r + dy, h - r + dx), (t + 2 * r, t + 2 * r)
        )
        hsum = hist_c + hist_n
        keep = hsum > 1.0  # "TEMPORARY" bin gate, DenoisingUnit.cpp:379
        diff = nb_n[..., None] * hist_c - nb_c[..., None] * hist_n
        denom = jnp.where(keep, nb_c[..., None] * nb_n[..., None] * hsum, 1.0)
        num_px = jnp.sum(jnp.where(keep, diff * diff / denom, 0.0), axis=-1)
        cnt_px = jnp.sum(keep, axis=-1).astype(jnp.float32)
        num = _box_sum(num_px, cfg.k)  # (T, T)
        cnt = _box_sum(cnt_px, cfg.k)
        dist = jnp.where(cnt > 0, num / jnp.maximum(cnt, 1.0), jnp.inf)

        rows = gy + jnp.arange(t)[:, None] + dy
        cols = gx + jnp.arange(t)[None, :] + dx
        in_interior = (
            (rows >= r) & (rows <= height - 1 - r)
            & (cols >= r) & (cols <= width - 1 - r)
        )
        return (dist <= threshold) & in_interior

    masks = jax.vmap(one_offset)(offs)  # (O, T, T) bool (vmap-native layout)

    rows = gy + jnp.arange(t)[:, None]
    cols = gx + jnp.arange(t)[None, :]
    owned = ((ly + jnp.arange(t))[:, None] < core_h) & (
        (lx + jnp.arange(t))[None, :] < core_w
    )
    center_valid = (
        (rows >= r) & (rows <= height - 1 - r)
        & (cols >= r) & (cols <= width - 1 - r)
        & owned
    )
    stride = _stride_center_mask(cfg, rows, cols, height, width)
    if stride is not None:
        center_valid = center_valid & stride
    masks = masks.at[_self_offset_index(cfg)].set(center_valid)
    masks = masks & center_valid[None]
    return masks.astype(jnp.float32), center_valid


def _sym_apply(mats: jnp.ndarray, fn, impl: str = "jacobi") -> jnp.ndarray:
    """V diag(fn(lambda)) V^T for a batch of symmetric matrices."""
    if impl == "jacobi":
        from bcd_tpu.ops.sym_eigh import sym_apply

        return sym_apply(mats, fn)
    lam, vec = jnp.linalg.eigh(mats)
    return jnp.einsum(
        "...ij,...j,...kj->...ik", vec, fn(lam), vec, precision=HIGHEST
    )


def denoise_tile(cfg: MonoscaleConfig, color_pad, nb_pad, histo_pad, pixcov_pad,
                 gy, gx, ly, lx, core_h, core_w, height, width,
                 threshold, min_eigen):
    """Denoise one tile. Inputs are (T+2h, T+2h, C) slabs; returns
    (out_sum (T+2h, T+2h, 3), count (T+2h, T+2h)) apron-inclusive
    contributions for global overlap-add."""
    if cfg.use_fused:
        from bcd_tpu.core.fused import denoise_tile_fused

        return denoise_tile_fused(
            cfg, color_pad, nb_pad, histo_pad, pixcov_pad,
            gy, gx, ly, lx, core_h, core_w, height, width,
            threshold, min_eigen,
            interpret=jax.default_backend() == "cpu",
            sweeps=cfg.solve_sweeps,
            collect_stats=cfg.collect_stats,
        )

    t, r, b, h = cfg.tile, cfg.patch_radius, cfg.search_radius, cfg.halo
    npx, d = cfg.npx, cfg.d
    tp = t + 2 * h
    offs = jnp.asarray(_offsets(cfg))

    masks_o, center_valid = _distance_masks(
        cfg, histo_pad, nb_pad[..., 0], gy, gx, ly, lx, core_h, core_w,
        height, width, threshold,
    )  # (O, T, T)

    n = jnp.sum(masks_o, axis=0)  # (T, T)
    is_main = (n >= d + 1) & center_valid
    is_fb = (~is_main) & center_valid
    n_safe = jnp.maximum(n, 1.0)

    main_f = is_main.astype(color_pad.dtype)
    fb_f = is_fb.astype(color_pad.dtype)
    n_off = cfg.n_offsets
    k = cfg.k
    offs_np = _offsets(cfg)

    if cfg.use_pallas:
        # fused kernel: everything from the second moment to the filtered
        # candidates in one VMEM-resident pass, pixels on the lane axis.
        # All marshaling is channels-leading so no large transposes occur
        # on the way IN (one transpose remains on the way out, feeding the
        # pixel-major scatter).
        from bcd_tpu.ops.solve_filter_pallas import LANES, solve_filter

        p_raw = t * t
        p_pad = -(-p_raw // LANES) * LANES
        pad_px = p_pad - p_raw
        padp = lambda x: jnp.pad(  # noqa: E731
            x, ((0, 0),) * (x.ndim - 1) + ((0, pad_px),))

        def patchify_lead(img):  # (tp, tp, C) -> (k*k*C, E, E)
            chans = [
                img[dy : tp - 2 * r + dy, dx : tp - 2 * r + dx, c]
                for dy in range(k)
                for dx in range(k)
                for c in range(img.shape[-1])
            ]
            return jnp.stack(chans, axis=0)

        cp_lead = patchify_lead(color_pad)  # (d, E, E)
        cv_lead = patchify_lead(pixcov_pad)  # (npx*6, E, E)

        def cand_stack(lead):
            rows = lead.shape[0]
            return jnp.stack(
                [jax.lax.slice(lead, (0, dy + b, dx + b),
                               (rows, dy + b + t, dx + b + t))
                 for dy, dx in offs_np], axis=0,
            ).reshape(n_off, rows, p_raw)

        c_t = padp(cand_stack(cp_lead))  # (O, d, P)
        cv_t = cand_stack(cv_lead)  # (O, 54, t*t)
        mask_flat = masks_o.reshape(n_off, p_raw)
        mask_t = padp(mask_flat)
        inv_n = (1.0 / n_safe).reshape(1, p_raw)
        m_flat = jnp.sum(c_t[..., :p_raw] * mask_flat[:, None, :], axis=0) \
            * inv_n  # (d, t*t)
        noise_t = padp(
            jnp.sum(cv_t * mask_flat[:, None, :], axis=0) * inv_n)
        n_t = jnp.pad(n_safe.reshape(1, p_raw), ((0, 0), (0, pad_px)),
                      constant_values=1.0)
        m_t = padp(m_flat)

        field_t = solve_filter(
            c_t, mask_t, noise_t, n_t, m_t, min_eigen, npx=npx,
            interpret=jax.default_backend() == "cpu",
        )
        # gate + fallback in the lane layout, then one transpose for the
        # pixel-major scatter
        field_t = field_t[..., :p_raw] * main_f.reshape(1, 1, p_raw)
        field_t = field_t.at[_self_offset_index(cfg)].add(
            fb_f.reshape(1, p_raw) * m_flat)
        field = jnp.moveaxis(field_t, -1, 0).reshape(t, t, n_off, d)
        masks = jnp.moveaxis(masks_o, 0, -1)  # (T, T, O) for the count path
    else:
        masks = jnp.moveaxis(masks_o, 0, -1)  # (T, T, O)
        # candidate patch stacks over the extended core: patchifying the
        # whole (tp, tp) slab yields (tp-2r)^2 = (t+2b)^2 = E^2 patch
        # vectors whose index (i, j) is the patch at padded coord (r+i, r+j)
        cp_ext = _patchify(color_pad, r)  # (E, E, d)
        cv_ext = _patchify(pixcov_pad, r)  # (E, E, npx*6)

        def cand_slice(arr, o):
            return jax.lax.dynamic_slice(
                arr, (o[0] + b, o[1] + b, 0), (t, t, arr.shape[-1])
            )

        # offset axis INNER (T, T, O, C): the moment/filter contractions
        # below are then clean (T*T)-batched GEMMs
        C = jax.vmap(partial(cand_slice, cp_ext), out_axes=2)(offs)
        CV = jax.vmap(partial(cand_slice, cv_ext), out_axes=2)(offs)

        mk = masks[..., None]  # (T, T, O, 1)
        m = jnp.sum(mk * C, axis=2) / n_safe[..., None]  # (T, T, d)
        noise6 = jnp.sum(mk * CV, axis=2).reshape(t, t, npx, 6) \
            / n_safe[..., None, None]
        noise = cov6_to_mat3(noise6)  # (T, T, npx, 3, 3)
        noise_dense = blockdiag_expand(noise)  # (T, T, d, d)

        # second moment via batched matmul over the offset axis (MXU work)
        m2mat = jnp.einsum("twok,twol->twkl", mk * C, C, precision=HIGHEST)
        nm1 = jnp.maximum(n - 1.0, 1.0)[..., None, None]
        cemp = (m2mat - n[..., None, None] * m[..., :, None] * m[..., None, :]) / nm1

        # step 1 (DenoisingUnit.cpp:421-436)
        clamped = _sym_apply(cemp - noise_dense,
                             lambda lam: jnp.maximum(lam, 0.0), cfg.eigh_impl)
        inv1 = _sym_apply(
            clamped + noise_dense,
            lambda lam: 1.0 / jnp.maximum(lam, min_eigen), cfg.eigh_impl,
        )
        n_inv1 = jnp.einsum("twkl,twlj->twkj", noise_dense, inv1,
                            precision=HIGHEST)
        eye = jnp.eye(d, dtype=color_pad.dtype)
        a1 = eye - n_inv1

        # step 2 (DenoisingUnit.cpp:438-453), closed form on the affine family
        cov2 = jnp.einsum(
            "twkl,twlj,twmj->twkm", a1, cemp, a1, precision=HIGHEST
        )
        inv2 = _sym_apply(
            cov2 + noise_dense,
            lambda lam: 1.0 / jnp.maximum(lam, min_eigen), cfg.eigh_impl,
        )
        n_inv2 = jnp.einsum("twkl,twlj->twkj", noise_dense, inv2,
                            precision=HIGHEST)
        a2 = eye - n_inv2
        b2 = jnp.einsum("twkl,twl->twk", n_inv2, m, precision=HIGHEST)

        # filtered candidate patches for every offset: A2 x + b2
        x2 = (
            jnp.einsum("twol,twkl->twok", C, a2, precision=HIGHEST)
            + b2[:, :, None, :]
        )  # (T, T, O, d)

        field = mk * main_f[..., None, None] * x2
        field = field.at[:, :, _self_offset_index(cfg), :].add(
            fb_f[..., None] * m)

    self_o = _self_offset_index(cfg)
    cnt_field = masks * main_f[..., None]
    cnt_field = cnt_field.at[:, :, self_o].add(fb_f)

    # scatter-add every candidate's patch-field at the candidate center via
    # one deterministic segment-sum over a static index map (replaces the
    # reference's sequential per-patch scatter, DenoisingUnit.cpp:672-693)
    py, px = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
    seg = (
        (h + py[:, :, None] + offs_np[None, None, :, 0]) * tp
        + (h + px[:, :, None] + offs_np[None, None, :, 1])
    ).reshape(-1)  # (T*T*O,) static
    seg_ids = jnp.asarray(seg, jnp.int32)
    facc = jax.ops.segment_sum(
        field.reshape(-1, d), seg_ids, num_segments=tp * tp
    ).reshape(tp, tp, d)
    cacc = jax.ops.segment_sum(
        cnt_field.reshape(-1), seg_ids, num_segments=tp * tp
    ).reshape(tp, tp)

    # fan out: pixel y receives channel-group q of the candidate at y - q
    out_sum = jnp.zeros((tp, tp, 3), color_pad.dtype)
    count = jnp.zeros((tp, tp), color_pad.dtype)
    for qi, (qy, qx) in enumerate(
        (qy, qx) for qy in range(-r, r + 1) for qx in range(-r, r + 1)
    ):
        shifted = jnp.roll(facc[..., 3 * qi : 3 * qi + 3], (qy, qx), axis=(0, 1))
        out_sum = out_sum + shifted
        count = count + jnp.roll(cacc, (qy, qx), axis=(0, 1))
    # rolls wrap across the apron edge; candidates live in [h-b, h+t+b) and
    # |q| <= r so writes stay within [h-b-r, h+t+b+r) = [0, tp): no wrap of
    # real data can occur — the wrapped lanes are zero.
    if cfg.collect_stats:
        return out_sum, count, jnp.stack([jnp.sum(main_f), jnp.sum(fb_f)])
    return out_sum, count


def denoise_accumulate(cfg: MonoscaleConfig, color_p, nb_p, histo_p, cov_p,
                       threshold, min_eigen,
                       origin=(0, 0), global_shape=None):
    """Run the engine over a halo-padded slab and return the *unnormalized*
    ``(out_sum, count)`` accumulators, apron-inclusive.

    Inputs are (core_h + 2*halo, core_w + 2*halo, C): the owned core plus a
    halo that carries either zeros (single-device, at image borders) or the
    neighbor's real pixels (spatially-sharded frames). ``origin`` is the
    core's top-left corner in global image coordinates, ``global_shape`` the
    full image size — interior/window-truncation masks are evaluated
    globally, so sharded slabs produce exactly the contributions of a
    single-device run. The returned (core_h + 2*halo, core_w + 2*halo[, 3])
    accumulators hold, in the apron, contributions that belong to
    neighboring slabs: overlap-add them there before normalizing."""
    t, h = cfg.tile, cfg.halo
    core_h, core_w = color_p.shape[0] - 2 * h, color_p.shape[1] - 2 * h
    g_h, g_w = global_shape if global_shape is not None else (core_h, core_w)
    row0, col0 = origin
    ny = math.ceil(core_h / t)
    nx = math.ceil(core_w / t)
    hp, wp = ny * t, nx * t

    pixcov_p = cov_p / nb_p  # Denoiser.cpp:357-373

    def pad_to_grid(img, fill=0.0):
        return jnp.pad(
            img,
            ((0, hp - core_h), (0, wp - core_w), (0, 0)),
            constant_values=fill,
        )

    color_g = pad_to_grid(color_p)
    nb_g = pad_to_grid(nb_p, 1.0)  # avoid 0-division in distance denominators
    histo_g = pad_to_grid(histo_p)
    pixcov_g = pad_to_grid(pixcov_p)

    tile_origins = jnp.asarray(
        [(ty * t, tx * t) for ty in range(ny) for tx in range(nx)], dtype=jnp.int32
    )

    tp = t + 2 * h

    tb = max(1, cfg.tile_batch)
    n_tiles = tile_origins.shape[0]
    if n_tiles % tb:  # pad with repeats of the last tile; the duplicate
        # contributions are avoided by masking duplicates below
        reps = jnp.tile(tile_origins[-1:], ((-n_tiles) % tb, 1))
        dup_mask = jnp.concatenate([
            jnp.ones((n_tiles,), jnp.float32),
            jnp.zeros(((-n_tiles) % tb,), jnp.float32)])
        tile_origins = jnp.concatenate([tile_origins, reps])
    else:
        dup_mask = jnp.ones((n_tiles,), jnp.float32)
    chunked = tile_origins.reshape(-1, tb, 2)
    mask_chunked = dup_mask.reshape(-1, tb)

    def one_tile(torigin):
        ly, lx = torigin[0], torigin[1]
        slabs = [
            jax.lax.dynamic_slice(a, (ly, lx, 0), (tp, tp, a.shape[-1]))
            for a in (color_g, nb_g, histo_g, pixcov_g)
        ]
        return denoise_tile(
            cfg, *slabs, row0 + ly, col0 + lx, ly, lx, core_h, core_w,
            g_h, g_w, threshold, min_eigen,
        )

    n_chunks = chunked.shape[0]

    def body(carry, chunk):
        out_acc, cnt_acc, stats_acc = carry
        origins, valid, chunk_i = chunk
        res = jax.vmap(one_tile)(origins)  # (tb, tp, tp, 3/1)
        if cfg.collect_stats:
            outs, cnts, tstats = res
            stats_acc = stats_acc + jnp.sum(tstats * valid[:, None], axis=0)
        else:
            outs, cnts = res
        outs = outs * valid[:, None, None, None]
        cnts = cnts * valid[:, None, None]
        for i in range(tb):  # sequential overlap-add (writes may overlap)
            ly, lx = origins[i, 0], origins[i, 1]
            cur = jax.lax.dynamic_slice(out_acc, (ly, lx, 0), (tp, tp, 3))
            out_acc = jax.lax.dynamic_update_slice(
                out_acc, cur + outs[i], (ly, lx, 0))
            curc = jax.lax.dynamic_slice(cnt_acc, (ly, lx), (tp, tp))
            cnt_acc = jax.lax.dynamic_update_slice(
                cnt_acc, curc + cnts[i], (ly, lx))
        if cfg.report_progress:
            # ordered so fractions arrive monotone (reference parity:
            # integer-percent callbacks within a scale, Denoiser.cpp:179-192)
            jax.debug.callback(
                _emit_progress, chunk_i + 1, n_chunks, ordered=True)
        return (out_acc, cnt_acc, stats_acc), None

    out0 = _zeros_like_varying((hp + 2 * h, wp + 2 * h, 3), color_p)
    cnt0 = _zeros_like_varying((hp + 2 * h, wp + 2 * h), color_p)
    stats0 = _zeros_like_varying((2,), color_p)
    (out_acc, cnt_acc, stats_acc), _ = jax.lax.scan(
        body, (out0, cnt0, stats0),
        (chunked, mask_chunked, jnp.arange(n_chunks, dtype=jnp.int32)))

    trimmed = (
        out_acc[: core_h + 2 * h, : core_w + 2 * h],
        cnt_acc[: core_h + 2 * h, : core_w + 2 * h],
    )
    if cfg.collect_stats:
        return trimmed + (stats_acc,)
    return trimmed


@partial(jax.jit, static_argnames=("cfg",))
def _denoise_image(cfg: MonoscaleConfig, color, nb, histo, cov,
                   threshold, min_eigen):
    height, width = color.shape[:2]
    h = cfg.halo

    def pad(img, fill=0.0):
        return jnp.pad(img, ((h, h), (h, h), (0, 0)), constant_values=fill)

    res = denoise_accumulate(
        cfg, pad(color), pad(nb, 1.0), pad(histo), pad(cov),
        threshold, min_eigen, origin=(0, 0), global_shape=(height, width),
    )
    out_acc, cnt_acc = res[0], res[1]
    out = out_acc[h : h + height, h : h + width]
    cnt = cnt_acc[h : h + height, h : h + width]
    final = jnp.where(
        cnt[..., None] > 0, out / jnp.maximum(cnt, 1.0)[..., None], 0.0)
    if cfg.collect_stats:
        return final, res[2]
    return final


def auto_engine_config(params: DenoiserParameters,
                       tile: int | None = None,
                       use_pallas: bool | None = None,
                       tile_batch: int | None = None,
                       use_fused: bool | None = None,
                       skip_stride: int = 1,
                       report_progress: bool = False,
                       collect_stats: bool = False) -> MonoscaleConfig:
    """Resolve the engine configuration for the current backend — the ONE
    place engine selection happens, shared by ``denoise_monoscale`` and the
    scale-out drivers (bcd_tpu/parallel/) so sharded slabs run exactly the
    same (fast) engine as single-device frames."""
    on_accel = jax.default_backend() != "cpu"
    if use_fused is None:
        # the fused spatial kernels only support the reference's
        # patch_radius=1 geometry so far (d = 27); other radii take the
        # batched-XLA path. The pm layout also needs tile % 16 == 0
        # (compact rows must tile into whole 128-lane blocks).
        use_fused = (on_accel and params.patch_radius == 1
                     and (tile is None or tile % 16 == 0))
    if use_pallas is None:
        # any accelerator backend (incl. tunneled TPU platforms); the CPU
        # backend would only run the kernel interpreted, which is slower
        # than the XLA path
        use_pallas = on_accel and not use_fused
    if tile_batch is None:
        tile_batch = 16 if use_pallas else 1
    # default tile: 48 on the fused accelerator path (best measured
    # throughput — halo overhead 1.72x vs 2.16x at 32; 64 exceeds VMEM),
    # 32 elsewhere
    return MonoscaleConfig(
        patch_radius=params.patch_radius,
        search_radius=params.search_window_radius,
        tile=tile or (48 if use_fused else 32),
        use_pallas=use_pallas,
        use_fused=use_fused,
        tile_batch=tile_batch,
        skip_stride=skip_stride,
        report_progress=report_progress,
        collect_stats=collect_stats,
    )


def denoise_monoscale(color, nb, histo, cov, params: DenoiserParameters,
                      tile: int | None = None,
                      use_pallas: bool | None = None,
                      tile_batch: int | None = None,
                      use_fused: bool | None = None,
                      skip_stride: int = 1,
                      progress_callback: Callable[[float], None] | None = None,
                      stats=None):
    """Denoise one scale. Arrays are (H, W, C) float32 (numpy or jax);
    returns a jax array (H, W, 3). On accelerator backends the fully fused
    K1->K2->K4 spatial pipeline is the default (measured fastest on v5e);
    pass ``use_fused``/``use_pallas``/``tile_batch`` to override.

    ``stats``: an optional :class:`bcd_tpu.chrono.PhaseStats` — when given,
    the scale is timed (with a device sync, so enabling stats adds one
    blocking readback per scale) and the reference's DenoisingStatistics
    counters (DenoisingUnit.cpp:56-69: managed pixels, main-path solves,
    mean-patch fallbacks) are accumulated on device and recorded."""
    in_jit_progress = (progress_callback is not None
                       and _injit_callbacks_supported())
    cfg = auto_engine_config(
        params, tile=tile, use_pallas=use_pallas, tile_batch=tile_batch,
        use_fused=use_fused, skip_stride=skip_stride,
        report_progress=in_jit_progress,
        collect_stats=stats is not None,
    )
    args = (
        cfg,
        jnp.asarray(color, jnp.float32),
        jnp.asarray(nb, jnp.float32),
        jnp.asarray(histo, jnp.float32),
        jnp.asarray(cov, jnp.float32),
        jnp.float32(params.histogram_distance_threshold),
        jnp.float32(params.min_eigen_value),
    )

    def run():
        res = _denoise_image(*args)
        if not cfg.collect_stats:
            return res
        out, counts = res
        n_main, n_fb = (int(x) for x in np.asarray(counts))
        stats.count("pixels: main-path solves", n_main)
        stats.count("pixels: fallback (mean patch)", n_fb)
        stats.count("pixels: managed", n_main + n_fb)
        return out

    ctx = (stats.phase(f"denoise {color.shape[1]}x{color.shape[0]}")
           if stats is not None else contextlib.nullcontext())
    with ctx:
        if progress_callback is None:
            out = run()
        elif not in_jit_progress:
            # host-side fallback (unsupported-callback platforms): one
            # 0 -> 1 step per scale, synced so 1.0 means the work is done
            progress_callback(0.0)
            out = run()
            float(jnp.sum(out))
            progress_callback(1.0)
        else:
            with progress_scope(progress_callback):
                out = run()
                # drain the ordered callbacks before leaving the scope
                # (dispatch is async; a scalar readback is the only reliable
                # sync on the axon tunnel, where block_until_ready can
                # return early)
                float(jnp.sum(out))
        if stats is not None:
            float(jnp.sum(out))  # sync so the phase timer sees real work
    return out
