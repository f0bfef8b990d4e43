"""Trusted NumPy oracle for the BCD reference semantics.

A direct, slow, float64 re-statement of the reference algorithm used as the
golden baseline for the TPU engine (the reference C++ cannot be built here:
its vendored submodules are stripped). Every function cites the reference
code it mirrors. Small images only — this is O(H*W*169*27^2) Python/numpy.

Semantics notes (all verified against the reference source):

- Patch centers are restricted to the interior [r, H-1-r] x [r, W-1-r]
  (Denoiser.cpp:136-146), so candidate patches are always fully in-bounds.
- The search window around a center is truncated at that same interior
  (PixelWindow with border=patchRadius, DeepImage.hpp:112-120).
- Histogram patch distance: chi^2-like per bin, skipping bins with
  b1+b2 <= 1, normalized by the count of non-skipped bins over the whole
  patch (DenoisingUnit.cpp:336-386).
- Deterministic full denoising: every interior pixel is processed
  (equivalent to the reference's -m 0 best-quality path; the -r/-m
  order-dependent skip heuristics are intentionally not reproduced).
"""

from __future__ import annotations

import numpy as np

# covariance channel order xx, yy, zz, yz, xz, xy (CovarianceMatrix.h:18-28)
COV_XX, COV_YY, COV_ZZ, COV_YZ, COV_XZ, COV_XY = range(6)


def cov6_to_mat3(c):
    """(..., 6) -> (..., 3, 3) symmetric matrix."""
    c = np.asarray(c)
    m = np.empty(c.shape[:-1] + (3, 3), dtype=c.dtype)
    m[..., 0, 0] = c[..., COV_XX]
    m[..., 1, 1] = c[..., COV_YY]
    m[..., 2, 2] = c[..., COV_ZZ]
    m[..., 1, 2] = m[..., 2, 1] = c[..., COV_YZ]
    m[..., 0, 2] = m[..., 2, 0] = c[..., COV_XZ]
    m[..., 0, 1] = m[..., 1, 0] = c[..., COV_XY]
    return m


# ---------------------------------------------------------------------------
# SamplesAccumulator (SamplesAccumulator.cpp:44-141)
# ---------------------------------------------------------------------------

def accumulate_samples(samples, nb_of_bins=20, gamma=2.2, max_value=2.5,
                       weights=None):
    """samples: (H, W, S, C>=3) float. Returns dict with nbOfSamples (H,W,1),
    mean (H,W,3), cov (H,W,6), histo (H,W,3*bins)."""
    samples = np.asarray(samples, dtype=np.float64)[..., :3]
    H, W, S, _ = samples.shape
    if weights is None:
        weights = np.ones((H, W, S), dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)

    wsum = w.sum(axis=2)
    w2sum = (w * w).sum(axis=2)
    wc = (w[..., None] * samples).sum(axis=2)

    r, g, b = samples[..., 0], samples[..., 1], samples[..., 2]
    cov = np.stack(
        [
            (w * r * r).sum(2), (w * g * g).sum(2), (w * b * b).sum(2),
            (w * g * b).sum(2), (w * r * b).sum(2), (w * r * g).sum(2),
        ],
        axis=-1,
    )

    # histogram splat (SamplesAccumulator.cpp:77-105)
    sature_level_gamma = 2.0
    histo = np.zeros((H, W, 3 * nb_of_bins), dtype=np.float64)
    v = np.maximum(samples, 0.0)
    if gamma > 1:
        v = v ** (1.0 / gamma)
    if max_value > 0:
        v = v / max_value
    v = np.minimum(v, sature_level_gamma)
    bin_float = v * (nb_of_bins - 2)
    floor_bin = bin_float.astype(np.int64)
    in_bounds = floor_bin < nb_of_bins - 2
    floor_bin = np.where(in_bounds, floor_bin, nb_of_bins - 2)
    ceil_w = np.where(
        in_bounds,
        bin_float - floor_bin,
        (v - 1.0) / (sature_level_gamma - 1.0),
    )
    floor_w = 1.0 - ceil_w
    for line in range(H):
        for col in range(W):
            for s in range(S):
                for ch in range(3):
                    base = ch * nb_of_bins
                    fb = floor_bin[line, col, s, ch]
                    histo[line, col, base + fb] += w[line, col, s] * floor_w[line, col, s, ch]
                    histo[line, col, base + fb + 1] += w[line, col, s] * ceil_w[line, col, s, ch]

    # finalize (computeSampleStatistics, SamplesAccumulator.cpp:110-141)
    inv_wsum = 1.0 / wsum
    mean = wc * inv_wsum[..., None]
    cov = cov * inv_wsum[..., None]
    m0, m1, m2 = mean[..., 0], mean[..., 1], mean[..., 2]
    cov[..., COV_XX] -= m0 * m0
    cov[..., COV_YY] -= m1 * m1
    cov[..., COV_ZZ] -= m2 * m2
    cov[..., COV_YZ] -= m1 * m2
    cov[..., COV_XZ] -= m0 * m2
    cov[..., COV_XY] -= m0 * m1
    bias = 1.0 / (1.0 - w2sum / (wsum * wsum))
    cov = cov * bias[..., None]

    return {
        "nb_of_samples": wsum[..., None],
        "mean": mean,
        "cov": cov,
        "histo": histo,
    }


# ---------------------------------------------------------------------------
# SpikeRemovalFilter (SpikeRemovalFilter.cpp:18-116)
# ---------------------------------------------------------------------------

def spike_removal(color, nb, histo, cov, threshold_factor):
    color = np.asarray(color, dtype=np.float64)
    H, W, _ = color.shape
    r = 1
    pw = 2 * r + 1
    out = [np.array(x, dtype=np.float64, copy=True) for x in (color, nb, histo, cov)]
    src = [np.asarray(x, dtype=np.float64) for x in (color, nb, histo, cov)]

    for line in range(H):
        for col in range(W):
            cl = min(max(line, r), H - 1 - r)
            cc = min(max(col, r), W - 1 - r)
            neigh = src[0][cl - r : cl + r + 1, cc - r : cc + r + 1, :].reshape(-1, 3)
            avg = neigh.mean(axis=0)
            std = np.sqrt(((neigh - avg) ** 2).sum(axis=0) / (neigh.shape[0] - 1))
            dev = np.abs(src[0][line, col] - avg)
            if np.any(dev > threshold_factor * std):
                d = np.abs(neigh[:, None, :] - neigh[None, :, :]).sum(axis=(1, 2))
                mi = int(np.argmin(d))  # argmin keeps first minimum, like the
                # strict '<' comparison in compute3DMedianIndex
                ml = cl - r + mi // pw
                mc = cc - r + mi % pw
                for dst, s in zip(out, src):
                    dst[line, col] = s[ml, mc]
    return tuple(out)


# ---------------------------------------------------------------------------
# Monoscale denoiser (Denoiser.cpp + DenoisingUnit.cpp), -m 0 semantics
# ---------------------------------------------------------------------------

def _histogram_patch_distance(histo, nb, p, c, r, nb_of_bins):
    """DenoisingUnit.cpp:336-386. p/c are (line, col) patch centers."""
    total = 0.0
    nbins_nonzero = 0
    for dl in range(-r, r + 1):
        for dc in range(-r, r + 1):
            h1 = histo[p[0] + dl, p[1] + dc]
            h2 = histo[c[0] + dl, c[1] + dc]
            n1 = nb[p[0] + dl, p[1] + dc, 0]
            n2 = nb[c[0] + dl, c[1] + dc, 0]
            keep = (h1 + h2) > 1.0  # skip bins with b1+b2 <= 1 ("TEMPORARY")
            diff = n2 * h1 - n1 * h2
            denom = np.where(keep, n1 * n2 * (h1 + h2), 1.0)
            terms = np.where(keep, diff * diff / denom, 0.0)
            total += terms.sum()
            nbins_nonzero += int(keep.sum())
    return total / nbins_nonzero if nbins_nonzero else 0.0


def _patch_vector(img, c, r):
    """27-dim color patch vector, pixel-major channel-innermost
    (pickColorPatchesFromColorImage, DenoisingUnit.cpp:483-498)."""
    return img[c[0] - r : c[0] + r + 1, c[1] - r : c[1] + r + 1, :].reshape(-1)


def _clamp_neg_eigenvalues(mat):
    lam, vec = np.linalg.eigh(mat)
    return (vec * np.maximum(lam, 0.0)) @ vec.T


def _inverse_floored(mat, min_eigen):
    lam, vec = np.linalg.eigh(mat)
    return (vec / np.maximum(lam, min_eigen)) @ vec.T


def denoise_monoscale(color, nb, histo, cov, params):
    """Full-quality deterministic monoscale denoise. params is
    bcd_tpu.params.DenoiserParameters (or anything with the same attrs)."""
    color = np.asarray(color, dtype=np.float64)
    nb = np.asarray(nb, dtype=np.float64)
    histo = np.asarray(histo, dtype=np.float64)
    cov = np.asarray(cov, dtype=np.float64)
    H, W, _ = color.shape
    r = params.patch_radius
    b = params.search_window_radius
    thr = params.histogram_distance_threshold
    min_eigen = params.min_eigen_value
    npx = (2 * r + 1) ** 2
    d = 3 * npx
    nb_of_bins = histo.shape[-1]

    pixel_cov = cov / nb  # Denoiser.cpp:357-373

    out_sum = np.zeros((H, W, 3), dtype=np.float64)
    count = np.zeros((H, W), dtype=np.int64)

    for pl in range(r, H - r):
        for pc in range(r, W - r):
            p = (pl, pc)
            # search window truncated to interior (border=patchRadius)
            centers = []
            for cl in range(max(r, pl - b), min(H - 1 - r, pl + b) + 1):
                for cc in range(max(r, pc - b), min(W - 1 - r, pc + b) + 1):
                    if _histogram_patch_distance(
                        histo, nb, p, (cl, cc), r, nb_of_bins
                    ) <= thr:
                        centers.append((cl, cc))
            n = len(centers)

            if n < d + 1:
                # fallback: simple average patch at the main location
                # (denoiseOnlyMainPatch, DenoisingUnit.cpp:455-481)
                mean_patch = np.zeros(d)
                for c in centers:
                    mean_patch += _patch_vector(color, c, r)
                mean_patch /= n
                out_sum[pl - r : pl + r + 1, pc - r : pc + r + 1, :] += (
                    mean_patch.reshape(2 * r + 1, 2 * r + 1, 3)
                )
                count[pl - r : pl + r + 1, pc - r : pc + r + 1] += 1
                continue

            # noise covariance patch mean (computeNoiseCovPatchesMean)
            noise_blocks = np.zeros((npx, 3, 3))
            for c in centers:
                patch_cov = pixel_cov[
                    c[0] - r : c[0] + r + 1, c[1] - r : c[1] + r + 1, :
                ].reshape(npx, 6)
                noise_blocks += cov6_to_mat3(patch_cov)
            noise_blocks /= n

            X = np.stack([_patch_vector(color, c, r) for c in centers])  # (n, d)

            def apply_noise_blockdiag(vecs):
                v = vecs.reshape(vecs.shape[0], npx, 3)
                return np.einsum("qij,nqj->nqi", noise_blocks, v).reshape(
                    vecs.shape[0], d
                )

            def add_noise_blockdiag(mat, sign=1.0):
                m = mat.copy()
                for q in range(npx):
                    m[3 * q : 3 * q + 3, 3 * q : 3 * q + 3] += sign * noise_blocks[q]
                return m

            # ---- step 1 (denoiseSelectedPatchesStep1)
            m1 = X.mean(axis=0)
            Xc = X - m1
            cemp = Xc.T @ Xc / (n - 1)
            clamped = _clamp_neg_eigenvalues(add_noise_blockdiag(cemp, -1.0))
            inv1 = _inverse_floored(add_noise_blockdiag(clamped, +1.0), min_eigen)
            X1 = X - apply_noise_blockdiag(Xc @ inv1.T)

            # ---- step 2 (denoiseSelectedPatchesStep2): stats of the
            # denoised set, no eigenvalue clamp, but the *noisy* patches are
            # re-centered by the denoised mean for the final filter
            m2 = X1.mean(axis=0)
            X1c = X1 - m2
            cemp2 = X1c.T @ X1c / (n - 1)
            inv2 = _inverse_floored(add_noise_blockdiag(cemp2, +1.0), min_eigen)
            Xc2 = X - m2
            X2 = X - apply_noise_blockdiag(Xc2 @ inv2.T)

            # ---- aggregate (aggregateOutputPatches)
            for i, c in enumerate(centers):
                out_sum[
                    c[0] - r : c[0] + r + 1, c[1] - r : c[1] + r + 1, :
                ] += X2[i].reshape(2 * r + 1, 2 * r + 1, 3)
                count[c[0] - r : c[0] + r + 1, c[1] - r : c[1] + r + 1] += 1

    return out_sum / count[..., None]


# ---------------------------------------------------------------------------
# Multiscale pyramid (MultiscaleDenoiser.cpp)
# ---------------------------------------------------------------------------

def downscale_sum(img):
    """2x2 block sum (MultiscaleDenoiser.cpp:243-268); odd trailing
    row/column dropped."""
    img = np.asarray(img, dtype=np.float64)
    H, W = img.shape[:2]
    h, w = H // 2, W // 2
    v = img[: 2 * h, : 2 * w]
    return v[0::2, 0::2] + v[1::2, 0::2] + v[0::2, 1::2] + v[1::2, 1::2]


def downscale_average(img):
    return 0.25 * downscale_sum(img)


def downscale_sample_covariance_sum(cov, nb):
    """Weighted 2x2 sum with w_i = (1/16) * sum(N) / N_i
    (MultiscaleDenoiser.cpp:297-334)."""
    cov = np.asarray(cov, dtype=np.float64)
    nb2 = np.asarray(nb, dtype=np.float64)[..., 0]
    H, W = cov.shape[:2]
    h, w = H // 2, W // 2
    c = cov[: 2 * h, : 2 * w]
    n = nb2[: 2 * h, : 2 * w]
    quads_c = [c[0::2, 0::2], c[1::2, 0::2], c[0::2, 1::2], c[1::2, 1::2]]
    quads_n = [n[0::2, 0::2], n[1::2, 0::2], n[0::2, 1::2], n[1::2, 1::2]]
    nsum = sum(quads_n)
    out = np.zeros_like(quads_c[0])
    for ci, ni in zip(quads_c, quads_n):
        out += (nsum / ni / 16.0)[..., None] * ci
    return out


def interpolate(img, up_h, up_w):
    """Fixed 9/16-3/16-1/16 upsample with edge clamping
    (MultiscaleDenoiser.cpp:473-512)."""
    img = np.asarray(img, dtype=np.float64)
    H, W = img.shape[:2]
    out = np.empty((up_h, up_w) + img.shape[2:], dtype=np.float64)
    for ul in range(up_h):
        for uc in range(up_w):
            line, col = ul // 2, uc // 2
            al = min(max(line + ((ul % 2) * 2 - 1), 0), H - 1)
            ac = min(max(col + ((uc % 2) * 2 - 1), 0), W - 1)
            l = min(line, H - 1)
            c = min(col, W - 1)
            out[ul, uc] = (
                9 / 16 * img[l, c]
                + 3 / 16 * (img[l, ac] + img[al, c])
                + 1 / 16 * img[al, ac]
            )
    return out


def merge_outputs(high, low):
    """merged = H - interpolate(downscale(H)) + interpolate(L)
    (MultiscaleDenoiser.cpp:453-466, 541-548)."""
    high = np.asarray(high, dtype=np.float64)
    H, W = high.shape[:2]
    low_pass = interpolate(downscale_average(high), H, W)
    return high - low_pass + interpolate(low, H, W)


def denoise_multiscale(color, nb, histo, cov, params, nb_of_scales):
    inputs = [(np.asarray(color, np.float64), np.asarray(nb, np.float64),
               np.asarray(histo, np.float64), np.asarray(cov, np.float64))]
    for _ in range(nb_of_scales - 1):
        c, n, h, sc = inputs[-1]
        inputs.append(
            (
                downscale_average(c),
                downscale_sum(n),
                downscale_sum(h),
                downscale_sample_covariance_sum(sc, n),
            )
        )
    outputs = [None] * nb_of_scales
    for scale in range(nb_of_scales - 1, -1, -1):
        c, n, h, sc = inputs[scale]
        outputs[scale] = denoise_monoscale(c, n, h, sc, params)
        if scale < nb_of_scales - 1:
            outputs[scale] = merge_outputs(outputs[scale], outputs[scale + 1])
    return outputs[0]
