"""Fused spatial kernels (ops/fused_pallas.py, v2 "pm" contract) vs a
brute-force numpy oracle, in interpret mode.

The oracle implements the true 2-D semantics (no flat-shift tricks):
reference chi^2 patch distances (DenoisingUnit.cpp:336-386), masked
moments over candidates (DenoisingUnit.cpp:400-536), and the per-patch
scatter aggregation (DenoisingUnit.cpp:672-693)."""

import numpy as np

from tests import reference_impl as oracle

T, B, R = 16, 2, 1
NBINS3 = 30  # 3 x 10 bins keeps the test fast
D = 3 * (2 * R + 1) ** 2
ND = 2 * B + 1


def _halo():
    from bcd_tpu.ops.fused_pallas import pm_halo

    return pm_halo(R, B)


H = 8  # pm_halo(1, 2); asserted in _flat_inputs
TP = T + 2 * H


def _offsets():
    return [(dy, dx) for dy in range(-B, B + 1) for dx in range(-B, B + 1)]


def _scene(rng):
    # shared base histogram + per-pixel noise: distances spread around the
    # 0.25 threshold so masks are mixed (calibrated)
    base = rng.random(NBINS3) * 4
    histo = (base + 0.5 * rng.random((TP, TP, NBINS3))).astype(np.float32)
    nb = (rng.random((TP, TP, 1)) * 8 + 4).astype(np.float32)
    color = rng.random((TP, TP, 3)).astype(np.float32)
    pixcov = (0.01 * rng.standard_normal((TP, TP, 6))).astype(np.float32)
    return histo, nb, color, pixcov


def _validity():
    """Treat the tile as the whole image: interior = [R, TP-R)^2 box,
    centers = the t x t tile core."""
    yy, xx = np.meshgrid(np.arange(TP), np.arange(TP), indexing="ij")
    interior = ((yy >= R) & (yy < TP - R) & (xx >= R) & (xx < TP - R))
    core = ((yy >= H) & (yy < H + T) & (xx >= H) & (xx < H + T))
    center_valid = interior & core
    return center_valid, interior


def _oracle_masks(histo, nb, threshold):
    center_valid, interior = _validity()
    offs = _offsets()
    masks = np.zeros((len(offs), TP, TP), np.float32)
    h64, n64 = histo.astype(np.float64), nb.astype(np.float64)
    self_idx = (len(offs) - 1) // 2
    for oi, (dy, dx) in enumerate(offs):
        for y in range(TP):
            for x in range(TP):
                if not center_valid[y, x]:
                    continue
                cy, cx = y + dy, x + dx
                if not (0 <= cy < TP and 0 <= cx < TP and interior[cy, cx]):
                    continue
                if oi == self_idx:
                    masks[oi, y, x] = 1.0
                    continue
                dist = oracle._histogram_patch_distance(
                    h64, n64, (y, x), (cy, cx), R, NBINS3)
                # degenerate all-bins-gated pairs -> +inf (documented
                # divergence; the oracle helper returns 0.0 there)
                terms = (h64[y - R : y + R + 1, x - R : x + R + 1]
                         + h64[cy - R : cy + R + 1, cx - R : cx + R + 1])
                if not (terms > 1.0).any():
                    dist = np.inf
                masks[oi, y, x] = 1.0 if dist <= threshold else 0.0
    return masks


def _flat_inputs(histo, nb, color, pixcov):
    """pm-flat slabs: the row-major reshape IS the flat layout (no pads)."""
    import jax.numpy as jnp

    assert _halo() == H
    center_valid, interior = _validity()
    valid = np.stack([center_valid, interior], axis=-1).astype(np.float32)
    flat = lambda a: jnp.asarray(a.reshape(TP * TP, a.shape[-1]))  # noqa
    return (flat(histo), flat(nb), flat(color), flat(pixcov), flat(valid))


def _run_k1(histo, nb, color, pixcov, threshold):
    from bcd_tpu.ops.fused_pallas import masks_moments2

    histo_f, nb_f, color_f, pixcov_f, valid_f = _flat_inputs(
        histo, nb, color, pixcov)
    return masks_moments2(
        histo_f, nb_f, color_f, pixcov_f, valid_f,
        threshold, t=T, r=R, b=B, interpret=True,
    )


def _masks_2d(masks_k):
    m = np.asarray(masks_k)  # (nd, tp*tp, nd) indexed [dyi, z, dxi]
    m = np.moveaxis(m, 2, 1).reshape(ND * ND, TP * TP)
    return m.reshape(ND * ND, TP, TP)


def _compact_2d(arr):
    """(t*t, C) compact core-pixel-major rows -> (T, T, C)."""
    return np.asarray(arr).reshape(T, T, -1)


def test_masks_match_oracle(rng):
    histo, nb, color, pixcov = _scene(rng)
    threshold = 0.25
    masks_k, _, _ = _run_k1(histo, nb, color, pixcov, threshold)
    masks = _masks_2d(masks_k)

    ref = _oracle_masks(histo, nb, threshold)
    self_idx = (ND * ND - 1) // 2
    sel = ref.sum() / max(ref[self_idx].sum(), 1)  # avg candidates/center
    assert 1.5 < sel < 20, f"degenerate test scene (avg similar = {sel})"
    np.testing.assert_array_equal(masks, ref)


def test_moments_match_oracle(rng):
    histo, nb, color, pixcov = _scene(rng)
    threshold = 0.25
    _, m2, misc = _run_k1(histo, nb, color, pixcov, threshold)
    from bcd_tpu.ops.fused_pallas import tri_geometry

    _, tri_expand, _ = tri_geometry(D)
    m2 = _compact_2d(m2)[..., tri_expand].reshape(T, T, D, D)
    misc = _compact_2d(misc)

    center_valid, _ = _validity()
    ref_masks = _oracle_masks(histo, nb, threshold)
    offs = _offsets()
    c64 = color.astype(np.float64)
    v64 = pixcov.astype(np.float64)
    for y in range(H, H + T, 3):
        for x in range(H, H + T, 3):
            m2_ref = np.zeros((D, D))
            msum_ref = np.zeros(D)
            nov_ref = np.zeros(54)
            n_ref = 0.0
            for oi, (dy, dx) in enumerate(offs):
                if not ref_masks[oi, y, x]:
                    continue
                v = oracle._patch_vector(c64, (y + dy, x + dx), R)
                m2_ref += np.outer(v, v)
                msum_ref += v
                nov_ref += oracle._patch_vector(v64, (y + dy, x + dx), R)
                n_ref += 1.0
            cy, cx = y - H, x - H  # compact coords
            np.testing.assert_allclose(
                m2[cy, cx], m2_ref, rtol=2e-5, atol=1e-5)
            np.testing.assert_allclose(
                misc[cy, cx, 0:D], msum_ref, rtol=2e-5, atol=1e-5)
            np.testing.assert_allclose(
                misc[cy, cx, D : D + 54], nov_ref, rtol=2e-5, atol=1e-5)
            assert misc[cy, cx, D + 54] == n_ref
            assert misc[cy, cx, D + 55] == center_valid[y, x]


def test_apply_scatter_matches_oracle(rng):
    import jax.numpy as jnp
    from bcd_tpu.ops.fused_pallas import apply_scatter2
    from bcd_tpu.ops.solve_filter_pallas import SMALL_CH

    histo, nb, color, pixcov = _scene(rng)
    threshold = 0.25
    masks_k, _, misc = _run_k1(histo, nb, color, pixcov, threshold)
    n_map_c = _compact_2d(misc)[..., D + 54]

    center_valid, _ = _validity()
    core_valid_c = center_valid[H : H + T, H : H + T]
    # synthetic per-pixel filters over the COMPACT core (the solve stage
    # is tested elsewhere)
    a2 = rng.standard_normal((T, T, D, D)).astype(np.float32) * 0.1
    b2 = rng.standard_normal((T, T, D)).astype(np.float32)
    mvec = rng.standard_normal((T, T, D)).astype(np.float32)

    # the engine gates at n >= d+1; with b=2 there are only 25 candidates,
    # so use a test-local gate — the gate is an input channel to the kernel
    is_main = (n_map_c >= 12) & core_valid_c
    is_fb = core_valid_c & ~is_main
    assert is_main.any() and is_fb.any()

    a2t_pm = np.swapaxes(a2, -1, -2).reshape(T * T, D * D)
    small = np.zeros((T * T, SMALL_CH), np.float32)
    small[:, 0:D] = b2.reshape(T * T, D)
    small[:, D] = is_main.reshape(-1)
    small[:, D + 1 : 2 * D + 1] = (
        is_fb[..., None] * mvec).reshape(T * T, D)
    small[:, 2 * D + 1] = is_fb.reshape(-1)

    out = apply_scatter2(
        jnp.asarray(masks_k),
        jnp.asarray(a2t_pm),
        jnp.asarray(small),
        jnp.asarray(color.reshape(TP * TP, 3)),
        t=T, r=R, b=B, interpret=True,
    )
    out = np.asarray(out).reshape(TP, TP, 4)

    # oracle: per-center per-candidate filtered patch, scattered at the
    # candidate center (DenoisingUnit.cpp:672-693)
    ref_masks = _oracle_masks(histo, nb, threshold)
    offs = _offsets()
    out_ref = np.zeros((TP, TP, 3))
    cnt_ref = np.zeros((TP, TP))
    qoffs = [(qy, qx) for qy in range(-R, R + 1) for qx in range(-R, R + 1)]
    for y in range(TP):
        for x in range(TP):
            if not center_valid[y, x]:
                continue
            cyx = (y - H, x - H)
            if is_main[cyx]:
                for oi, (dy, dx) in enumerate(offs):
                    if not ref_masks[oi, y, x]:
                        continue
                    cy, cx = y + dy, x + dx
                    v = oracle._patch_vector(
                        color.astype(np.float64), (cy, cx), R)
                    field = a2[cyx].astype(np.float64) @ v + b2[cyx]
                    for qi, (qy, qx) in enumerate(qoffs):
                        out_ref[cy + qy, cx + qx] += field[3 * qi : 3 * qi + 3]
                        cnt_ref[cy + qy, cx + qx] += 1.0
            else:
                for qi, (qy, qx) in enumerate(qoffs):
                    out_ref[y + qy, x + qx] += mvec[cyx][3 * qi : 3 * qi + 3]
                    cnt_ref[y + qy, x + qx] += 1.0

    np.testing.assert_allclose(out[..., :3], out_ref, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(out[..., 3], cnt_ref, rtol=0, atol=0)
