"""Fused solve+filter Pallas kernel vs its XLA twin (interpret mode on CPU)."""

import numpy as np
import pytest


def make_inputs(rng, O=49, d=27, npx=9, P=128):
    C = rng.standard_normal((O, d, P)).astype(np.float32)
    mask = (rng.random((O, P)) < 0.7).astype(np.float32)
    mask[O // 2] = 1.0  # self always selected
    n = mask.sum(axis=0, keepdims=True)
    m = (C * mask[:, None, :]).sum(axis=0) / n
    # SPD-ish noise blocks: diag-dominant
    noise = np.zeros((6 * npx, P), np.float32)
    for q in range(npx):
        noise[6 * q : 6 * q + 3] = 0.05 + 0.1 * rng.random((3, P))
        noise[6 * q + 3 : 6 * q + 6] = 0.01 * rng.standard_normal((3, P))
    return C, mask, noise.astype(np.float32), n.astype(np.float32), m


def test_kernel_matches_xla_twin(rng):
    import jax.numpy as jnp
    from bcd_tpu.ops.solve_filter_pallas import (
        solve_filter, solve_filter_reference)

    C, mask, noise, n, m = make_inputs(rng)
    args = tuple(jnp.asarray(x) for x in (C, mask, noise, n, m))
    out = np.asarray(solve_filter(*args, 1e-8, interpret=True, sweeps=10))
    ref = np.asarray(solve_filter_reference(*args, 1e-8))
    # same math up to the floor substitution and fp ordering
    err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 2e-3, err
    rms = np.sqrt(np.mean((out - ref) ** 2))
    assert rms < 2e-4, rms


def test_kernel_multi_block(rng):
    import jax.numpy as jnp
    from bcd_tpu.ops.solve_filter_pallas import (
        solve_filter, solve_filter_reference)

    C, mask, noise, n, m = make_inputs(rng, P=256)
    args = tuple(jnp.asarray(x) for x in (C, mask, noise, n, m))
    out = np.asarray(solve_filter(*args, 1e-8, interpret=True))
    ref = np.asarray(solve_filter_reference(*args, 1e-8))
    assert np.sqrt(np.mean((out - ref) ** 2)) < 2e-4


def test_floor_substitution_is_immaterial(rng):
    """(M + eps I)^-1 vs eigenvalue floor: the outputs agree through the
    filter (the floor only engages in near-null directions where the patch
    deviations are themselves tiny)."""
    import jax.numpy as jnp
    from bcd_tpu.ops.solve_filter_pallas import solve_filter_reference

    C, mask, noise, n, m = make_inputs(rng)
    args = tuple(jnp.asarray(x) for x in (C, mask, noise, n, m))
    exact = np.asarray(solve_filter_reference(*args, 1e-8, exact_floor=True))
    subst = np.asarray(solve_filter_reference(*args, 1e-8, exact_floor=False))
    assert np.sqrt(np.mean((exact - subst) ** 2)) < 1e-5


def _moment_inputs(rng, O=49, d=27, npx=9, P=128):
    """Raw masked moments as masks_moments (K1) would emit them."""
    C, mask, noise_mean, n, m = make_inputs(rng, O=O, d=d, npx=npx, P=P)
    mk = mask[:, None, :]
    m2 = np.einsum("okp,olp->klp", mk * C, C).astype(np.float32)
    msum = (mk * C).sum(axis=0).astype(np.float32)
    nov = (noise_mean * n).astype(np.float32)  # raw sums, not means
    return m2, msum, nov, n, C, mask, noise_mean, m


def test_solve_matrices_matches_twin(rng):
    import jax.numpy as jnp
    from bcd_tpu.ops.solve_filter_pallas import (
        solve_matrices, solve_matrices_reference)

    m2, msum, nov, n, *_ = _moment_inputs(rng)
    args = tuple(jnp.asarray(x) for x in (m2, msum, nov, n))
    a2t, b2 = solve_matrices(*args, 1e-8, interpret=True, sweeps=10)
    a2t_r, b2_r = solve_matrices_reference(*args, 1e-8)
    for got, ref in ((np.asarray(a2t), np.asarray(a2t_r)),
                     (np.asarray(b2), np.asarray(b2_r))):
        rms = np.sqrt(np.mean((got - ref) ** 2))
        assert rms < 2e-4, rms


def test_solve_matrices_consistent_with_solve_filter(rng):
    """The moment-form kernel and the candidate-stack kernel must produce
    the same filter: field_o = mask_o (A2 c_o + b2)."""
    import jax.numpy as jnp
    from bcd_tpu.ops.solve_filter_pallas import solve_filter, solve_matrices

    m2, msum, nov, n, C, mask, noise_mean, m = _moment_inputs(rng)
    a2t, b2 = solve_matrices(
        *(jnp.asarray(x) for x in (m2, msum, nov, n)), 1e-8,
        interpret=True, sweeps=10)
    field = np.asarray(solve_filter(
        *(jnp.asarray(x) for x in (C, mask, noise_mean, n, m)), 1e-8,
        interpret=True, sweeps=10))

    a2 = np.moveaxis(np.asarray(a2t), -1, 0).transpose(0, 2, 1)  # (P, d, d)
    b2v = np.moveaxis(np.asarray(b2)[0], -1, 0)  # (P, d)
    # want (O, d, P): mask * (A2 C + b2)
    want = mask[:, None, :] * np.moveaxis(
        np.einsum("pkl,pol->pok", a2, np.moveaxis(C, -1, 0)) + b2v[:, None],
        0, -1)
    rms = np.sqrt(np.mean((field - want) ** 2))
    assert rms < 2e-4, rms


def test_solve_matrices_degenerate_lanes(rng):
    """Pad lanes (n=1, zero moments) and empty sets must produce finite
    A2/b2 (gated downstream) — no NaN/Inf leaks."""
    import jax.numpy as jnp
    from bcd_tpu.ops.solve_filter_pallas import solve_matrices

    m2, msum, nov, n, *_ = _moment_inputs(rng)
    m2[..., :32] = 0.0
    msum[:, :32] = 0.0
    nov[:, :32] = 0.0
    n[:, :16] = 1.0  # pad-lane convention
    n[:, 16:32] = 0.0  # empty similar set
    a2t, b2 = solve_matrices(
        *(jnp.asarray(x) for x in (m2, msum, nov, n)), 1e-8,
        interpret=True)
    assert np.isfinite(np.asarray(a2t)).all()
    assert np.isfinite(np.asarray(b2)).all()


def _pm_inputs(rng, d=27, npx=9, P=256):
    """Pixel-major moment inputs as masks_moments2 (K1 v2) emits them."""
    from bcd_tpu.ops.fused_pallas import tri_geometry

    m2, msum, nov, n, *_ = _moment_inputs(rng, d=d, npx=npx, P=P)
    tri_base, tri_expand, dtri = tri_geometry(d)
    m2_full = np.moveaxis(m2, -1, 0).reshape(P, d * d)  # (P, d*d)
    # pack the upper triangle: channel tri(k, j<=k..) of pixel p
    pack_idx = np.zeros(dtri, np.int64)
    for k in range(d):
        for j in range(k, d):
            pack_idx[tri_base[k] + (j - k)] = k * d + j
    m2_pm = m2_full[:, pack_idx].astype(np.float32)
    misc = np.zeros((P, 128), np.float32)
    misc[:, 0:d] = msum.T
    misc[:, d : d + 6 * npx] = nov.T
    misc[:, d + 6 * npx] = n[0]
    cv = (rng.random(P) < 0.9).astype(np.float32)
    misc[:, d + 6 * npx + 1] = cv
    return m2_pm, misc


def test_solve_matrices_pm_matches_twin(rng):
    """Pixel-major K2 (MXU in-kernel transposes + gates) vs its XLA twin."""
    import jax.numpy as jnp
    from bcd_tpu.ops.solve_filter_pallas import (
        solve_matrices_pm, solve_matrices_pm_reference)

    m2_pm, misc = _pm_inputs(rng)
    a2t, small = solve_matrices_pm(
        jnp.asarray(m2_pm), jnp.asarray(misc), 1e-8, interpret=True,
        sweeps=10)
    a2t_r, small_r = solve_matrices_pm_reference(
        jnp.asarray(m2_pm), jnp.asarray(misc), 1e-8)
    rms = np.sqrt(np.mean((np.asarray(a2t) - np.asarray(a2t_r)) ** 2))
    assert rms < 2e-4, rms
    small, small_r = np.asarray(small), np.asarray(small_r)
    d = 27
    # gates must be EXACT
    np.testing.assert_array_equal(small[:, d], small_r[:, d])
    np.testing.assert_array_equal(small[:, 2 * d + 1], small_r[:, 2 * d + 1])
    rms = np.sqrt(np.mean((small - small_r) ** 2))
    assert rms < 2e-4, rms


def test_solve_matrices_pm_consistent_with_lane_form(rng):
    """The pixel-major kernel is the lane-form kernel + layout changes:
    same moments through both must give the same filter matrices."""
    import jax.numpy as jnp
    from bcd_tpu.ops.fused_pallas import tri_geometry
    from bcd_tpu.ops.solve_filter_pallas import (
        solve_matrices, solve_matrices_pm)

    m2, msum, nov, n, *_ = _moment_inputs(rng, P=128)
    a2t_l, b2_l = solve_matrices(
        *(jnp.asarray(x) for x in (m2, msum, nov, n)), 1e-8,
        interpret=True, sweeps=10)

    m2_pm, misc = _pm_inputs(rng, P=128)
    # rebuild the SAME moments into the pm layout (ignore _pm_inputs' rng
    # use: feed the lane-form arrays)
    _, tri_expand, dtri = tri_geometry(27)
    misc[:, 0:27] = msum.T
    misc[:, 27:81] = nov.T
    misc[:, 81] = n[0]
    misc[:, 82] = 1.0
    d = 27
    m2_full = np.moveaxis(m2, -1, 0).reshape(128, d * d)
    from bcd_tpu.ops.fused_pallas import tri_geometry as tg
    tri_base, _, _ = tg(d)
    pack_idx = np.zeros(dtri, np.int64)
    for k in range(d):
        for j in range(k, d):
            pack_idx[tri_base[k] + (j - k)] = k * d + j
    m2_pm = m2_full[:, pack_idx].astype(np.float32)

    a2t_pm, small = solve_matrices_pm(
        jnp.asarray(m2_pm), jnp.asarray(misc), 1e-8, interpret=True,
        sweeps=10)
    # lane layout a2t_l[k, j, p] = pm row p channel k*d+j
    want = np.asarray(a2t_l).reshape(d * d, 128).T
    np.testing.assert_allclose(np.asarray(a2t_pm), want, rtol=2e-5,
                               atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(small)[:, 0:d], np.asarray(b2_l)[0].T, rtol=2e-5,
        atol=2e-6)
