"""skip_stride: the deterministic analog of the reference's skip-marking
heuristic (Denoiser.cpp:161-162 + DenoisingUnit.cpp:163-173) — solve only
every Nth patch center; the patch aggregation still covers every pixel.
"""

import numpy as np

from bcd_tpu.core.monoscale import MonoscaleConfig, _denoise_image
from tests.test_ops_vs_oracle import make_stats


def _run(cfg, args, threshold=1.0):
    import jax.numpy as jnp

    return np.asarray(
        _denoise_image(cfg, *args, jnp.float32(threshold),
                       jnp.float32(1e-8)))


def _args(rng, h=20, w=17):
    import jax.numpy as jnp

    _, st = make_stats(rng, h=h, w=w, spp=16)
    return st, [jnp.asarray(st[k], jnp.float32)
                for k in ("mean", "nb_of_samples", "histo", "cov")]


def test_stride_covers_every_interior_pixel(rng):
    """Non-divisible image sizes: the anchored stride grid must leave no
    interior pixel without an estimate (output identically 0 only outside
    the interior)."""
    _, args = _args(rng, h=19, w=14)
    for stride in (2, 3):
        out = _run(MonoscaleConfig(search_radius=2, tile=8,
                                   skip_stride=stride), args)
        interior = out[1:-1, 1:-1]
        assert (np.abs(interior).sum(axis=-1) > 0).all(), stride


def test_stride_one_is_exact(rng):
    _, args = _args(rng)
    base = _run(MonoscaleConfig(search_radius=2, tile=8), args)
    s1 = _run(MonoscaleConfig(search_radius=2, tile=8, skip_stride=1), args)
    np.testing.assert_array_equal(base, s1)


def test_stride_fused_matches_xla(rng):
    _, args = _args(rng, h=14, w=12)
    for stride in (2, 3):
        ref = _run(MonoscaleConfig(search_radius=3, tile=8,
                                   skip_stride=stride), args)
        got = _run(MonoscaleConfig(search_radius=3, tile=16, use_fused=True,
                                   skip_stride=stride), args)
        rms = np.sqrt(np.mean((got - ref) ** 2))
        assert rms < 2e-4, (stride, rms)


def test_stride_quality_degrades_gracefully(rng):
    """Strided output must stay much closer to the exact denoised result
    than the noisy input is (it averages fewer, but still many, estimates
    per pixel)."""
    st, args = _args(rng, h=24, w=24)
    noisy = np.asarray(st["mean"])
    # search_radius 3 gives 49 candidates (>= d+1 = 28 so the main path can
    # engage); a loose threshold makes the filter actually select patches
    exact = _run(MonoscaleConfig(search_radius=3, tile=8), args,
                 threshold=10.0)
    strided = _run(MonoscaleConfig(search_radius=3, tile=8, skip_stride=2),
                   args, threshold=10.0)
    inner = (slice(2, -2), slice(2, -2))
    rms = lambda a, b: np.sqrt(np.mean((a[inner] - b[inner]) ** 2))  # noqa: E731
    assert rms(noisy, exact) > 1e-3, "degenerate scene: filter inactive"
    assert rms(strided, exact) < 0.5 * rms(noisy, exact), (
        rms(strided, exact), rms(noisy, exact))
