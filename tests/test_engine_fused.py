"""Fully fused K1->K2->K4 engine path (interpret mode) vs the XLA path.

The XLA path is itself pinned to the float64 oracle (test_monoscale.py),
so agreement here certifies the fused pipeline end to end.
"""

import numpy as np

from bcd_tpu.core.monoscale import MonoscaleConfig, _denoise_image
from tests.test_ops_vs_oracle import make_stats


def _run(cfg, args):
    import jax.numpy as jnp

    return np.asarray(
        _denoise_image(cfg, *args, jnp.float32(1.0), jnp.float32(1e-8)))


def test_fused_engine_matches_xla(rng):
    import jax.numpy as jnp

    _, st = make_stats(rng, h=14, w=12, spp=16)
    args = [jnp.asarray(st[k], jnp.float32)
            for k in ("mean", "nb_of_samples", "histo", "cov")]
    ref = _run(MonoscaleConfig(search_radius=3, tile=8), args)
    got = _run(MonoscaleConfig(search_radius=3, tile=16, use_fused=True), args)
    rms = np.sqrt(np.mean((got - ref) ** 2))
    assert rms < 2e-4, rms


def test_fused_engine_tile_grid_invariance(rng):
    """Non-divisible image sizes: partial edge tiles must contribute
    identically whatever the tile size."""
    import jax.numpy as jnp

    _, st = make_stats(rng, h=13, w=18, spp=16)
    args = [jnp.asarray(st[k], jnp.float32)
            for k in ("mean", "nb_of_samples", "histo", "cov")]
    a = _run(MonoscaleConfig(search_radius=2, tile=16, use_fused=True), args)
    bb = _run(MonoscaleConfig(search_radius=2, tile=32, use_fused=True), args)
    np.testing.assert_allclose(a, bb, rtol=1e-5, atol=1e-6)
