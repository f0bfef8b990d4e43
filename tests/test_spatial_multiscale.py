"""Multiscale over spatially-sharded frames must match the single-device
multiscale result."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from bcd_tpu.params import DenoiserParameters
from tests.test_parallel import small_inputs


def test_multiscale_spatial_matches_single_device(rng):
    from bcd_tpu.core.multiscale import denoise_multiscale
    from bcd_tpu.parallel.spatial import denoise_multiscale_spatial

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:2]), ("x",))
    # W=48: scale-1 width 24 stays divisible by 2 with slabs >= halo 4
    color, nb, histo, cov = small_inputs(rng, h=20, w=48)
    params = DenoiserParameters(search_window_radius=3)
    single = np.asarray(denoise_multiscale(
        color, nb, histo, cov, params, nb_of_scales=2, tile=8))
    sharded = np.asarray(denoise_multiscale_spatial(
        color, nb, histo, cov, params, mesh, nb_of_scales=2, tile=8))
    np.testing.assert_allclose(sharded, single, rtol=3e-5, atol=3e-6)


def test_multiscale_spatial_rejects_bad_geometry(rng):
    from bcd_tpu.parallel.spatial import denoise_multiscale_spatial

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:4]), ("x",))
    color, nb, histo, cov = small_inputs(rng, h=12, w=36)
    # scale-1 width 18 not divisible by 4
    with pytest.raises(ValueError):
        denoise_multiscale_spatial(
            color, nb, histo, cov, DenoiserParameters(search_window_radius=2),
            mesh, nb_of_scales=2, tile=8)
