"""Renderfarm mode: data-parallel batches of frames over a device mesh.

The reference's renderfarm story is "one process per frame with a shared
JSON preset" (reference README). Here a whole batch of frames is denoised
in one pjit-compiled step, sharded over the mesh's ``frames`` axis — many
frames per TPU slice with zero host round-trips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bcd_tpu.core.monoscale import _denoise_image, auto_engine_config
from bcd_tpu.core.multiscale import denoise_multiscale
from bcd_tpu.params import DenoiserParameters


def denoise_frames(
    colors, nbs, histos, covs,
    params: DenoiserParameters,
    mesh: Optional[Mesh] = None,
    axis: str = "frames",
    nb_of_scales: int = 1,
    tile: Optional[int] = None,
    use_fused: Optional[bool] = None,
    use_pallas: Optional[bool] = None,
):
    """Denoise a batch of frames: arrays (F, H, W, C). With a mesh, the
    frame axis is sharded over ``mesh[axis]`` (F divisible by its size);
    without one, the batch is vmapped on the current device."""
    # same engine auto-selection as denoise_monoscale: renderfarm batches
    # run the fused Pallas pipeline on accelerators, not the slow XLA path
    cfg = auto_engine_config(
        params, tile=tile, use_fused=use_fused, use_pallas=use_pallas)
    threshold = jnp.float32(params.histogram_distance_threshold)
    min_eigen = jnp.float32(params.min_eigen_value)

    if nb_of_scales > 1:
        def one_frame(c, n, h, sc):
            return denoise_multiscale(
                c, n, h, sc, params, nb_of_scales=nb_of_scales, tile=tile,
                use_fused=use_fused, use_pallas=use_pallas,
            )
    else:
        def one_frame(c, n, h, sc):
            return _denoise_image(cfg, c, n, h, sc, threshold, min_eigen)

    batched = jax.vmap(one_frame)
    args = [jnp.asarray(a, jnp.float32) for a in (colors, nbs, histos, covs)]

    if mesh is None:
        return jax.jit(batched)(*args)

    spec = P(axis, None, None, None)
    sharding = NamedSharding(mesh, spec)
    args = [jax.device_put(a, sharding) for a in args]
    return jax.jit(batched, out_shardings=sharding)(*args)
