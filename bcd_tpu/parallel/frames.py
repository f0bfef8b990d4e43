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

try:  # JAX >= 0.5 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


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
    frame axis is sharded over ``mesh[axis]`` (F divisible by its size)
    and each device maps sequentially over its local frames; without one,
    the batch runs sequentially on the current device."""
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

    # frames assigned to ONE device run SEQUENTIALLY (lax.map), not
    # vmapped: the Pallas tile grid is serialized per core, so vmap buys
    # no parallelism within a device — but it DOES batch-inflate the
    # kernels' scoped-VMEM footprint (a vmapped K1 at the production
    # tile=48 exceeded the 120 MB budget by 408 KB; caught by verify-tpu
    # gate [5c] on hardware). Cross-device parallelism comes from the
    # mesh axis alone.
    def map_frames(c, n, h, sc):
        return jax.lax.map(lambda a: one_frame(*a), (c, n, h, sc))

    args = [jnp.asarray(a, jnp.float32) for a in (colors, nbs, histos, covs)]

    if mesh is None:
        return jax.jit(map_frames)(*args)

    spec = P(axis, None, None, None)
    sharding = NamedSharding(mesh, spec)
    args = [jax.device_put(a, sharding) for a in args]
    # check_vma=False for the same reason as parallel/spatial.py: the
    # Pallas out_shapes carry no varying-over-mesh-axes annotation.
    fn = shard_map(
        map_frames, mesh=mesh,
        in_specs=(spec,) * 4, out_specs=spec, check_vma=False)
    return jax.jit(fn)(*args)
