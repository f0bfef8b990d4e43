"""Engine with the fused Pallas kernel (interpret mode) vs the XLA path."""

import numpy as np

from bcd_tpu.core.monoscale import MonoscaleConfig, _denoise_image
from tests.test_ops_vs_oracle import make_stats


def test_pallas_engine_matches_xla(rng):
    import jax.numpy as jnp

    _, st = make_stats(rng, h=14, w=12, spp=16)
    args = [jnp.asarray(st[k], jnp.float32)
            for k in ("mean", "nb_of_samples", "histo", "cov")]
    out = {}
    for use_pallas in (False, True):
        cfg = MonoscaleConfig(search_radius=3, tile=8, use_pallas=use_pallas)
        out[use_pallas] = np.asarray(
            _denoise_image(cfg, *args, jnp.float32(1.0), jnp.float32(1e-8))
        )
    rms = np.sqrt(np.mean((out[True] - out[False]) ** 2))
    assert rms < 2e-4, rms
