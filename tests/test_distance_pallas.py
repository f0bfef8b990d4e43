"""Experimental distance-map Pallas kernel vs the oracle's per-pixel
distances (interpret mode)."""

import numpy as np

from tests import reference_impl as oracle


def test_distance_kernel_matches_oracle(rng):
    import jax.numpy as jnp
    from bcd_tpu.ops.distance_pallas import distance_maps

    t, b, r = 8, 2, 1
    h = b + r
    tp = t + 2 * h
    nbins3 = 30  # 3 x 10 bins keeps the test fast
    histo = (rng.random((tp, tp, nbins3)) * 4).astype(np.float32)
    nb = (rng.random((tp, tp)) * 8 + 4).astype(np.float32)

    offs = [(dy, dx) for dy in range(-b, b + 1) for dx in range(-b, b + 1)]
    shifts = np.asarray([[dy * tp + dx] for dy, dx in offs], np.int32)
    l_pad = b * tp + b + r * tp + r  # covers offset + box-shift reach

    histo_flat = np.zeros((nbins3, l_pad + tp * tp + l_pad), np.float32)
    histo_flat[:, l_pad : l_pad + tp * tp] = (
        histo.reshape(tp * tp, nbins3).T)
    nb_flat = np.ones((1, l_pad + tp * tp + l_pad), np.float32)
    nb_flat[0, l_pad : l_pad + tp * tp] = nb.reshape(-1)

    out = np.asarray(distance_maps(
        jnp.asarray(histo_flat), jnp.asarray(nb_flat), jnp.asarray(shifts),
        1.0, tp=tp, t=t, r=r, interpret=True,
    ))  # (25, t*t)

    # oracle distances (only where patches stay fully in the tile)
    nb3 = nb[..., None]
    for oi, (dy, dx) in enumerate(offs):
        for py in range(t):
            for px in range(t):
                p = (h + py, h + px)
                c = (p[0] + dy, p[1] + dx)
                ref = oracle._histogram_patch_distance(
                    histo.astype(np.float64), nb3.astype(np.float64),
                    p, c, r, nbins3)
                got = out[oi, py * t + px]
                assert abs(got - ref) < 1e-3 * max(1.0, abs(ref)), (
                    oi, py, px, got, ref)
