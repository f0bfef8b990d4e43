"""Batched fixed-schedule Jacobi eigensolver tests."""

import numpy as np

from bcd_tpu.ops import sym_eigh


def test_reconstruction_and_orthogonality(rng):
    import jax.numpy as jnp

    b, n = 32, 28
    a = rng.standard_normal((b, n, n)).astype(np.float32)
    a = (a + a.transpose(0, 2, 1)) / 2
    lam, vec = sym_eigh.jacobi_eigh(jnp.asarray(a))
    lam, vec = np.asarray(lam), np.asarray(vec)
    rec = np.einsum("bij,bj,bkj->bik", vec, lam, vec)
    assert np.abs(rec - a).max() < 1e-4
    orth = np.einsum("bij,bik->bjk", vec, vec)
    assert np.abs(orth - np.eye(n)).max() < 2e-5
    # eigenvalue multisets match numpy's
    ref = np.linalg.eigh(a.astype(np.float64))[0]
    np.testing.assert_allclose(np.sort(lam, axis=-1), ref, atol=1e-4)


def test_sym_apply_odd_size_matches_numpy(rng):
    import jax.numpy as jnp

    b, n = 16, 27
    a = rng.standard_normal((b, n, n)).astype(np.float32)
    a = (a + a.transpose(0, 2, 1)) / 2
    out = np.asarray(
        sym_eigh.sym_apply(jnp.asarray(a), lambda l: jnp.maximum(l, 0.0))
    )
    lam, vec = np.linalg.eigh(a.astype(np.float64))
    ref = np.einsum("bij,bj,bkj->bik", vec, np.maximum(lam, 0.0), vec)
    assert np.abs(out - ref).max() < 1e-4


def test_engine_jacobi_matches_lax(rng):
    from bcd_tpu.core.monoscale import MonoscaleConfig, _denoise_image
    from tests.test_ops_vs_oracle import make_stats
    import jax.numpy as jnp

    _, st = make_stats(rng, h=14, w=12, spp=16)
    args = [jnp.asarray(st[k], jnp.float32)
            for k in ("mean", "nb_of_samples", "histo", "cov")]
    out = {}
    for impl in ("jacobi", "lax"):
        cfg = MonoscaleConfig(search_radius=3, tile=8, eigh_impl=impl)
        out[impl] = np.asarray(
            _denoise_image(cfg, *args, jnp.float32(1.0), jnp.float32(1e-8))
        )
    assert np.sqrt(np.mean((out["jacobi"] - out["lax"]) ** 2)) < 1e-5
