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
