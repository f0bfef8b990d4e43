"""Batched symmetric eigendecomposition via fixed-schedule cyclic Jacobi.

The engine needs, per pixel, V diag(f(lambda)) V^T of 27x27 symmetric
matrices (eigenvalue clamping and floored inversion — reference
DenoisingUnit.cpp:578-630, which uses Eigen's SelfAdjointEigenSolver one
matrix at a time). On TPU, XLA's general eigh is not tuned for millions of
tiny matrices; this implementation instead runs classic two-sided Jacobi
with a *compile-time-static* round-robin rotation schedule, so every step
is a batched elementwise/gather op over (batch, n, n) — pure VPU work with
no data-dependent control flow. Eigenvalue ORDER is unspecified (no sort),
which is irrelevant for V f(lambda) V^T.

Accuracy: off-diagonal mass contracts quadratically; `sweeps=10` reaches
float32 machine precision for n<=32 in practice (tests compare against
np.linalg.eigh reconstructions).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_robin_schedule(n: int) -> np.ndarray:
    """Tournament pairings: (n-1) rounds of n/2 disjoint pairs covering all
    index pairs once. n must be even."""
    assert n % 2 == 0
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = [(players[i], players[n - 1 - i]) for i in range(n // 2)]
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    return np.asarray(rounds, dtype=np.int32)  # (n-1, n/2, 2)


def _schedule_vectors(n: int):
    """Per-round column-mix vectors: for each round, partner[k], and the
    (alpha, beta) combination signs such that
      A'[:, k] = c[k] * A[:, k] + sgn[k] * s_of_pair[k] * A[:, partner[k]]
    where for the pair (p, q): A'[:,p] = c A[:,p] - s A[:,q],
                               A'[:,q] = s A[:,p] + c A[:,q]."""
    rounds = _round_robin_schedule(n)
    n_rounds = rounds.shape[0]
    partner = np.empty((n_rounds, n), dtype=np.int32)
    sgn = np.empty((n_rounds, n), dtype=np.float32)
    p_idx = np.empty((n_rounds, n), dtype=np.int32)  # pair slot of column k
    is_p = np.empty((n_rounds, n), dtype=np.float32)
    for r, pairs in enumerate(rounds):
        for slot, (p, q) in enumerate(pairs):
            partner[r, p], partner[r, q] = q, p
            sgn[r, p], sgn[r, q] = -1.0, 1.0
            p_idx[r, p] = p_idx[r, q] = slot
            is_p[r, p], is_p[r, q] = 1.0, 0.0
    return rounds, partner, sgn, p_idx, is_p


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(mats: jnp.ndarray, sweeps: int = 10):
    """Batched symmetric eigendecomposition.

    mats: (..., n, n) symmetric float32, n even (pad odd sizes upstream).
    Returns (eigenvalues (..., n) UNSORTED, eigenvectors (..., n, n) with
    eigenvectors as COLUMNS): mats = V diag(lam) V^T.

    TPU layout note: internally the batch lives on the LAST (lane) axis —
    arrays are (n, n, B) — so every rotation is a full-width vector op; the
    n x n structural axes map to sublanes. Rotations use static row gathers
    only (the round-robin schedule is compile-time constant).
    """
    n = mats.shape[-1]
    rounds_np, partner_np, sgn_np, pidx_np, _ = _schedule_vectors(n)
    rounds = jnp.asarray(rounds_np)  # (R, n/2, 2)
    partners = jnp.asarray(partner_np)  # (R, n)
    sgns = jnp.asarray(sgn_np)
    pidxs = jnp.asarray(pidx_np)
    n_rounds = rounds_np.shape[0]

    batch = mats.shape[:-2]
    bsz = int(np.prod(batch)) if batch else 1
    # (B, n, n) -> (n, n, B): batch on lanes
    a0 = jnp.moveaxis(mats.reshape((-1, n, n)).astype(jnp.float32), 0, -1)
    # derive the identity carry from a0 so it inherits a0's device-varying
    # type under shard_map (a replicated constant cannot be a scan carry
    # that is updated with per-shard data)
    v0 = jnp.eye(n, dtype=jnp.float32)[:, :, None] + a0 * 0.0

    def one_round(carry, r):
        a, v = carry  # (n, n, B)
        pairs = rounds[r]
        p, q = pairs[:, 0], pairs[:, 1]
        partner, sgn, pidx = partners[r], sgns[r], pidxs[r]

        # diagonal/pair entries: (n/2, B)
        app = a[p, p, :]
        aqq = a[q, q, :]
        apq = a[p, q, :]
        # stable rotation (Rutishauser): t = sign(tau)/(|tau|+sqrt(1+tau^2))
        small = jnp.abs(apq) < 1e-30
        denom = jnp.where(small, 1.0, 2.0 * apq)
        tau = (aqq - app) / denom
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)  # tau = 0 -> 45 degree rotation
        t = jnp.where(small, 0.0, t)  # negligible off-diagonal -> identity
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c

        c_all = c[pidx]  # (n, B): coefficient for structural index k
        mix = sgn[:, None] * s[pidx]  # -s for p-members, +s for q-members

        def rotate_axis0(m):  # m (n, ..., B); mixes structural rows
            return c_all.reshape((n,) + (1,) * (m.ndim - 2) + (-1,)) * m + \
                mix.reshape((n,) + (1,) * (m.ndim - 2) + (-1,)) * m[partner]

        # A <- J^T A J: rotate rows, then columns (axis 1 via transpose)
        a = rotate_axis0(a)
        a = jnp.swapaxes(rotate_axis0(jnp.swapaxes(a, 0, 1)), 0, 1)
        # V <- V J: columns only (V's column axis is axis 1)
        v = jnp.swapaxes(rotate_axis0(jnp.swapaxes(v, 0, 1)), 0, 1)
        return (a, v), None

    def one_sweep(carry, _):
        carry, _ = jax.lax.scan(one_round, carry, jnp.arange(n_rounds))
        return carry, None

    (a, v), _ = jax.lax.scan(one_sweep, (a0, v0), None, length=sweeps)
    idx = jnp.arange(n)
    lam = a[idx, idx, :]  # (n, B)
    lam = jnp.moveaxis(lam, -1, 0).reshape(batch + (n,))
    vec = jnp.moveaxis(v, -1, 0).reshape(batch + (n, n))
    return lam, vec


def sym_apply(mats: jnp.ndarray, fn, sweeps: int = 10) -> jnp.ndarray:
    """V diag(fn(lambda)) V^T via the batched Jacobi solver. Odd n is padded
    to even with a zero diagonal block (fn must map 0 to a finite value for
    the padding to stay inert; for f(x)=1/max(x, eps) the pad contributes
    (1/eps) * v v^T only within the pad subspace, which is sliced away)."""
    n = mats.shape[-1]
    if n % 2:
        pad = [(0, 0)] * (mats.ndim - 2) + [(0, 1), (0, 1)]
        lam, vec = jacobi_eigh(jnp.pad(mats, pad), sweeps=sweeps)
        out = jnp.einsum("...ij,...j,...kj->...ik", vec, fn(lam), vec)
        return out[..., :n, :n]
    lam, vec = jacobi_eigh(mats, sweeps=sweeps)
    return jnp.einsum("...ij,...j,...kj->...ik", vec, fn(lam), vec)
