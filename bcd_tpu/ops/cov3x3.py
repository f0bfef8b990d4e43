"""Symmetric 3x3 covariance utilities (reference CovarianceMatrix.h/.cpp).

Covariances are stored as 6 floats in channel order xx, yy, zz, yz, xz, xy
(reference ``ESymmetricMatrix3x3Data``, CovarianceMatrix.h:18-28). The
reference's ``Block3x3DiagonalSymmetricMatrix`` (per-patch block-diagonal
noise covariance) maps here to arrays shaped (..., npx, 3, 3).
"""

from __future__ import annotations

import jax.numpy as jnp

COV_XX, COV_YY, COV_ZZ, COV_YZ, COV_XZ, COV_XY = range(6)


def cov6_to_mat3(c: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3) symmetric matrix."""
    xx, yy, zz, yz, xz, xy = (c[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat3_to_cov6(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6) in xx, yy, zz, yz, xz, xy order."""
    return jnp.stack(
        [
            m[..., 0, 0], m[..., 1, 1], m[..., 2, 2],
            m[..., 1, 2], m[..., 0, 2], m[..., 0, 1],
        ],
        axis=-1,
    )


def blockdiag_expand(blocks: jnp.ndarray) -> jnp.ndarray:
    """(..., npx, 3, 3) blocks -> dense (..., d, d) block-diagonal matrix."""
    npx = blocks.shape[-3]
    eye = jnp.eye(npx, dtype=blocks.dtype)
    full = jnp.einsum("qp,...qij->...qipj", eye, blocks)
    return full.reshape(blocks.shape[:-3] + (3 * npx, 3 * npx))


def blockdiag_add(mat: jnp.ndarray, blocks: jnp.ndarray, sign: float = 1.0):
    """Add a block-diagonal matrix of (npx, 3, 3) blocks to (..., d, d)
    matrices, d = 3*npx (reference addCovMatPatchToMatrix /
    substractCovMatPatchFromMatrix, DenoisingUnit.cpp:538-576)."""
    return mat + sign * blockdiag_expand(blocks)


def blockdiag_matmul(blocks: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Multiply block-diagonal (..., npx, 3, 3) by (..., d, k): rows of the
    result in patch-pixel groups of 3 (reference multiplyCovMatPatchByVector,
    DenoisingUnit.cpp:632-654, generalized to matrices)."""
    npx = blocks.shape[-3]
    batch = mat.shape[:-2]
    k = mat.shape[-1]
    m = mat.reshape(batch + (npx, 3, k))
    out = jnp.einsum("...qij,...qjk->...qik", blocks, m)
    return out.reshape(batch + (3 * npx, k))
