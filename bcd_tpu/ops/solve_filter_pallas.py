"""Fused Pallas TPU kernel: masked patch statistics -> eigenvalue-clamped
two-step Bayesian filter, for a batch of pixels.

This is the per-pixel hot path of the denoiser (reference DenoisingUnit.cpp
steps: empiricalCovarianceMatrix + clampNegativeEigenValues +
inverseSymmetricMatrix + finalDenoisingMatrixMultiplication) fused into one
VMEM-resident kernel. XLA codegen for millions of tiny (27-dim) per-pixel
matrices is lane-starved (27 of 128 lanes) and HBM-bound between ops; here
the PIXEL batch lives on the lane axis — every operation is a full-width
vector op on (d, d, 128) tiles that never leave VMEM:

- masked second moment      M2 = sum_o mask_o c_o c_o^T        (VPU MACs)
- empirical covariance      Cemp = (M2 - n m m^T) / (n-1)
- eigenvalue clamp          via two-sided cyclic Jacobi with the Brent-Luk
  systolic pairing: matrices live in a "player position" layout where the
  rotation pairs are ALWAYS (i, i+half) — static slab slices, no gathers —
  and a fixed 5-slice permutation re-seats players between rounds.
- floored inversions        as Cholesky of (M + minEigen*I): equivalent to
  the reference's eigenvalue floor except for eigendirections with
  lambda ~ minEigen, where the patch deviations are themselves ~sqrt(lambda)
  (numerically immaterial; validated against the float64 oracle in tests).
- filter                    field_o = mask_o (A2 c_o + b2), A2 = I - N inv2

Grid: one step per 128-pixel block. All loops over offsets/rounds are
fori_loops with static-extent bodies; the Jacobi round uses only static
slicing and concatenation (Mosaic-friendly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _blockdiag_onehots(npx: int) -> np.ndarray:
    """(6*npx, d, d) constant masks: dense block-diagonal = sum_k E_k * v_k
    with v ordered per block as xx, yy, zz, yz, xz, xy."""
    d = 3 * npx
    out = np.zeros((6 * npx, d, d), np.float32)
    pairs = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]
    for q in range(npx):
        for ch, (i, j) in enumerate(pairs):
            out[6 * q + ch, 3 * q + i, 3 * q + j] = 1.0
            out[6 * q + ch, 3 * q + j, 3 * q + i] = 1.0
    return out


def _perm_slices(dp: int):
    """Brent-Luk re-seating permutation as 5 static slice ranges:
    new = concat(x[0:1], x[h:h+1], x[1:h-1], x[h+1:2h], x[h-1:h])."""
    h = dp // 2
    return [(0, 1), (h, h + 1), (1, h - 1), (h + 1, 2 * h), (h - 1, h)]


def _solve_filter_kernel(c_ref, mask_ref, noise_ref, n_ref, m_ref, eps_ref,
                         field_ref, *, n_offsets, d, npx, sweeps):
    dp = d + 1 if d % 2 else d  # padded (even) size for the pairing schedule
    half = dp // 2
    P = LANES

    noise = noise_ref[:]  # (6*npx, P)
    n = n_ref[:]  # (1, P)
    m = m_ref[:]  # (d, P)
    eps = eps_ref[0, 0]

    f32 = jnp.float32

    # iota-built structural masks (pallas kernels may not capture array
    # constants; everything 2-D constant is generated in-kernel)
    ri_dp = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 0)
    ci_dp = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 1)
    eye_dp = (ri_dp == ci_dp).astype(f32)
    sel = (ci_dp == ri_dp + half).astype(f32)
    ri_d = ri_dp[:d, :d]
    ci_d = ci_dp[:d, :d]
    eye_d = (ri_d == ci_d).astype(f32)

    # ---- masked second moment ------------------------------------------
    # (loops over the offset axis read the VMEM refs with a dynamic index;
    # Mosaic does not lower dynamic_slice of traced values)
    def mo(o, acc):
        c_o = c_ref[pl.ds(o, 1)][0]  # (d, P)
        w = mask_ref[pl.ds(o, 1)]  # (1, P)
        return acc + (c_o * w)[:, None, :] * c_o[None, :, :]

    m2 = jax.lax.fori_loop(0, n_offsets, mo, jnp.zeros((d, d, P), f32))
    nm1 = jnp.maximum(n - 1.0, 1.0)
    cemp = (m2 - n[None] * m[:, None, :] * m[None, :, :]) / nm1[None]

    # ---- dense block-diagonal noise -------------------------------------
    pairs = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]
    bd = jnp.zeros((d, d, P), f32)
    for q in range(npx):
        for ch, (i, j) in enumerate(pairs):
            a_, b_ = 3 * q + i, 3 * q + j
            one = ((ri_d == a_) & (ci_d == b_)) | ((ri_d == b_) & (ci_d == a_))
            bd = bd + one.astype(f32)[:, :, None] * \
                noise[6 * q + ch][None, None, :]

    s_mat = cemp - bd

    # ---- Jacobi clamp ----------------------------------------------------
    a = jnp.pad(s_mat, ((0, dp - d), (0, dp - d), (0, 0)))
    vt = jnp.broadcast_to(eye_dp[:, :, None], (dp, dp, P))
    perm = _perm_slices(dp)

    def permute0(x):
        return jnp.concatenate([x[a0:a1] for a0, a1 in perm], axis=0)

    def permute1(x):
        return jnp.concatenate([x[:, a0:a1] for a0, a1 in perm], axis=1)

    def jacobi_round(_, carry):
        a, vt = carry
        dall = jnp.sum(a * eye_dp[:, :, None], axis=1)  # (dp, P)
        apq = jnp.sum(a * sel[:, :, None], axis=1)[:half]  # (half, P)
        app, aqq = dall[:half], dall[half:]
        small = jnp.abs(apq) < 1e-30
        denom = jnp.where(small, 1.0, 2.0 * apq)
        tau = (aqq - app) / denom
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c

        def rot_rows(x):
            top, bot = x[:half], x[half:]
            return jnp.concatenate(
                [c[:, None, :] * top - s[:, None, :] * bot,
                 s[:, None, :] * top + c[:, None, :] * bot], axis=0)

        a = rot_rows(a)
        lef, rig = a[:, :half], a[:, half:]
        a = jnp.concatenate(
            [c[None] * lef - s[None] * rig,
             s[None] * lef + c[None] * rig], axis=1)
        vt = rot_rows(vt)
        return permute1(permute0(a)), permute0(vt)

    a, vt = jax.lax.fori_loop(0, sweeps * (dp - 1), jacobi_round, (a, vt))

    lam = jnp.maximum(jnp.sum(a * eye_dp[:, :, None], axis=1), 0.0)  # clamp

    clamped = jnp.zeros((dp, dp, P), f32)
    for k in range(dp):  # static unroll: V^T diag(lam) V
        row = vt[k]  # (dp, P)
        clamped = clamped + (row * lam[k][None])[:, None, :] * row[None, :, :]
    clamped = clamped[:d, :d]

    row_1d = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)

    # ---- Cholesky + two-sided solves ------------------------------------
    def chol(mat):
        """Lower Cholesky of (d, d, P), unrolled right-looking."""
        work = mat
        cols = []
        for j in range(d):
            diag = work[j, j][None]  # (1, P)
            inv_p = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
            col = work[:, j] * inv_p  # (d, P)
            col = col * (row_1d >= j).astype(f32)
            work = work - col[:, None, :] * col[None, :, :]
            cols.append(col)
        return jnp.stack(cols, axis=1)  # (d, d, P), L[:, j] = cols[j]

    def spd_inverse(mat):
        """(M + eps I)^-1 via Cholesky and 2x triangular solve, d rhs."""
        L = chol(mat + eps * eye_d[:, :, None])
        # forward: L Y = I
        rhs = jnp.broadcast_to(eye_d[:, :, None], (d, d, P))
        yrows = []
        for k in range(d):
            yk = rhs[k] / L[k, k][None]  # (d, P)
            rhs = rhs - L[:, k][:, None, :] * yk[None, :, :]
            yrows.append(yk)
        y = jnp.stack(yrows, axis=0)
        # backward: L^T X = Y
        xrows = [None] * d
        for k in reversed(range(d)):
            xk = y[k] / L[k, k][None]
            y = y - L[k, :][:, None, :] * xk[None, :, :]
            xrows[k] = xk
        return jnp.stack(xrows, axis=0)  # (d, d, P)

    def matmul(x, y):
        """(d,d,P) @ (d,d,P) lane-parallel."""
        acc = jnp.zeros((d, d, P), f32)
        for k in range(d):
            acc = acc + x[:, k][:, None, :] * y[k][None, :, :]
        return acc

    # step 1: A1 = I - BD * inv1
    inv1 = spd_inverse(clamped + bd)
    a1 = eye_d[:, :, None] - matmul(bd, inv1)
    # step 2 (closed form): cov2 = A1 Cemp A1^T
    cov2 = matmul(matmul(a1, cemp), jnp.swapaxes(a1, 0, 1))
    inv2 = spd_inverse(cov2 + bd)
    t2 = matmul(bd, inv2)
    a2 = eye_d[:, :, None] - t2

    def matvec(x, v):
        acc = jnp.zeros((d, P), f32)
        for k in range(d):
            acc = acc + x[:, k] * v[k][None, :]
        return acc

    b2 = matvec(t2, m)  # (d, P)

    # ---- filter every candidate ------------------------------------------
    def fo(o, carry):
        c_o = c_ref[pl.ds(o, 1)][0]  # (d, P)
        w = mask_ref[pl.ds(o, 1)]  # (1, P)
        y = (matvec(a2, c_o) + b2) * w
        field_ref[pl.ds(o, 1)] = y[None]
        return carry

    jax.lax.fori_loop(0, n_offsets, fo, 0)


@functools.partial(
    jax.jit, static_argnames=("npx", "sweeps", "interpret"))
def solve_filter(C_t, mask_t, noise_t, n_t, m_t, min_eigen,
                 npx: int = 9, sweeps: int = 6, interpret: bool = False):
    """Run the fused solve+filter kernel.

    C_t:     (O, d, P) candidate patch vectors, pixel batch LAST
    mask_t:  (O, P) similar-set masks (float 0/1)
    noise_t: (6*npx, P) mean noise covariance blocks
    n_t:     (1, P) similar-set sizes
    m_t:     (d, P) masked means
    Returns field_t (O, d, P): masked filtered candidate patches.
    P must be a multiple of 128 (pad with mask=0 pixels upstream).
    """
    n_offsets, d, p_total = C_t.shape
    assert p_total % LANES == 0, p_total
    grid = (p_total // LANES,)

    kernel = functools.partial(
        _solve_filter_kernel, n_offsets=n_offsets, d=d, npx=npx,
        sweeps=sweeps)

    lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    lane_spec3 = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    eps = jnp.asarray(min_eigen, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec3(n_offsets, d),
            lane_spec(n_offsets),
            lane_spec(6 * npx),
            lane_spec(1),
            lane_spec(d),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=lane_spec3(n_offsets, d),
        out_shape=jax.ShapeDtypeStruct((n_offsets, d, p_total), jnp.float32),
        interpret=interpret,
    )(C_t, mask_t, noise_t, n_t, m_t, eps)


def solve_filter_reference(C_t, mask_t, noise_t, n_t, m_t, min_eigen,
                           npx: int = 9, exact_floor: bool = True):
    """Plain-XLA twin of the kernel for testing (float32, same math;
    ``exact_floor=True`` uses the reference's eigenvalue floor instead of
    the kernel's (M + eps I) Cholesky substitute)."""
    from bcd_tpu.ops.cov3x3 import blockdiag_expand, cov6_to_mat3
    from bcd_tpu.ops.sym_eigh import sym_apply

    O, d, P = C_t.shape
    C = jnp.moveaxis(C_t, -1, 0)  # (P, O, d)
    mask = jnp.moveaxis(mask_t, -1, 0)  # (P, O)
    noise6 = jnp.moveaxis(noise_t, -1, 0).reshape(P, npx, 6)
    n = n_t[0]  # (P,)
    m = jnp.moveaxis(m_t, -1, 0)  # (P, d)

    bd = blockdiag_expand(cov6_to_mat3(noise6))
    mk = mask[..., None]
    m2 = jnp.einsum("pok,pol->pkl", mk * C, C)
    nm1 = jnp.maximum(n - 1.0, 1.0)[:, None, None]
    cemp = (m2 - n[:, None, None] * m[:, :, None] * m[:, None, :]) / nm1

    clamped = sym_apply(cemp - bd, lambda l: jnp.maximum(l, 0.0))
    if exact_floor:
        inv = lambda mat: sym_apply(  # noqa: E731
            mat, lambda l: 1.0 / jnp.maximum(l, min_eigen))
    else:
        eye = jnp.eye(d)
        inv = lambda mat: jnp.linalg.inv(mat + min_eigen * eye)  # noqa: E731
    inv1 = inv(clamped + bd)
    eye = jnp.eye(d)
    a1 = eye - jnp.einsum("pkl,plj->pkj", bd, inv1)
    cov2 = jnp.einsum("pkl,plj,pmj->pkm", a1, cemp, a1)
    inv2 = inv(cov2 + bd)
    t2 = jnp.einsum("pkl,plj->pkj", bd, inv2)
    a2 = eye - t2
    b2 = jnp.einsum("pkl,pl->pk", t2, m)
    x2 = jnp.einsum("pkl,pol->pok", a2, C) + b2[:, None, :]
    field = mk * x2
    return jnp.moveaxis(field, 0, -1)  # (O, d, P)
