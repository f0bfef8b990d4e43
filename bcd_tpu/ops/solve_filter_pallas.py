"""Fused Pallas TPU kernels for the per-pixel Bayesian solve.

This is the per-pixel hot path of the denoiser (reference DenoisingUnit.cpp
steps: empiricalCovarianceMatrix + clampNegativeEigenValues +
inverseSymmetricMatrix + finalDenoisingMatrixMultiplication) fused into
VMEM-resident kernels. XLA codegen for millions of tiny (27-dim) per-pixel
matrices is lane-starved (27 of 128 lanes used) and HBM-bound between ops;
here the PIXEL batch lives on the lane axis — every op is a full-width
vector op on (d, d, 128) tiles that never leave VMEM.

Two kernels share the math core:

- ``solve_filter``: candidate-stack form. Takes the gathered (O, d, P)
  candidate patch vectors + masks, computes the masked moments itself, and
  emits the filtered candidate fields. Used by the tile engine's
  per-candidate path (monoscale.py, cfg.use_pallas).
- ``solve_matrices`` (K2 of the fully fused pipeline, ops/fused_pallas.py):
  moment form. Takes the PRE-ACCUMULATED masked moments from the spatial
  ``masks_moments`` kernel (raw second moment M2, patch sums, patch-cov
  sums, set sizes) and emits only the per-pixel filter (A2^T, b2) — the
  candidates never exist in HBM at all; ``apply_scatter`` re-derives the
  filtered fields as spatial correlations.

Math pipeline (all per pixel, vectorized over 128 lanes):
- masked second moment   M2 = sum_o mask_o c_o c_o^T
- empirical covariance   Cemp = (M2 - n m m^T)/(n-1)
- eigenvalue clamp of (Cemp - N) via cyclic Jacobi with the Brent-Luk
  systolic pairing in ONE-SIDED ACCUMULATION form (see
  ``_jacobi_clamp_psd``): rotation pairs are always (i, i+half), and the
  loop maintains Q / W = Q A with row-only plane-granular updates — no
  sublane-axis shuffles at all.
- floored inversions as Cholesky of (M + minEigen I): equivalent to the
  reference's eigenvalue floor except in eigendirections with
  lambda ~ minEigen, where the filtered deviations are themselves
  O(sqrt(lambda)) (validated immaterial against the float64 oracle).
  ``solve_matrices`` never forms the inverse: it solves
  (M + eps I) X = BD directly (forward + back substitution,
  ``_make_spd_solve``); products are sums of row-outer-products
  (X^T Y = sum_k rowX_k^T rowY_k), which need only row slices.
- filter                 A2 = I - N inv2, b2 = N inv2 m
  (solve_filter additionally applies it: field_o = mask_o (A2 c_o + b2))

Mosaic practicalities that shaped the code (measured on v5e through this
environment's remote-compile tunnel): 1-D intermediates (``x[k][None]``)
cost ~35 s of compile time EACH and can crash the compiler; dynamic-index
reads/writes of VMEM refs and keepdim ``lax.slice_in_dim`` are fast; so
every loop is a ``fori_loop`` whose body touches scratch REFS with
``pl.ds`` and produces no rank-1 values, and axis-insertion outer products
appear only inside loop bodies (compiled once).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _rsqrt_exact(x):
    """rsqrt with one Newton-Raphson refinement.

    The TPU VPU's rsqrt is an approximation, and the terminal forces
    --xla_allow_excess_precision=true, which also canonicalizes
    1/jnp.sqrt(x) into that same approximation — an explicit Newton step
    is the only reliable way to full fp32 accuracy. Caught by the
    on-hardware gate (make verify-tpu [1]): compiled-vs-twin rms was
    5.5e-4 with raw rsqrt in the Cholesky pivots and Jacobi rotation
    coefficients (non-orthogonal rotations compound over the ~108
    rounds), vs 4e-7 interpreted."""
    r = jax.lax.rsqrt(x)
    return r * (1.5 - 0.5 * x * r * r)


def _eye3(d: int):
    ri3 = jax.lax.broadcasted_iota(jnp.int32, (d, d, 1), 0)
    ci3 = jax.lax.broadcasted_iota(jnp.int32, (d, d, 1), 1)
    return ri3, ci3, (ri3 == ci3).astype(jnp.float32)


def _jacobi_clamp_psd(x, d, dp, sweeps, y0_s, y1_s, vt_s, lam_s):
    """Eigenvalue-clamp a symmetric (d, d, P) value at zero (the reference's
    clampNegativeEigenValues, DenoisingUnit.cpp:606-630) via fixed-schedule
    Brent-Luk Jacobi. Uses vt_s (dp, dp, P) / lam_s (dp, P) scratch refs;
    returns the clamped (d, d, P) value.

    ONE-SIDED ACCUMULATION form: instead of conjugating A two-sidedly
    (whose column rotation mixes SUBLANE slices at misaligned offsets —
    the dominant per-round cost on TPU), the loop maintains Q (the
    accumulated rotations, rows = eigenvector estimates) and W = Q A.
    Both update with ROW-ONLY plane-granular ops; the pivot entries of
    the implicit two-sided matrix are recovered as inner products,
    apq = <W[i,:], Q[i+half,:]>, one aligned multiply-reduce per round.
    The diagonal is carried analytically (app' = app - t apq,
    aqq' = aqq + t apq) for the rotation angles; the final eigenvalues
    are read back exactly as lam_k = <W[k,:], Q[k,:]>.

    FAST-GIVENS (square-root-free) rotations: the loop actually stores
    SCALED rows, true row k = f_k * stored row k, with the same scale
    vector f for W and Q (both rotate identically). One rotation is then
    a single FMA per element per matrix — top' = top + alpha * bot,
    bot' = beta * top + bot with alpha = -s f_q / (c f_p),
    beta = s f_p / (c f_q) — instead of the plain form's two multiplies
    plus add (2x the vector FLOPs; this loop is the VPU-bound core of
    K2). Scales update analytically (f_p' = c f_p, f_q' = c f_q) and the
    rows are RENORMALIZED at every sweep boundary, which bounds
    f >= (1/sqrt(2))^(dp-1) ~ 9e-5 between renorms — comfortably inside
    fp32. Validated on golden-scene and adversarial moments: the
    filtered-candidate rms vs float64 truth is IDENTICAL to the plain
    rotation at every sweep count (the rotations are algebraically the
    same; only the rounding pattern differs).

    W and Q are FUSED into one (dp, 2*dpad, P) array Y (W in sublane
    columns [0, dpad), Q in [dpad, 2*dpad), dpad = align8(dp)): the two
    matrices rotate with identical coefficients, so one plane op per
    re-seating piece rotates both — half the instruction streams and one
    concat per round instead of two. The pad columns are zero and stay
    zero (rotations are row-linear), so the inner products can run over
    the full aligned widths.

    The Brent-Luk re-seating [0, h, 1..h-2, h+1..2h-1, h-1] is FUSED into
    the rotation WRITES: each rotated piece is written directly at its
    re-seated plane offset in the other ping-pong ref (y0_s <-> y1_s), so
    a round costs one FMA + one write per element with NO concat copy and
    no loop-carried (dp, 2*dpad, P) value (the round-4 rewrite: the old
    concat-and-carry form measured ~2x this loop's FMA floor e2e). f and
    dall ride along as (dp, 1, P) PLANE-shaped values so their re-seating
    concats are plane-granular too (as 2-D (dp, P) values they concat on
    the sublane axis at misaligned offsets — a relayout every round)."""
    P = x.shape[-1]
    f32 = jnp.float32
    half = dp // 2
    # dp even (2*half rows, dp-1 odd rounds); dp >= 4 so round_body's fixed
    # write layout never aliases row D0 (half == 1 would)
    assert dp % 2 == 0 and dp >= 4, dp
    dpad = -(-dp // 8) * 8
    ri3p = jax.lax.broadcasted_iota(jnp.int32, (dp, dpad, 1), 0)
    ci3p = jax.lax.broadcasted_iota(jnp.int32, (dp, dpad, 1), 1)
    eye3p = (ri3p == ci3p).astype(f32)

    w0 = jnp.pad(x, ((0, dp - d), (0, dpad - d), (0, 0)))  # W = Q A
    y0_s[:, 0:dpad] = w0
    y0_s[:, dpad:] = jnp.broadcast_to(eye3p, (dp, dpad, P))  # Q = I
    d0 = jnp.sum(w0 * eye3p, axis=1)  # (dp, P)

    def round_body(yin, yout, dall, f):
        # true apq[i] = (Q A Q^T)[i, i+half]
        #             = f_i f_{i+half} sum_j W~[i, j] Q~[i+half, j]
        # (pad columns are zero in both halves, so full-width sums are
        # exact). The per-pair chain runs on 2-D (half, P) values — dense
        # sublane packing, 7x fewer vregs than (half, 1, P) planes.
        s_t = jnp.sum(yin[:half, :dpad] * yin[half:, dpad:], axis=1)
        fp, fq = f[:half], f[half:]
        apq = s_t * (fp * fq)
        app, aqq = dall[:half], dall[half:]
        small = jnp.abs(apq) < 1e-30
        denom = jnp.where(small, 1.0, 2.0 * apq)
        tau = (aqq - app) / denom
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)
        t = jnp.where(small, 0.0, t)
        c = _rsqrt_exact(1.0 + t * t)  # (half, P)
        s = t * c
        inv_cf = 1.0 / (c * fp * fq)
        an = jnp.where(small, 0.0, -s * fq * fq * inv_cf)[:, None, :]
        bn = jnp.where(small, 0.0, s * fp * fp * inv_cf)[:, None, :]

        # U[i] = top[i] + alpha[i] bot[i], D[i] = beta[i] top[i] + bot[i];
        # re-seated layout [U0, D0, U1..U(h-2), D1..D(h-1), U(h-1)]
        # written straight into yout (5 static plane slices):
        top, bot = yin[:half], yin[half:]
        yout[0:1] = top[0:1] + an[0:1] * bot[0:1]
        yout[1:2] = bn[0:1] * top[0:1] + bot[0:1]
        yout[2:half] = top[1 : half - 1] + an[1 : half - 1] * bot[1 : half - 1]
        yout[half : dp - 1] = bn[1:half] * top[1:half] + bot[1:half]
        yout[dp - 1 : dp] = (top[half - 1 : half]
                             + an[half - 1 : half] * bot[half - 1 : half])

        def reseat(u, dn):
            return jnp.concatenate(
                [u[0:1], dn[0:1], u[1 : half - 1], dn[1:half],
                 u[half - 1 : half]], axis=0)

        return (reseat(app - t * apq, aqq + t * apq),
                reseat(c * fp, c * fq))

    def double_round(_, carry):
        dall, f = carry
        dall, f = round_body(y0_s, y1_s, dall, f)
        dall, f = round_body(y1_s, y0_s, dall, f)
        return dall, f

    def jacobi_sweep(_, dall):
        dall, f = jax.lax.fori_loop(
            0, (dp - 1) // 2, double_round,
            (dall, jnp.ones((dp, P), f32)))
        dall, f = round_body(y0_s, y1_s, dall, f)  # final (odd) round
        # renormalize: fold the scales back into the rows so f stays in
        # fp32 range across sweeps (doubles as the ping-pong copy-back)
        y0_s[:] = y1_s[:] * f[:, None, :]
        return dall

    jax.lax.fori_loop(0, sweeps, jacobi_sweep, d0)
    vt_s[:] = y0_s[:, dpad : dpad + dp]
    # exact final eigenvalues: lam_k = (Q A Q^T)[k, k] = <W[k,:], Q[k,:]>
    lam_s[:] = jnp.maximum(
        jnp.sum(y0_s[:, 0:dpad] * y0_s[:, dpad:], axis=1), 0.0)  # (dp, P)

    # clamped = sum_k lam_k q_k^T q_k (rows of Q are eigenvectors)
    def recon(k, acc):
        row = vt_s[pl.ds(k, 1)]  # (1, dp, P)
        lk = lam_s[pl.ds(k, 1)]  # (1, P)
        return acc + jnp.swapaxes(row, 0, 1) * (row * lk[None])

    return jax.lax.fori_loop(
        0, dp, recon, jnp.zeros((dp, dp, P), f32), unroll=dp)[:d, :d]


def _make_spd_inverse(a_s, rhs_s, lt_s, y_s, d, eps):
    """Closure: SPD inverse of a (d, d, P) value as chol(M + eps I),
    Y = L^-1 by forward substitution, inv = Y^T Y. Uses the given (d, d, P)
    scratch refs."""
    f32 = jnp.float32
    _, _, eye3 = _eye3(d)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, d, 1), 1)

    def spd_inverse(mat):
        a_s[:] = mat + eps * eye3  # cholesky working matrix
        rhs_s[:] = jnp.broadcast_to(eye3, mat.shape)

        def chol_step(j, carry):
            rowj = a_s[pl.ds(j, 1)]  # (1, d, P)
            pivot = jnp.sum(rowj * (col_iota == j).astype(f32), axis=1,
                            keepdims=True)  # (1, 1, P)
            invp = _rsqrt_exact(jnp.maximum(pivot, 1e-30))
            colv = rowj * invp * (col_iota >= j).astype(f32)  # (1, d, P)
            lt_s[pl.ds(j, 1)] = colv  # LT row j = L column j
            a_s[:] = a_s[:] - jnp.swapaxes(colv, 0, 1) * colv
            return carry

        # NOTE: the Schur complement stays symmetric, so row j of the
        # updated matrix IS column j — rows are all we ever read.
        jax.lax.fori_loop(0, d, chol_step, 0)

        def fwd_step(k, _):
            ltrow = lt_s[pl.ds(k, 1)]  # (1, d, P): L column k
            pivot = jnp.sum(ltrow * (col_iota == k).astype(f32), axis=1,
                            keepdims=True)
            yk = rhs_s[pl.ds(k, 1)] / pivot  # (1, d, P)
            y_s[pl.ds(k, 1)] = yk
            rhs_s[:] = rhs_s[:] - jnp.swapaxes(ltrow, 0, 1) * yk
            return _

        jax.lax.fori_loop(0, d, fwd_step, 0)

        def yty_step(k, acc):
            yk = y_s[pl.ds(k, 1)]  # (1, d, P)
            return acc + jnp.swapaxes(yk, 0, 1) * yk

        return jax.lax.fori_loop(
            0, d, yty_step, jnp.zeros(mat.shape, f32))

    return spd_inverse


def _make_spd_solve(a_s, rhs_s, lt_s, d, eps):
    """Closure: solve (M + eps I) X = RHS for SPD M via Cholesky with
    forward + back substitution — one fewer O(d^3) pass than forming the
    inverse and multiplying (no Y^T Y product). X is left in rhs_s.

    All three passes are PYTHON loops with STATIC axis-0 slices so each
    rank-1 update touches only the rows it changes: the Schur update
    runs on a_s[j+1:], the forward substitution on rhs_s[k+1:], and the
    back-substitution contraction on rhs_s[k:] (L^T[k, i<k] = 0 — those
    rows hold Y and contribute nothing). Axis 0 of the (d, d, P) scratch
    is the untiled major axis, so shrinking slices save real work at
    every step — the traced-loop version updated all d rows each time
    (2x the FMAs per solve). Axis-1 (sublane) masks stay full width.

    The back pass uses only axis-0 row reads: rows of lt_s are rows of
    L^T, so sum_i L^T[k,i] * row_i is an axis-0 contraction; row k's
    pivot * Y[k] term is added back analytically."""
    f32 = jnp.float32
    _, _, eye3 = _eye3(d)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, d, 1), 1)

    def spd_solve(mat, rhs_val):
        a_s[:] = mat + eps * eye3
        rhs_s[:] = rhs_val

        for j in range(d):
            rowj = a_s[j : j + 1]  # (1, d, P)
            pivot = jnp.sum(rowj * (col_iota == j).astype(f32), axis=1,
                            keepdims=True)
            invp = _rsqrt_exact(jnp.maximum(pivot, 1e-30))
            colv = rowj * invp * (col_iota >= j).astype(f32)
            lt_s[j : j + 1] = colv  # LT row j = L column j
            if j + 1 < d:
                # NOTE: the Schur complement stays symmetric, so row i of
                # the updated matrix IS column i — rows are all we read
                a_s[j + 1 :] = (a_s[j + 1 :]
                                - jnp.swapaxes(colv, 0, 1)[j + 1 :] * colv)

        for k in range(d):
            ltrow = lt_s[k : k + 1]  # (1, d, P): L column k
            pivot = jnp.sum(ltrow * (col_iota == k).astype(f32), axis=1,
                            keepdims=True)
            yk = rhs_s[k : k + 1] / pivot
            if k + 1 < d:
                # L[i, k] = 0 for i <= k: only rows below k change
                rhs_s[k + 1 :] = (rhs_s[k + 1 :]
                                  - jnp.swapaxes(ltrow, 0, 1)[k + 1 :] * yk)
            rhs_s[k : k + 1] = yk

        for k in range(d - 1, -1, -1):
            ltrow = lt_s[k : k + 1]  # (1, d, P): row k of L^T
            pivot = jnp.sum(ltrow * (col_iota == k).astype(f32), axis=1,
                            keepdims=True)
            s_full = jnp.sum(
                jnp.swapaxes(ltrow, 0, 1)[k:] * rhs_s[k:], axis=0,
                keepdims=True)  # (1, d, P)
            yk = rhs_s[k : k + 1]
            rhs_s[k : k + 1] = (yk - (s_full - pivot * yk)) / pivot

    return spd_solve


def _make_xty(d, P):
    """Closure: X^T Y for symmetric X from two (d, d, P) scratch refs, as a
    sum of row outer products (only row slices are ever read)."""

    def xty(x_ref_like, y_ref_like):
        def step(k, acc):
            xr = x_ref_like[pl.ds(k, 1)]
            yr = y_ref_like[pl.ds(k, 1)]
            return acc + jnp.swapaxes(xr, 0, 1) * yr

        return jax.lax.fori_loop(
            0, d, step, jnp.zeros((d, d, P), jnp.float32), unroll=d)

    return xty


_COV_PAIRS = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]  # xx yy zz yz xz xy


def _blockdiag_noise(read_channel, d, npx, P):
    """Dense (d, d, P) block-diagonal noise covariance from per-patch-pixel
    6-channel blocks; ``read_channel(idx)`` returns the (1, P) channel
    value (channel order xx,yy,zz,yz,xz,xy, CovarianceMatrix.h:18-28)."""
    f32 = jnp.float32
    ri3, ci3, _ = _eye3(d)
    bd = jnp.zeros((d, d, P), f32)
    for q in range(npx):
        for ch, (i, j) in enumerate(_COV_PAIRS):
            a_, b_ = 3 * q + i, 3 * q + j
            one = ((ri3 == a_) & (ci3 == b_)) | ((ri3 == b_) & (ci3 == a_))
            nv = read_channel(6 * q + ch)  # (1, P)
            bd = bd + one.astype(f32) * nv[None]
    return bd


def _solve_filter_kernel(c_ref, mask_ref, noise_ref, n_ref, m_ref, eps_ref,
                         field_ref,
                         m2_s, a_s, vt_s, lam_s, y0_s, y1_s, lt_s, y_s, rhs_s, t2t_s,
                         work_s, inv_s, bd_s, a1t_s,
                         *, n_offsets, d, npx, sweeps):
    dp = d + 1 if d % 2 else d  # padded (even) size for the pairing schedule
    P = LANES
    f32 = jnp.float32

    n = n_ref[:]  # (1, P)
    m = m_ref[:]  # (d, P)
    eps = eps_ref[0, 0]
    _, _, eye3 = _eye3(d)

    mask3 = mask_ref[:][:, None, :]  # (O, 1, P), hoisted loop-invariant

    # ---- masked second moment: row i of M2 = sum_o (w c)[o,i] * c[o,:] ---
    def m2_row(i, carry):
        ci = c_ref[:, pl.ds(i, 1)]  # (O, 1, P)
        row = jnp.sum(ci * mask3 * c_ref[:], axis=0, keepdims=True)
        m2_s[pl.ds(i, 1)] = row  # (1, d, P)
        return carry

    jax.lax.fori_loop(0, d, m2_row, 0)

    nm1 = jnp.maximum(n - 1.0, 1.0)  # (1, P)
    m2 = m2_s[:]
    cemp = (m2 - n[None] * m[:, None, :] * m[None, :, :]) / nm1[None]
    work_s[:] = cemp  # keep Cemp for step 2

    bd_s[:] = _blockdiag_noise(
        lambda idx: noise_ref[pl.ds(idx, 1)], d, npx, P)
    bd = bd_s[:]

    clamped = _jacobi_clamp_psd(
        cemp - bd, d, dp, sweeps, y0_s, y1_s, vt_s, lam_s)

    spd_inverse = _make_spd_inverse(a_s, rhs_s, lt_s, y_s, d, eps)
    xty = _make_xty(d, P)

    # step 1: inv1 = (clamped + BD + eps I)^-1 ; A1^T = I - inv1 BD
    inv_s[:] = spd_inverse(clamped + bd)
    a1t_s[:] = jnp.broadcast_to(eye3, (d, d, P)) - xty(inv_s, bd_s)

    # step 2 (closed form): cov2 = A1 Cemp A1^T
    #   H = Cemp A1^T (Cemp symmetric), cov2 = A1 H = (A1^T)^T H
    m2_s[:] = xty(work_s, a1t_s)  # H (reuse m2 scratch)
    cov2 = xty(a1t_s, m2_s)
    inv_s[:] = spd_inverse(cov2 + bd)
    t2t_s[:] = xty(inv_s, bd_s)  # T2^T = inv2 BD; T2 = BD inv2

    # b2 = T2 m: b2[i] = sum_k T2T[k, i] m[k]
    def b2_step(k, acc):
        t2tk = t2t_s[pl.ds(k, 1)]  # (1, d, P)
        mk = m_ref[pl.ds(k, 1)]  # (1, P)
        return acc + t2tk * mk[None]

    b2 = jax.lax.fori_loop(0, d, b2_step, jnp.zeros((1, d, P), f32))

    # ---- filter all candidates: field = (C - C T2^T + b2) * mask ---------
    # tmp[o, i] = sum_k C[o, k] T2T[k, i]  (= sum_k T2[i, k] C[o, k])
    def filt_step(k, acc):
        ck = c_ref[:, pl.ds(k, 1)]  # (O, 1, P)
        t2tk = t2t_s[pl.ds(k, 1)]  # (1, d, P)
        return acc + ck * t2tk

    tmp = jax.lax.fori_loop(
        0, d, filt_step, jnp.zeros((n_offsets, d, P), f32))
    field_ref[:] = (c_ref[:] - tmp + b2) * mask_ref[:][:, None, :]


@functools.partial(
    jax.jit, static_argnames=("npx", "sweeps", "interpret"))
def solve_filter(C_t, mask_t, noise_t, n_t, m_t, min_eigen,
                 npx: int = 9, sweeps: int = 6, interpret: bool = False):
    """Run the fused solve+filter kernel (candidate-stack form).

    C_t:     (O, d, P) candidate patch vectors, pixel batch LAST
    mask_t:  (O, P) similar-set masks (float 0/1)
    noise_t: (6*npx, P) mean noise covariance blocks (xx,yy,zz,yz,xz,xy)
    n_t:     (1, P) similar-set sizes
    m_t:     (d, P) masked means
    Returns field_t (O, d, P): masked filtered candidate patches.
    P must be a multiple of 128 (pad with mask=0 pixels upstream).
    """
    n_offsets, d, p_total = C_t.shape
    assert p_total % LANES == 0, p_total
    dp = d + 1 if d % 2 else d
    dpad = -(-dp // 8) * 8
    grid = (p_total // LANES,)

    kernel = functools.partial(
        _solve_filter_kernel, n_offsets=n_offsets, d=d, npx=npx,
        sweeps=sweeps)

    lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    lane_spec3 = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    eps = jnp.asarray(min_eigen, jnp.float32).reshape(1, 1)
    scratch = [
        pltpu.VMEM((d, d, LANES), jnp.float32),    # m2_s / H
        pltpu.VMEM((d, d, LANES), jnp.float32),    # a_s (cholesky working)
        pltpu.VMEM((dp, dp, LANES), jnp.float32),  # vt_s
        pltpu.VMEM((dp, LANES), jnp.float32),      # lam_s
        pltpu.VMEM((dp, 2 * dpad, LANES), jnp.float32),  # y0_s
        pltpu.VMEM((dp, 2 * dpad, LANES), jnp.float32),  # y1_s
        pltpu.VMEM((d, d, LANES), jnp.float32),    # lt_s
        pltpu.VMEM((d, d, LANES), jnp.float32),    # y_s
        pltpu.VMEM((d, d, LANES), jnp.float32),    # rhs_s
        pltpu.VMEM((d, d, LANES), jnp.float32),    # t2t_s
        pltpu.VMEM((d, d, LANES), jnp.float32),    # work_s (Cemp)
        pltpu.VMEM((d, d, LANES), jnp.float32),    # inv_s
        pltpu.VMEM((d, d, LANES), jnp.float32),    # bd_s
        pltpu.VMEM((d, d, LANES), jnp.float32),    # a1t_s
    ]
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(C_t, mask_t, noise_t, n_t, m_t, eps)


def _two_step_solve(m2, msum, nov_read, n, eps,
                    a_s, vt_s, lam_s, y0_s, y1_s, lt_s, rhs_s, t2t_s,
                    work_s, bd_s, a1t_s, h_s, m_s,
                    *, d, npx, sweeps):
    """Shared math core of the moment-form solve (values in, values out).

    m2:   (d, d, P) raw masked second moments
    msum: (d, P) masked patch sums (NOT yet / n)
    nov_read(idx): (1, P) masked patch-cov channel sum (NOT yet / n)
    n:    (1, P) similar-set sizes
    Returns (a2t (d, d, P) with a2t[k, j] = A2[j, k], b2 (1, d, P),
    m (d, P) the masked mean). Scratch refs as in the callers.
    """
    from bcd_tpu.ops.fused_pallas import _SKIP

    dp = d + 1 if d % 2 else d
    P = n.shape[-1]
    f32 = jnp.float32
    inv_n = 1.0 / jnp.maximum(n, 1.0)
    _, _, eye3 = _eye3(d)

    m_s[:] = msum * inv_n  # masked mean m = msum / n, (d, P)
    m = m_s[:]
    nm1 = jnp.maximum(n - 1.0, 1.0)
    cemp = (m2 - n[None] * m[:, None, :] * m[None, :, :]) / nm1[None]
    work_s[:] = cemp  # keep Cemp for step 2

    if "k2bd" in _SKIP:  # e2e bisect: identity-ish noise blocks
        bd_s[:] = jnp.broadcast_to(eye3, (d, d, P)) * 1e-3
    else:
        bd_s[:] = _blockdiag_noise(
            lambda idx: nov_read(idx) * inv_n, d, npx, P)
    bd = bd_s[:]

    if "k2jac" in _SKIP:  # e2e bisect: no eigenvalue clamp
        clamped = cemp - bd
    else:
        clamped = _jacobi_clamp_psd(
            cemp - bd, d, dp, sweeps, y0_s, y1_s, vt_s, lam_s)

    spd_solve = _make_spd_solve(a_s, rhs_s, lt_s, d, eps)
    if "k2chol" in _SKIP:  # e2e bisect: pass-through solves
        spd_solve = lambda mat, rhs_val: rhs_s.__setitem__(  # noqa: E731
            slice(None), rhs_val)
    xty = _make_xty(d, P)
    if "k2xty" in _SKIP:  # e2e bisect: pass-through products
        xty = lambda x_ref_like, y_ref_like: y_ref_like[:]  # noqa: E731

    # step 1: solve (clamped + BD + eps I) X = BD => X = inv1 BD;
    # A1^T = I - X (one fewer O(d^3) pass than inverse-then-product)
    spd_solve(clamped + bd, bd)
    a1t_s[:] = jnp.broadcast_to(eye3, (d, d, P)) - rhs_s[:]

    # step 2 (closed form): cov2 = A1 Cemp A1^T
    h_s[:] = xty(work_s, a1t_s)  # H = Cemp A1^T
    cov2 = xty(a1t_s, h_s)
    spd_solve(cov2 + bd, bd)  # X = inv2 BD = T2^T; T2 = BD inv2
    t2t_s[:] = rhs_s[:]

    # A2^T = I - T2^T, in the k-major packing apply_scatter expects:
    # a2t[k, j] = A2[j, k]
    a2t = jnp.broadcast_to(eye3, (d, d, P)) - t2t_s[:]

    # b2 = T2 m: b2[i] = sum_k T2T[k, i] m[k]
    def b2_step(k, acc):
        t2tk = t2t_s[pl.ds(k, 1)]  # (1, d, P)
        mk = m_s[pl.ds(k, 1)]  # (1, P)
        return acc + t2tk * mk[None]

    b2 = jax.lax.fori_loop(0, d, b2_step, jnp.zeros((1, d, P), f32))
    return a2t, b2, m


def _solve_matrices_kernel(m2_ref, msum_ref, nov_ref, n_ref, eps_ref,
                           a2t_ref, b2_ref,
                           a_s, vt_s, lam_s, y0_s, y1_s, lt_s, rhs_s, t2t_s,
                           work_s, bd_s, a1t_s, h_s, m_s,
                           *, d, npx, sweeps, lanes):
    a2t, b2, _ = _two_step_solve(
        m2_ref[:], msum_ref[:], lambda idx: nov_ref[pl.ds(idx, 1)],
        n_ref[:], eps_ref[0, 0],
        a_s, vt_s, lam_s, y0_s, y1_s, lt_s, rhs_s, t2t_s, work_s, bd_s, a1t_s, h_s,
        m_s, d=d, npx=npx, sweeps=sweeps)
    a2t_ref[:] = a2t
    b2_ref[:] = b2


@functools.partial(
    jax.jit, static_argnames=("npx", "sweeps", "interpret", "lanes"))
def solve_matrices(m2_t, msum_t, nov_t, n_t, min_eigen,
                   npx: int = 9, sweeps: int = 6, interpret: bool = False,
                   lanes: int = LANES):
    """Run the moment-form solve kernel (K2 of the fused pipeline).

    m2_t:   (d, d, P) RAW masked second moments sum_o w c_o c_o^T
            (from ``masks_moments``; lane-marshaled upstream)
    msum_t: (d, P) masked color-patch sums (NOT yet divided by n)
    nov_t:  (6*npx, P) masked patch pixel-cov sums (NOT yet divided by n)
    n_t:    (1, P) similar-set sizes (pad lanes with n=1, moments 0)
    Returns (a2t (d, d, P), b2 (1, d, P)) with a2t[k, j, p] = A2[p][j, k]
    — flattening (k, j) row-major gives exactly ``apply_scatter``'s k-major
    packing. P must be a multiple of 128.
    """
    d = m2_t.shape[0]
    p_total = m2_t.shape[-1]
    assert p_total % lanes == 0, (p_total, lanes)
    dp = d + 1 if d % 2 else d
    dpad = -(-dp // 8) * 8
    grid = (p_total // lanes,)

    kernel = functools.partial(
        _solve_matrices_kernel, d=d, npx=npx, sweeps=sweeps, lanes=lanes)

    lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, lanes), lambda i: (0, i), memory_space=pltpu.VMEM)
    lane_spec3 = lambda rows, cols: pl.BlockSpec(  # noqa: E731
        (rows, cols, lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    eps = jnp.asarray(min_eigen, jnp.float32).reshape(1, 1)
    dd = lambda: pltpu.VMEM((d, d, lanes), jnp.float32)  # noqa: E731
    scratch = [
        dd(),                                      # a_s (cholesky working)
        pltpu.VMEM((dp, dp, lanes), jnp.float32),  # vt_s
        pltpu.VMEM((dp, lanes), jnp.float32),      # lam_s
        pltpu.VMEM((dp, 2 * dpad, lanes), jnp.float32),  # y0_s
        pltpu.VMEM((dp, 2 * dpad, lanes), jnp.float32),  # y1_s
        dd(),                                      # lt_s
        dd(),                                      # rhs_s (solve RHS/X)
        dd(),                                      # t2t_s
        dd(),                                      # work_s (Cemp)
        dd(),                                      # bd_s
        dd(),                                      # a1t_s
        dd(),                                      # h_s
        pltpu.VMEM((d, lanes), jnp.float32),       # m_s
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec3(d, d),
            lane_spec(d),
            lane_spec(6 * npx),
            lane_spec(1),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            lane_spec3(d, d),
            lane_spec3(1, d),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, d, p_total), jnp.float32),
            jax.ShapeDtypeStruct((1, d, p_total), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(m2_t, msum_t, nov_t, n_t, eps)


def _mxu_t(x, precision=jax.lax.Precision.HIGHEST):
    """Transpose a 2-D value on the MXU: X^T = dot(I_b, X^T-form) via a
    dim1 x dim1 contraction against an in-kernel identity. BIT-EXACT for
    fp32 at precision=HIGHEST (permutation-matrix dots: each output is
    1.0 * v with the bf16x3 split of v reconstructing exactly — verified
    on hardware, scripts/probe_transpose.py) and ~free next to the
    pallas I/O (the probe's no-op I/O baseline times the same). Callers
    transposing 0/1-valued data may pass precision=DEFAULT (a single
    bf16 pass is already exact for 0/1)."""
    nb_ = x.shape[1]
    ri = jax.lax.broadcasted_iota(jnp.int32, (nb_, nb_), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (nb_, nb_), 1)
    eye = (ri == ci).astype(jnp.float32)
    return jax.lax.dot_general(
        eye, x, (((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32)


# misc channel map emitted by masks_moments2 (K1) and consumed here:
#   [0:d]            masked color-patch sums (msum)
#   [d:d+6*npx]      masked patch-cov sums (nov)
#   [d+6*npx]        similar-set size n
#   [d+6*npx+1]      center_valid flag
# small_pm channel map emitted for apply_scatter2 (K4):
#   [0:d]    b2, [d] main-path gate, [d+1:2d+1] fb * mean patch,
#   [2d+1]   fb flag;  rest zero (pad to 64 lanes)
SMALL_CH = 64


def _solve_matrices_pm_kernel(expand_ref, m2_ref, misc_ref, eps_ref,
                              a2t_ref, small_ref,
                              a_s, vt_s, lam_s, y0_s, y1_s, lt_s, rhs_s, t2t_s,
                              work_s, bd_s, a1t_s, h_s, m_s, nov_s, sm_s,
                              *, d, npx, sweeps):
    """Pixel-major K2: moments arrive as (128, dtri)/(128, 128) pixel rows
    straight from K1's compact output; the lane transposes and the
    triangle expansion run on the MXU in-kernel (this is what deleted the
    ~2.2 ms/tile XLA marshal between K1->K2->K4, round-2 VERDICT item 1a).
    Emits the filter back in pixel-major (128, d*d) rows plus the packed
    small channels [b2, gate, fbm, fb] so K4 needs no XLA marshaling
    either (gates per reference DenoisingUnit.cpp:182-191, 455-481)."""
    P = m2_ref.shape[0]  # 128 pixels on the LANE axis after transpose
    f32 = jnp.float32
    eps = eps_ref[0, 0]

    from bcd_tpu.ops.fused_pallas import _SKIP

    if "k2solve" in _SKIP:  # e2e bisect: pass-through identity filter
        a2t_ref[:] = jnp.zeros_like(a2t_ref)
        small_ref[:] = jnp.zeros_like(small_ref)
        return

    # --- MXU marshal in: transpose + triangle expansion in one dot -------
    # expanded[i, p] = m2_pm[p, tri[i]] = sum_k E[i, k] m2_pm[p, k]
    m2_t = jax.lax.dot_general(
        expand_ref[:], m2_ref[:], (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=f32).reshape(d, d, P)
    misc_t = _mxu_t(misc_ref[:])  # (128 ch, 128 px)
    msum = misc_t[0:d]
    nov_s[:] = misc_t[d : d + 6 * npx]
    n = misc_t[d + 6 * npx : d + 6 * npx + 1]
    cv = misc_t[d + 6 * npx + 1 : d + 6 * npx + 2]

    a2t, b2, m = _two_step_solve(
        m2_t, msum, lambda idx: nov_s[pl.ds(idx, 1)], n, eps,
        a_s, vt_s, lam_s, y0_s, y1_s, lt_s, rhs_s, t2t_s, work_s, bd_s,
        a1t_s, h_s, m_s, d=d, npx=npx, sweeps=sweeps)

    # --- gates (DenoisingUnit.cpp:182-191): main path needs n >= d+1 -----
    gate = jnp.where((n >= d + 1) & (cv > 0.0), 1.0, 0.0)  # (1, P)
    fb = cv * (1.0 - gate)

    # --- MXU marshal out: back to pixel-major rows -----------------------
    a2t_ref[:] = _mxu_t(a2t.reshape(d * d, P))  # (128, d*d)
    sm_s[0:d] = b2.reshape(d, P)
    sm_s[d : d + 1] = gate
    sm_s[d + 1 : 2 * d + 1] = fb * m
    sm_s[2 * d + 1 : 2 * d + 2] = fb
    sm_s[2 * d + 2 :] = jnp.zeros((SMALL_CH - 2 * d - 2, P), f32)
    small_ref[:] = _mxu_t(sm_s[:])  # (128, SMALL_CH)


@functools.partial(
    jax.jit, static_argnames=("npx", "sweeps", "interpret"))
def solve_matrices_pm(m2_pm, misc_pm, min_eigen,
                      npx: int = 9, sweeps: int = 6,
                      interpret: bool = False):
    """Run the pixel-major moment-form solve (K2 of the fused pipeline).

    m2_pm:   (P, d(d+1)/2) RAW masked second moments, upper-triangle
             packed, PIXEL rows (K1's compact core output)
    misc_pm: (P, 128) packed small moments (channel map above)
    Returns (a2t_pm (P, d*d) with row p = A2[p]^T k-major flattened,
    small_pm (P, 64) = [b2, gate, fb*m, fb]). P % 128 == 0.
    """
    from bcd_tpu.ops.fused_pallas import tri_geometry

    p_total, dtri = m2_pm.shape
    d = int((np.sqrt(8 * dtri + 1) - 1) / 2)
    assert d * (d + 1) // 2 == dtri, dtri
    assert p_total % LANES == 0, p_total
    dp = d + 1 if d % 2 else d
    dpad = -(-dp // 8) * 8
    _, tri_expand, _ = tri_geometry(d)
    expand = np.zeros((d * d, dtri), np.float32)
    expand[np.arange(d * d), tri_expand] = 1.0

    kernel = functools.partial(
        _solve_matrices_pm_kernel, d=d, npx=npx, sweeps=sweeps)

    eps = jnp.asarray(min_eigen, jnp.float32).reshape(1, 1)
    dd = lambda: pltpu.VMEM((d, d, LANES), jnp.float32)  # noqa: E731
    scratch = [
        dd(),                                      # a_s (cholesky working)
        pltpu.VMEM((dp, dp, LANES), jnp.float32),  # vt_s
        pltpu.VMEM((dp, LANES), jnp.float32),      # lam_s
        pltpu.VMEM((dp, 2 * dpad, LANES), jnp.float32),  # y0_s
        pltpu.VMEM((dp, 2 * dpad, LANES), jnp.float32),  # y1_s
        dd(),                                      # lt_s
        dd(),                                      # rhs_s (solve RHS/X)
        dd(),                                      # t2t_s
        dd(),                                      # work_s (Cemp)
        dd(),                                      # bd_s
        dd(),                                      # a1t_s
        dd(),                                      # h_s
        pltpu.VMEM((d, LANES), jnp.float32),       # m_s
        pltpu.VMEM((6 * npx, LANES), jnp.float32),  # nov_s
        pltpu.VMEM((SMALL_CH, LANES), jnp.float32),  # sm_s
    ]
    return pl.pallas_call(
        kernel,
        grid=(p_total // LANES,),
        in_specs=[
            pl.BlockSpec((d * d, dtri), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, dtri), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((LANES, d * d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, SMALL_CH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_total, d * d), jnp.float32),
            jax.ShapeDtypeStruct((p_total, SMALL_CH), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(expand), m2_pm, misc_pm, eps)


def solve_matrices_pm_reference(m2_pm, misc_pm, min_eigen,
                                npx: int = 9, exact_floor: bool = True):
    """Plain-XLA twin of ``solve_matrices_pm``: same pixel-major inputs
    and outputs."""
    from bcd_tpu.ops.cov3x3 import blockdiag_expand, cov6_to_mat3
    from bcd_tpu.ops.fused_pallas import tri_geometry

    p_total, dtri = m2_pm.shape
    d = int((np.sqrt(8 * dtri + 1) - 1) / 2)
    _, tri_expand, _ = tri_geometry(d)
    m2 = m2_pm[:, tri_expand].reshape(p_total, d, d)
    msum = misc_pm[:, 0:d]
    nov = misc_pm[:, d : d + 6 * npx]
    n = misc_pm[:, d + 6 * npx]
    cv = misc_pm[:, d + 6 * npx + 1]
    nsafe = jnp.maximum(n, 1.0)
    m = msum / nsafe[:, None]
    noise6 = nov.reshape(p_total, npx, 6) / nsafe[:, None, None]
    bd = blockdiag_expand(cov6_to_mat3(noise6))
    nm1 = jnp.maximum(n - 1.0, 1.0)[:, None, None]
    cemp = (m2 - n[:, None, None] * m[:, :, None] * m[:, None, :]) / nm1

    a2, b2 = _solve_core_reference(cemp, bd, m, min_eigen, exact_floor)
    gate = ((n >= d + 1) & (cv > 0.0)).astype(jnp.float32)
    fb = cv * (1.0 - gate)
    a2t_pm = jnp.swapaxes(a2, -1, -2).reshape(p_total, d * d)
    small = jnp.zeros((p_total, SMALL_CH), jnp.float32)
    small = small.at[:, 0:d].set(b2)
    small = small.at[:, d].set(gate)
    small = small.at[:, d + 1 : 2 * d + 1].set(fb[:, None] * m)
    small = small.at[:, 2 * d + 1].set(fb)
    return a2t_pm, small


def _solve_core_reference(cemp, bd, m, min_eigen, exact_floor=True):
    """Shared XLA reference for the two-step solve: returns (A2, b2)."""
    from bcd_tpu.ops.sym_eigh import sym_apply

    d = cemp.shape[-1]
    clamped = sym_apply(cemp - bd, lambda l: jnp.maximum(l, 0.0))
    if exact_floor:
        inv = lambda mat: sym_apply(  # noqa: E731
            mat, lambda l: 1.0 / jnp.maximum(l, min_eigen))
    else:
        eye_ = jnp.eye(d)
        inv = lambda mat: jnp.linalg.inv(mat + min_eigen * eye_)  # noqa: E731
    eye = jnp.eye(d)
    inv1 = inv(clamped + bd)
    a1 = eye - jnp.einsum("pkl,plj->pkj", bd, inv1)
    cov2 = jnp.einsum("pkl,plj,pmj->pkm", a1, cemp, a1)
    inv2 = inv(cov2 + bd)
    t2 = jnp.einsum("pkl,plj->pkj", bd, inv2)
    a2 = eye - t2
    b2 = jnp.einsum("pkl,pl->pk", t2, m)
    return a2, b2


def solve_filter_reference(C_t, mask_t, noise_t, n_t, m_t, min_eigen,
                           npx: int = 9, exact_floor: bool = True):
    """Plain-XLA twin of ``solve_filter`` for testing (float32, same math;
    ``exact_floor=True`` uses the reference's eigenvalue floor instead of
    the kernel's (M + eps I) Cholesky substitute)."""
    from bcd_tpu.ops.cov3x3 import blockdiag_expand, cov6_to_mat3

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

    a2, b2 = _solve_core_reference(cemp, bd, m, min_eigen, exact_floor)
    x2 = jnp.einsum("pkl,pol->pok", a2, C) + b2[:, None, :]
    field = mk * x2
    return jnp.moveaxis(field, 0, -1)  # (O, d, P)


def solve_matrices_reference(m2_t, msum_t, nov_t, n_t, min_eigen,
                             npx: int = 9, exact_floor: bool = True):
    """Plain-XLA twin of ``solve_matrices``: same inputs, returns
    (a2t (d, d, P), b2 (1, d, P)) in the kernel's layout."""
    from bcd_tpu.ops.cov3x3 import blockdiag_expand, cov6_to_mat3

    d = m2_t.shape[0]
    P = m2_t.shape[-1]
    n = n_t[0]  # (P,)
    nsafe = jnp.maximum(n, 1.0)
    m2 = jnp.moveaxis(m2_t, -1, 0)  # (P, d, d)
    m = jnp.moveaxis(msum_t, -1, 0) / nsafe[:, None]
    noise6 = jnp.moveaxis(nov_t, -1, 0).reshape(P, npx, 6) \
        / nsafe[:, None, None]
    bd = blockdiag_expand(cov6_to_mat3(noise6))
    nm1 = jnp.maximum(n - 1.0, 1.0)[:, None, None]
    cemp = (m2 - n[:, None, None] * m[:, :, None] * m[:, None, :]) / nm1

    a2, b2 = _solve_core_reference(cemp, bd, m, min_eigen, exact_floor)
    # kernel layout: a2t[k, j, p] = A2[p][j, k]
    a2t = jnp.moveaxis(jnp.swapaxes(a2, -1, -2), 0, -1)
    return a2t, jnp.moveaxis(b2, 0, -1)[None]
