"""Bisect the solve_filter kernel to find the Mosaic-crashing stage."""
import functools
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 128
O, d, npx = 169, 27, 9
dp, half = 28, 14
f32 = jnp.float32

rng = np.random.default_rng(0)
C = jnp.asarray(rng.standard_normal((O, d, P)), f32)
mask = jnp.asarray((rng.random((O, P)) < 0.7), f32)
noise = jnp.asarray(rng.random((6 * npx, P)) * 0.1, f32)
n = mask.sum(0, keepdims=True)
m = (C * mask[:, None]).sum(0) / n

STAGE = sys.argv[1] if len(sys.argv) > 1 else "m2"


def kernel(c_ref, mask_ref, noise_ref, n_ref, m_ref, out_ref):
    noise_v = noise_ref[:]
    n_v = n_ref[:]
    m_v = m_ref[:]

    ri_dp = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 0)
    ci_dp = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 1)
    eye_dp = (ri_dp == ci_dp).astype(f32)
    sel = (ci_dp == ri_dp + half).astype(f32)
    ri_d = ri_dp[:d, :d]
    ci_d = ci_dp[:d, :d]
    eye_d = (ri_d == ci_d).astype(f32)

    def mo(o, acc):
        c_o = c_ref[pl.ds(o, 1)][0]
        w = mask_ref[pl.ds(o, 1)]
        return acc + (c_o * w)[:, None, :] * c_o[None, :, :]

    m2 = jax.lax.fori_loop(0, O, mo, jnp.zeros((d, d, P), f32))
    if STAGE == "m2":
        out_ref[:] = m2[0]
        return

    nm1 = jnp.maximum(n_v - 1.0, 1.0)
    cemp = (m2 - n_v[None] * m_v[:, None, :] * m_v[None, :, :]) / nm1[None]

    pairs = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]
    bd = jnp.zeros((d, d, P), f32)
    for q in range(npx):
        for ch, (i, j) in enumerate(pairs):
            a_, b_ = 3 * q + i, 3 * q + j
            one = ((ri_d == a_) & (ci_d == b_)) | ((ri_d == b_) & (ci_d == a_))
            bd = bd + one.astype(f32)[:, :, None] * noise_v[6 * q + ch][None, None, :]
    if STAGE == "bd":
        out_ref[:] = (cemp - bd)[0]
        return

    s_mat = cemp - bd
    a = jnp.pad(s_mat, ((0, 1), (0, 1), (0, 0)))
    vt = jnp.broadcast_to(eye_dp[:, :, None], (dp, dp, P))
    perm = [(0, 1), (half, half + 1), (1, half - 1), (half + 1, 2 * half),
            (half - 1, half)]

    def permute0(x):
        return jnp.concatenate([x[a0:a1] for a0, a1 in perm], axis=0)

    def permute1(x):
        return jnp.concatenate([x[:, a0:a1] for a0, a1 in perm], axis=1)

    def jacobi_round(_, carry):
        a, vt = carry
        dall = jnp.sum(a * eye_dp[:, :, None], axis=1)
        apq = jnp.sum(a * sel[:, :, None], axis=1)[:half]
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

    a, vt = jax.lax.fori_loop(0, 27, jacobi_round, (a, vt))
    if STAGE == "jacobi":
        out_ref[:] = a[:d, :d][0]
        return

    lam = jnp.maximum(jnp.sum(a * eye_dp[:, :, None], axis=1), 0.0)
    clamped = jnp.zeros((dp, dp, P), f32)
    for k in range(dp):
        row = vt[k]
        clamped = clamped + (row * lam[k][None])[:, None, :] * row[None, :, :]
    clamped = clamped[:d, :d]
    if STAGE == "recon":
        out_ref[:] = clamped[0]
        return

    row_1d = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)

    def chol(mat):
        work = mat
        cols = []
        for j in range(d):
            diag = work[j, j][None]
            inv_p = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
            col = work[:, j] * inv_p
            col = col * (row_1d >= j).astype(f32)
            work = work - col[:, None, :] * col[None, :, :]
            cols.append(col)
        return jnp.stack(cols, axis=1)

    L = chol(clamped + bd + 1e-8 * eye_d[:, :, None])
    if STAGE == "chol":
        out_ref[:] = L[0]
        return
    out_ref[:] = L[0]


out_shape = jax.ShapeDtypeStruct((d, P), f32)
fn = pl.pallas_call(
    kernel,
    grid=(1,),
    in_specs=[
        pl.BlockSpec((O, d, P), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((O, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((6 * npx, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((d, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
    out_shape=out_shape,
)

t0 = time.perf_counter()
out = fn(C, mask, noise, n, m)
print(f"STAGE={STAGE} OK, checksum={float(out.sum()):.4f}, "
      f"{time.perf_counter()-t0:.1f}s")
