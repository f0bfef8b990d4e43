"""Per-stage timing of the monoscale engine on the current backend.

NOTE: on the axon TPU tunnel, block_until_ready returns early; every
measured function therefore reduces its outputs to scalars and the timer
forces a host readback (float(...)), which is the only reliable sync.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bcd_tpu.core import monoscale as M
from bcd_tpu.ops.sym_eigh import sym_apply

cfg = M.MonoscaleConfig(patch_radius=1, search_radius=6, tile=32)
t, h, b, r, d = cfg.tile, cfg.halo, cfg.search_radius, cfg.patch_radius, cfg.d
tp = t + 2 * h
rng = np.random.default_rng(0)

color_p = jnp.asarray(rng.random((tp, tp, 3)), jnp.float32)
nb_p = jnp.asarray(np.full((tp, tp, 1), 16.0), jnp.float32)
histo_p = jnp.asarray(rng.random((tp, tp, 60)) * 4, jnp.float32)
cov_p = jnp.asarray(rng.random((tp, tp, 6)) * 0.1 + 0.05, jnp.float32)
HIGHEST = jax.lax.Precision.HIGHEST


def timeit(name, fn, *a, iters=5):
    float(jax.tree_util.tree_leaves(fn(*a))[0])  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    _ = [float(x) for x in jax.tree_util.tree_leaves(out)]
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<44s} {dt*1e3:9.2f} ms")
    return dt


offs = jnp.asarray(M._offsets(cfg))


@jax.jit
def stage_masks(histo_p, nb_p):
    m, cv = M._distance_masks(cfg, histo_p, nb_p[..., 0], 0, 0, 0, 0, t, t,
                              1024, 1024, jnp.float32(1.0))
    return m.sum()


timeit("distance masks (169 offsets)", stage_masks, histo_p, nb_p)


@jax.jit
def _masks(histo_p, nb_p):
    m, _ = M._distance_masks(cfg, histo_p, nb_p[..., 0], 0, 0, 0, 0, t, t,
                             1024, 1024, jnp.float32(1.0))
    return m


masks = _masks(histo_p, nb_p)


def cand_slice(arr, o):
    return jax.lax.dynamic_slice(arr, (o[0] + b, o[1] + b, 0),
                                 (t, t, arr.shape[-1]))


@jax.jit
def stage_gather(color_p, cov_p):
    cp_ext = M._patchify(color_p, r)
    cv_ext = M._patchify(cov_p, r)
    C = jax.vmap(partial(cand_slice, cp_ext), out_axes=2)(offs)
    CV = jax.vmap(partial(cand_slice, cv_ext), out_axes=2)(offs)
    return C.sum() + CV.sum()


timeit("candidate gather (C, CV)", stage_gather, color_p, cov_p)


@jax.jit
def stage_moments(color_p, masks):
    cp_ext = M._patchify(color_p, r)
    C = jax.vmap(partial(cand_slice, cp_ext), out_axes=2)(offs)
    mk = masks[..., None]
    m2 = jnp.einsum("twok,twol->twkl", mk * C, C, precision=HIGHEST)
    return m2.sum()


timeit("M2 moment einsum", stage_moments, color_p, masks)

mats = rng.standard_normal((t * t, d, d)).astype(np.float32)
mats = (mats + mats.transpose(0, 2, 1)) / 2 + 30 * np.eye(d, dtype=np.float32)
mats_j = jnp.asarray(mats)


@jax.jit
def eigh_jacobi(x):
    return sym_apply(x, lambda l: 1.0 / jnp.maximum(l, 1e-8)).sum()


@jax.jit
def eigh_lax(x):
    lam, vec = jnp.linalg.eigh(x)
    return jnp.einsum("...ij,...j,...kj->...ik", vec,
                      1.0 / jnp.maximum(lam, 1e-8), vec).sum()


timeit(f"eigh jacobi x1 (batch {t*t})", eigh_jacobi, mats_j)
timeit(f"eigh lax    x1 (batch {t*t})", eigh_lax, mats_j, iters=2)

a2 = jnp.asarray(rng.random((t, t, d, d)), jnp.float32)
b2v = jnp.asarray(rng.random((t, t, d)), jnp.float32)


@jax.jit
def stage_filter(a2, color_p, b2v):
    cp_ext = M._patchify(color_p, r)
    C = jax.vmap(partial(cand_slice, cp_ext), out_axes=2)(offs)
    x2 = jnp.einsum("twol,twkl->twok", C, a2, precision=HIGHEST) \
        + b2v[:, :, None, :]
    return x2.sum()


timeit("filter einsum (C @ A2^T)", stage_filter, a2, color_p, b2v)

field = jnp.asarray(rng.random((t, t, 169, d)), jnp.float32)
py, px = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
offs_np = M._offsets(cfg)
seg = ((h + py[:, :, None] + offs_np[None, None, :, 0]) * tp
       + (h + px[:, :, None] + offs_np[None, None, :, 1])).reshape(-1)
seg_ids = jnp.asarray(seg, jnp.int32)


@jax.jit
def stage_scatter(field):
    facc = jax.ops.segment_sum(field.reshape(-1, d), seg_ids,
                               num_segments=tp * tp)
    return facc.sum()


timeit("segment-sum scatter", stage_scatter, field)


@jax.jit
def whole_tile(color_p, nb_p, histo_p, cov_p):
    o, c = M.denoise_tile(cfg, color_p, nb_p, histo_p, cov_p / nb_p,
                          0, 0, 0, 0, t, t, 1024, 1024,
                          jnp.float32(1.0), jnp.float32(1e-8))
    return o.sum() + c.sum()


dt = timeit("whole tile (32x32 core)", whole_tile, color_p, nb_p, histo_p,
            cov_p)
print(f"  -> {t*t/dt/1e6:.3f} MPix/s")
