"""Per-stage timing of the fused K1->K2->K4 tile pipeline on the current
backend. Each stage runs inside a lax.scan (REPS iterations) within one
jit, so per-dispatch/tunnel overhead is fully amortized — the printed
number is the honest steady-state per-tile cost of that stage.

Usage: python scripts/profile_fused.py [tile]
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bcd_tpu.core.monoscale import MonoscaleConfig  # noqa: E402
from bcd_tpu.ops.fused_pallas import (  # noqa: E402
    apply_scatter, flat_geometry, masks_moments, to_flat)
from bcd_tpu.ops.solve_filter_pallas import LANES, solve_matrices  # noqa: E402

T = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPS = 30
cfg = MonoscaleConfig(tile=T)
t, h, b, r, d, npx = T, cfg.halo, cfg.search_radius, cfg.patch_radius, cfg.d, cfg.npx
tp = t + 2 * h
tps, r0, rows = flat_geometry(tp, b, r)
p_raw = t * t
p_pad = -(-p_raw // LANES) * LANES
nd = 2 * b + 1

rng = np.random.default_rng(0)


def scan_time(name, fn, *args, per="tile"):
    """Time REPS sequential invocations of fn inside one jit."""

    @jax.jit
    def run(args):
        def body(carry, _):
            out = fn(*jax.tree_util.tree_map(
                lambda a: a + carry * jnp.zeros_like(a), args))
            s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
            return s * 1e-30, None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return s

    float(run(args))  # compile + warm
    t0 = time.perf_counter()
    float(run(args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:<40s} {dt * 1e3:8.2f} ms/{per}", flush=True)
    return dt


# ---- inputs -----------------------------------------------------------------
histo = jnp.asarray(rng.random((tp, tp, 60)) * 4, jnp.float32)
nb = jnp.asarray(np.full((tp, tp, 1), 16.0), jnp.float32)
color = jnp.asarray(rng.random((tp, tp, 3)), jnp.float32)
pixcov = jnp.asarray(rng.random((tp, tp, 6)) * 0.01, jnp.float32)
yy, xx = np.meshgrid(np.arange(tp), np.arange(tp), indexing="ij")
interior = (yy >= r) & (yy < tp - r) & (xx >= r) & (xx < tp - r)
core = (yy >= h) & (yy < h + t) & (xx >= h) & (xx < h + t)
valid = jnp.asarray(
    np.stack([interior & core, interior], -1).astype(np.float32))

print(f"backend: {jax.default_backend()}  tile={t} tp={tp} rows={rows}",
      flush=True)

# ---- stage 1: to_flat marshaling -------------------------------------------
def marshal_in(histo, nb, color, pixcov, valid):
    return (to_flat(histo, b, r), to_flat(nb, b, r, fill=1.0),
            to_flat(color, b, r), to_flat(pixcov, b, r),
            to_flat(valid, b, r))


flat_args = jax.jit(marshal_in)(histo, nb, color, pixcov, valid)
scan_time("to_flat x5 (XLA)", marshal_in, histo, nb, color, pixcov, valid)

# ---- stage 2: K1 ------------------------------------------------------------
k1 = lambda *a: masks_moments(*a, 1.0, tp=tp, r=r, b=b)  # noqa: E731
masks, m2, misc = jax.jit(k1)(*flat_args)
scan_time("K1 masks_moments", k1, *flat_args)


# ---- stage 3: lane marshal for K2 -------------------------------------------
def marshal_k2(m2, misc):
    from bcd_tpu.ops.fused_pallas import tri_geometry

    _, tri_expand, dtri = tri_geometry(d)
    core2d = lambda a: a.reshape(tp, tps, a.shape[-1])[  # noqa: E731
        h : h + t, h : h + t]
    m2_c = core2d(m2).reshape(p_raw, dtri)
    misc_c = core2d(misc)
    pad_px = p_pad - p_raw
    lanes = lambda a: jnp.moveaxis(  # noqa: E731
        jnp.pad(a, ((0, pad_px), (0, 0))), 0, -1)
    m2_t = lanes(m2_c)[jnp.asarray(tri_expand)].reshape(d, d, p_pad)
    msum_t = lanes(misc_c[..., 0:d].reshape(p_raw, d))
    nov_t = lanes(misc_c[..., d : d + 6 * npx].reshape(p_raw, 6 * npx))
    n_t = jnp.pad(misc_c[..., d + 6 * npx].reshape(p_raw), ((0, pad_px),),
                  constant_values=1.0)[None]
    return m2_t, msum_t, nov_t, n_t


k2_args = jax.jit(marshal_k2)(m2, misc)
scan_time("lane marshal K1->K2 (XLA)", marshal_k2, m2, misc)

# ---- stage 4: K2 ------------------------------------------------------------
k2 = lambda *a: solve_matrices(*a, 1e-8, npx=npx)  # noqa: E731
a2t_l, b2_l = jax.jit(k2)(*k2_args)
scan_time("K2 solve_matrices", k2, *k2_args)


# ---- stage 5: unmarshal + embed + to_flat for K4 ----------------------------
def marshal_k4(a2t_l, b2_l, misc):
    a2t_px = jnp.moveaxis(
        a2t_l.reshape(d * d, p_pad)[:, :p_raw], -1, 0).reshape(t, t, d * d)
    b2_px = jnp.moveaxis(b2_l[0][:, :p_raw], -1, 0).reshape(t, t, d)
    core2d = lambda a: a.reshape(tp, tps, a.shape[-1])[  # noqa: E731
        h : h + t, h : h + t]
    misc_c = core2d(misc)
    n_map = misc_c[..., d + 6 * npx]
    gate = (n_map >= d + 1).astype(jnp.float32)[..., None]
    m_map = misc_c[..., 0:d] / jnp.maximum(n_map, 1.0)[..., None]
    fb = 1.0 - gate
    fbm = jnp.concatenate([fb * m_map, fb], axis=-1)
    embed = lambda a: jnp.pad(  # noqa: E731
        a, ((h, tp - h - t), (h, tp - h - t), (0, 0)))
    return (to_flat(embed(a2t_px), b, r), to_flat(embed(b2_px), b, r),
            to_flat(embed(gate), b, r), to_flat(embed(fbm), b, r))


k4_maps = jax.jit(marshal_k4)(a2t_l, b2_l, misc)
scan_time("marshal K2->K4 (XLA)", marshal_k4, a2t_l, b2_l, misc)

# ---- stage 6: K4 ------------------------------------------------------------
k4 = lambda m, a, bb, g, f, c: apply_scatter(  # noqa: E731
    m, a, bb, g, f, c, tp=tp, r=r, b=b)
scan_time("K4 apply_scatter", k4, masks, *k4_maps, flat_args[2])

print("done", flush=True)
