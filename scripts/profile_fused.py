"""Per-stage timing of the fused K1->K2->K4 tile pipeline (v2 pm
contract) on the current backend. Each stage runs inside a lax.scan
(REPS iterations) within one jit, so per-dispatch/tunnel overhead is
fully amortized — the printed number is the honest steady-state per-tile
cost of that stage.

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
    apply_scatter2, masks_moments2, pm_geometry)
from bcd_tpu.ops.solve_filter_pallas import solve_matrices_pm  # noqa: E402

T = int(sys.argv[1]) if len(sys.argv) > 1 else 48
REPS = 30
cfg = MonoscaleConfig(tile=T, use_fused=True)
t, h, b, r, d, npx = T, cfg.halo, cfg.search_radius, cfg.patch_radius, cfg.d, cfg.npx
hh, tp, cb0, ncore, ch0, nchi = pm_geometry(t, r, b)
assert hh == h
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


# ---- inputs (pm-flat slabs: plain row-major reshapes) -----------------------
histo = jnp.asarray(rng.random((tp, tp, 60)) * 4, jnp.float32)
nb = jnp.asarray(np.full((tp, tp, 1), 16.0), jnp.float32)
color = jnp.asarray(rng.random((tp, tp, 3)), jnp.float32)
pixcov = jnp.asarray(rng.random((tp, tp, 6)) * 0.01, jnp.float32)
yy, xx = np.meshgrid(np.arange(tp), np.arange(tp), indexing="ij")
interior = (yy >= r) & (yy < tp - r) & (xx >= r) & (xx < tp - r)
core = (yy >= h) & (yy < h + t) & (xx >= h) & (xx < h + t)
valid = jnp.asarray(
    np.stack([interior & core, interior], -1).astype(np.float32))

print(f"backend: {jax.default_backend()}  tile={t} tp={tp} halo={h}",
      flush=True)

flat = lambda a: a.reshape(tp * tp, a.shape[-1])  # noqa: E731
flat_args = tuple(flat(a) for a in (histo, nb, color, pixcov, valid))

# ---- K1 ---------------------------------------------------------------------
k1 = lambda *a: masks_moments2(*a, 1.0, t=t, r=r, b=b)  # noqa: E731
masks, m2, misc = jax.jit(k1)(*flat_args)
scan_time("K1 masks_moments2", k1, *flat_args)

# ---- K2 ---------------------------------------------------------------------
k2 = lambda *a: solve_matrices_pm(*a, 1e-8, npx=npx)  # noqa: E731
a2t_pm, small_pm = jax.jit(k2)(m2, misc)
scan_time("K2 solve_matrices_pm", k2, m2, misc)

# ---- K4 ---------------------------------------------------------------------
k4 = lambda m, a, s, c: apply_scatter2(  # noqa: E731
    m, a, s, c, t=t, r=r, b=b)
scan_time("K4 apply_scatter2", k4, masks, a2t_pm, small_pm, flat_args[2])


# ---- full pipeline (kernels back to back, one jit) --------------------------
def full(histo_f, nb_f, color_f, pixcov_f, valid_f):
    ms, m2_, mi = masks_moments2(
        histo_f, nb_f, color_f, pixcov_f, valid_f, 1.0, t=t, r=r, b=b)
    a2, sm = solve_matrices_pm(m2_, mi, 1e-8, npx=npx)
    return apply_scatter2(ms, a2, sm, color_f, t=t, r=r, b=b)


dt = scan_time("K1+K2+K4 pipeline", full, *flat_args)
print(f"-> {t * t / dt / 1e6:.3f} MPix/s monoscale-equivalent", flush=True)
print("done", flush=True)
