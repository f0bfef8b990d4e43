"""Bisect K1/K4 stage costs on the current backend via the
BCD_FUSED_SKIP toggles (v2 pm kernels). Each variant is a process-level
toggle, so run one skip-set per invocation:

    python scripts/bisect_fused.py k1 [tile]       # full kernel
    BCD_FUSED_SKIP=chi2 python scripts/bisect_fused.py k1
    BCD_FUSED_SKIP=m2,small python scripts/bisect_fused.py k1
    BCD_FUSED_SKIP=k4acc python scripts/bisect_fused.py k4

Toggles: gbuild chi2 box masks m2 (K1 — since the banded-MXU rewrite,
"m2" skips the ONE combined moment dot incl. msum/nov/n and "small" is a
no-op); k2solve (K2); k4acc k4fil (K4). scripts/bisect_e2e.py applies the
same toggles to the real engine end-to-end — trust that one for e2e
decisions (the standalone numbers here include harness inflation).
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from bcd_tpu.cache import configure_compile_cache

configure_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bcd_tpu.core.monoscale import MonoscaleConfig  # noqa: E402
from bcd_tpu.ops.fused_pallas import (  # noqa: E402
    apply_scatter2, masks_moments2)
from bcd_tpu.ops.solve_filter_pallas import solve_matrices_pm  # noqa: E402

WHICH = sys.argv[1] if len(sys.argv) > 1 else "k1"
T = int(sys.argv[2]) if len(sys.argv) > 2 else 48
REPS = 30
cfg = MonoscaleConfig(tile=T, use_fused=True)
t, h, b, r, npx = T, cfg.halo, cfg.search_radius, cfg.patch_radius, cfg.npx
tp = t + 2 * h
rng = np.random.default_rng(0)

histo = jnp.asarray(rng.random((tp, tp, 60)) * 4, jnp.float32)
nb = jnp.asarray(np.full((tp, tp, 1), 16.0), jnp.float32)
color = jnp.asarray(rng.random((tp, tp, 3)), jnp.float32)
pixcov = jnp.asarray(rng.random((tp, tp, 6)) * 0.01, jnp.float32)
yy, xx = np.meshgrid(np.arange(tp), np.arange(tp), indexing="ij")
interior = (yy >= r) & (yy < tp - r) & (xx >= r) & (xx < tp - r)
core = (yy >= h) & (yy < h + t) & (xx >= h) & (xx < h + t)
valid = jnp.asarray(
    np.stack([interior & core, interior], -1).astype(np.float32))

flat = lambda a: a.reshape(tp * tp, a.shape[-1])  # noqa: E731
flat_args = tuple(flat(a) for a in (histo, nb, color, pixcov, valid))

k1 = lambda *a: masks_moments2(*a, 1.0, t=t, r=r, b=b)  # noqa: E731

if WHICH == "k1":
    fn, args = k1, flat_args
else:
    masks, m2, misc = jax.jit(k1)(*flat_args)
    a2t_pm, small_pm = jax.jit(
        lambda *a: solve_matrices_pm(*a, 1e-8, npx=npx))(m2, misc)
    fn = lambda m, a, s, c: apply_scatter2(  # noqa: E731
        m, a, s, c, t=t, r=r, b=b)
    args = (masks, a2t_pm, small_pm, flat_args[2])


@jax.jit
def run(args):
    def body(carry, _):
        out = fn(*jax.tree_util.tree_map(
            lambda a: a + carry * jnp.zeros_like(a), args))
        s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
        return s * 1e-30, None

    s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
    return s


float(run(args))
t0 = time.perf_counter()
float(run(args))
dt = (time.perf_counter() - t0) / REPS
skip = os.environ.get("BCD_FUSED_SKIP", "<none>")
print(f"{WHICH} tile={T} skip={skip}: {dt*1e3:.2f} ms/tile", flush=True)
