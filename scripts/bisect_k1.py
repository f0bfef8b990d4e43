"""Bisect K1 (masks_moments) cost on the current backend via the
BCD_FUSED_SKIP toggles. Each variant is a fresh process-level toggle, so
run one skip-set per invocation:

    python scripts/bisect_k1.py            # full kernel
    BCD_FUSED_SKIP=chi2 python scripts/bisect_k1.py
    BCD_FUSED_SKIP=m2 python scripts/bisect_k1.py
    BCD_FUSED_SKIP=chi2,m2,small python scripts/bisect_k1.py
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax
import jax.numpy as jnp
import numpy as np

from bcd_tpu.cache import configure_compile_cache

configure_compile_cache()

from bcd_tpu.core.monoscale import MonoscaleConfig  # noqa: E402
from bcd_tpu.ops.fused_pallas import (  # noqa: E402
    flat_geometry, masks_moments, to_flat)

T = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPS = 30
cfg = MonoscaleConfig(tile=T)
t, h, b, r = T, cfg.halo, cfg.search_radius, cfg.patch_radius
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

flat = (to_flat(histo, b, r), to_flat(nb, b, r, fill=1.0),
        to_flat(color, b, r), to_flat(pixcov, b, r), to_flat(valid, b, r))

k1 = jax.jit(lambda *a: masks_moments(*a, 1.0, tp=tp, r=r, b=b))


@jax.jit
def run(args):
    def body(carry, _):
        out = k1(*jax.tree_util.tree_map(
            lambda a: a + carry * jnp.zeros_like(a), args))
        s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
        return s * 1e-30, None

    s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
    return s


float(run(flat))
t0 = time.perf_counter()
float(run(flat))
dt = (time.perf_counter() - t0) / REPS
skip = os.environ.get("BCD_FUSED_SKIP", "<none>")
print(f"K1 tile={T} skip={skip}: {dt * 1e3:.2f} ms", flush=True)
