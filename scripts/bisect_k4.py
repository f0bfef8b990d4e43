"""Bisect K4 (apply_scatter) cost via BCD_FUSED_SKIP toggles
(k4acc / k4fil). Usage: BCD_FUSED_SKIP=k4acc python scripts/bisect_k4.py
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
    apply_scatter, flat_geometry, to_flat)

T = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPS = 30
cfg = MonoscaleConfig(tile=T)
t, h, b, r, d = T, cfg.halo, cfg.search_radius, cfg.patch_radius, cfg.d
tp = t + 2 * h
tps, r0, rows = flat_geometry(tp, b, r)
nd = 2 * b + 1
rng = np.random.default_rng(0)

masks = jnp.asarray(rng.random((nd, rows, nd)) < 0.5, jnp.float32)
a2t_f = to_flat(jnp.asarray(
    rng.standard_normal((tp, tp, d * d)) * 0.1, jnp.float32), b, r)
b2_f = to_flat(jnp.asarray(
    rng.standard_normal((tp, tp, d)), jnp.float32), b, r)
gate_f = to_flat(jnp.asarray(
    rng.random((tp, tp, 1)) < 0.9, jnp.float32), b, r)
fbm_f = to_flat(jnp.asarray(
    rng.standard_normal((tp, tp, d + 1)), jnp.float32), b, r)
color_f = to_flat(jnp.asarray(rng.random((tp, tp, 3)), jnp.float32), b, r)

k4 = jax.jit(lambda *a: apply_scatter(*a, tp=tp, r=r, b=b))
args = (masks, a2t_f, b2_f, gate_f, fbm_f, color_f)


@jax.jit
def run(args):
    def body(carry, _):
        out = k4(*jax.tree_util.tree_map(
            lambda a: a + carry * jnp.zeros_like(a), args))
        return jnp.sum(out) * 1e-30, None

    s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
    return s


float(run(args))
t0 = time.perf_counter()
float(run(args))
dt = (time.perf_counter() - t0) / REPS
skip = os.environ.get("BCD_FUSED_SKIP", "<none>")
print(f"K4 tile={T} skip={skip}: {dt * 1e3:.2f} ms", flush=True)
