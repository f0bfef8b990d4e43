"""K2 (solve_matrices) timing vs lane-block width and sweeps.

Usage: python scripts/bisect_k2.py [P_total] [lanes] [sweeps]
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

from bcd_tpu.ops.solve_filter_pallas import solve_matrices  # noqa: E402

P = int(sys.argv[1]) if len(sys.argv) > 1 else 2304
LN = int(sys.argv[2]) if len(sys.argv) > 2 else 128
SW = int(sys.argv[3]) if len(sys.argv) > 3 else 4
REPS = 30
d, npx, O = 27, 9, 49

rng = np.random.default_rng(0)
C = rng.standard_normal((O, d, P)).astype(np.float32)
mask = (rng.random((O, P)) < 0.7).astype(np.float32)
mask[O // 2] = 1.0
n = mask.sum(axis=0, keepdims=True).astype(np.float32)
mk = mask[:, None, :]
m2 = np.einsum("okp,olp->klp", mk * C, C).astype(np.float32)
msum = (mk * C).sum(axis=0).astype(np.float32)
nov = np.zeros((6 * npx, P), np.float32)
for q in range(npx):
    nov[6 * q : 6 * q + 3] = (0.05 + 0.1 * rng.random((3, P))) * n
    nov[6 * q + 3 : 6 * q + 6] = 0.01 * rng.standard_normal((3, P)) * n

args = tuple(jnp.asarray(x) for x in (m2, msum, nov, n))
k2 = jax.jit(lambda *a: solve_matrices(*a, 1e-8, sweeps=SW, lanes=LN))


@jax.jit
def run(args):
    def body(carry, _):
        out = k2(*jax.tree_util.tree_map(
            lambda a: a + carry * jnp.zeros_like(a), args))
        s = sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))
        return s * 1e-30, None

    s, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
    return s


float(run(args))
t0 = time.perf_counter()
float(run(args))
dt = (time.perf_counter() - t0) / REPS
print(f"K2 P={P} lanes={LN} sweeps={SW}: {dt * 1e3:.2f} ms "
      f"({dt / P * 1e9:.0f} ns/px)", flush=True)
