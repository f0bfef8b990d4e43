"""END-TO-END stage bisect: time the real monoscale engine (full tile
scan, all XLA glue) under each BCD_FUSED_SKIP toggle. Unlike
bisect_fused.py / profile_fused.py (which time kernels standalone and
inflate by their own harness), differences here are true e2e costs.

One toggle per invocation (the env var is read at import):
    python scripts/bisect_e2e.py                 # full engine
    BCD_FUSED_SKIP=chi2 python scripts/bisect_e2e.py
Toggles: gbuild chi2 box masks m2 small (K1); k2solve (K2);
k4acc k4fil (K4).

Timing note: one warmup + best of 3, single jit call, scalar-readback
sync (axon tunnel).
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

from bcd_tpu.cache import configure_compile_cache

configure_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bcd_tpu.core.monoscale import denoise_monoscale  # noqa: E402
from bcd_tpu.params import DenoiserParameters  # noqa: E402

H = int(os.environ.get("BISECT_H", "1088"))
W = int(os.environ.get("BISECT_W", "1920"))
TILE = int(os.environ.get("BISECT_TILE", "48"))

rng = np.random.default_rng(0)
color = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
nb = jnp.asarray(np.full((H, W, 1), 16.0), jnp.float32)
histo = jnp.asarray(rng.random((H, W, 60)) * 4, jnp.float32)
cov = jnp.asarray(rng.random((H, W, 6)) * 0.1 + 0.05, jnp.float32)
float(color[0, 0, 0])

params = DenoiserParameters()


def run():
    out = denoise_monoscale(color, nb, histo, cov, params, tile=TILE)
    float(out[0, 0, 0])


run()  # compile + warm
times = []
for _ in range(3):
    t0 = time.perf_counter()
    run()
    times.append(time.perf_counter() - t0)
t = min(times)
skip = os.environ.get("BCD_FUSED_SKIP", "<none>")
n_tiles = -(-H // TILE) * -(-W // TILE)
print(f"e2e mono {H}x{W} tile={TILE} skip={skip}: {t:.3f} s "
      f"({t / n_tiles * 1e3:.2f} ms/tile, {H * W / 1e6 / t:.3f} MPix/s, "
      f"spread {max(times)/t:.2f}x)", flush=True)
