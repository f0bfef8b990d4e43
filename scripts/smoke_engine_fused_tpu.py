"""Hardware smoke for the fully fused engine path: compile the K1->K2->K4
pipeline on the real TPU, check accuracy against the XLA engine path, and
time both at a realistic monoscale shape.

Usage: python scripts/smoke_engine_fused_tpu.py [H W]
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import make_inputs  # noqa: E402
from bcd_tpu.core.monoscale import MonoscaleConfig, _denoise_image  # noqa: E402


def run_cfg(cfg, args, label, iters=3):
    t0 = time.time()
    out = _denoise_image(cfg, *args, jnp.float32(1.0), jnp.float32(1e-8))
    s = float(jnp.sum(out))  # device-side reduce + scalar readback = sync
    t1 = time.time()
    t2 = time.time()
    for _ in range(iters):
        out = _denoise_image(cfg, *args, jnp.float32(1.0), jnp.float32(1e-8))
    s = float(jnp.sum(out))
    dt = (time.time() - t2) / iters
    h, w = out.shape[:2]
    print(f"{label}: compile+run {t1 - t0:.1f}s, steady {dt * 1e3:.0f} ms "
          f"({h * w / dt / 1e6:.3f} MPix/s), checksum {s:.3f}", flush=True)
    return np.asarray(out), dt


def main():
    h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (256, 256)
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    color, nb, histo, cov = make_inputs(h, w)
    args = [jnp.asarray(x) for x in (color, nb, histo, cov)]

    out_f, dt_f = run_cfg(
        MonoscaleConfig(use_fused=True), args, "fused  K1->K2->K4")
    out_x, dt_x = run_cfg(
        MonoscaleConfig(use_pallas=True, tile_batch=16), args,
        "xla+solve-kernel ")

    rms = float(np.sqrt(np.mean((out_f - out_x) ** 2)))
    print(f"fused-vs-xla RMSE {rms:.2e}  speedup {dt_x / dt_f:.1f}x", flush=True)
    assert rms < 2e-4, rms
    print("SMOKE OK")


if __name__ == "__main__":
    main()
