"""Hardware smoke test for the fused spatial kernels at production
geometry: compile on the real TPU, compare against interpret mode.

Usage: python scripts/smoke_fused_tpu.py [k1|k4|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bcd_tpu.ops.fused_pallas import (  # noqa: E402
    apply_scatter, masks_moments, to_flat)

T, B, R = 32, 6, 1
H = B + R
TP = T + 2 * H
NBINS3 = 60
D = 27


def sync(x):
    # device-side reduce + scalar readback: a reliable sync that doesn't
    # drag the full array through the tunnel
    return float(jnp.sum(x))


def make_inputs(rng):
    base = rng.random(NBINS3) * 4
    histo = (base + 0.5 * rng.random((TP, TP, NBINS3))).astype(np.float32)
    nb = (rng.random((TP, TP, 1)) * 8 + 4).astype(np.float32)
    color = rng.random((TP, TP, 3)).astype(np.float32)
    pixcov = (0.01 * rng.standard_normal((TP, TP, 6))).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(TP), np.arange(TP), indexing="ij")
    interior = ((yy >= R) & (yy < TP - R) & (xx >= R) & (xx < TP - R))
    core = ((yy >= H) & (yy < H + T) & (xx >= H) & (xx < H + T))
    valid = np.stack([interior & core, interior], -1).astype(np.float32)
    return histo, nb, color, pixcov, valid


def k1_args():
    rng = np.random.default_rng(7)
    histo, nb, color, pixcov, valid = make_inputs(rng)
    return (
        to_flat(jnp.asarray(histo), B, R),
        to_flat(jnp.asarray(nb), B, R, fill=1.0),
        to_flat(jnp.asarray(color), B, R),
        to_flat(jnp.asarray(pixcov), B, R),
        to_flat(jnp.asarray(valid), B, R),
    )


def run_k1(interpret):
    args = k1_args()
    t0 = time.time()
    masks, m2, misc = masks_moments(
        *args, 0.25, tp=TP, r=R, b=B, interpret=interpret)
    s = sync(masks) + sync(m2) + sync(misc)
    t1 = time.time()
    reps = 10
    t2 = time.time()
    for _ in range(reps):  # queue async; one readback at the end
        masks, m2, misc = masks_moments(
            *args, 0.25, tp=TP, r=R, b=B, interpret=interpret)
    s = sync(masks)
    dt = (time.time() - t2) / reps
    print(f"K1 interpret={interpret}: compile+run {t1-t0:.1f}s, "
          f"steady {dt*1e3:.1f} ms/tile ({T*T/dt/1e6:.3f} "
          f"MPix/s core), checksum {s:.3f}")
    return np.asarray(masks), np.asarray(m2), np.asarray(misc)


def run_k4(interpret, masks):
    rng = np.random.default_rng(8)
    histo, nb, color, pixcov, valid = make_inputs(rng)
    a2t = (0.1 * rng.standard_normal((TP, TP, D * D))).astype(np.float32)
    b2 = rng.standard_normal((TP, TP, D)).astype(np.float32)
    gate = valid[..., 0:1]
    fbm = np.zeros((TP, TP, D + 1), np.float32)
    args = (
        jnp.asarray(masks),
        to_flat(jnp.asarray(a2t), B, R),
        to_flat(jnp.asarray(b2), B, R),
        to_flat(jnp.asarray(gate), B, R),
        to_flat(jnp.asarray(fbm), B, R),
        to_flat(jnp.asarray(color), B, R),
    )
    t0 = time.time()
    out = apply_scatter(*args, tp=TP, r=R, b=B, interpret=interpret)
    s = sync(out)
    t1 = time.time()
    reps = 10
    t2 = time.time()
    for _ in range(reps):
        out = apply_scatter(*args, tp=TP, r=R, b=B, interpret=interpret)
    s = sync(out)
    dt = (time.time() - t2) / reps
    print(f"K4 interpret={interpret}: compile+run {t1-t0:.1f}s, "
          f"steady {dt*1e3:.1f} ms/tile, checksum {s:.3f}")
    return np.asarray(out)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), jax.devices())
    on_cpu = jax.default_backend() == "cpu"

    masks = None
    if which in ("k1", "all"):
        m_hw, m2_hw, misc_hw = run_k1(interpret=on_cpu)
        masks = m_hw
        if not on_cpu:
            m_it, m2_it, misc_it = run_k1(interpret=True)
            for name, a, bb in (("masks", m_hw, m_it), ("m2", m2_hw, m2_it),
                                ("misc", misc_hw, misc_it)):
                err = np.max(np.abs(a - bb)) / max(1e-9, np.max(np.abs(bb)))
                print(f"  K1 {name}: hw-vs-interpret rel err {err:.2e}")
                assert err < 1e-5, name

    if which in ("k4", "all"):
        if masks is None:
            masks, _, _ = run_k1(interpret=True)
        out_hw = run_k4(interpret=on_cpu, masks=jnp.asarray(masks))
        if not on_cpu:
            out_it = run_k4(interpret=True, masks=jnp.asarray(masks))
            err = (np.max(np.abs(out_hw - out_it))
                   / max(1e-9, np.max(np.abs(out_it))))
            print(f"  K4 out: hw-vs-interpret rel err {err:.2e}")
            assert err < 1e-5
    print("SMOKE OK")


if __name__ == "__main__":
    main()
