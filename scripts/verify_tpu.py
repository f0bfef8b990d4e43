"""On-hardware accuracy gate (``make verify-tpu``).

Everything in tests/ deliberately runs on the CPU backend (conftest.py),
and the Pallas kernels are exercised there in interpret mode only — a
Mosaic miscompile would ship undetected. This script closes that gap on
the real chip:

1. COMPILED solve kernel (``solve_matrices``) vs its XLA twin.
2. The fully fused K1->K2->K4 engine path vs the XLA engine path on a
   synthetic scene (both compiled on the device).
3. The engine vs the committed golden fixtures (native CPU engine
   outputs, tests/golden/) — RMSE < 1e-4, same gate as the CPU tests.
4. A timing-variance probe (3 runs): >1.2x spread flags tenancy
   contention that would corrupt benchmark numbers.

Exits non-zero on any accuracy failure. Requires exclusive use of the
TPU (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

import numpy as np


def rmse(a, b):
    return float(np.sqrt(np.mean(
        (np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)))


def _solve_truth_f64(m2, msum, nov, n, eps, npx):
    """Float64 numpy statement of the two-step solve (exact eigen floor),
    in the kernel's (d, d, P)/(1, d, P) output layout."""
    d = m2.shape[0]
    P = m2.shape[-1]
    nn = n[0].astype(np.float64)
    nsafe = np.maximum(nn, 1.0)
    m2p = np.moveaxis(m2, -1, 0).astype(np.float64)  # (P, d, d)
    m = np.moveaxis(msum, -1, 0).astype(np.float64) / nsafe[:, None]
    nov6 = np.moveaxis(nov, -1, 0).astype(np.float64).reshape(P, npx, 6) \
        / nsafe[:, None, None]
    bd = np.zeros((P, d, d))
    pairs = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]
    for q in range(npx):
        for ch, (i, j) in enumerate(pairs):
            bd[:, 3 * q + i, 3 * q + j] = nov6[:, q, ch]
            bd[:, 3 * q + j, 3 * q + i] = nov6[:, q, ch]
    nm1 = np.maximum(nn - 1.0, 1.0)[:, None, None]
    cemp = (m2p - nn[:, None, None] * m[:, :, None] * m[:, None, :]) / nm1

    def sym_apply(mats, f):
        lam, v = np.linalg.eigh(mats)
        return np.einsum("pij,pj,pkj->pik", v, f(lam), v)

    clamped = sym_apply(cemp - bd, lambda l: np.maximum(l, 0.0))
    inv = lambda mm: sym_apply(  # noqa: E731
        mm, lambda l: 1.0 / np.maximum(l, eps))
    eye = np.eye(d)
    inv1 = inv(clamped + bd)
    a1 = eye - np.einsum("pkl,plj->pkj", bd, inv1)
    cov2 = np.einsum("pkl,plj,pmj->pkm", a1, cemp, a1)
    inv2 = inv(cov2 + bd)
    t2 = np.einsum("pkl,plj->pkj", bd, inv2)
    a2 = eye - t2
    b2 = np.einsum("pkl,pl->pk", t2, m)
    a2t = np.moveaxis(np.swapaxes(a2, -1, -2), 0, -1)
    return a2t, np.moveaxis(b2, 0, -1)[None]


def main() -> int:
    from bcd_tpu.cache import configure_compile_cache

    configure_compile_cache()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform}/{dev.device_kind}", flush=True)
    on_cpu = dev.platform == "cpu"
    if on_cpu:
        print("WARNING: no accelerator — kernels fall back to interpret "
              "mode; this gate only means something on the TPU", flush=True)
    failures = []

    # --- 1. compiled solve kernel vs XLA twin -----------------------------
    from bcd_tpu.ops.solve_filter_pallas import (
        solve_matrices, solve_matrices_reference)

    rng = np.random.default_rng(99)
    d, npx, O, P = 27, 9, 49, 256
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
    a2t, b2 = solve_matrices(*args, 1e-8, sweeps=6,
                             interpret=on_cpu)  # compiled on accelerators
    # float64 numpy truth (NOT the jax twin: compiled on the TPU, the
    # twin's own fp32 eigh carries ~5e-4 error and would dominate)
    a2t_r, b2_r = _solve_truth_f64(m2, msum, nov, n, 1e-8, npx)
    e1 = max(rmse(a2t, a2t_r), rmse(b2, b2_r))
    ok = e1 < 2e-4
    print(f"[1] compiled solve_matrices vs twin: rms {e1:.2e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        failures.append("solve_matrices")

    # --- 2+3. engine paths vs each other and vs goldens -------------------
    from bcd_tpu.core.monoscale import denoise_monoscale
    from bcd_tpu.core.multiscale import denoise_multiscale
    from bcd_tpu.io import image_io
    from bcd_tpu.params import DenoiserParameters

    gd = os.path.join(HERE, "tests", "golden")
    mean = image_io.load_multi_channels_exr(os.path.join(gd, "in_color.exr"))
    hc = image_io.load_multi_channels_exr(os.path.join(gd, "in_hist.exr"))
    histo, nb = image_io.separate_nb_of_samples_from_histogram(hc)
    cov = image_io.load_multi_channels_exr(os.path.join(gd, "in_cov.exr"))
    params = DenoiserParameters(search_window_radius=6)

    out_fused = denoise_monoscale(mean, nb, histo, cov, params, tile=16,
                                  use_fused=True)
    out_xla = denoise_monoscale(mean, nb, histo, cov, params, tile=16,
                                use_fused=False, use_pallas=False)
    e2 = rmse(out_fused, out_xla)
    ok = e2 < 1e-4
    print(f"[2] fused engine vs XLA engine (mono b=6): rms {e2:.2e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        failures.append("fused-vs-xla")

    golden_mono = image_io.load_multi_channels_exr(
        os.path.join(gd, "out_mono_b6.exr"))
    golden_multi = image_io.load_multi_channels_exr(
        os.path.join(gd, "out_multi2_b6.exr"))
    e3a = rmse(out_fused, golden_mono)
    out_multi = denoise_multiscale(mean, nb, histo, cov, params,
                                   nb_of_scales=2, tile=16)
    e3b = rmse(out_multi, golden_multi)
    ok = e3a < 1e-4 and e3b < 1e-4
    print(f"[3] engine vs goldens: mono rms {e3a:.2e}, multi rms {e3b:.2e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        failures.append("goldens")

    # --- 4. timing variance probe ----------------------------------------
    def run():
        out = denoise_monoscale(mean, nb, histo, cov, params, tile=16)
        float(np.asarray(out)[0, 0, 0])

    run()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    spread = max(times) / min(times)
    print(f"[4] timing spread over 3 runs: {spread:.2f}x "
          f"({'stable' if spread < 1.2 else 'CONTENDED — do not bench now'})",
          flush=True)

    if failures:
        print(f"FAILURES: {failures}", flush=True)
        return 1
    print("verify-tpu: all gates green", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
