"""On-hardware accuracy gate (``make verify-tpu``).

Everything in tests/ deliberately runs on the CPU backend (conftest.py),
and the Pallas kernels are exercised there in interpret mode only — a
Mosaic miscompile would ship undetected. This script closes that gap on
the real chip:

1. COMPILED pixel-major solve kernel (``solve_matrices_pm``, the
   production K2) vs a float64 numpy truth.
2. The fully fused K1->K2->K4 engine path vs the XLA engine path on the
   golden scene, at BOTH tile=16 and the bench/production tile=48 (the
   VMEM-edge configuration where the kernels compile differently).
3. The engine vs the committed golden fixtures (native CPU engine
   outputs, tests/golden/) — RMSE < 1e-4, same gate as the CPU tests —
   plus the -s 3 multiscale path (fused vs XLA, both compiled).
4. The candidate-stack Pallas path (patch_radius=2, ``solve_filter``)
   compiled vs the XLA engine — the only other kernel path reachable
   from the CLI.
5. ``denoise_monoscale_spatial`` on a 1-device mesh of the real chip vs
   the plain engine: Pallas-under-shard_map compiled on hardware.
6. A timing-variance probe (3 runs): >1.2x spread means tenancy
   contention that would corrupt benchmark numbers — treated as a
   FAILURE (exit non-zero), per the round-2 verdict.

Exits non-zero on any failure. Requires exclusive use of the TPU
(see .claude/skills/verify/SKILL.md).
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


def _solve_truth_f64(m2p, m, nov6, nn, eps):
    """Float64 numpy statement of the two-step solve (exact eigen floor).
    m2p (P, d, d) RAW second moments; m (P, d) means; nov6 (P, npx, 6)
    MEAN noise blocks; nn (P,) set sizes. Returns (a2 (P, d, d), b2)."""
    P, d, _ = m2p.shape
    npx = nov6.shape[1]
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
    return a2, b2


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

    # --- 1. compiled pixel-major solve kernel vs float64 truth -----------
    from bcd_tpu.ops.fused_pallas import tri_geometry
    from bcd_tpu.ops.solve_filter_pallas import solve_matrices_pm

    rng = np.random.default_rng(99)
    d, npx, O, P = 27, 9, 49, 256
    C = rng.standard_normal((O, d, P)).astype(np.float32)
    mask = (rng.random((O, P)) < 0.7).astype(np.float32)
    mask[O // 2] = 1.0
    n = mask.sum(axis=0).astype(np.float32)  # (P,)
    mk = mask[:, None, :]
    m2p = np.einsum("okp,olp->pkl", mk * C, C).astype(np.float64)
    msum = (mk * C).sum(axis=0).T.astype(np.float64)  # (P, d)
    nov6 = np.zeros((P, npx, 6), np.float64)
    for q in range(npx):
        nov6[:, q, 0:3] = (0.05 + 0.1 * rng.random((P, 3)))
        nov6[:, q, 3:6] = 0.01 * rng.standard_normal((P, 3))

    tri_base, tri_expand, dtri = tri_geometry(d)
    pack_idx = np.zeros(dtri, np.int64)
    for k in range(d):
        for j in range(k, d):
            pack_idx[tri_base[k] + (j - k)] = k * d + j
    m2_pm = m2p.reshape(P, d * d)[:, pack_idx].astype(np.float32)
    misc = np.zeros((P, 128), np.float32)
    misc[:, 0:d] = msum
    misc[:, d : d + 6 * npx] = (nov6 * n[:, None, None]).reshape(P, 6 * npx)
    misc[:, d + 6 * npx] = n
    misc[:, d + 6 * npx + 1] = 1.0

    a2t_pm, small = solve_matrices_pm(
        jnp.asarray(m2_pm), jnp.asarray(misc), 1e-8, sweeps=6,
        interpret=on_cpu)  # compiled on accelerators
    # float64 numpy truth (NOT a jax twin: compiled on the TPU, a twin's
    # own fp32 eigh carries ~5e-4 error and would dominate)
    a2_r, b2_r = _solve_truth_f64(
        m2p, msum / np.maximum(n, 1.0)[:, None], nov6, n.astype(np.float64),
        1e-8)
    a2t_r = np.swapaxes(a2_r, -1, -2).reshape(P, d * d)
    e1 = max(rmse(a2t_pm, a2t_r), rmse(np.asarray(small)[:, 0:d], b2_r))
    ok = e1 < 2e-4
    print(f"[1] compiled solve_matrices_pm vs f64 truth: rms {e1:.2e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        failures.append("solve_matrices_pm")

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

    out_xla = denoise_monoscale(mean, nb, histo, cov, params, tile=16,
                                use_fused=False, use_pallas=False)
    for tl in (16, 48):  # 48 = bench/production config (VMEM edge)
        out_fused = denoise_monoscale(mean, nb, histo, cov, params, tile=tl,
                                      use_fused=True)
        e2 = rmse(out_fused, out_xla)
        ok = e2 < 1e-4
        print(f"[2] fused engine (tile={tl}) vs XLA engine: rms {e2:.2e} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append(f"fused-vs-xla-t{tl}")

    golden_mono = image_io.load_multi_channels_exr(
        os.path.join(gd, "out_mono_b6.exr"))
    golden_multi = image_io.load_multi_channels_exr(
        os.path.join(gd, "out_multi2_b6.exr"))
    out_fused48 = denoise_monoscale(mean, nb, histo, cov, params, tile=48,
                                    use_fused=True)
    e3a = rmse(out_fused48, golden_mono)
    out_multi = denoise_multiscale(mean, nb, histo, cov, params,
                                   nb_of_scales=2, tile=16)
    e3b = rmse(out_multi, golden_multi)
    # -s 3 path (bench config): fused vs XLA engine, both compiled
    out_s3_f = denoise_multiscale(mean, nb, histo, cov, params,
                                  nb_of_scales=3, tile=48, use_fused=True)
    out_s3_x = denoise_multiscale(mean, nb, histo, cov, params,
                                  nb_of_scales=3, tile=16, use_fused=False,
                                  use_pallas=False)
    e3c = rmse(out_s3_f, out_s3_x)
    ok = e3a < 1e-4 and e3b < 1e-4 and e3c < 1e-4
    print(f"[3] goldens + -s 3: mono rms {e3a:.2e}, multi2 rms {e3b:.2e}, "
          f"s3 fused-vs-xla rms {e3c:.2e} {'OK' if ok else 'FAIL'}",
          flush=True)
    if not ok:
        failures.append("goldens")

    # --- 4. candidate-stack Pallas path (r=2), compiled -------------------
    params_r2 = DenoiserParameters(patch_radius=2, search_window_radius=3)
    out_r2_p = denoise_monoscale(mean, nb, histo, cov, params_r2, tile=16,
                                 use_pallas=True, use_fused=False)
    out_r2_x = denoise_monoscale(mean, nb, histo, cov, params_r2, tile=16,
                                 use_pallas=False, use_fused=False)
    e4 = rmse(out_r2_p, out_r2_x)
    ok = e4 < 1e-4
    print(f"[4] candidate-stack kernel (r=2) vs XLA: rms {e4:.2e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        failures.append("solve_filter-r2")

    # --- 5. Pallas under shard_map on a 1-device mesh ---------------------
    from jax.sharding import Mesh

    from bcd_tpu.parallel.spatial import denoise_monoscale_spatial

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("x",))
    engine = "XLA (interpret fallback)" if on_cpu else "fused Pallas"
    out_sp = denoise_monoscale_spatial(
        mean, nb, histo, cov, params, mesh1, tile=48, use_fused=not on_cpu)
    e5 = rmse(out_sp, out_fused48)
    ok = e5 < 1e-5
    print(f"[5] spatial shard_map (1-dev mesh, engine={engine}) vs plain: "
          f"rms {e5:.2e} {'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        failures.append("shard_map-fused")

    # --- 5b. multiscale spatial on the 1-dev mesh (round-3 verdict #4) ----
    from bcd_tpu.parallel.spatial import denoise_multiscale_spatial

    out_ms_sp = denoise_multiscale_spatial(
        mean, nb, histo, cov, params, mesh1, nb_of_scales=3, tile=48,
        use_fused=not on_cpu)
    e5b = rmse(out_ms_sp, out_s3_f)
    ok = e5b < 1e-5
    print(f"[5b] multiscale spatial (1-dev mesh, engine={engine}) vs plain "
          f"-s 3: rms {e5b:.2e} {'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        failures.append("multiscale-spatial-fused")

    # --- 5c. frame batch on the 1-dev mesh (round-3 verdict #4) -----------
    from bcd_tpu.parallel.frames import denoise_frames

    meshf = Mesh(np.array(jax.devices()[:1]), ("frames",))
    stack = lambda a: np.stack([np.asarray(a)] * 2)  # noqa: E731
    out_fr = denoise_frames(
        stack(mean), stack(nb), stack(histo), stack(cov), params,
        mesh=meshf, tile=48, use_fused=not on_cpu)
    e5c = max(rmse(np.asarray(out_fr)[i], out_fused48) for i in range(2))
    ok = e5c < 1e-5
    print(f"[5c] frame batch (1-dev mesh, engine={engine}, F=2) vs plain: "
          f"rms {e5c:.2e} {'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        failures.append("frames-fused")

    # --- 6. timing variance probe ----------------------------------------
    def run():
        out = denoise_monoscale(mean, nb, histo, cov, params, tile=48)
        float(np.asarray(out)[0, 0, 0])

    run()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    spread = max(times) / min(times)
    ok = spread < 1.2
    print(f"[6] timing spread over 3 runs: {spread:.2f}x "
          f"({'stable' if ok else 'CONTENDED — numbers not trustable'})",
          flush=True)
    if not ok and not on_cpu:
        failures.append("timing-spread")

    if failures:
        print(f"FAILURES: {failures}", flush=True)
        return 1
    print("verify-tpu: all gates green", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
