"""Batch denoise CLI (reference src/cli/main.cpp).

Flag surface preserved verbatim: ``-o -i -h -c -d -b -w -r -p --p-factor
-m -s -e --ncores --use-cuda`` with the same semantics, including the
``<input>_hist.exr`` / ``<input>_cov.exr`` path inference when -h/-c are
omitted (main.cpp:344-370). The ``-a <file>.bcd.json`` pipeline-preset flag,
documented but never parsed by the reference (main.cpp:107), is implemented
here: CLI flags given after -a override preset values.

Defaults match the reference's *effective* CLI behavior (ProgramArguments
ctor, main.cpp:46-59): -r 1, -p 1, -m 1, -s 3 — note the reference's usage
text claims 0 for -r/-p; we document the real values.

Divergences (documented): -r/-m are accepted and recorded but the TPU
engine always runs the deterministic full denoise (the artifact-free -m 0
path); --use-cuda/--ncores map to accelerator/device options.
"""

from __future__ import annotations

import sys
import time
from typing import List, Optional

import numpy as np

from bcd_tpu import params as P
from bcd_tpu.core.pipeline import denoise_pipeline
from bcd_tpu.io import image_io


def print_usage(prog: str) -> None:
    d = P.PipelineParameters()
    mono = d.denoiser.monoscale
    print("Bayesian Collaborative Denoising (TPU-native)\n")
    print(f"Usage: {prog} <arguments list>")
    print("Only EXR images are supported.\n")
    print("Required arguments list (unless a pipeline file is provided and contains this data):")
    print("    -o <output>          The file path to the output image")
    print("    -i <input>           The file path to the input image")
    print("    -h <hist>            The file path to the input histograms buffer")
    print("    -c <cov>             The file path to the input covariance matrices buffer")
    print("Optional arguments list:")
    print("    -a <file>            The file path to the .bcd.json file containing arguments for the program")
    print(f"    -d <float>           Histogram patch distance threshold (default: {mono.histogram_distance_threshold})")
    print(f"    -b <int>             Radius of search windows (default: {mono.search_window_radius})")
    print(f"    -w <int>             Radius of patches (default: {mono.patch_radius})")
    print(f"    -r <0/1>             1 for random pixel order; accepted for compatibility — the TPU engine is always deterministic and artifact-free (default: {int(mono.use_random_pixel_order)})")
    print(f"    -p <0/1>             1 for a spike removal prefiltering (default: {int(d.prefiltering.perform_spike_removal)})")
    print(f"    --p-factor <float>   Spike prefilter threshold = factor * stddev; lower removes more spikes (default: {d.prefiltering.spike_removal_threshold_stdev_factor})")
    print(f"    -m <float in [0,1]>  Probability of skipping marked patch centers; accepted for compatibility — the TPU engine always re-denoises every pixel (default: {mono.marked_pixels_skipping_probability})")
    print(f"    -s <int>             Number of Scales for Multi-Scaling (default: {d.denoiser.nb_of_scales})")
    print("    --ncores <nbOfCores> Accepted for compatibility (CPU-era flag); has no TPU meaning")
    print(f"    --use-cuda <0/1>     Accepted for compatibility; 1 maps to 'use the accelerator' (default: {int(mono.use_cuda)})")
    print(f"    -e <float>           Minimum eigen value for matrix inversion (default: {mono.min_eigen_value})")
    print("    --tile <int>         Processing tile size (TPU-specific; default 32)")
    print("    --skip-stride <int>  Solve only every Nth patch center (deterministic analog of the reference's skip-marking heuristic); 1 = exact, 2/3 trade quality for throughput (default: 1)")
    print("    --stats              Print a per-phase time/pixel-count report after the run (the reference's COMPUTE_DENOISING_STATS build option, always available here)")


class _Args:
    def __init__(self):
        self.output_path = ""
        self.input_color_path = ""
        self.hist_path: Optional[str] = None
        self.cov_path: Optional[str] = None
        self.pipeline = P.PipelineParameters()
        self.tile: Optional[int] = None
        self.skip_stride: int = 1
        self.stats: bool = False


def _expect_value(argv: List[str], i: int, flag: str, msg: str) -> str:
    if i + 1 >= len(argv):
        print(f"ERROR in program arguments: expecting {msg} after '{flag}'")
        raise SystemExit(1)
    return argv[i + 1]


def parse_args(argv: List[str]) -> Optional[_Args]:
    args = _Args()
    mono = args.pipeline.denoiser.monoscale
    pre = args.pipeline.prefiltering
    i = 0
    while i < len(argv):
        flag = argv[i]
        if flag == "-a":
            path = _expect_value(argv, i, flag, "file path to the pipeline file")
            P.load_pipeline_json(path, args.pipeline)
            mono = args.pipeline.denoiser.monoscale
            pre = args.pipeline.prefiltering
            fn = args.pipeline.input_file_names
            args.input_color_path = fn.colors or args.input_color_path
            args.hist_path = fn.histograms or args.hist_path
            args.cov_path = fn.covariances or args.cov_path
            i += 2
        elif flag == "-o":
            args.output_path = _expect_value(argv, i, flag, "file path to the output image")
            i += 2
        elif flag == "-i":
            args.input_color_path = _expect_value(argv, i, flag, "file path to the input color image")
            i += 2
        elif flag == "-h":
            args.hist_path = _expect_value(argv, i, flag, "file path to the input histogram image")
            i += 2
        elif flag == "-c":
            args.cov_path = _expect_value(argv, i, flag, "file path to the input covariance matrix image")
            i += 2
        elif flag == "-d":
            mono.histogram_distance_threshold = float(_expect_value(argv, i, flag, "histogram patch distance threshold"))
            i += 2
        elif flag == "-b":
            mono.search_window_radius = int(_expect_value(argv, i, flag, "radius of search window"))
            i += 2
        elif flag == "-w":
            mono.patch_radius = int(_expect_value(argv, i, flag, "radius of patch"))
            i += 2
        elif flag == "-e":
            mono.min_eigen_value = float(_expect_value(argv, i, flag, "minimum eigen value"))
            i += 2
        elif flag == "-r":
            v = _expect_value(argv, i, flag, "0 or 1")
            if v not in ("0", "1"):
                print("ERROR in program arguments: expecting 0 or 1 after '-r'")
                return None
            mono.use_random_pixel_order = v == "1"
            i += 2
        elif flag == "-p":
            v = _expect_value(argv, i, flag, "0 or 1")
            if v not in ("0", "1"):
                print("ERROR in program arguments: expecting 0 or 1 after '-p'")
                return None
            pre.perform_spike_removal = v == "1"
            i += 2
        elif flag == "--p-factor":
            pre.spike_removal_threshold_stdev_factor = float(
                _expect_value(argv, i, flag, "standard deviation factor"))
            i += 2
        elif flag == "-m":
            v = float(_expect_value(argv, i, flag, "float in [0,1]"))
            if not 0.0 <= v <= 1.0:
                print("ERROR in program arguments: expecting float in [0,1] after '-m'")
                return None
            mono.marked_pixels_skipping_probability = v
            i += 2
        elif flag == "-s":
            args.pipeline.denoiser.nb_of_scales = int(
                _expect_value(argv, i, flag, "number of scales"))
            i += 2
        elif flag == "--ncores":
            mono.nb_of_cores = int(_expect_value(argv, i, flag, "number of cores"))
            i += 2
        elif flag == "--use-cuda":
            v = _expect_value(argv, i, flag, "0 or 1")
            if v not in ("0", "1"):
                print("ERROR in program arguments: expecting 0 or 1 after '--use-cuda'")
                return None
            mono.use_cuda = v == "1"
            i += 2
        elif flag == "--tile":
            args.tile = int(_expect_value(argv, i, flag, "tile size"))
            i += 2
        elif flag == "--skip-stride":
            args.skip_stride = int(_expect_value(argv, i, flag, "stride"))
            i += 2
        elif flag == "--stats":
            args.stats = True
            i += 1
        else:
            i += 1  # unknown tokens skipped, like the reference parser

    # validated after the loop so it can't depend on -w argument order
    if not 1 <= args.skip_stride <= 2 * mono.patch_radius + 1:
        print("ERROR in program arguments: --skip-stride must be in "
              f"[1, {2 * mono.patch_radius + 1}] (= patch diameter, so the "
              "patch aggregation still covers every pixel)")
        return None

    # infer _hist/_cov from the color path when omitted (main.cpp:344-370)
    if args.input_color_path:
        stem = args.input_color_path[:-4] if args.input_color_path.endswith(".exr") else args.input_color_path
        if not args.hist_path:
            args.hist_path = stem + "_hist.exr"
            print(f"Warning: input histogram file not provided by -h argument: assuming '{args.hist_path}'")
        if not args.cov_path:
            args.cov_path = stem + "_cov.exr"
            print(f"Warning: input covariance file not provided by -c argument: assuming '{args.cov_path}'")

    missing = []
    if not args.input_color_path:
        missing.append("-i")
    if not args.hist_path:
        missing.append("-h")
    if not args.cov_path:
        missing.append("-c")
    if not args.output_path:
        missing.append("-o")
    if missing:
        print("ERROR: Missing required program argument(s): " + " ".join(missing))
        print()
        print_usage("bcd")
        return None
    return args


def launch(argv: List[str]) -> int:
    args = parse_args(argv)
    if args is None:
        return 1

    try:
        color = image_io.load_exr(args.input_color_path)
        if color.shape[-1] == 1:
            color = np.repeat(color, 3, axis=-1)
        hist_and_count = image_io.load_multi_channels_exr(args.hist_path)
        histo, nb = image_io.separate_nb_of_samples_from_histogram(
            hist_and_count)
        cov = image_io.load_multi_channels_exr(args.cov_path)
    except Exception as e:  # missing file, truncated/invalid EXR, ...
        print(f"ERROR: couldn't load input images: {e}")
        return 1

    last_pct = [-1]

    def progress(p: float) -> None:
        # print on integer-percent changes only (reference Denoiser.cpp:189)
        pct = int(p * 100)
        if pct != last_pct[0]:
            last_pct[0] = pct
            print(f"\r{pct} %", end="", flush=True)

    stats = None
    if args.stats:
        from bcd_tpu.chrono import PhaseStats

        stats = PhaseStats()

    out = denoise_pipeline(
        color, nb, histo, cov, args.pipeline, tile=args.tile,
        progress_callback=progress, skip_stride=args.skip_stride,
        stats=stats,
    )
    print()
    image_io.write_exr(out, args.output_path)
    print(f"Written denoised output in file {args.output_path}")
    if stats is not None:
        # the reference prints its DenoisingStatistics tree after the run
        # (DenoisingUnit.cpp:71-94 printChronometers + counters)
        print(stats.report())
    return 0


def main() -> int:
    from bcd_tpu.cache import configure_compile_cache

    configure_compile_cache()
    start = time.perf_counter()
    rc = launch(sys.argv[1:])
    elapsed = time.perf_counter() - start
    print(f"Program total time: {elapsed:.3f} s")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
