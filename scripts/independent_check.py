"""Independent semantics check: bcd_tpu vs the UPSTREAM reference's own C++.

Round-2 verdict item 5: every parity claim so far chains through
tests/reference_impl.py — written by the same author as the engine. This
script removes that single point of failure by compiling the reference's
actual core (/root/reference/src/core/*.cpp, CPU path, FOUND_CUDA off)
out-of-tree and diffing its output against bcd_tpu's engine on the same
statistics arrays.

Build recipe discovered on this host:
 - Eigen: the reference vendors it as a stripped submodule (ext/eigen is
   empty) but the baked-in tensorflow wheel ships the full Eigen headers.
 - OpenEXR/nanogui/json: not needed — src/core/ is IO-free; our driver
   (native/ref_driver.cpp) feeds DeepImage buffers from raw arrays.
 - wine for bin/win64/bcd_cli.exe: not installed and no package manager
   egress, so running the shipped binaries stays impossible; building the
   source is strictly better anyway (same code, native speed).

Usage: python scripts/independent_check.py [--scales N] [--size HxW]
Exits non-zero if the engines disagree (rms > 2e-4 of signal scale).
"""

from __future__ import annotations

import argparse
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

REF = os.environ.get("BCD_REFERENCE_DIR", "/root/reference")
BUILD_DIR = os.path.join(tempfile.gettempdir(), "bcd_ref_build")

REF_CORE_SOURCES = [
    "Denoiser.cpp",
    "DenoisingUnit.cpp",
    "MultiscaleDenoiser.cpp",
    "SpikeRemovalFilter.cpp",
    "SamplesAccumulator.cpp",
    "CovarianceMatrix.cpp",
    "Utils.cpp",
    "Chronometer.cpp",
]


def find_eigen() -> str | None:
    candidates = ["/usr/include/eigen3"]
    try:
        import tensorflow  # noqa: F401  (only for its vendored headers)

        tf_dir = os.path.dirname(tensorflow.__file__)
        candidates.insert(0, os.path.join(tf_dir, "include"))
    except Exception:
        # the wheel's include dir works even if importing tf is slow/broken
        for sp in sys.path:
            cand = os.path.join(sp, "tensorflow", "include")
            if os.path.isdir(os.path.join(cand, "Eigen")):
                candidates.insert(0, cand)
    for c in candidates:
        if os.path.isdir(os.path.join(c, "Eigen")):
            return c
    return None


def build_reference(verbose: bool = True) -> str | None:
    """Compile the reference core + our raw-array driver. Returns exe path."""
    src_dir = os.path.join(REF, "src", "core")
    inc_dir = os.path.join(REF, "include", "bcd", "core")
    if not os.path.isdir(src_dir):
        if verbose:
            print(f"reference sources not found at {src_dir}", file=sys.stderr)
        return None
    eigen = find_eigen()
    if eigen is None:
        if verbose:
            print("no Eigen headers found (need tensorflow wheel or "
                  "/usr/include/eigen3)", file=sys.stderr)
        return None

    os.makedirs(BUILD_DIR, exist_ok=True)
    exe = os.path.join(BUILD_DIR, "ref_driver")
    sources = [os.path.join(src_dir, s) for s in REF_CORE_SOURCES]
    sources.append(os.path.join(REPO, "native", "ref_driver.cpp"))
    stamp = os.path.join(BUILD_DIR, "sources.stamp")
    sig = "|".join(f"{s}:{os.path.getmtime(s)}" for s in sources)
    if os.path.exists(exe) and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read() == sig:
                return exe

    cmd = [
        "g++", "-O2", "-std=c++14", "-fopenmp",
        f"-I{inc_dir}", f"-I{eigen}",
        "-DNDEBUG",  # DeepImage asserts off, like the reference's Release
        # the reference calls unqualified sqrt/pow without <cmath> (builds
        # under MSVC's lenient headers); give gcc the global-namespace decls
        "-include", "math.h",
        *sources,
        "-o", exe,
    ]
    if verbose:
        print("building reference core:", " ".join(cmd), file=sys.stderr)
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        if verbose:
            print(proc.stderr[-4000:], file=sys.stderr)
        return None
    with open(stamp, "w") as f:
        f.write(sig)
    return exe


def run_reference(exe, color, nb, histo, cov, params, scales=1, cores=1):
    """Run the compiled reference denoiser on (H,W,D) float32 arrays."""
    h, w = color.shape[:2]
    bins = histo.shape[2]
    blob = struct.pack(
        "<8i2f", w, h, bins, scales, params.patch_radius,
        params.search_window_radius, 0, cores,
        params.histogram_distance_threshold, params.min_eigen_value,
    )
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.bin")
        outp = os.path.join(td, "out.bin")
        with open(inp, "wb") as f:
            f.write(blob)
            for arr in (color, nb, histo, cov):
                f.write(np.ascontiguousarray(arr, np.float32).tobytes())
        subprocess.run([exe, inp, outp], check=True, timeout=1800)
        out = np.fromfile(outp, dtype=np.float32)
    return out.reshape(h, w, 3)


def run_reference_accumulator(exe, samples, weights, nb_of_bins=20,
                              gamma=2.2, max_value=2.5):
    """Stream (H, W, S, 3) samples + (H, W, S) weights through the
    UPSTREAM SamplesAccumulator (ref_driver --acc). Returns
    (nb (H,W), mean (H,W,3), cov (H,W,6), histo (H,W,3*bins))."""
    h, w, spp, _ = samples.shape
    blob = struct.pack("<4i2f", w, h, spp, nb_of_bins, gamma, max_value)
    packed = np.concatenate(
        [np.asarray(samples, np.float32),
         np.asarray(weights, np.float32)[..., None]], axis=-1)
    with tempfile.TemporaryDirectory() as td:
        inp = os.path.join(td, "in.bin")
        outp = os.path.join(td, "out.bin")
        with open(inp, "wb") as f:
            f.write(blob)
            f.write(np.ascontiguousarray(packed).tobytes())
        subprocess.run([exe, "--acc", inp, outp], check=True, timeout=600)
        out = np.fromfile(outp, dtype=np.float32)
    n = h * w
    nb = out[:n].reshape(h, w)
    mean = out[n : 4 * n].reshape(h, w, 3)
    cov = out[4 * n : 10 * n].reshape(h, w, 6)
    histo = out[10 * n :].reshape(h, w, 3 * nb_of_bins)
    return nb, mean, cov, histo


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="64x96")
    ap.add_argument("--scales", type=int, default=1)
    ap.add_argument("--tile", type=int, default=32)
    args = ap.parse_args()
    h, w = (int(x) for x in args.size.split("x"))

    exe = build_reference()
    if exe is None:
        print("BLOCKED: could not build the reference core on this host")
        return 2

    import jax

    jax.config.update("jax_platforms", "cpu")

    from make_test_scene import render_clean, sample_noisy
    from bcd_tpu.ops.accumulator import SamplesAccumulator
    from bcd_tpu.params import DenoiserParameters, HistogramParameters
    from bcd_tpu.core.multiscale import denoise_multiscale

    clean = render_clean(h, w)
    acc = SamplesAccumulator(h, w, HistogramParameters())
    acc.add_samples(sample_noisy(clean, spp=6, seed=3))
    nb, mean, cov, histo = acc.extract_samples_statistics()
    color = mean.astype(np.float32)
    nb = nb.astype(np.float32)
    histo = histo.astype(np.float32)
    cov = cov.astype(np.float32)

    params = DenoiserParameters()
    ref = run_reference(exe, color, nb, histo, cov, params,
                        scales=args.scales)
    ours = np.asarray(
        denoise_multiscale(color, nb, histo, cov, params,
                           nb_of_scales=args.scales, tile=args.tile)
    )

    scale = float(np.sqrt(np.mean(ref ** 2)) + 1e-12)
    rms = float(np.sqrt(np.mean((ref - ours) ** 2))) / scale
    mx = float(np.abs(ref - ours).max())
    print(f"reference-C++ vs bcd_tpu ({h}x{w}, scales={args.scales}): "
          f"relative rms {rms:.3e}, max abs {mx:.3e}")
    ok = rms < 2e-4
    print("independent check:", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
