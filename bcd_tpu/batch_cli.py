"""Renderfarm batch mode: denoise many frames driven by .bcd.json presets.

The reference's renderfarm story is one bcd_cli process per frame sharing a
JSON preset (reference README). Here a whole frame set is processed by one
process: frames of identical geometry are grouped, batched, and denoised
data-parallel across all available devices (bcd_tpu.parallel.frames); odd
geometries fall back to per-frame processing. Per-frame job isolation: a
failing frame is reported and skipped, not fatal (the reference exits).

Usage:
  python -m bcd_tpu.batch_cli -a preset.bcd.json -o OUTDIR frame1.exr ...
  python -m bcd_tpu.batch_cli -o OUTDIR --suffix _den frames/*.exr

Each input color EXR must have its `_hist.exr` / `_cov.exr` siblings
(raw2bcd layout). Preset denoiser parameters apply to every frame.
"""

from __future__ import annotations

import argparse
import os
import time
from collections import defaultdict
from typing import List

import numpy as np

from bcd_tpu import params as P
from bcd_tpu.core.pipeline import denoise_pipeline, sanitize_output
from bcd_tpu.io import image_io


def load_frame(color_path: str):
    stem = color_path[:-4] if color_path.endswith(".exr") else color_path
    color = image_io.load_exr(color_path)
    if color.shape[-1] == 1:
        color = np.repeat(color, 3, axis=-1)
    hist_and_count = image_io.load_multi_channels_exr(stem + "_hist.exr")
    histo, nb = image_io.separate_nb_of_samples_from_histogram(hist_and_count)
    cov = image_io.load_multi_channels_exr(stem + "_cov.exr")
    return color, nb, histo, cov


def main(argv: List[str] | None = None) -> int:
    from bcd_tpu.cache import configure_compile_cache

    configure_compile_cache()
    ap = argparse.ArgumentParser(
        description="Batch-denoise frames with a shared .bcd.json preset")
    ap.add_argument("frames", nargs="+", help="input color EXRs")
    ap.add_argument("-a", "--preset", help=".bcd.json preset")
    ap.add_argument("-o", "--outdir", required=True)
    ap.add_argument("--suffix", default="_BCDfiltered")
    ap.add_argument("--tile", type=int, default=None)
    ap.add_argument("--batch", action="store_true",
                    help="batch same-geometry frames across devices "
                         "(monoscale only)")
    ap.add_argument("--resume", action="store_true",
                    help="skip frames whose output already exists "
                         "(preemption-safe renderfarm runs)")
    args = ap.parse_args(argv)

    pipeline = P.PipelineParameters()
    if args.preset:
        P.load_pipeline_json(args.preset, pipeline)
    os.makedirs(args.outdir, exist_ok=True)

    def out_path(frame):
        base = os.path.basename(frame)
        stem = base[:-4] if base.endswith(".exr") else base
        return os.path.join(args.outdir, stem + args.suffix + ".exr")

    start = time.perf_counter()
    failures = 0

    if args.resume:
        skipped = [f for f in args.frames if os.path.exists(out_path(f))]
        if skipped:
            print(f"resume: skipping {len(skipped)} already-denoised frames")
        args.frames = [f for f in args.frames if not os.path.exists(out_path(f))]

    if args.batch and pipeline.denoiser.nb_of_scales == 1:
        import jax
        from jax.sharding import Mesh
        from bcd_tpu.parallel.frames import denoise_frames

        groups = defaultdict(list)
        loaded = {}
        for frame in args.frames:
            try:
                loaded[frame] = load_frame(frame)
                groups[loaded[frame][0].shape].append(frame)
            except Exception as e:
                print(f"ERROR loading {frame}: {e}")
                failures += 1
        devices = jax.devices()
        for shape, frames in groups.items():
            n_dev = max(1, min(len(devices), len(frames)))
            mesh = Mesh(np.array(devices[:n_dev]), ("frames",))
            # pad the batch to a multiple of the device count
            pad = (-len(frames)) % n_dev
            batch = frames + frames[:pad] if pad else frames
            data = [loaded[f] for f in batch]
            colors, nbs, histos, covs = (np.stack(x) for x in zip(*data))
            out = np.asarray(denoise_frames(
                colors, nbs, histos, covs, pipeline.denoiser.monoscale,
                mesh=mesh, axis="frames", tile=args.tile))
            for i, frame in enumerate(frames):
                img = np.asarray(sanitize_output(out[i]))
                image_io.write_exr(img, out_path(frame))
                print(f"wrote {out_path(frame)}")
    else:
        for frame in args.frames:
            try:
                color, nb, histo, cov = load_frame(frame)
                out = denoise_pipeline(color, nb, histo, cov, pipeline,
                                       tile=args.tile)
                image_io.write_exr(out, out_path(frame))
                print(f"wrote {out_path(frame)}")
            except Exception as e:  # per-frame isolation
                print(f"ERROR denoising {frame}: {e}")
                failures += 1

    n_frames = len(args.frames)
    elapsed = time.perf_counter() - start
    print(f"{n_frames - failures}/{n_frames} frames in {elapsed:.1f} s")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
