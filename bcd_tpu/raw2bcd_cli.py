"""raw2bcd: convert a raw all-samples dump to the three BCD input EXRs
(reference src/raw_converter/main.cpp).

Usage: raw2bcd <input> <outputPrefix>

Writes ``<prefix>.exr`` (mean color), ``<prefix>_hist.exr`` (histograms +
trailing sample-count channel) and ``<prefix>_cov.exr`` (covariances).
Histogram parameters are fixed at the converter defaults (20 bins,
gamma 2.2, max 2.5 — main.cpp:49-52). Unlike the reference's per-sample
streaming loop, samples are accumulated in vectorized row blocks on device.
"""

from __future__ import annotations

import sys
from typing import List

from bcd_tpu.io import image_io, raw
from bcd_tpu.ops.accumulator import SamplesAccumulator
from bcd_tpu.params import HistogramParameters

COLOR_SUFFIX = ""
HISTOGRAM_SUFFIX = "_hist"
COVARIANCE_SUFFIX = "_cov"
EXTENSION = ".exr"


def print_usage() -> None:
    print("raw2bcd (TPU-native)\n")
    print("Usage: raw2bcd <input> <outputPrefix>")
    print("Converts a raw file with all samples into the inputs for the "
          "BayesianCollaborativeDenoiser program")
    print("Required arguments list:")
    print("    <input>           The file path to the input image")
    print("    <outputPrefix>    The file path to the output image, without .exr extension")


def convert(input_path: str, output_prefix: str, rows_per_block: int = 64) -> int:
    header = raw.read_header(input_path)
    print(f"Version: {header.version}")
    print(f"Resolution: {header.width}x{header.height}")
    print(f"Nb of samples: {header.nb_of_samples}")
    print(f"Nb of channels: {header.nb_of_channels}")

    acc = SamplesAccumulator(header.height, header.width, HistogramParameters())
    for row0, block in raw.iter_raw_row_blocks(input_path, rows_per_block):
        acc.add_samples(block, row0=row0)
    nb, mean, cov, histo = acc.extract_samples_statistics()

    hist_and_count = image_io.merge_histogram_and_nb_of_samples(histo, nb)
    image_io.write_exr(mean, output_prefix + COLOR_SUFFIX + EXTENSION)
    image_io.write_multi_channels_exr(
        cov, output_prefix + COVARIANCE_SUFFIX + EXTENSION)
    image_io.write_multi_channels_exr(
        hist_and_count, output_prefix + HISTOGRAM_SUFFIX + EXTENSION)
    return 0


def main(argv: List[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print_usage()
        return 1
    return convert(argv[0], argv[1])


if __name__ == "__main__":
    raise SystemExit(main())
