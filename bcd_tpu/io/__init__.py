"""IO layer: EXR codec, image adapters, raw sample dumps (reference bcdio)."""

from bcd_tpu.io.image_io import (
    load_exr,
    load_multi_channels_exr,
    write_exr,
    write_multi_channels_exr,
    separate_nb_of_samples_from_histogram,
    merge_histogram_and_nb_of_samples,
)

__all__ = [
    "load_exr",
    "load_multi_channels_exr",
    "write_exr",
    "write_multi_channels_exr",
    "separate_nb_of_samples_from_histogram",
    "merge_histogram_and_nb_of_samples",
]
