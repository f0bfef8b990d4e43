"""Parameter dataclasses and ``.bcd.json`` preset (de)serialization.

One canonical configuration layer replacing the reference's three divergent
ones (library ctor defaults, CLI defaults, JSON defaults — see
reference src/cli/main.cpp:46-59 vs include/bcd/core/IDenoiser.h:20-44 vs
include/bcd/io/ParametersIO.h:27-32).  Defaults here follow the CLI's
*effective* behavior (the reference's printed usage text disagrees with its
own code; we fix the docs, not the behavior).

JSON preset keys match reference src/io/ParametersIO.cpp:95-160 exactly so
existing ``.bcd.json`` files load unchanged:
  inputColorFile, inputHistoFile, inputCovarFile,
  performSpikeRemovalPrefiltering, spikeRemovalThresholdStDevFactor,
  nbOfScales, histoDistanceThreshold, useCuda, nbOfCores, patchRadius,
  searchWindowRadius, randomPixelOrder, markedPixelsSkippingProbability,
  minEigenValue.

Unlike the reference's ``ParametersIO::write`` (which falls off the end of a
non-void function, src/io/ParametersIO.cpp:119-162), ``save_pipeline_json``
reports success properly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional

BCD_JSON_EXTENSION = ".bcd.json"  # reference: include/bcd/io/ParametersIO.h:67-71


@dataclass
class HistogramParameters:
    """Histogram binning parameters (reference SamplesAccumulator.h:20-30)."""

    nb_of_bins: int = 20
    gamma: float = 2.2
    max_value: float = 2.5


@dataclass
class DenoiserParameters:
    """Monoscale denoiser parameters (reference IDenoiser.h:20-44).

    ``use_cuda``/``nb_of_cores`` are accepted for preset compatibility and
    mapped onto device options (they have no direct TPU meaning).

    ``use_random_pixel_order`` and ``marked_pixels_skipping_probability``
    exist in the reference to trade speed for grid artifacts caused by its
    sequential skip-marking. The TPU engine denoises every pixel batched and
    deterministically (equivalent to the reference's best-quality
    ``-m 0`` path), so these are accepted, recorded, and intentionally have
    no effect on the output. Documented divergence, SURVEY.md §7.
    """

    histogram_distance_threshold: float = 1.0
    patch_radius: int = 1
    search_window_radius: int = 6
    min_eigen_value: float = 1e-8  # reference IDenoiser.h:26 (shipped default)
    use_random_pixel_order: bool = True
    marked_pixels_skipping_probability: float = 1.0
    nb_of_cores: int = 0
    use_cuda: bool = True  # mapped to "use accelerator" (TPU) if available

    @property
    def patch_size(self) -> int:
        return 2 * self.patch_radius + 1

    @property
    def nb_of_pixels_in_patch(self) -> int:
        return self.patch_size * self.patch_size

    @property
    def color_patch_dimension(self) -> int:
        return 3 * self.nb_of_pixels_in_patch

    @property
    def window_size(self) -> int:
        return 2 * self.search_window_radius + 1

    @property
    def max_nb_of_similar_patches(self) -> int:
        return self.window_size * self.window_size


@dataclass
class PrefilteringParameters:
    """Spike-removal prefilter parameters (reference ParametersIO.h:27-32)."""

    perform_spike_removal: bool = True
    spike_removal_threshold_stdev_factor: float = 2.0


@dataclass
class MultiscaleDenoiserParameters:
    nb_of_scales: int = 3
    monoscale: DenoiserParameters = field(default_factory=DenoiserParameters)


@dataclass
class InputFileNames:
    colors: str = ""
    histograms: str = ""
    covariances: str = ""


@dataclass
class PipelineParameters:
    """Full pipeline preset (reference ParametersIO.h:19-46)."""

    input_file_names: InputFileNames = field(default_factory=InputFileNames)
    prefiltering: PrefilteringParameters = field(
        default_factory=PrefilteringParameters
    )
    denoiser: MultiscaleDenoiserParameters = field(
        default_factory=MultiscaleDenoiserParameters
    )


@dataclass
class PipelineParametersSelector:
    """Gates which sections load/save (reference ParametersIO.h:48-57)."""

    input_file_names: bool = True
    prefiltering_parameters: bool = True
    denoiser_parameters: bool = True


def _folder_of(path: str) -> str:
    folder = os.path.dirname(path)
    return folder + os.sep if folder else ""


def load_pipeline_json(
    path: str,
    params: Optional[PipelineParameters] = None,
    selector: Optional[PipelineParametersSelector] = None,
) -> PipelineParameters:
    """Load a ``.bcd.json`` preset, overwriting only keys present in the file
    (reference ParametersIO.cpp:36-117). Input paths are stored relative to
    the JSON file and resolved against its folder on load."""
    params = params if params is not None else PipelineParameters()
    selector = selector if selector is not None else PipelineParametersSelector()
    with open(path, "r") as f:
        obj = json.load(f)
    folder = _folder_of(path)

    if selector.input_file_names:
        if "inputColorFile" in obj:
            params.input_file_names.colors = folder + obj["inputColorFile"]
        if "inputHistoFile" in obj:
            params.input_file_names.histograms = folder + obj["inputHistoFile"]
        if "inputCovarFile" in obj:
            params.input_file_names.covariances = folder + obj["inputCovarFile"]

    if selector.prefiltering_parameters:
        if "performSpikeRemovalPrefiltering" in obj:
            params.prefiltering.perform_spike_removal = bool(
                obj["performSpikeRemovalPrefiltering"]
            )
        if "spikeRemovalThresholdStDevFactor" in obj:
            params.prefiltering.spike_removal_threshold_stdev_factor = float(
                obj["spikeRemovalThresholdStDevFactor"]
            )

    if selector.denoiser_parameters:
        if "nbOfScales" in obj:
            params.denoiser.nb_of_scales = int(obj["nbOfScales"])
        mono = params.denoiser.monoscale
        if "histoDistanceThreshold" in obj:
            mono.histogram_distance_threshold = float(obj["histoDistanceThreshold"])
        if "useCuda" in obj:
            mono.use_cuda = bool(obj["useCuda"])
        if "nbOfCores" in obj:
            mono.nb_of_cores = int(obj["nbOfCores"])
        if "patchRadius" in obj:
            mono.patch_radius = int(obj["patchRadius"])
        if "searchWindowRadius" in obj:
            mono.search_window_radius = int(obj["searchWindowRadius"])
        if "randomPixelOrder" in obj:
            mono.use_random_pixel_order = bool(obj["randomPixelOrder"])
        if "markedPixelsSkippingProbability" in obj:
            mono.marked_pixels_skipping_probability = float(
                obj["markedPixelsSkippingProbability"]
            )
        if "minEigenValue" in obj:
            mono.min_eigen_value = float(obj["minEigenValue"])

    return params


def _relative_path_from_folder(file_path: str, folder_path: str) -> str:
    """Reference Utils::getRelativePathFromFolder (src/core/Utils.cpp:90-115)."""
    sep = "/"
    l1, l2 = len(file_path), len(folder_path)
    l = min(l1, l2)
    pos_after_last_common_sep = 0
    for i in range(l):
        if file_path[i] != folder_path[i]:
            break
        if file_path[i] == sep:
            pos_after_last_common_sep = i + 1
    rel = ""
    for i in range(pos_after_last_common_sep, l2):
        if folder_path[i] == sep:
            rel += "../"
    return rel + file_path[pos_after_last_common_sep:]


def save_pipeline_json(
    params: PipelineParameters,
    path: str,
    selector: Optional[PipelineParametersSelector] = None,
) -> bool:
    """Save a ``.bcd.json`` preset (reference ParametersIO.cpp:119-162,
    with the missing return statement fixed)."""
    selector = selector if selector is not None else PipelineParametersSelector()
    folder = _folder_of(path)
    obj = {}
    if selector.input_file_names:
        fn = params.input_file_names
        obj["inputColorFile"] = _relative_path_from_folder(fn.colors, folder)
        obj["inputHistoFile"] = _relative_path_from_folder(fn.histograms, folder)
        obj["inputCovarFile"] = _relative_path_from_folder(fn.covariances, folder)
    if selector.prefiltering_parameters:
        obj["performSpikeRemovalPrefiltering"] = (
            params.prefiltering.perform_spike_removal
        )
        obj["spikeRemovalThresholdStDevFactor"] = (
            params.prefiltering.spike_removal_threshold_stdev_factor
        )
    if selector.denoiser_parameters:
        obj["nbOfScales"] = params.denoiser.nb_of_scales
        mono = params.denoiser.monoscale
        obj["histoDistanceThreshold"] = mono.histogram_distance_threshold
        obj["useCuda"] = mono.use_cuda
        obj["nbOfCores"] = mono.nb_of_cores
        obj["patchRadius"] = mono.patch_radius
        obj["searchWindowRadius"] = mono.search_window_radius
        obj["randomPixelOrder"] = mono.use_random_pixel_order
        obj["markedPixelsSkippingProbability"] = (
            mono.marked_pixels_skipping_probability
        )
        obj["minEigenValue"] = mono.min_eigen_value
    try:
        with open(path, "w") as f:
            json.dump(obj, f, indent=4)
    except OSError:
        return False
    return True


def asdict(params) -> dict:
    return dataclasses.asdict(params)
