"""Preset (.bcd.json) load/save tests against the reference's key schema
(reference src/io/ParametersIO.cpp:95-160)."""

import json

from bcd_tpu import params as P


def test_defaults_match_cli_effective_behavior():
    d = P.DenoiserParameters()
    assert d.histogram_distance_threshold == 1.0
    assert d.patch_radius == 1
    assert d.search_window_radius == 6
    assert d.min_eigen_value == 1e-8
    assert d.use_random_pixel_order is True
    assert d.marked_pixels_skipping_probability == 1.0
    assert d.color_patch_dimension == 27
    assert d.max_nb_of_similar_patches == 169
    p = P.PipelineParameters()
    assert p.prefiltering.perform_spike_removal is True
    assert p.prefiltering.spike_removal_threshold_stdev_factor == 2.0
    assert p.denoiser.nb_of_scales == 3


def test_json_roundtrip(tmp_path):
    p = P.PipelineParameters()
    p.input_file_names.colors = str(tmp_path / "scene.exr")
    p.input_file_names.histograms = str(tmp_path / "scene_hist.exr")
    p.input_file_names.covariances = str(tmp_path / "scene_cov.exr")
    p.denoiser.nb_of_scales = 2
    p.denoiser.monoscale.search_window_radius = 4
    p.denoiser.monoscale.min_eigen_value = 1e-4

    path = str(tmp_path / ("preset" + P.BCD_JSON_EXTENSION))
    assert P.save_pipeline_json(p, path) is True

    with open(path) as f:
        obj = json.load(f)
    # exact reference key names
    for key in [
        "inputColorFile", "inputHistoFile", "inputCovarFile",
        "performSpikeRemovalPrefiltering", "spikeRemovalThresholdStDevFactor",
        "nbOfScales", "histoDistanceThreshold", "useCuda", "nbOfCores",
        "patchRadius", "searchWindowRadius", "randomPixelOrder",
        "markedPixelsSkippingProbability", "minEigenValue",
    ]:
        assert key in obj, key
    assert obj["inputColorFile"] == "scene.exr"  # stored relative to the json

    q = P.load_pipeline_json(path)
    assert q.denoiser.nb_of_scales == 2
    assert q.denoiser.monoscale.search_window_radius == 4
    assert q.denoiser.monoscale.min_eigen_value == 1e-4
    # paths resolved against the json's folder
    assert q.input_file_names.colors == str(tmp_path / "scene.exr")


def test_partial_json_only_overwrites_present_keys(tmp_path):
    path = str(tmp_path / "partial.bcd.json")
    with open(path, "w") as f:
        json.dump({"searchWindowRadius": 3}, f)
    q = P.load_pipeline_json(path)
    assert q.denoiser.monoscale.search_window_radius == 3
    assert q.denoiser.monoscale.patch_radius == 1  # untouched default
