"""End-to-end CLI tests: raw2bcd -> bcd denoise, preset handling, path
inference — the worked example from the reference README, self-generated."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    from make_test_scene import render_clean, sample_noisy
    from bcd_tpu.io import raw

    d = tmp_path_factory.mktemp("scene")
    clean = render_clean(48, 40)
    samples = sample_noisy(clean, spp=24, seed=7)
    raw_path = str(d / "test.raw")
    raw.write_raw(raw_path, samples)
    return {"dir": d, "raw": raw_path, "clean": clean}


def test_raw2bcd_and_denoise_cli(scene, tmp_path):
    from bcd_tpu import raw2bcd_cli, cli
    from bcd_tpu.io import image_io

    prefix = str(scene["dir"] / "test")
    assert raw2bcd_cli.main([scene["raw"], prefix]) == 0
    for suffix in (".exr", "_hist.exr", "_cov.exr"):
        assert os.path.exists(prefix + suffix)

    out_path = str(tmp_path / "test_BCDfiltered.exr")
    # -h/-c omitted: the CLI infers <input>_hist.exr / <input>_cov.exr
    rc = cli.launch(
        ["-i", prefix + ".exr", "-o", out_path, "-s", "2", "-b", "2",
         "--tile", "16"]
    )
    assert rc == 0
    out = image_io.load_exr(out_path)
    assert out.shape == (48, 40, 3)
    assert np.all(np.isfinite(out)) and np.all(out >= 0)

    # denoising must clearly beat the noisy input against the clean render
    # (the fast-test parameters -s 2 -b 2 are deliberately weak; default
    # -s 3 -b 6 denoises much harder but is too slow for unit tests)
    noisy = image_io.load_exr(prefix + ".exr")
    clean = scene["clean"]
    rmse_noisy = np.sqrt(np.mean((noisy - clean) ** 2))
    rmse_out = np.sqrt(np.mean((out - clean) ** 2))
    assert rmse_out < 0.75 * rmse_noisy, (rmse_out, rmse_noisy)


def test_cli_preset_flag(scene, tmp_path):
    from bcd_tpu import cli

    prefix = str(scene["dir"] / "test")
    preset = {
        "inputColorFile": "test.exr",
        "inputHistoFile": "test_hist.exr",
        "inputCovarFile": "test_cov.exr",
        "nbOfScales": 1,
        "searchWindowRadius": 2,
        "performSpikeRemovalPrefiltering": False,
    }
    preset_path = str(scene["dir"] / "preset.bcd.json")
    with open(preset_path, "w") as f:
        json.dump(preset, f)

    out_path = str(tmp_path / "preset_out.exr")
    rc = cli.launch(["-a", preset_path, "-o", out_path, "--tile", "16"])
    assert rc == 0
    assert os.path.exists(out_path)


def test_cli_missing_args():
    from bcd_tpu import cli

    assert cli.parse_args([]) is None
    assert cli.parse_args(["-r", "2"]) is None  # invalid 0/1
    assert cli.parse_args(["-m", "1.5"]) is None  # out of range


def test_cli_arg_values_reach_params():
    from bcd_tpu import cli

    args = cli.parse_args(
        ["-i", "x.exr", "-o", "y.exr", "-d", "0.5", "-b", "4", "-w", "2",
         "-e", "1e-4", "-r", "0", "-p", "0", "--p-factor", "1.5", "-m", "0",
         "-s", "1", "--ncores", "4", "--use-cuda", "0"]
    )
    mono = args.pipeline.denoiser.monoscale
    assert mono.histogram_distance_threshold == 0.5
    assert mono.search_window_radius == 4
    assert mono.patch_radius == 2
    assert mono.min_eigen_value == 1e-4
    assert mono.use_random_pixel_order is False
    assert args.pipeline.prefiltering.perform_spike_removal is False
    assert args.pipeline.prefiltering.spike_removal_threshold_stdev_factor == 1.5
    assert mono.marked_pixels_skipping_probability == 0.0
    assert args.pipeline.denoiser.nb_of_scales == 1
    assert mono.nb_of_cores == 4 and mono.use_cuda is False
    assert args.hist_path == "x_hist.exr" and args.cov_path == "x_cov.exr"
