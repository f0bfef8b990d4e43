"""Renderfarm batch CLI tests: preset-driven multi-frame denoise with
per-frame failure isolation."""

import json
import os

import numpy as np

from bcd_tpu import batch_cli
from bcd_tpu.io import image_io
from tests.test_ops_vs_oracle import make_stats


def _write_frame(rng, folder, name, h=14, w=12):
    _, st = make_stats(rng, h=h, w=w, spp=8)
    stem = str(folder / name)
    image_io.write_exr(st["mean"].astype(np.float32), stem + ".exr")
    image_io.write_multi_channels_exr(
        image_io.merge_histogram_and_nb_of_samples(
            st["histo"].astype(np.float32),
            st["nb_of_samples"].astype(np.float32)),
        stem + "_hist.exr")
    image_io.write_multi_channels_exr(
        st["cov"].astype(np.float32), stem + "_cov.exr")
    return stem + ".exr"


def test_batch_sequential_with_preset(tmp_path, rng):
    frames = [_write_frame(rng, tmp_path, f"f{i}") for i in range(2)]
    preset = str(tmp_path / "p.bcd.json")
    with open(preset, "w") as f:
        json.dump({"nbOfScales": 1, "searchWindowRadius": 2,
                   "performSpikeRemovalPrefiltering": False}, f)
    outdir = str(tmp_path / "out")
    rc = batch_cli.main(frames + ["-a", preset, "-o", outdir, "--tile", "8"])
    assert rc == 0
    for frame in frames:
        stem = os.path.basename(frame)[:-4]
        out = image_io.load_exr(os.path.join(outdir, stem + "_BCDfiltered.exr"))
        assert out.shape == (14, 12, 3)
        assert np.all(np.isfinite(out))


def test_batch_mode_groups_frames(tmp_path, rng):
    frames = [_write_frame(rng, tmp_path, f"g{i}") for i in range(3)]
    preset = str(tmp_path / "p.bcd.json")
    with open(preset, "w") as f:
        json.dump({"nbOfScales": 1, "searchWindowRadius": 2}, f)
    outdir = str(tmp_path / "out")
    rc = batch_cli.main(
        frames + ["-a", preset, "-o", outdir, "--tile", "8", "--batch"])
    assert rc == 0
    assert len(os.listdir(outdir)) == 3


def test_batch_failure_isolation(tmp_path, rng):
    good = _write_frame(rng, tmp_path, "ok")
    bad = str(tmp_path / "missing.exr")  # no such file
    preset = str(tmp_path / "p.bcd.json")
    with open(preset, "w") as f:
        json.dump({"nbOfScales": 1, "searchWindowRadius": 2,
                   "performSpikeRemovalPrefiltering": False}, f)
    outdir = str(tmp_path / "out")
    rc = batch_cli.main([good, bad, "-a", preset, "-o", outdir, "--tile", "8"])
    assert rc == 1  # failures reported
    assert len(os.listdir(outdir)) == 1  # the good frame still produced
