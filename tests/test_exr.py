"""EXR codec and image adapter tests: round-trips, compression modes,
grayscale detection, Bin_%04d probing, histogram/count packing."""

import numpy as np
import pytest

from bcd_tpu.io import exr, image_io


def _rand_img(rng, h, w):
    return rng.standard_normal((h, w)).astype(np.float32)


@pytest.mark.parametrize(
    "compression",
    [exr.NO_COMPRESSION, exr.ZIPS_COMPRESSION, exr.ZIP_COMPRESSION],
)
def test_float_roundtrip(tmp_path, rng, compression):
    path = str(tmp_path / "img.exr")
    chans = {"R": _rand_img(rng, 37, 23), "G": _rand_img(rng, 37, 23)}
    exr.write_exr(path, chans, compression=compression)
    out, info = exr.read_exr(path)
    assert info["width"] == 23 and info["height"] == 37
    np.testing.assert_array_equal(out["R"], chans["R"])
    np.testing.assert_array_equal(out["G"], chans["G"])


def test_half_roundtrip(tmp_path, rng):
    path = str(tmp_path / "img.exr")
    data = _rand_img(rng, 16, 16)
    exr.write_exr(path, {"R": data}, pixel_types={"R": exr.HALF})
    out, _ = exr.read_exr(path)
    np.testing.assert_array_equal(out["R"], data.astype(np.float16).astype(np.float32))


def test_zip_chunking_many_lines(tmp_path, rng):
    # >16 lines exercises multi-chunk ZIP blocks, incl. a partial last chunk
    path = str(tmp_path / "img.exr")
    data = _rand_img(rng, 53, 11)
    exr.write_exr(path, {"Z": data})
    out, _ = exr.read_exr(path)
    np.testing.assert_array_equal(out["Z"], data)


def test_zip_predictor_inverse(rng):
    raw = rng.integers(0, 256, size=1001, dtype=np.uint8).tobytes()
    assert exr._zip_postprocess(exr._zip_preprocess(raw)) == raw


def test_color_image_roundtrip_half_quantized(tmp_path, rng):
    path = str(tmp_path / "color.exr")
    img = rng.random((21, 34, 3)).astype(np.float32)
    image_io.write_exr(img, path)
    out = image_io.load_exr(path)
    # color files are HALF on disk (like the reference's RgbaOutputFile)
    np.testing.assert_array_equal(
        out, img.astype(np.float16).astype(np.float32)
    )


def test_grayscale_autodetect(tmp_path):
    path = str(tmp_path / "gray.exr")
    img = np.linspace(0, 1, 15 * 9, dtype=np.float32).reshape(15, 9, 1)
    image_io.write_exr(img, path)  # replicated to RGB on disk
    out = image_io.load_exr(path)
    assert out.shape == (15, 9, 1)  # collapsed back (reference ImageIO.cpp:42-51)


def test_multi_channels_roundtrip(tmp_path, rng):
    path = str(tmp_path / "hist.exr")
    img = rng.random((10, 12, 61)).astype(np.float32)
    image_io.write_multi_channels_exr(img, path)
    out = image_io.load_multi_channels_exr(path)
    np.testing.assert_array_equal(out, img)
    # channel names follow the Bin_%04d contract
    channels, _ = exr.read_exr(path)
    assert "Bin_0000" in channels and "Bin_0060" in channels


def test_histogram_count_packing(rng):
    histo = rng.random((7, 8, 60)).astype(np.float32)
    count = rng.random((7, 8, 1)).astype(np.float32)
    merged = image_io.merge_histogram_and_nb_of_samples(histo, count)
    assert merged.shape == (7, 8, 61)
    h2, c2 = image_io.separate_nb_of_samples_from_histogram(merged)
    np.testing.assert_array_equal(h2, histo)
    np.testing.assert_array_equal(c2, count)


def test_raw_roundtrip(tmp_path, rng):
    from bcd_tpu.io import raw

    path = str(tmp_path / "dump.raw")
    samples = rng.random((6, 5, 4, 3)).astype(np.float32)
    raw.write_raw(path, samples)
    header, out = raw.read_raw(path)
    assert (header.width, header.height) == (5, 6)
    assert header.nb_of_samples == 4 and header.nb_of_channels == 3
    np.testing.assert_array_equal(out, samples)
    blocks = list(raw.iter_raw_row_blocks(path, rows_per_block=4))
    assert [r for r, _ in blocks] == [0, 4]
    np.testing.assert_array_equal(np.concatenate([b for _, b in blocks]), samples)
