"""GUI server smoke tests over real HTTP (the reference's interactive
parameter-design app, rebuilt as a web UI)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from bcd_tpu.gui.display import cov_trace, cubehelix, tonemap_color
from bcd_tpu.gui.png import encode_png


def test_png_encoder_valid(rng):
    img = (rng.random((9, 13, 3)) * 255).astype(np.uint8)
    data = encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    import struct
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (13, 9)


def test_display_mappings(rng):
    hdr = rng.random((6, 7, 3)).astype(np.float32) * 4
    out = tonemap_color(hdr, exposure=-1, gamma=2.2)
    assert out.dtype == np.uint8 and out.shape == (6, 7, 3)
    cov = rng.random((6, 7, 6)).astype(np.float32)
    tr = cov_trace(cov)
    np.testing.assert_allclose(
        tr, np.sqrt(cov[..., 0] + cov[..., 1] + cov[..., 2]), rtol=1e-6)
    cm = cubehelix(tr / tr.max())
    assert cm.shape == (6, 7, 3) and cm.dtype == np.uint8


@pytest.fixture
def gui_server(tmp_path, rng):
    from http.server import ThreadingHTTPServer
    import bcd_tpu.gui.server as srv

    # fresh state per test
    srv.STATE = srv.AppState()
    server = ThreadingHTTPServer(("127.0.0.1", 0), srv.Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.read()


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_gui_endpoints(gui_server, tmp_path, rng):
    from bcd_tpu.io import image_io

    # stage a tiny input trio
    color = rng.random((10, 12, 3)).astype(np.float32)
    histo = rng.random((10, 12, 60)).astype(np.float32) * 4
    nb = np.full((10, 12, 1), 8.0, np.float32)
    cov = np.zeros((10, 12, 6), np.float32)
    cov[..., :3] = 0.05
    image_io.write_exr(color, str(tmp_path / "c.exr"))
    image_io.write_multi_channels_exr(
        image_io.merge_histogram_and_nb_of_samples(histo, nb),
        str(tmp_path / "h.exr"))
    image_io.write_multi_channels_exr(cov, str(tmp_path / "v.exr"))

    page = _get(gui_server + "/").decode()
    assert "bcd_tpu parameter designer" in page

    state = json.loads(_get(gui_server + "/state"))
    assert state["loaded"] is False

    state = _post(gui_server + "/load", {
        "inputColorFile": str(tmp_path / "c.exr"),
        "inputHistoFile": str(tmp_path / "h.exr"),
        "inputCovarFile": str(tmp_path / "v.exr"),
    })
    assert state["loaded"] is True and state["error"] is None

    png = _get(gui_server + "/image?view=input&exposure=0&gamma=2.2")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    png2 = _get(gui_server + "/image?view=input_covtrace&exposure=0&gamma=1")
    assert png2[:8] == b"\x89PNG\r\n\x1a\n"

    # preset save writes the reference schema
    state = _post(gui_server + "/preset", {
        "mode": "save", "path": str(tmp_path / "p.bcd.json"), "params": {}})
    with open(tmp_path / "p.bcd.json") as f:
        assert "histoDistanceThreshold" in json.load(f)

    # error surface: bad preset path -> error in state, server alive
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        _post(gui_server + "/preset", {"mode": "load", "path": "/nope.json"})
    state = json.loads(_get(gui_server + "/state"))
    assert "FileNotFoundError" in (state["error"] or "")


def test_gui_concurrent_denoise_single_run(gui_server, tmp_path, rng):
    """Racing /denoise POSTs: exactly one denoise may start; losers get the
    'denoise already running' note and the running job is unaffected by
    concurrent parameter updates (it runs on a snapshot)."""
    from concurrent.futures import ThreadPoolExecutor

    from bcd_tpu.io import image_io

    color = rng.random((16, 16, 3)).astype(np.float32)
    histo = rng.random((16, 16, 60)).astype(np.float32) * 4
    nb = np.full((16, 16, 1), 8.0, np.float32)
    cov = np.zeros((16, 16, 6), np.float32)
    cov[..., :3] = 0.05
    image_io.write_exr(color, str(tmp_path / "c.exr"))
    image_io.write_multi_channels_exr(
        image_io.merge_histogram_and_nb_of_samples(histo, nb),
        str(tmp_path / "h.exr"))
    image_io.write_multi_channels_exr(cov, str(tmp_path / "v.exr"))
    _post(gui_server + "/load", {
        "inputColorFile": str(tmp_path / "c.exr"),
        "inputHistoFile": str(tmp_path / "h.exr"),
        "inputCovarFile": str(tmp_path / "v.exr"),
    })

    body = {"nbOfScales": 1, "searchWindowRadius": 2}
    with ThreadPoolExecutor(8) as ex:
        states = list(ex.map(
            lambda _: _post(gui_server + "/denoise", body), range(8)))
    rejected = [s for s in states if s.get("error") == "denoise already running"]
    assert len(rejected) >= 1  # racers were turned away, not double-started

    # params posted mid-run must not corrupt the running job
    _post(gui_server + "/denoise", {"searchWindowRadius": 3})

    import time as _t
    for _ in range(600):
        state = json.loads(_get(gui_server + "/state"))
        if not state["busy"]:
            break
        _t.sleep(0.1)
    assert state["busy"] is False
    assert state["hasOutput"] is True
    png = _get(gui_server + "/image?view=output&exposure=0&gamma=2.2")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
