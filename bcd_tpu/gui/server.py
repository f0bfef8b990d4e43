"""Interactive parameter-design web app (the reference's bcd-gui,
src/gui/GuiWindow.cpp, rebuilt as a browser UI over the TPU engine).

Feature parity with the NanoGUI app: load the color/histogram/covariance
EXR trio, five views (input color, input cov-trace, prefiltered color,
prefiltered cov-trace, denoised output), exposure/gamma tonemapping with a
cubehelix colormap for scalar views, the full parameter panel, spike-removal
prefilter, denoise with wall-time display, output EXR save, and .bcd.json
preset load/save. Unlike the reference (which denoises synchronously on the
UI thread, GuiWindow.cpp:340-379), denoising runs in a worker thread with a
progress endpoint.

Run:  python -m bcd_tpu.gui.server [--port 8000] [-a preset.bcd.json]
"""

from __future__ import annotations

import argparse
import copy
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from bcd_tpu import params as P
from bcd_tpu.core.pipeline import denoise_pipeline
from bcd_tpu.gui.display import cov_trace, cubehelix, tonemap_color
from bcd_tpu.gui.png import encode_png
from bcd_tpu.io import image_io
from bcd_tpu.ops.spike_removal import spike_removal


class AppState:
    def __init__(self):
        self.lock = threading.Lock()
        self.pipeline = P.PipelineParameters()
        self.inputs = None  # dict: color, nb, histo, cov
        self.prefiltered = None
        self.output = None
        self.progress = 0.0
        self.denoise_seconds = None
        self.busy = False
        self.error = None

    def load_inputs(self):
        fn = self.pipeline.input_file_names
        color = image_io.load_exr(fn.colors)
        if color.shape[-1] == 1:
            color = np.repeat(color, 3, axis=-1)
        hist_and_count = image_io.load_multi_channels_exr(fn.histograms)
        histo, nb = image_io.separate_nb_of_samples_from_histogram(hist_and_count)
        cov = image_io.load_multi_channels_exr(fn.covariances)
        self.inputs = {"color": color, "nb": nb, "histo": histo, "cov": cov}
        self.prefiltered = None
        self.output = None

    def run_prefilter(self):
        i = self.inputs
        c, n, h, cv = spike_removal(
            i["color"], i["nb"], i["histo"], i["cov"],
            np.float32(
                self.pipeline.prefiltering.spike_removal_threshold_stdev_factor
            ),
        )
        self.prefiltered = {
            "color": np.asarray(c), "nb": np.asarray(n),
            "histo": np.asarray(h), "cov": np.asarray(cv),
        }

    def start_denoise(self) -> bool:
        """Atomic busy test-and-set + parameter/input snapshot; returns
        False when a denoise is already running (the caller reports it).
        Must be called with the lock held."""
        if self.busy or self.inputs is None:
            return False
        self.busy = True
        self.error = None
        self.progress = 0.0
        # the worker runs on a SNAPSHOT so concurrent /denoise or /state
        # POSTs can't interleave update_params with a running denoise
        pipeline = copy.deepcopy(self.pipeline)
        inputs = self.inputs
        threading.Thread(
            target=self._run_denoise, args=(pipeline, inputs), daemon=True
        ).start()
        return True

    def _run_denoise(self, pipeline, inputs):
        try:
            t0 = time.perf_counter()

            def cb(p):
                with self.lock:
                    self.progress = float(p)

            output = denoise_pipeline(
                inputs["color"], inputs["nb"], inputs["histo"],
                inputs["cov"], pipeline, progress_callback=cb,
            )
            with self.lock:
                self.output = output
                self.denoise_seconds = time.perf_counter() - t0
                self.progress = 1.0
        except Exception as e:  # surface errors to the UI
            with self.lock:
                self.error = f"{type(e).__name__}: {e}"
        finally:
            # under the lock: clearing busy after the progress=1.0 publish
            # but outside it left a window where a /denoise was spuriously
            # rejected and its persisted error masked state
            with self.lock:
                self.busy = False

    def view_image(self, view: str, exposure: float, gamma: float):
        if view == "output" and self.output is not None:
            return tonemap_color(self.output, exposure, gamma)
        if self.inputs is None:
            return np.zeros((8, 8, 3), np.uint8)
        src = self.prefiltered if view.startswith("prefiltered") and \
            self.prefiltered is not None else self.inputs
        if view.endswith("covtrace"):
            return cubehelix(cov_trace(src["cov"]), exposure, 1.0)
        return tonemap_color(src["color"], exposure, gamma)

    def params_dict(self):
        m = self.pipeline.denoiser.monoscale
        pre = self.pipeline.prefiltering
        fn = self.pipeline.input_file_names
        return {
            "inputColorFile": fn.colors,
            "inputHistoFile": fn.histograms,
            "inputCovarFile": fn.covariances,
            "performSpikeRemovalPrefiltering": pre.perform_spike_removal,
            "spikeRemovalThresholdStDevFactor":
                pre.spike_removal_threshold_stdev_factor,
            "nbOfScales": self.pipeline.denoiser.nb_of_scales,
            "histoDistanceThreshold": m.histogram_distance_threshold,
            "patchRadius": m.patch_radius,
            "searchWindowRadius": m.search_window_radius,
            "minEigenValue": m.min_eigen_value,
            "busy": self.busy,
            "progress": self.progress,
            "denoiseSeconds": self.denoise_seconds,
            "error": self.error,
            "loaded": self.inputs is not None,
            "hasOutput": self.output is not None,
        }

    def update_params(self, obj: dict):
        m = self.pipeline.denoiser.monoscale
        pre = self.pipeline.prefiltering
        fn = self.pipeline.input_file_names
        fn.colors = obj.get("inputColorFile", fn.colors)
        fn.histograms = obj.get("inputHistoFile", fn.histograms)
        fn.covariances = obj.get("inputCovarFile", fn.covariances)
        pre.perform_spike_removal = bool(
            obj.get("performSpikeRemovalPrefiltering",
                    pre.perform_spike_removal))
        pre.spike_removal_threshold_stdev_factor = float(
            obj.get("spikeRemovalThresholdStDevFactor",
                    pre.spike_removal_threshold_stdev_factor))
        self.pipeline.denoiser.nb_of_scales = int(
            obj.get("nbOfScales", self.pipeline.denoiser.nb_of_scales))
        m.histogram_distance_threshold = float(
            obj.get("histoDistanceThreshold", m.histogram_distance_threshold))
        m.patch_radius = int(obj.get("patchRadius", m.patch_radius))
        m.search_window_radius = int(
            obj.get("searchWindowRadius", m.search_window_radius))
        m.min_eigen_value = float(obj.get("minEigenValue", m.min_eigen_value))


STATE = AppState()

PAGE = """<!doctype html>
<html><head><title>bcd_tpu designer</title><style>
body { font-family: sans-serif; margin: 0; display: flex; background: #222; color: #ddd; }
#panel { width: 330px; padding: 12px; background: #2b2b2b; min-height: 100vh; }
#panel label { display: block; margin-top: 8px; font-size: 13px; }
#panel input[type=text] { width: 100%; }
#panel input[type=number] { width: 90px; }
#viewer { flex: 1; padding: 12px; }
#viewport { overflow: hidden; height: 85vh; border: 1px solid #444;
            cursor: grab; background: #111; }
#img { image-rendering: pixelated; transform-origin: 0 0; user-select: none;
       -webkit-user-drag: none; }
button { margin-top: 10px; margin-right: 6px; }
#status { margin-top: 10px; font-size: 13px; color: #9c9; white-space: pre-wrap; }
h3 { margin: 6px 0; }
</style></head><body>
<div id="panel">
  <h3>bcd_tpu parameter designer</h3>
  <label>Color EXR <input type="text" id="inputColorFile"></label>
  <label>Histogram EXR <input type="text" id="inputHistoFile"></label>
  <label>Covariance EXR <input type="text" id="inputCovarFile"></label>
  <button onclick="loadInputs()">Load inputs</button>
  <h3>Prefilter</h3>
  <label><input type="checkbox" id="performSpikeRemovalPrefiltering"> spike removal</label>
  <label>threshold stdev factor <input type="number" step="0.1" id="spikeRemovalThresholdStDevFactor"></label>
  <button onclick="prefilter()">Prefilter</button>
  <h3>Denoiser</h3>
  <label>scales <input type="number" id="nbOfScales"></label>
  <label>distance threshold <input type="number" step="0.1" id="histoDistanceThreshold"></label>
  <label>patch radius <input type="number" id="patchRadius"></label>
  <label>search radius <input type="number" id="searchWindowRadius"></label>
  <label>min eigenvalue <input type="number" step="1e-8" id="minEigenValue"></label>
  <button onclick="denoise()">Denoise</button>
  <h3>Preset</h3>
  <label>.bcd.json path <input type="text" id="presetPath"></label>
  <button onclick="preset('load')">Load</button>
  <button onclick="preset('save')">Save</button>
  <h3>Output</h3>
  <label>save EXR to <input type="text" id="savePath"></label>
  <button onclick="saveOutput()">Save output</button>
  <div id="status"></div>
</div>
<div id="viewer">
  <select id="view" onchange="refresh()">
    <option value="input">input color</option>
    <option value="input_covtrace">input cov trace</option>
    <option value="prefiltered">prefiltered color</option>
    <option value="prefiltered_covtrace">prefiltered cov trace</option>
    <option value="output">output</option>
  </select>
  exposure <input type="range" id="exposure" min="-8" max="8" step="0.25" value="0" onchange="refresh()">
  gamma <input type="range" id="gamma" min="1" max="4" step="0.1" value="2.2" onchange="refresh()">
  <span style="font-size:12px;color:#888">(wheel = zoom, drag = pan, double-click = reset)</span>
  <div id="viewport"><img id="img"></div>
</div>
<script>
const FIELDS = ["inputColorFile","inputHistoFile","inputCovarFile",
 "performSpikeRemovalPrefiltering","spikeRemovalThresholdStDevFactor",
 "nbOfScales","histoDistanceThreshold","patchRadius","searchWindowRadius",
 "minEigenValue"];
function collect() {
  const o = {};
  for (const f of FIELDS) {
    const el = document.getElementById(f);
    o[f] = el.type === "checkbox" ? el.checked : el.value;
  }
  return o;
}
function fill(o) {
  for (const f of FIELDS) {
    const el = document.getElementById(f);
    if (el.type === "checkbox") el.checked = o[f]; else el.value = o[f];
  }
  let s = o.busy ? ("denoising... " + Math.round(o.progress*100) + " %") : "idle";
  if (o.denoiseSeconds) s += "\\nlast denoise: " + o.denoiseSeconds.toFixed(2) + " s";
  if (o.error) s += "\\nERROR: " + o.error;
  document.getElementById("status").textContent = s;
  return o;
}
async function api(path, body) {
  const r = await fetch(path, body ? {method:"POST", body: JSON.stringify(body)} : {});
  return r.json();
}
async function sync() { fill(await api("/state")); }
async function loadInputs() { fill(await api("/load", collect())); refresh(); }
async function prefilter() { fill(await api("/prefilter", collect())); document.getElementById("view").value="prefiltered"; refresh(); }
async function denoise() {
  fill(await api("/denoise", collect()));
  const poll = setInterval(async () => {
    const o = fill(await api("/state"));
    if (!o.busy) { clearInterval(poll); document.getElementById("view").value="output"; refresh(); }
  }, 500);
}
async function preset(mode) {
  fill(await api("/preset", {mode: mode, path: document.getElementById("presetPath").value, params: collect()}));
}
async function saveOutput() { fill(await api("/save", {path: document.getElementById("savePath").value})); }
function refresh() {
  const v = document.getElementById("view").value;
  const e = document.getElementById("exposure").value;
  const g = document.getElementById("gamma").value;
  document.getElementById("img").src = `/image?view=${v}&exposure=${e}&gamma=${g}&t=${Date.now()}`;
}
// pan/zoom ViewFrame (reference GuiWindow.h:51-81)
let vf = {s: 1, tx: 0, ty: 0};
const img = document.getElementById("img");
const vp = document.getElementById("viewport");
function applyVF() {
  img.style.transform = `translate(${vf.tx}px, ${vf.ty}px) scale(${vf.s})`;
}
vp.addEventListener("wheel", (ev) => {
  ev.preventDefault();
  const rect = vp.getBoundingClientRect();
  const mx = ev.clientX - rect.left, my = ev.clientY - rect.top;
  const k = ev.deltaY < 0 ? 1.25 : 0.8;
  vf.tx = mx - k * (mx - vf.tx);
  vf.ty = my - k * (my - vf.ty);
  vf.s *= k;
  applyVF();
}, {passive: false});
let drag = null;
vp.addEventListener("mousedown", (ev) => {
  drag = {x: ev.clientX - vf.tx, y: ev.clientY - vf.ty};
  vp.style.cursor = "grabbing";
});
window.addEventListener("mousemove", (ev) => {
  if (!drag) return;
  vf.tx = ev.clientX - drag.x; vf.ty = ev.clientY - drag.y; applyVF();
});
window.addEventListener("mouseup", () => { drag = null; vp.style.cursor = "grab"; });
vp.addEventListener("dblclick", () => { vf = {s: 1, tx: 0, ty: 0}; applyVF(); });
sync(); refresh();
</script></body></html>
"""


class Handler(BaseHTTPRequestHandler):
    def _json(self, obj, code=200):
        payload = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _body(self):
        length = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(length) or b"{}")

    def log_message(self, *args):  # quiet
        pass

    def do_GET(self):
        url = urlparse(self.path)
        if url.path == "/":
            payload = PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
        elif url.path == "/state":
            with STATE.lock:
                resp = STATE.params_dict()
            self._json(resp)
        elif url.path == "/image":
            q = parse_qs(url.query)
            # under the lock: a render during denoise completion must not
            # see output/prefiltered mid-swap
            with STATE.lock:
                img = STATE.view_image(
                    q.get("view", ["input"])[0],
                    float(q.get("exposure", ["0"])[0]),
                    float(q.get("gamma", ["2.2"])[0]),
                )
            payload = encode_png(img)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
        else:
            self._json({"error": "not found"}, 404)

    def do_POST(self):
        try:
            body = self._body()
            # every state mutation happens under the lock; the denoise
            # worker itself runs outside it on a parameter snapshot
            with STATE.lock:
                if self.path == "/load":
                    STATE.update_params(body)
                    STATE.load_inputs()
                elif self.path == "/prefilter":
                    STATE.update_params(body)
                    STATE.run_prefilter()
                elif self.path == "/denoise":
                    STATE.update_params(body)
                    if not STATE.start_denoise() and STATE.inputs is not None:
                        STATE.error = "denoise already running"
                elif self.path == "/preset":
                    if body["mode"] == "save":
                        STATE.update_params(body.get("params", {}))
                        P.save_pipeline_json(STATE.pipeline, body["path"])
                    else:
                        P.load_pipeline_json(body["path"], STATE.pipeline)
                elif self.path == "/save":
                    if STATE.output is not None:
                        image_io.write_exr(STATE.output, body["path"])
                else:
                    return self._json({"error": "not found"}, 404)
                resp = STATE.params_dict()
            self._json(resp)
        except Exception as e:
            with STATE.lock:
                STATE.error = f"{type(e).__name__}: {e}"
                resp = STATE.params_dict()
            self._json(resp, 500)


def main() -> int:
    from bcd_tpu.cache import configure_compile_cache

    configure_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("-a", "--preset", help=".bcd.json preset to load at start")
    args = ap.parse_args()
    if args.preset:
        P.load_pipeline_json(args.preset, STATE.pipeline)
        try:
            STATE.load_inputs()
        except Exception as e:
            STATE.error = f"{type(e).__name__}: {e}"
    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"bcd_tpu designer listening on http://{args.host}:{args.port}")
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
