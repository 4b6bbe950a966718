"""Web front end for the manual click-to-segment session (the 22m UI).

The reference serves a Gradio app on 0.0.0.0:7890
(22_segment_image_manual.py:367-371). Gradio is not available in this
image, so this is a dependency-free stdlib ``http.server`` app over the
same ``ManualSegmentSession``: a single page shows the current image, a
click POSTs the point, the 3 candidate masks come back as overlays, and
picking one saves ``<stem>_rmbg.png``.

Unlike the reference's module-global mutable ``state`` dict (22m:50-59,
racy under concurrent browsers — SURVEY.md §5), all session mutations here
hold a lock.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from retrieval_based_object_detection_tpu.pipelines.segment import (
    ManualSegmentSession,
)

_PAGE = """<!DOCTYPE html>
<html><head><title>rbod manual segmentation</title><style>
body { font-family: sans-serif; margin: 1.5em; }
#main img { max-width: 640px; border: 1px solid #999; cursor: crosshair; }
.cand { max-width: 200px; border: 2px solid #ccc; cursor: pointer; }
.cand.best { border-color: #2a7; }
</style></head><body>
<h2>Manual segmentation</h2>
<div id="status"></div>
<div id="main"><img id="img" src="/img/current" onclick="click_img(event)"></div>
<div id="cands"></div>
<button onclick="next_img()">next image</button>
<a href="/api/download"><button>download results (zip)</button></a>
<script>
async function refresh() {
  const s = await (await fetch('/api/state')).json();
  document.getElementById('status').textContent =
    s.current ? `${s.pos + 1}/${s.total}: ${s.current}` : 'done';
  document.getElementById('img').src = '/img/current?' + Date.now();
  document.getElementById('cands').innerHTML = '';
}
async function click_img(ev) {
  const img = document.getElementById('img');
  const x = ev.offsetX * img.naturalWidth / img.clientWidth;
  const y = ev.offsetY * img.naturalHeight / img.clientHeight;
  const r = await (await fetch('/api/click', {method: 'POST',
    body: JSON.stringify({x: x, y: y})})).json();
  const div = document.getElementById('cands');
  div.innerHTML = '';
  r.scores.forEach((score, i) => {
    const c = document.createElement('img');
    c.src = `/img/candidate/${i}?` + Date.now();
    c.className = 'cand' + (i === r.best ? ' best' : '');
    c.title = `score ${score.toFixed(4)} — click to save`;
    c.onclick = async () => {
      await fetch('/api/save', {method: 'POST',
        body: JSON.stringify({mask: i})});
      await fetch('/api/next', {method: 'POST'});
      refresh();
    };
    div.appendChild(c);
  });
}
async function next_img() { await fetch('/api/next', {method: 'POST'}); refresh(); }
refresh();
</script></body></html>"""


class SegmentWebApp:
    """HTTP app over one ManualSegmentSession (lock-guarded)."""

    def __init__(self, session: ManualSegmentSession):
        self.session = session
        self.lock = threading.Lock()
        self._loaded_for: object = None
        self._candidates: np.ndarray | None = None
        self._scores: np.ndarray | None = None

    # ------------------------------------------------------------ ops
    def state(self) -> dict:
        with self.lock:
            return {
                "total": len(self.session.items),
                "pos": self.session.pos,
                "current": str(self.session.current)
                if self.session.current else None,
            }

    def current_image_png(self) -> bytes | None:
        from PIL import Image

        with self.lock:
            if self.session.current is None:
                return None
            if self._loaded_for != self.session.current:
                self.session.load()
                self._loaded_for = self.session.current
                self._candidates = None
            arr = self.session._loaded
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        return buf.getvalue()

    def click(self, x: float, y: float) -> dict:
        with self.lock:
            if self.session.current is None:
                return {"error": "no image"}
            if self._loaded_for != self.session.current:
                self.session.load()
                self._loaded_for = self.session.current
            masks, scores = self.session.click(x, y)
            self._candidates, self._scores = masks, scores
            return {"scores": [float(s) for s in scores],
                    "best": int(np.argmax(scores))}

    def candidate_png(self, i: int) -> bytes | None:
        from PIL import Image

        with self.lock:
            if self._candidates is None or not (
                    0 <= i < self._candidates.shape[0]):
                return None
            img = self.session._loaded.copy()
            mask = self._candidates[i]
        # Dim the background so the candidate region stands out.
        img[~mask] = (img[~mask] * 0.25).astype(img.dtype)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "PNG")
        return buf.getvalue()

    def save(self, mask_idx: int) -> dict:
        with self.lock:
            # Validate UNDER the lock: a concurrent /api/next can clear
            # the candidates between the handler's precheck and this
            # call (double-click, second tab) — the stale save must be
            # a clean client error, not an AssertionError escaping the
            # handler (same race class review_web's quarantine fixed).
            if self._candidates is None:
                return {"error": "click first"}
            if not 0 <= mask_idx < self._candidates.shape[0]:
                return {"error": f"mask index {mask_idx} out of range "
                                 f"[0, {self._candidates.shape[0]})"}
            out = self.session.save(mask_idx)
            return {"saved": str(out)}

    def next(self) -> dict:
        with self.lock:
            self.session.next()
            self._loaded_for = None
            self._candidates = None
            return {"pos": self.session.pos}

    def results_zip(self) -> bytes:
        """Zip of every saved ``*_rmbg.png`` in the session directory —
        the reference's bulk-download button (22m:291-306)."""
        import zipfile

        with self.lock:
            outputs = sorted(self.session.src_dir.glob("*_rmbg.png"))
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
                for p in outputs:
                    zf.write(p, arcname=p.name)
            return buf.getvalue()


def make_handler(app: SegmentWebApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj, code: int = 200) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif path == "/api/state":
                self._json(app.state())
            elif path == "/img/current":
                png = app.current_image_png()
                if png is None:
                    self._json({"error": "done"}, 404)
                else:
                    self._send(200, png, "image/png")
            elif path.startswith("/img/candidate/"):
                try:
                    i = int(path.rsplit("/", 1)[1])
                except ValueError:
                    self._json({"error": "bad index"}, 400)
                    return
                png = app.candidate_png(i)
                if png is None:
                    self._json({"error": "no candidate"}, 404)
                else:
                    self._send(200, png, "image/png")
            elif path == "/api/download":
                data = app.results_zip()
                self.send_response(200)
                self.send_header("Content-Type", "application/zip")
                self.send_header("Content-Disposition",
                                 "attachment; filename=segmented_masks.zip")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length") or 0)
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._json({"error": "bad json"}, 400)
                return
            if self.path == "/api/click":
                if "x" not in body or "y" not in body:
                    self._json({"error": "x and y required"}, 400)
                    return
                try:
                    x, y = float(body["x"]), float(body["y"])
                except (TypeError, ValueError):
                    self._json({"error": "x and y must be numbers"}, 400)
                    return
                self._json(app.click(x, y))
            elif self.path == "/api/save":
                try:
                    mask_idx = int(body.get("mask", 0))
                except (TypeError, ValueError):
                    self._json({"error": "mask must be an integer"}, 400)
                    return
                # Candidate-state checks live in app.save, under the
                # app lock — an unlocked precheck here races /api/next.
                out = app.save(mask_idx)
                self._json(out, 400 if "error" in out else 200)
            elif self.path == "/api/next":
                self._json(app.next())
            else:
                self._json({"error": "not found"}, 404)

    return Handler


def serve(session: ManualSegmentSession, host: str = "0.0.0.0",
          port: int = 7890) -> ThreadingHTTPServer:
    """Start the UI server (port 7890 mirrors 22m:367-371). Returns the
    server; call ``serve_forever()`` or run it from a thread."""
    app = SegmentWebApp(session)
    server = ThreadingHTTPServer((host, port), make_handler(app))
    server.app = app  # for tests/tools
    return server
