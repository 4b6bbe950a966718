"""Web front end for the label-review session (the 12_* UI, browser-based).

The reference's reviewer is a cv2 keyboard window (12_labeling_check.py:
249-320) — unusable on headless hosts. This stdlib-http app serves the
same workflow: the current image renders with numbered boxes, buttons
mirror the keyboard protocol (digit=keep that box, r=re-detect,
m=quarantine, n/b=navigate), and progress resumes via the session's
resume file. All mutations hold a lock.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from retrieval_based_object_detection_tpu.pipelines.review import ReviewSession

_PAGE = """<!DOCTYPE html>
<html><head><title>rbod label review</title><style>
body { font-family: sans-serif; margin: 1.5em; }
img { max-width: 720px; border: 1px solid #999; }
button { margin: 0.2em; padding: 0.4em 0.9em; }
.cand { background: #eef; }
</style></head><body>
<h2>Label review</h2>
<div id="status"></div>
<div><img id="img" src="/img"></div>
<div id="boxbtns"></div>
<div>
  <button onclick="act('redetect')">re-detect (r)</button>
  <button onclick="act('manual')">quarantine (m)</button>
  <button onclick="act('prev')">back (b)</button>
  <button onclick="act('next')">next (n)</button>
</div>
<div id="cands"></div>
<script>
async function refresh() {
  const s = await (await fetch('/api/state')).json();
  document.getElementById('status').textContent = s.done
    ? 'review complete'
    : `${s.pos + 1}/${s.total}: ${s.current} — ${s.n_boxes} box(es)`;
  document.getElementById('img').src = '/img?' + Date.now();
  const bb = document.getElementById('boxbtns');
  bb.innerHTML = '';
  for (let i = 0; i < s.n_boxes; i++) {
    const b = document.createElement('button');
    b.textContent = `keep box ${i}`;
    b.onclick = () => act('select', {box: i});
    bb.appendChild(b);
  }
  document.getElementById('cands').innerHTML = '';
}
async function act(name, body) {
  const r = await (await fetch('/api/' + name, {method: 'POST',
    body: JSON.stringify(body || {})})).json();
  if (name === 'redetect' && r.candidates) {
    const div = document.getElementById('cands');
    div.innerHTML = 'proposals: ';
    r.candidates.forEach((box, i) => {
      const b = document.createElement('button');
      b.className = 'cand';
      b.textContent = `use proposal ${i}: [${box.map(Math.round)}]`;
      b.onclick = () => act('replace', {box: box});
      div.appendChild(b);
    });
    return;
  }
  refresh();
}
refresh();
</script></body></html>"""


class ReviewWebApp:
    def __init__(self, session: ReviewSession):
        self.session = session
        self.lock = threading.Lock()

    def state(self) -> dict:
        with self.lock:
            return {
                "total": len(self.session.items),
                "pos": self.session.pos,
                "current": str(self.session.current)
                if self.session.current else None,
                "n_boxes": len(self.session.boxes())
                if self.session.current else 0,
                "done": self.session.done,
            }

    def image_png(self) -> bytes | None:
        from PIL import Image

        with self.lock:
            if self.session.current is None:
                return None
            arr = self.session.render()
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        return buf.getvalue()

    def select(self, box: int) -> dict:
        with self.lock:
            ok = self.session.select_box(int(box))
            return {"ok": ok}

    def redetect(self) -> dict:
        with self.lock:
            return {"candidates": [list(map(float, b))
                                   for b in self.session.redetect()]}

    def replace(self, box) -> dict:
        with self.lock:
            # Re-check under the lock: another tab's /api/manual may have
            # consumed the last item after the handler's pre-check.
            if self.session.current is None:
                return {"ok": False, "error": "review complete"}
            self.session.replace_label(tuple(box))
            return {"ok": True}

    def manual(self) -> dict:
        with self.lock:
            dst = self.session.move_to_manual()
            return {"moved": str(dst) if dst else None}

    def nav(self, direction: str) -> dict:
        with self.lock:
            getattr(self.session, direction)()
            return {"pos": self.session.pos}


def make_handler(app: ReviewWebApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj, code=200):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif path == "/api/state":
                self._json(app.state())
            elif path == "/img":
                png = app.image_png()
                if png is None:
                    self._json({"error": "done"}, 404)
                else:
                    self._send(200, png, "image/png")
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length") or 0)
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._json({"error": "bad json"}, 400)
                return
            # The completeness pre-check must hold the app lock — an
            # unguarded read races a concurrent /api/manual that removes
            # the last item (the app methods re-check under their lock,
            # but the friendly 409 should too).
            with app.lock:
                complete = app.session.current is None
            if complete and self.path != "/api/state":
                self._json({"error": "review complete"}, 409)
                return
            if self.path == "/api/select":
                try:
                    box_idx = int(body["box"])
                except (KeyError, TypeError, ValueError):
                    self._json({"error": "integer box index required"}, 400)
                    return
                self._json(app.select(box_idx))
            elif self.path == "/api/redetect":
                self._json(app.redetect())
            elif self.path == "/api/replace":
                box = body.get("box")
                if (not isinstance(box, (list, tuple)) or len(box) != 4
                        or not all(isinstance(v, (int, float))
                                   for v in box)):
                    self._json({"error": "box [x1,y1,x2,y2] required"}, 400)
                    return
                self._json(app.replace(box))
            elif self.path == "/api/manual":
                self._json(app.manual())
            elif self.path in ("/api/next", "/api/prev"):
                self._json(app.nav(self.path.rsplit("/", 1)[1]))
            else:
                self._json({"error": "not found"}, 404)

    return Handler


def serve(session: ReviewSession, host: str = "0.0.0.0", port: int = 7891
          ) -> ThreadingHTTPServer:
    app = ReviewWebApp(session)
    server = ThreadingHTTPServer((host, port), make_handler(app))
    server.app = app
    return server
