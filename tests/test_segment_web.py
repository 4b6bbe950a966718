"""Manual-segmentation web UI: drive the HTTP API end to end."""

import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.models.sam import model as SM
from retrieval_based_object_detection_tpu.pipelines.segment import (
    ManualSegmentSession,
)
from retrieval_based_object_detection_tpu.pipelines import segment_web


@pytest.fixture
def server(tmp_path, rng):
    d = tmp_path / "cls"
    d.mkdir()
    for i in range(2):
        arr = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"m{i}.jpg")
    sam = SM.SamPredictor(SM.init_params(SM.SAM_TINY, 0), SM.SAM_TINY)
    session = ManualSegmentSession(sam, d)
    srv = segment_web.serve(session, host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", d
    srv.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_full_click_save_flow(server):
    base, d = server
    status, body, ctype = _get(base + "/")
    assert status == 200 and b"Manual segmentation" in body

    status, state = 200, json.loads(_get(base + "/api/state")[1])
    assert state["total"] == 2 and state["pos"] == 0

    status, png, ctype = _get(base + "/img/current")
    assert status == 200 and ctype == "image/png"

    status, res = _post(base + "/api/click", {"x": 25, "y": 20})
    assert status == 200 and len(res["scores"]) == 3
    best = res["best"]

    status, png, _ = _get(base + f"/img/candidate/{best}")
    assert status == 200

    status, res = _post(base + "/api/save", {"mask": best})
    assert status == 200
    assert (d / "m0_rmbg.png").exists()

    _post(base + "/api/next", {})
    state = json.loads(_get(base + "/api/state")[1])
    assert state["pos"] == 1


def test_error_paths(server):
    base, _ = server
    status, res = _post(base + "/api/click", {"x": 5})  # missing y
    assert status == 400
    status, res = _post(base + "/api/save", {"mask": 0})  # no click yet
    assert status == 400
    status, _, _ = _get(base + "/img/candidate/notanint")
    assert status == 400
    status, _, _ = _get(base + "/nope")
    assert status == 404


def test_concurrent_clicks_are_serialized(server):
    """Two browsers clicking at once must not corrupt session state
    (the reference's module-global state dict was racy, 22m:50-59)."""
    import concurrent.futures

    base, d = server
    _get(base + "/img/current")  # ensure loaded

    def click(i):
        return _post(base + "/api/click", {"x": 10 + i, "y": 10 + i})

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        results = list(ex.map(click, range(4)))
    assert all(status == 200 and len(res["scores"]) == 3
               for status, res in results)
    # Session still coherent: save works.
    status, res = _post(base + "/api/save", {"mask": 0})
    assert status == 200


def test_download_zip(server):
    """/api/download returns a zip of the saved *_rmbg.png outputs
    (22m:291-306 bulk download)."""
    import io
    import zipfile

    base, d = server
    # Save one mask first.
    _get(base + "/img/current")
    _post(base + "/api/click", {"x": 25, "y": 20})
    _post(base + "/api/save", {"mask": 0})
    status, body, ctype = _get(base + "/api/download")
    assert status == 200 and ctype == "application/zip"
    with zipfile.ZipFile(io.BytesIO(body)) as zf:
        names = zf.namelist()
    assert names == ["m0_rmbg.png"]


def test_save_after_next_is_clean_400(server):
    """A save that lands after /api/next cleared the candidates (double
    click, second tab) must be a clean 400, not an AssertionError
    escaping the handler — the check must happen under the app lock."""
    base, _ = server
    _get(base + "/img/current")
    status, _ = _post(base + "/api/click", {"x": 10, "y": 10})
    assert status == 200
    status, _ = _post(base + "/api/next", {})
    assert status == 200
    status, res = _post(base + "/api/save", {"mask": 0})
    assert status == 400 and "click first" in res["error"]
    # Out-of-range index is also validated app-side now.
    _post(base + "/api/click", {"x": 10, "y": 10})
    status, res = _post(base + "/api/save", {"mask": 99})
    assert status == 400 and "out of range" in res["error"]
