"""Label-review web UI: drive the HTTP workflow end to end."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.models.detector import (
    SaliencyProposer,
)
from retrieval_based_object_detection_tpu.pipelines import review_web
from retrieval_based_object_detection_tpu.pipelines.review import (
    ReviewConfig,
    ReviewSession,
)


@pytest.fixture
def server(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    root = tmp_path / "dataset_jpeg"
    d = root / "original_images" / "cls"
    d.mkdir(parents=True)
    for i in range(2):
        img = np.full((100, 140, 3), 232, np.uint8)
        img[25:75, 35:105] = (200, 40, 40)
        img = np.clip(img + rng.integers(0, 8, img.shape), 0, 255
                      ).astype(np.uint8)
        Image.fromarray(img).save(d / f"r{i}.jpg")
        (d / f"r{i}.txt").write_text(
            "0 0.5 0.5 0.5 0.5\n0 0.2 0.2 0.2 0.2\n")
    session = ReviewSession(
        ReviewConfig(root_dir=str(root), img_type="original",
                     manual_dir=str(tmp_path / "dataset_manual")),
        detector=SaliencyProposer())
    srv = review_web.serve(session, host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", d
    srv.shutdown()


def get(url):
    try:
        with urllib.request.urlopen(url, timeout=30) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), None


def post(url, body=None):
    req = urllib.request.Request(
        url, data=json.dumps(body or {}).encode(), method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_review_workflow(server):
    base, d = server
    assert b"Label review" in get(base + "/")[1]
    state = json.loads(get(base + "/api/state")[1])
    assert state["total"] == 2 and state["n_boxes"] == 2

    # Rendered image with boxes.
    status, png, ctype = get(base + "/img")
    assert status == 200 and ctype == "image/png"

    # Keep box 1 → label rewritten to one line, auto-advance.
    status, res = post(base + "/api/select", {"box": 1})
    assert res["ok"]
    assert len((d / "r0.txt").read_text().strip().splitlines()) == 1
    state = json.loads(get(base + "/api/state")[1])
    assert state["pos"] == 1

    # Re-detect proposals, replace the label with the first.
    status, res = post(base + "/api/redetect")
    assert res["candidates"], res
    status, res = post(base + "/api/replace", {"box": res["candidates"][0]})
    assert res["ok"]
    vals = [float(v) for v in (d / "r1.txt").read_text().split()[1:]]
    assert abs(vals[0] - 0.5) < 0.1  # recentred on the product

    # Quarantine the current image → review complete (it was the last).
    status, res = post(base + "/api/manual")
    assert "dataset_manual" in res["moved"]
    state = json.loads(get(base + "/api/state")[1])
    assert state["done"]

    # Probes on the completed session.
    assert post(base + "/api/select", {"box": 0})[0] == 409
    assert get(base + "/img")[0] == 404


def test_review_web_probes(server):
    base, _ = server
    assert post(base + "/api/select", {})[0] == 400      # missing box
    assert post(base + "/api/replace", {"box": [1, 2]})[0] == 400
    assert post(base + "/api/bogus")[0] == 404
