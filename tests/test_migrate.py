"""Qdrant migration: pull collections from a (fake) Qdrant REST server.

The fake implements exactly the three endpoints the migrator uses —
GET /collections, GET /collections/{name},
POST /collections/{name}/points/scroll with offset pagination — with the
response envelopes Qdrant emits ({"status": "ok", "result": ...}), so a
real server is a drop-in.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.cli.main import main
from retrieval_based_object_detection_tpu.gallery.persist import load_store
from retrieval_based_object_detection_tpu.gallery.store import VectorStore
from retrieval_based_object_detection_tpu.pipelines import migrate as mg


def _collection(points, dim, named=False):
    return {"points": points, "dim": dim, "named": named}


@pytest.fixture
def qdrant(rng):
    """Fake Qdrant with two collections; yields (base_url, data)."""
    vecs_a = rng.normal(size=(7, 8)).astype(np.float32)
    pts_a = [
        {
            # Qdrant ids may be ints or UUID strings; mix both.
            "id": i if i % 2 == 0 else f"uuid-{i}",
            "vector": vecs_a[i].tolist(),
            "payload": {
                "data_type": "original_images",
                "is_cropped": True,
                "is_segmented": False,
                "is_augmented": False,
                "class_name": "cola" if i < 4 else "fanta",
                "is_delegate": False,
                "delegate_type": None,
                "img_path": f"/data/p{i}.png",
                # non-schema fields must be dropped (and counted)
                "user_note": "hello",
            },
        }
        for i in range(7)
    ]
    vecs_b = rng.normal(size=(3, 4)).astype(np.float32)
    pts_b = [
        {
            "id": 100 + i,
            # named-vector layout: {"default": [...]}
            "vector": {"default": vecs_b[i].tolist()},
            "payload": {"class_name": "sprite", "is_delegate": bool(i == 0),
                        "delegate_type": "average" if i == 0 else None},
        }
        for i in range(3)
    ]
    data = {"prod": _collection(pts_a, 8),
            "named": _collection(pts_b, 4, named=True)}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, result, code=200):
            body = json.dumps({"status": "ok", "result": result}).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parts = self.path.strip("/").split("/")
            if parts == ["collections"]:
                self._send({"collections": [{"name": n} for n in data]})
            elif len(parts) == 2 and parts[0] == "collections":
                col = data.get(parts[1])
                if col is None:
                    return self._send({}, 404)
                if col["named"]:
                    vectors = {"default": {"size": col["dim"],
                                           "distance": "Cosine"}}
                else:
                    vectors = {"size": col["dim"], "distance": "Cosine"}
                self._send({"config": {"params": {"vectors": vectors}}})
            else:
                self._send({}, 404)

        def do_POST(self):
            parts = self.path.strip("/").split("/")
            if (len(parts) == 4 and parts[0] == "collections"
                    and parts[2:] == ["points", "scroll"]):
                col = data.get(parts[1])
                if col is None:
                    return self._send({}, 404)
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"])))
                assert body.get("with_payload") and body.get("with_vector")
                limit = body["limit"]
                start = body.get("offset") or 0
                pts = col["points"][start:start + limit]
                nxt = start + limit
                self._send({
                    "points": pts,
                    "next_page_offset":
                        nxt if nxt < len(col["points"]) else None,
                })
            else:
                self._send({}, 404)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", data, vecs_a, vecs_b
    srv.shutdown()


def test_list_and_info(qdrant):
    base, data, *_ = qdrant
    assert mg.list_qdrant_collections(base) == ["prod", "named"]
    assert mg.qdrant_collection_info(base, "prod") == (8, "cosine")
    assert mg.qdrant_collection_info(base, "named") == (4, "cosine")


def test_import_all_with_pagination(qdrant):
    base, data, vecs_a, vecs_b = qdrant
    store = VectorStore()
    res = mg.import_qdrant(store, base, batch=3, quiet=True)  # 3 pages for prod
    assert res.collections == ["prod", "named"]
    assert res.n_points == 10
    assert res.dropped_fields == {"user_note"}
    assert res.n_dropped_fields == 7

    prod = store.get("prod")
    assert len(prod) == 7 and prod.dim == 8
    rec = prod.get_by_path("/data/p3.png")
    assert rec is not None
    assert rec.payload.class_name == "cola"
    np.testing.assert_allclose(rec.vector, vecs_a[3], rtol=1e-6)
    # int and string ids both stringify
    assert prod.retrieve(["0", "uuid-1"], with_vectors=False)

    named = store.get("named")
    assert len(named) == 3 and named.dim == 4
    recs = {r.id: r for r in named.scroll(limit=10)[0]}
    assert recs["100"].payload.is_delegate
    assert recs["100"].payload.delegate_type == "average"


def test_import_selected_collection_only(qdrant):
    base, *_ = qdrant
    store = VectorStore()
    res = mg.import_qdrant(store, base, collections=["named"], quiet=True)
    assert res.collections == ["named"] and res.n_points == 3
    assert "prod" not in store


def test_import_unreachable_server():
    store = VectorStore()
    with pytest.raises(mg.QdrantError, match="cannot reach"):
        mg.import_qdrant(store, "http://127.0.0.1:9", quiet=True)


def test_cli_import_qdrant(qdrant, tmp_path, monkeypatch, capsys):
    base, *_ = qdrant
    monkeypatch.chdir(tmp_path)
    assert main(["import-qdrant", "--url", base, "--batch", "4"]) == 0
    out = capsys.readouterr().out
    assert "imported_points=10" in out
    assert "user_note" in out
    store = load_store("gallery_store")
    assert len(store.get("prod")) == 7


def test_import_refuses_to_wipe_existing_collection(qdrant, rng):
    base, *_ = qdrant
    store = VectorStore()
    g = store.create_collection("prod", dim=8)
    g.upsert(["keep"], rng.normal(size=(1, 8)).astype(np.float32),
             [{"data_type": "original_images", "class_name": "mine"}])
    with pytest.raises(mg.QdrantError, match="already holds"):
        mg.import_qdrant(store, base, collections=["prod"], quiet=True)
    # local point survived the refusal
    assert store.get("prod").retrieve(["keep"], with_vectors=False)
    # force opts in to the recreate
    res = mg.import_qdrant(store, base, collections=["prod"], quiet=True,
                           force=True)
    assert res.n_points == 7
    assert not store.get("prod").retrieve(["keep"], with_vectors=False)


def test_import_empty_collection_list_is_an_error(qdrant):
    base, *_ = qdrant
    with pytest.raises(mg.QdrantError, match="empty collection list"):
        mg.import_qdrant(VectorStore(), base, collections=[], quiet=True)
