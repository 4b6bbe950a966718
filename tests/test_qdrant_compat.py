"""Qdrant wire-compatibility façade (gallery/qdrant_compat.py).

Two validation angles:
  1. CLOSED LOOP — our own Qdrant REST *client* (pipelines/migrate.py,
     written against real Qdrant's wire format) migrates collections
     out of the façade; both sides of the wire format must agree.
  2. Raw HTTP requests shaped exactly like the reference's
     qdrant-client call sites (recreate_collection, per-point upsert at
     31_clip…py:176-179, filtered scroll at 32:123-131 / 33:96-150,
     count at qm:41-50, search, delete).
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.gallery import server as server_mod
from retrieval_based_object_detection_tpu.gallery.schema import Payload
from retrieval_based_object_detection_tpu.gallery.store import VectorStore
from retrieval_based_object_detection_tpu.pipelines import migrate


@pytest.fixture
def qdrant_api(tmp_path):
    srv = server_mod.serve(tmp_path / "store", host="127.0.0.1", port=0,
                           api="qdrant")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", srv.service
    srv.shutdown()


def _req(method, url, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def test_reference_call_sites_over_the_wire(qdrant_api, rng):
    base, _ = qdrant_api
    # recreate_collection (qdrant_manager.py:82-85): delete + PUT.
    _req("DELETE", f"{base}/collections/demo")
    out = _req("PUT", f"{base}/collections/demo",
               {"vectors": {"size": 16, "distance": "Cosine"}})
    assert out["status"] == "ok" and out["result"] is True
    # Second create -> Qdrant-style already-exists error.
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req("PUT", f"{base}/collections/demo",
             {"vectors": {"size": 16, "distance": "Cosine"}})
    assert ei.value.code == 409

    # get_collections (31_clip…py:55-57).
    out = _req("GET", f"{base}/collections")
    assert {"name": "demo"} in out["result"]["collections"]
    info = _req("GET", f"{base}/collections/demo")["result"]
    assert info["config"]["params"]["vectors"] == {
        "size": 16, "distance": "Cosine"}

    # Per-point upsert exactly as 31_clip…py:166-179 issues it.
    vecs = rng.normal(size=(6, 16)).astype(np.float32)
    for i in range(6):
        payload = {
            "data_type": "original_images", "is_cropped": True,
            "is_segmented": False, "is_augmented": False,
            "class_name": "cola" if i < 4 else "fanta",
            "is_delegate": False, "delegate_type": None,
            "img_path": f"/d/{i}.png",
        }
        out = _req("PUT", f"{base}/collections/demo/points?wait=true",
                   {"points": [{"id": f"{i:032x}",
                                "vector": vecs[i].tolist(),
                                "payload": payload}]})
        assert out["result"]["status"] == "completed"
    assert _req("GET", f"{base}/collections/demo")["result"][
        "points_count"] == 6

    # Filtered scroll with vectors (32_create_delegate_vector.py:123-131).
    out = _req("POST", f"{base}/collections/demo/points/scroll", {
        "limit": 100, "with_payload": True, "with_vector": True,
        "filter": {"must": [
            {"key": "class_name", "match": {"value": "cola"}},
            {"key": "is_delegate", "match": {"value": False}},
        ]}})["result"]
    assert len(out["points"]) == 4 and out["next_page_offset"] is None
    got = np.asarray([p["vector"] for p in out["points"]], np.float32)
    np.testing.assert_allclose(np.sort(got, 0), np.sort(vecs[:4], 0),
                               atol=1e-6)
    assert all(p["payload"]["class_name"] == "cola"
               for p in out["points"])

    # count (qdrant_manager.py:41-50).
    out = _req("POST", f"{base}/collections/demo/points/count",
               {"exact": True})["result"]
    assert out["count"] == 6

    # retrieve by ids (POST points).
    out = _req("POST", f"{base}/collections/demo/points",
               {"ids": [f"{2:032x}"], "with_payload": True,
                "with_vector": True})["result"]
    assert len(out) == 1 and out[0]["payload"]["img_path"] == "/d/2.png"

    # search (the N-way generalisation clients would use).
    out = _req("POST", f"{base}/collections/demo/points/search", {
        "vector": vecs[1].tolist(), "limit": 2, "with_payload": True,
    })["result"]
    assert out[0]["id"] == f"{1:032x}" and out[0]["score"] > 0.999

    # unsupported filter clause -> clear 400, not silent misfiltering.
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req("POST", f"{base}/collections/demo/points/scroll",
             {"filter": {"nested": {"key": "x"}}})
    assert ei.value.code == 400

    # malformed point bodies -> 400 (not 404/500; review finding).
    for bad in ({"points": [{"vector": [0.0] * 16}]},      # missing id
                {"points": [{"id": "x", "vector": [[1], [2]]}]}):  # ragged
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req("PUT", f"{base}/collections/demo/points", bad)
        assert ei.value.code == 400, bad

    # CollectionInfo carries the full field set qdrant-client validates.
    info = _req("GET", f"{base}/collections/demo")["result"]
    for fieldname in ("optimizer_status", "segments_count",
                      "payload_schema"):
        assert fieldname in info
    for sub in ("hnsw_config", "optimizer_config", "wal_config"):
        assert sub in info["config"]

    # delete points then the collection (qdrant_manager.py:104-141).
    _req("POST", f"{base}/collections/demo/points/delete",
         {"points": [f"{0:032x}"]})
    assert _req("POST", f"{base}/collections/demo/points/count",
                {})["result"]["count"] == 5
    assert _req("DELETE", f"{base}/collections/demo")["result"] is True
    assert _req("GET", f"{base}/collections")["result"]["collections"] == []


def test_closed_loop_migrate_from_facade(qdrant_api, rng):
    """pipelines/migrate (our Qdrant REST client) pulls collections out
    of the façade — both wire directions validated against each other,
    including scroll pagination."""
    base, svc = qdrant_api
    with svc.lock:
        g = svc.store.create_collection("src", dim=16)
        n = 37  # forces multiple scroll pages at batch=10
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        g.upsert([f"{i:032x}" for i in range(n)], vecs,
                 [Payload(data_type="original_images",
                          class_name=f"c{i % 3}",
                          img_path=f"/m/{i}.png") for i in range(n)])

    dest = VectorStore()
    res = migrate.import_qdrant(dest, base, batch=10, quiet=True)
    assert res.collections == ["src"] and res.n_points == n
    out = dest.get("src")
    assert len(out) == n and out.dim == 16 and out.distance == "cosine"
    rec = out.retrieve([f"{5:032x}"])[0]
    np.testing.assert_allclose(rec.vector, vecs[5], atol=1e-6)
    assert rec.payload.class_name == "c2"


def test_must_not_over_the_wire(qdrant_api, rng):
    """Qdrant must_not clauses serve through the facade (VERDICT r3 #8);
    should/range still rejects with the clear subset error."""
    base, svc = qdrant_api
    _req("PUT", f"{base}/collections/neg",
         {"vectors": {"size": 8, "distance": "Cosine"}})
    vecs = rng.normal(size=(12, 8)).astype("float32")
    _req("PUT", f"{base}/collections/neg/points", {"points": [
        {"id": f"{i:032x}", "vector": vecs[i].tolist(),
         "payload": {"data_type": "original_images",
                     "class_name": "a" if i % 2 else "b",
                     "is_delegate": False, "img_path": f"/q/{i}.png"}}
        for i in range(12)]})
    flt = {"must": [{"key": "is_delegate", "match": {"value": False}}],
           "must_not": [{"key": "class_name", "match": {"value": "a"}}]}
    out = _req("POST", f"{base}/collections/neg/points/count",
               {"filter": flt})
    assert out["result"]["count"] == 6
    out = _req("POST", f"{base}/collections/neg/points/scroll",
               {"filter": flt, "limit": 100})
    assert {p["payload"]["class_name"]
            for p in out["result"]["points"]} == {"b"}
    out = _req("POST", f"{base}/collections/neg/points/search",
               {"vector": vecs[1].tolist(), "limit": 3, "filter": flt})
    assert all(h["payload"]["class_name"] == "b" for h in out["result"])
    # one field in SEVERAL must_not conditions (class NOT IN {a, b}):
    # Qdrant's clause-list form a single mapping cannot carry — must
    # exclude BOTH, not last-wins (review finding: dict(pairs) dropped
    # the first condition and returned rows Qdrant would exclude).
    out = _req("POST", f"{base}/collections/neg/points/count",
               {"filter": {"must_not": [
                   {"key": "class_name", "match": {"value": "a"}},
                   {"key": "class_name", "match": {"value": "b"}}]}})
    assert out["result"]["count"] == 0  # classes here are only a/b
    # contradictory must duplicates -> loud 400, not last-wins.
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _req("POST", f"{base}/collections/neg/points/count",
             {"filter": {"must": [
                 {"key": "class_name", "match": {"value": "a"}},
                 {"key": "class_name", "match": {"value": "b"}}]}})
    assert e.value.code == 400
    assert "contradictory" in json.loads(e.value.read())["status"]["error"]
    # range is still out of the compatibility claim (the fixed 8-field
    # schema has no numeric fields) -> clear 4xx.

    with pytest.raises(urllib.error.HTTPError) as e:
        _req("POST", f"{base}/collections/neg/points/count",
             {"filter": {"must": [
                 {"key": "class_name", "range": {"gte": 1}}]}})
    assert e.value.code == 400
    msg = json.loads(e.value.read())["status"]["error"]
    assert "range" in msg
    with pytest.raises(urllib.error.HTTPError) as e:
        _req("POST", f"{base}/collections/neg/points/count",
             {"filter": {"min_should": {}}})
    assert e.value.code == 400


def test_should_over_the_wire(qdrant_api, rng):
    """Qdrant should clauses (OR-groups) serve through the facade —
    count/scroll/search/delete all route them to the columnar mask."""
    base, svc = qdrant_api
    _req("PUT", f"{base}/collections/orw",
         {"vectors": {"size": 8, "distance": "Cosine"}})
    vecs = rng.normal(size=(12, 8)).astype("float32")
    _req("PUT", f"{base}/collections/orw/points", {"points": [
        {"id": f"{i:032x}", "vector": vecs[i].tolist(),
         "payload": {"data_type": "original_images",
                     "class_name": ("a", "b", "c")[i % 3],
                     "is_delegate": False, "img_path": f"/s/{i}.png"}}
        for i in range(12)]})
    flt = {"should": [{"key": "class_name", "match": {"value": "a"}},
                      {"key": "class_name", "match": {"value": "b"}}]}
    out = _req("POST", f"{base}/collections/orw/points/count",
               {"filter": flt})
    assert out["result"]["count"] == 8
    out = _req("POST", f"{base}/collections/orw/points/scroll",
               {"filter": flt, "limit": 100})
    assert {p["payload"]["class_name"]
            for p in out["result"]["points"]} == {"a", "b"}
    out = _req("POST", f"{base}/collections/orw/points/search",
               {"vector": vecs[0].tolist(), "limit": 5, "filter": flt})
    assert out["result"] and all(
        h["payload"]["class_name"] in {"a", "b"} for h in out["result"])
    # must AND should together (Qdrant semantics)
    both = {"must": [{"key": "is_delegate", "match": {"value": False}}],
            "should": flt["should"]}
    out = _req("POST", f"{base}/collections/orw/points/count",
               {"filter": both})
    assert out["result"]["count"] == 8
    # delete by should-filter
    _req("POST", f"{base}/collections/orw/points/delete",
         {"filter": {"should": [
             {"key": "class_name", "match": {"value": "c"}}]}})
    out = _req("POST", f"{base}/collections/orw/points/count", {})
    assert out["result"]["count"] == 8


def _req_status(method, url, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_facade_search_defaults_to_approximate(qdrant_api, rng):
    """Qdrant's default search is approximate (HNSW); params.exact=true
    opts into exhaustive. The facade used to hardcode exact=True, which
    RAISES at capacity/sharded scale — the scales it exists for."""
    base, svc = qdrant_api
    _req("PUT", f"{base}/collections/ap",
         {"vectors": {"size": 16, "distance": "Cosine"}})
    vecs = rng.normal(size=(30, 16)).astype(np.float32)
    _req("PUT", f"{base}/collections/ap/points", {
        "points": [{"id": str(i), "vector": v.tolist(),
                    "payload": {"class_name": "c"}}
                   for i, v in enumerate(vecs)]})
    g = svc.store.get("ap")
    calls = {}
    orig = g.search

    def spy(queries, k=10, flt=None, exact=True, with_vectors=False,
            method=None):
        calls["exact"] = exact
        return orig(queries, k=k, flt=flt, exact=exact,
                    with_vectors=with_vectors, method=method)

    g.search = spy
    s, out = _req_status("POST", f"{base}/collections/ap/points/search",
                         {"vector": vecs[3].tolist(), "limit": 3})
    assert s == 200 and calls["exact"] is False
    assert out["result"][0]["id"] == "3"  # f32 rescore: same winner
    s, _ = _req_status("POST", f"{base}/collections/ap/points/search",
                       {"vector": vecs[3].tolist(), "limit": 3,
                        "params": {"exact": True}})
    assert s == 200 and calls["exact"] is True
    g.search = orig


def test_facade_rejects_unknown_payload_fields(qdrant_api):
    """Real Qdrant stores arbitrary payload JSON; our columnar schema
    is the fixed 8-field contract — silent field-dropping on upsert is
    undetectable data loss, so the facade must 400."""
    base, _ = qdrant_api
    _req("PUT", f"{base}/collections/pf",
         {"vectors": {"size": 16, "distance": "Cosine"}})
    s, out = _req_status("PUT", f"{base}/collections/pf/points", {
        "points": [{"id": "a", "vector": [0.0] * 16,
                    "payload": {"class_name": "x",
                                "source_csv": "run7.csv"}}]})
    assert s == 400 and "source_csv" in json.dumps(out)


def test_facade_unknown_filter_field_is_400_not_404(qdrant_api):
    base, _ = qdrant_api
    _req("PUT", f"{base}/collections/ff",
         {"vectors": {"size": 16, "distance": "Cosine"}})
    s, out = _req_status("POST", f"{base}/collections/ff/points/count",
                         {"filter": {"must": [
                             {"key": "clas_name",
                              "match": {"value": "x"}}]}})
    assert s == 400 and "payload field" in json.dumps(out)


def test_facade_over_mesh_sharded_store(tmp_path, rng):
    """The full Qdrant-replacement-at-scale story in one wire test:
    `--api qdrant --mesh-devices N` — a real qdrant-shaped client
    upserts, searches (approximate default -> the ICI-sharded tier),
    deletes, and the sharded view stays in sync, all over the Qdrant
    wire format."""
    import threading

    from retrieval_based_object_detection_tpu.gallery import (
        server as server_mod2,
    )

    srv = server_mod2.serve(tmp_path / "store", host="127.0.0.1", port=0,
                            api="qdrant", mesh_devices=-1)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        _req("PUT", f"{base}/collections/pod",
             {"vectors": {"size": 16, "distance": "Cosine"}})
        vecs = rng.normal(size=(40, 16)).astype(np.float32)
        _req("PUT", f"{base}/collections/pod/points", {
            "points": [{"id": str(i), "vector": v.tolist(),
                        "payload": {"data_type": "original_images",
                                    "class_name": "a" if i % 2 else "b",
                                    "img_path": f"/p{i}.png"}}
                       for i, v in enumerate(vecs)]})
        out = _req("POST", f"{base}/collections/pod/points/search",
                   {"vector": vecs[7].tolist(), "limit": 3,
                    "filter": {"must": [{"key": "class_name",
                                         "match": {"value": "a"}}]}})
        assert out["result"][0]["id"] == "7"
        g = srv.service.store.get("pod")
        assert g._shard_view is not None  # approximate default -> sharded
        _req("POST", f"{base}/collections/pod/points/delete",
             {"points": ["7"]})
        out = _req("POST", f"{base}/collections/pod/points/search",
                   {"vector": vecs[7].tolist(), "limit": 3})
        assert all(h["id"] != "7" for h in out["result"])
    finally:
        srv.shutdown()
