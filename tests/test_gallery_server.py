"""Gallery HTTP service: the Qdrant-role server, driven over the wire."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.gallery import server as GS


@pytest.fixture
def server(tmp_path):
    srv = GS.serve(tmp_path / "store", host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", tmp_path / "store"
    srv.shutdown()


def call(method, url, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_full_lifecycle(server, rng):
    base, root = server
    # create + list
    assert call("PUT", f"{base}/collections/prod", {"dim": 8})[0] == 200
    status, cols = call("GET", f"{base}/collections")
    assert cols == [{"name": "prod", "count": 0, "dim": 8,
                     "distance": "cosine"}]

    # upsert
    vecs = rng.normal(size=(5, 8)).astype(np.float32)
    payloads = [{"data_type": "original_images", "class_name": "a",
                 "img_path": f"/p{i}.png"} for i in range(5)]
    status, res = call("POST", f"{base}/collections/prod/points",
                       {"ids": [f"i{j}" for j in range(5)],
                        "vectors": vecs.tolist(), "payloads": payloads})
    assert res == {"upserted": 5}

    # count with filter
    status, res = call("GET", f"{base}/collections/prod/count",
                       {"filter": {"class_name": "a"}})
    assert res["count"] == 5

    # scroll with vectors
    status, res = call("POST", f"{base}/collections/prod/points/scroll",
                       {"limit": 2, "with_vectors": True})
    assert len(res["points"]) == 2 and res["next_offset"] == 2
    np.testing.assert_allclose(res["points"][0]["vector"], vecs[0],
                               rtol=1e-6)

    # search
    status, res = call("POST", f"{base}/collections/prod/points/search",
                       {"queries": [vecs[3].tolist()], "k": 2})
    assert res["results"][0][0]["id"] == "i3"
    assert res["results"][0][0]["score"] > 0.999

    # delete by filter
    status, res = call("POST", f"{base}/collections/prod/points/delete",
                       {"filter": {"img_path": "/p0.png"}})
    assert res == {"deleted": 1}

    # snapshot persists across a service restart
    assert call("POST", f"{base}/snapshot")[1] == {"saved": ["prod"]}
    svc2 = GS.GalleryService(root)
    assert svc2.store.get("prod").count() == 4

    # rename + delete collection
    call("POST", f"{base}/collections/prod/rename", {"new_name": "prod2"})
    status, cols = call("GET", f"{base}/collections")
    assert cols[0]["name"] == "prod2"
    assert call("DELETE", f"{base}/collections/prod2")[0] == 200
    assert call("GET", f"{base}/collections")[1] == []


def test_error_paths(server):
    base, _ = server
    assert call("PUT", f"{base}/collections/x", {"dim": 4})[0] == 200
    # duplicate create without force → 409
    code, res = call("PUT", f"{base}/collections/x", {"dim": 4})
    assert code == 409
    # unknown collection → 404
    code, res = call("GET", f"{base}/collections/nope/count")
    assert code == 404
    # malformed body → 400
    req = urllib.request.Request(f"{base}/collections/x/points",
                                 data=b"not json", method="POST")
    try:
        urllib.request.urlopen(req, timeout=10)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # bad route → 404
    assert call("GET", f"{base}/bogus")[0] == 404


def test_count_filter_via_query_param(server, rng):
    base, _ = server
    call("PUT", f"{base}/collections/q", {"dim": 4})
    vecs = rng.normal(size=(6, 4)).astype(np.float32)
    call("POST", f"{base}/collections/q/points",
         {"ids": [f"p{i}" for i in range(6)], "vectors": vecs.tolist(),
          "payloads": [{"data_type": "x",
                        "class_name": "a" if i < 2 else "b"}
                       for i in range(6)]})
    import urllib.parse

    flt = urllib.parse.quote(json.dumps({"class_name": "a"}))
    status, res = call("GET", f"{base}/collections/q/count?filter={flt}")
    assert res["count"] == 2
    status, res = call("POST", f"{base}/collections/q/count",
                       {"filter": {"class_name": "b"}})
    assert res["count"] == 4


def test_by_path_route_resolves_spelling(server, rng, tmp_path):
    """The by-path route rides Gallery.get_by_path's resolved-path
    fallback: a relative-path lookup finds a point stored under the
    absolute spelling (the served-topology twin of the local fix)."""
    import os

    base, _ = server
    call("PUT", f"{base}/collections/bp", {"dim": 8})
    img = tmp_path / "img" / "a.png"
    img.parent.mkdir(parents=True, exist_ok=True)
    img.write_bytes(b"x")
    abs_path = str(img.resolve())
    call("POST", f"{base}/collections/bp/points", {
        "ids": ["p1"], "vectors": [[1.0] * 8],
        "payloads": [{"data_type": "original_images", "class_name": "c",
                      "img_path": abs_path}]})
    rel = os.path.relpath(abs_path)
    st, out = call("POST", f"{base}/collections/bp/points/by-path",
                   {"img_path": rel})
    assert st == 200 and out["point"] is not None
    assert out["point"]["id"] == "p1"
    st, out = call("POST", f"{base}/collections/bp/points/by-path",
                   {"img_path": "/nowhere/else.png"})
    assert st == 200 and out["point"] is None
    st, out = call("POST", f"{base}/collections/bp/points/by-path", {})
    assert st == 400


def test_missing_body_keys_are_400_not_404(server):
    base, _ = server
    call("PUT", f"{base}/collections/mk", {"dim": 8})
    st, out = call("POST", f"{base}/collections/mk/points",
                   {"vectors": [[1.0] * 8]})  # no ids/payloads
    assert st == 400 and "missing required" in out["error"]
    st, out = call("POST", f"{base}/collections/mk/rename", {})
    assert st == 400
    st, out = call("POST", f"{base}/collections/mk/points/search", {})
    assert st == 400


def test_search_exact_false_auto_routes(server, rng):
    """exact:false without an explicit method must hit the serving tier
    (auto-routing), not silently run f32 HIGHEST."""
    base, _ = server
    call("PUT", f"{base}/collections/au", {"dim": 8})
    vecs = rng.normal(size=(5, 8)).astype(float)
    call("POST", f"{base}/collections/au/points", {
        "ids": [f"i{j}" for j in range(5)],
        "vectors": vecs.tolist(),
        "payloads": [{"data_type": "original_images", "class_name": "c",
                      "img_path": f"/{j}.png"} for j in range(5)]})
    st, out = call("POST", f"{base}/collections/au/points/search",
                   {"queries": [vecs[2].tolist()], "exact": False, "k": 1})
    assert st == 200 and out["results"][0][0]["id"] == "i2"
    # Unknown explicit method surfaces as a clean 400, not a crash.
    st, out = call("POST", f"{base}/collections/au/points/search",
                   {"queries": [vecs[2].tolist()], "method": "int16"})
    assert st == 400 and "unknown method" in out["error"]


def test_service_mesh_devices_serves_sharded(tmp_path, rng):
    """`rbod gallery-server --mesh-devices N`: the service's searches
    route through the ICI-sharded tier behind the same REST API
    (VERDICT r3 #1: the multi-chip tier must be a production surface,
    not a hand-built library object)."""
    srv = GS.serve(tmp_path / "store", host="127.0.0.1", port=0,
                   mesh_devices=-1)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert call("PUT", f"{base}/collections/prod", {"dim": 16})[0] == 200
        vecs = rng.normal(size=(40, 16)).astype(np.float32)
        payloads = [{"data_type": "original_images",
                     "class_name": "a" if i % 2 else "b",
                     "img_path": f"/p{i}.png"} for i in range(40)]
        status, res = call("POST", f"{base}/collections/prod/points",
                           {"ids": [f"i{j}" for j in range(40)],
                            "vectors": vecs.tolist(), "payloads": payloads})
        assert res == {"upserted": 5 * 8}
        status, res = call("POST", f"{base}/collections/prod/points/search",
                           {"queries": [vecs[7].tolist()], "k": 3,
                            "filter": {"class_name": "a"}})
        assert status == 200
        assert res["results"][0][0]["id"] == "i7"
        g = srv.service.store.get("prod")
        assert g._shard_view is not None  # it really went sharded
        # Mutations over the wire stay in sync with the sharded view.
        call("POST", f"{base}/collections/prod/points/delete",
             {"ids": ["i7"]})
        status, res = call("POST", f"{base}/collections/prod/points/search",
                           {"queries": [vecs[7].tolist()], "k": 3})
        assert all(h["id"] != "i7" for h in res["results"][0])
    finally:
        srv.shutdown()


def test_filter_should_native_wire(server, rng):
    """filter_should — [[field, value], ...] OR-group — rides the native
    REST wire through count/scroll/search, and GalleryClient emits it."""
    base, _ = server
    call("PUT", f"{base}/collections/sw", {"dim": 8})
    vecs = rng.normal(size=(9, 8)).astype(np.float32)
    payloads = [{"data_type": "original_images",
                 "class_name": ("a", "b", "c")[i % 3],
                 "img_path": f"/w/{i}.png"} for i in range(9)]
    call("POST", f"{base}/collections/sw/points",
         {"ids": [f"i{j}" for j in range(9)], "vectors": vecs.tolist(),
          "payloads": payloads})
    should = [["class_name", "a"], ["class_name", "b"]]
    status, res = call("POST", f"{base}/collections/sw/count",
                       {"filter_should": should})
    assert (status, res["count"]) == (200, 6)
    status, res = call("POST", f"{base}/collections/sw/points/scroll",
                       {"filter_should": should, "limit": 100})
    assert {p["payload"]["class_name"] for p in res["points"]} == {"a", "b"}
    status, res = call("POST", f"{base}/collections/sw/points/search",
                       {"queries": [vecs[0].tolist()], "k": 4,
                        "filter_should": should})
    assert res["results"][0] and all(
        h["payload"]["class_name"] in {"a", "b"}
        for h in res["results"][0])

    # the Python client serialises Filter.should into the same body
    from retrieval_based_object_detection_tpu.gallery.client import (
        _filter_body,
    )
    from retrieval_based_object_detection_tpu.gallery.schema import Filter

    body = _filter_body(Filter(must={"is_delegate": False},
                               should=(("class_name", "a"),)))
    assert body == {"filter": {"is_delegate": False},
                    "filter_should": [["class_name", "a"]]}


def test_maintain_endpoint_reclaims_and_persists(server, rng):
    """POST /collections/<name>/maintain runs the deferred compaction
    INSIDE the server process and makes the reclaim durable (base
    rewrite — a restart must not replay the tombstones). The Python
    client's maintain() drives the same endpoint (rbod store maintain
    against an http store used to AttributeError; review finding)."""
    base, root = server
    call("PUT", f"{base}/collections/mw", {"dim": 8})
    vecs = rng.normal(size=(10, 8)).astype(np.float32)
    call("POST", f"{base}/collections/mw/points",
         {"ids": [f"i{j}" for j in range(10)], "vectors": vecs.tolist(),
          "payloads": [{"data_type": "original_images", "class_name": "a",
                        "img_path": f"/m/{i}.png"} for i in range(10)]})
    call("POST", f"{base}/collections/mw/points/delete",
         {"ids": ["i0", "i1"]})
    # Below the dead-fraction threshold nothing is due without force.
    status, res = call("POST", f"{base}/collections/mw/maintain", {})
    assert (status, res["reclaimed"]) == (200, 0)
    from retrieval_based_object_detection_tpu.gallery.client import (
        GalleryClient,
    )

    assert GalleryClient(base, "mw").maintain(force=True) == 2
    status, res = call("GET", f"{base}/collections/mw/count")
    assert res["count"] == 8
    # Durable: a fresh service over the same root sees the compacted
    # store (no tombstone resurrection from replayed deltas).
    from retrieval_based_object_detection_tpu.gallery.server import (
        GalleryService,
    )

    svc2 = GalleryService(root)
    g2 = svc2.store.get("mw")
    assert len(g2) == 8 and g2._n_dead == 0


def test_query_param_filter_with_percent_escape_value(server, rng):
    """parse_qs already percent-decodes; the old extra unquote() turned
    a literal %20 inside a filter VALUE into a space and matched the
    wrong rows."""
    base, _ = server
    call("PUT", f"{base}/collections/pe", {"dim": 4})
    call("POST", f"{base}/collections/pe/points",
         {"ids": ["a", "b"],
          "vectors": rng.normal(size=(2, 4)).astype(np.float32).tolist(),
          "payloads": [
              {"data_type": "x", "class_name": "c",
               "img_path": "imgs/a%20b.jpg"},
              {"data_type": "x", "class_name": "c",
               "img_path": "imgs/a b.jpg"}]})
    import urllib.parse

    flt = urllib.parse.quote(json.dumps({"img_path": "imgs/a%20b.jpg"}))
    status, res = call("GET", f"{base}/collections/pe/count?filter={flt}")
    assert status == 200 and res["count"] == 1


def test_unexpected_server_error_returns_500_json(tmp_path):
    """An unexpected exception must still produce an HTTP response — a
    dropped connection makes the binary-frame client misread it as
    pre-binary version skew and re-send the body as JSON."""
    srv = GS.serve(tmp_path / "store", host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        call("PUT", f"{base}/collections/er", {"dim": 4})

        def boom(store, root):
            raise OSError("disk full")

        srv.service._save = boom
        status, res = call("POST", f"{base}/snapshot", {})
        assert status == 500 and "disk full" in json.dumps(res)
    finally:
        srv.shutdown()


def test_warm_prebuilds_serving_state(tmp_path, rng):
    """Gallery.warm builds the auto serving tier + filter masks ahead
    of the first client query; serve(warm=True) runs it in a background
    thread (at 10M the cold first query pays minutes of view build)."""
    import time

    from retrieval_based_object_detection_tpu.gallery import persist
    from retrieval_based_object_detection_tpu.gallery.schema import (
        Filter,
        Payload,
    )
    from retrieval_based_object_detection_tpu.gallery.store import (
        Gallery,
        VectorStore,
    )

    store = VectorStore()
    g = store.create_collection("w", dim=16)
    g.upsert([f"p{i}" for i in range(40)],
             np.random.default_rng(0).normal(size=(40, 16)).astype(
                 np.float32),
             [Payload(data_type="original_images",
                      class_name="a" if i % 2 else "b",
                      img_path=f"/w/{i}.png") for i in range(40)])
    flt = Filter(must={"class_name": "a"})
    secs = g.warm(filters=[flt])
    assert secs >= 0.0
    # BOTH routes pre-built at this scale: the approximate tier AND the
    # native API's exact=True default (f32 mirror).
    assert g._dev_bf16 is not None and g._dev_f32 is not None
    assert flt.cache_key() in g._mask_cache  # filtered mask pre-built
    # Through the service: background warm flag clears when done.
    persist.save_store(store, tmp_path / "store")
    srv = GS.serve(tmp_path / "store", host="127.0.0.1", port=0,
                   warm=True)
    # shutdown() blocks until serve_forever's loop observes it — the
    # loop must actually be running.
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        deadline = time.time() + 30
        while srv.service.warming and time.time() < deadline:
            time.sleep(0.05)
        assert not srv.service.warming
        g2 = srv.service.store.get("w")
        assert g2._dev_bf16 is not None and g2._dev_f32 is not None
    finally:
        srv.shutdown()


def test_warm_skips_failing_collection(tmp_path, rng):
    """One broken collection must not abort warming of the rest."""
    import time

    from retrieval_based_object_detection_tpu.gallery import persist
    from retrieval_based_object_detection_tpu.gallery.schema import Payload
    from retrieval_based_object_detection_tpu.gallery.store import (
        VectorStore,
    )

    store = VectorStore()
    for name in ("bad", "zz_good"):  # bad sorts first by size tie
        g = store.create_collection(name, dim=8)
        g.upsert([f"{name}{i}" for i in range(4)],
                 rng.normal(size=(4, 8)).astype(np.float32),
                 [Payload(data_type="original_images", class_name="c",
                          img_path=f"/{name}/{i}.png") for i in range(4)])
    persist.save_store(store, tmp_path / "store")
    srv = GS.serve(tmp_path / "store", host="127.0.0.1", port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        bad = srv.service.store.get("bad")
        def boom(*a, **k):
            raise RuntimeError("simulated device error")
        bad.warm = boom
        srv.service.warm_async()
        deadline = time.time() + 30
        while srv.service.warming and time.time() < deadline:
            time.sleep(0.05)
        assert not srv.service.warming
        good = srv.service.store.get("zz_good")
        assert good._dev_f32 is not None  # warmed despite the failure
    finally:
        srv.shutdown()


def test_gallery_server_healthz(server):
    base, _ = server
    st, out = call("GET", f"{base}/healthz")
    assert st == 200 and out["status"] == "ok" and out["warming"] is False


def test_concurrent_requests_during_warm_and_mutations(tmp_path, rng):
    """Race hunt: N client threads hammer search/upsert/delete/scroll
    over the wire WHILE the warm thread runs — no 500s, no torn reads,
    and the store ends consistent (the service lock + warm thread +
    SIGTERM snapshot are the only concurrency in the system)."""
    import concurrent.futures
    import time

    from retrieval_based_object_detection_tpu.gallery import persist
    from retrieval_based_object_detection_tpu.gallery.schema import Payload
    from retrieval_based_object_detection_tpu.gallery.store import (
        VectorStore,
    )

    store = VectorStore()
    g = store.create_collection("rc", dim=16)
    g.upsert([f"p{i}" for i in range(64)],
             rng.normal(size=(64, 16)).astype(np.float32),
             [Payload(data_type="original_images", class_name="c",
                      img_path=f"/rc/{i}.png") for i in range(64)])
    persist.save_store(store, tmp_path / "store")
    srv = GS.serve(tmp_path / "store", host="127.0.0.1", port=0,
                   warm=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    errors = []

    def worker(wid):
        r = np.random.default_rng(wid)
        for it in range(12):
            op = it % 4
            try:
                if op == 0:
                    st, out = call(
                        "POST", f"{base}/collections/rc/points/search",
                        {"queries": [r.normal(size=16).tolist()], "k": 3})
                    assert st == 200 and out["results"][0], (st, out)
                elif op == 1:
                    pid = f"w{wid}-{it}"
                    st, out = call(
                        "POST", f"{base}/collections/rc/points",
                        {"ids": [pid],
                         "vectors": [r.normal(size=16).tolist()],
                         "payloads": [{"data_type": "original_images",
                                       "class_name": "c",
                                       "img_path": f"/rc/{pid}.png"}]})
                    assert st == 200, (st, out)
                elif op == 2:
                    st, out = call(
                        "POST", f"{base}/collections/rc/points/scroll",
                        {"limit": 5})
                    assert st == 200 and len(out["points"]) == 5
                else:
                    st, out = call(
                        "POST", f"{base}/collections/rc/points/delete",
                        {"ids": [f"w{wid}-{it - 3}"]})
                    assert st == 200, (st, out)
            except Exception as e:  # collected, not raised mid-pool
                errors.append((wid, it, repr(e)))

    try:
        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            list(ex.map(worker, range(8)))
        assert not errors, errors[:4]
        deadline = time.time() + 30
        while srv.service.warming and time.time() < deadline:
            time.sleep(0.05)
        # Final consistency over the wire: count == live points.
        st, out = call("GET", f"{base}/collections/rc/count")
        g2 = srv.service.store.get("rc")
        assert st == 200 and out["count"] == len(g2)
        # And a search still answers correctly after the storm.
        st, out = call("POST", f"{base}/collections/rc/points/search",
                       {"queries": [np.zeros(16).tolist()], "k": 3})
        assert st == 200 and len(out["results"][0]) == 3
    finally:
        srv.shutdown()
