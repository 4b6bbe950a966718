"""Remote gallery topology: GalleryClient/RemoteVectorStore against a live
``rbod gallery-server`` — and the CLI stages driven end-to-end with
``--store http://...`` (the reference's Qdrant-container layout)."""

import threading

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.cli.main import main
from retrieval_based_object_detection_tpu.gallery import server as server_mod
from retrieval_based_object_detection_tpu.gallery.client import (
    GalleryClient,
    GalleryServiceError,
    RemoteVectorStore,
)
from retrieval_based_object_detection_tpu.gallery.schema import Filter, Payload


@pytest.fixture
def service(tmp_path):
    srv = server_mod.serve(tmp_path / "store", host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_client_crud_and_search(service, rng):
    store = RemoteVectorStore(service)
    g = store.create_collection("demo", dim=16)
    assert "demo" in store and store.list_collections() == [("demo", 0)]

    vecs = rng.normal(size=(20, 16)).astype(np.float32)
    pls = [Payload(data_type="original_images",
                   class_name="a" if i < 10 else "b",
                   img_path=f"/i/{i}.jpg") for i in range(20)]
    assert g.upsert([f"p{i}" for i in range(20)], vecs, pls) == 20
    assert len(g) == 20 and g.dim == 16
    assert g.count(Filter(must={"class_name": "a"})) == 10

    hits = g.search(vecs[3], k=3)
    assert hits[0][0].id == "p3" and hits[0][0].score > 0.999

    rec = g.get_by_path("/i/7.jpg")
    assert rec.id == "p7" and rec.vector.shape == (16,)

    assert g.distinct("class_name") == ["a", "b"]
    assert g.vectors_matching(Filter(must={"class_name": "b"})).shape \
        == (10, 16)

    assert g.delete(ids=["p0", "p1"]) == 2
    assert len(g) == 18

    store.rename_collection("demo", "demo2")
    assert "demo" not in store and "demo2" in store
    with pytest.raises(GalleryServiceError):
        GalleryClient(service, "demo").count()


def test_cli_stages_against_remote_store(service, tmp_path, monkeypatch,
                                         rng):
    """embed → delegates → experiments, all through --store http://..."""
    import dataclasses
    import json

    from retrieval_based_object_detection_tpu.models.clip.model import (
        CLIPVisionConfig,
        init_params,
    )
    from retrieval_based_object_detection_tpu.utils.checkpoint import (
        save_params,
    )

    monkeypatch.chdir(tmp_path)
    tiny = CLIPVisionConfig(image_size=64, patch_size=16, width=64,
                            layers=2, heads=1, embed_dim=32)
    ckpt = tmp_path / "tiny_clip"
    ckpt.mkdir()
    (ckpt / "clip_config.json").write_text(
        json.dumps(dataclasses.asdict(tiny)))
    save_params(init_params(tiny, seed=0), ckpt / "params")

    for cls, col in (("cola", (210, 40, 40)), ("fanta", (240, 140, 30))):
        for t in ("original", "natural"):
            d = tmp_path / "dataset_cropped" / f"{t}_images" / cls
            d.mkdir(parents=True)
            for i in range(2):
                a = np.full((64, 64, 3), 228, np.uint8)
                a[16:48, 16:48] = col
                Image.fromarray(a).save(d / f"p{i}_cropped_obj0.png")

    assert main(["store", "create", "--name", "main", "--store", service,
                 "--dim", "32"]) == 0
    for t in ("original", "natural"):
        assert main(["embed", "--root", "dataset_cropped", "--type", t,
                     "--store", service, "--collection", "main",
                     "--clip-checkpoint", str(ckpt)]) == 0
    assert main(["delegates", "--store", service,
                 "--collection", "main"]) == 0
    assert main(["experiments", "--store", service, "--collection", "main",
                 "--test-group", "dataset_cropped"]) == 0
    results = list((tmp_path / "results").rglob("result_*.csv"))
    assert results and results[0].read_text().count("\n") > 1


def test_client_search_with_vectors_and_auto_method(service, rng):
    store = RemoteVectorStore(service)
    g = store.create_collection("vecs", dim=8)
    vecs = rng.normal(size=(6, 8)).astype(np.float32)
    g.upsert([f"v{i}" for i in range(6)], vecs,
             [Payload(data_type="original_images", class_name="x",
                      img_path=f"/v/{i}.jpg") for i in range(6)])
    hits = g.search(vecs[2], k=2, with_vectors=True)  # exact default
    assert hits[0][0].id == "v2" and hits[0][0].vector is not None
    np.testing.assert_allclose(hits[0][0].vector, vecs[2], rtol=1e-6)
    # method=None + exact=False -> server-side auto routing, not an error
    hits2 = g.search(vecs[2], k=2, exact=False, method=None)
    assert hits2[0][0].id == "v2"


def test_binary_frame_upsert_roundtrip_precision(service, rng):
    """Binary transport ships raw f32 bytes — vectors survive BIT-EXACT
    (JSON float lists round-trip through decimal repr)."""
    store = RemoteVectorStore(service)
    g = store.create_collection("bin", dim=16)
    vecs = rng.normal(size=(5, 16)).astype(np.float32)
    g.upsert([f"b{i}" for i in range(5)], vecs,
             [Payload(data_type="original_images", class_name="x",
                      img_path=f"/b/{i}.jpg") for i in range(5)])
    recs = g.scroll_all(with_vectors=True)
    got = np.stack([r.vector for r in recs])
    assert (got == vecs).all()  # bit-exact, not just close


def test_malformed_binary_frame_gets_http_400(service):
    """Truncated/garbled octet-stream bodies must come back as a clean
    HTTP 400, not a dropped connection."""
    import urllib.error
    import urllib.request

    url = f"{service}/collections/whatever/points"
    for raw in (
        b"\x08\x00\x00\x00{}xxtrail",       # valid header, bad trailing len
        (lambda h: (len(h).to_bytes(4, "little") + h + b"\x00" * 9))(
            b'{"_array_key": "vectors"}'),  # no _array_shape, non-mult-of-4
    ):
        req = urllib.request.Request(url, data=raw, method="POST")
        req.add_header("Content-Type", "application/octet-stream")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400


def test_json_fallback_against_pre_binary_server(rng):
    """An upgraded client against an older (JSON-only) gallery-server:
    binary frames draw HTTP 400, and the client retries as JSON."""
    import json as _json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from retrieval_based_object_detection_tpu.gallery.persist import (
        load_store as _unused,  # noqa: F401  (parity with real server deps)
    )
    from retrieval_based_object_detection_tpu.gallery.store import VectorStore

    store = VectorStore()
    store.create_collection("old", dim=8)

    class OldHandler(BaseHTTPRequestHandler):
        """Pre-binary-transport server: _body is json.loads, always."""

        def log_message(self, *a):
            pass

        def _json_out(self, obj, code=200):
            b = _json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Length", str(len(b)))
            self.end_headers()
            self.wfile.write(b)

        def do_POST(self):
            raw = self.rfile.read(int(self.headers["Content-Length"]))
            # Faithful to the old server: json.loads straight on the
            # bytes. Raw f32 frames are usually invalid UTF-8, so this
            # raises UnicodeDecodeError and DROPS the connection (the
            # skew mode the client's fallback must survive).
            try:
                body = _json.loads(raw)
            except _json.JSONDecodeError:
                return self._json_out({"error": "bad json"}, 400)
            g = store.get("old")
            if self.path.endswith("/points"):
                n = g.upsert(body["ids"], np.asarray(body["vectors"]),
                             body["payloads"])
                return self._json_out({"upserted": n})
            if self.path.endswith("/points/search"):
                res = g.search(np.asarray(body["queries"], np.float32),
                               k=body["k"])
                return self._json_out({"results": [
                    [{"id": r.id, "score": float(r.score),
                      "payload": r.payload.to_dict()} for r in hits]
                    for hits in res]})
            return self._json_out({"error": "not found"}, 404)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), OldHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        g = GalleryClient(f"http://127.0.0.1:{srv.server_address[1]}",
                          "old", dim=8)
        vecs = rng.normal(size=(4, 8)).astype(np.float32)
        pls = [Payload(data_type="original_images", class_name="x",
                       img_path=f"/o/{i}.jpg") for i in range(4)]
        assert g.upsert([f"o{i}" for i in range(4)], vecs, pls) == 4
        hits = g.search(vecs[1], k=2)
        assert hits[0][0].id == "o1" and hits[0][0].score > 0.999
    finally:
        srv.shutdown()


def test_validation_400_is_not_retried_as_json(service, rng):
    """A genuine validation 400 from a binary-capable server must surface
    immediately — NOT trigger the JSON-fallback resend of the full
    vector payload (ADVICE r2)."""
    from unittest import mock

    from retrieval_based_object_detection_tpu.gallery import client as C

    store = RemoteVectorStore(service)
    g = store.create_collection("val", dim=8)
    vecs = rng.normal(size=(3, 8)).astype(np.float32)
    pls = [Payload(data_type="original_images", class_name="x",
                   img_path=f"/v/{i}.jpg") for i in range(2)]  # mismatch!
    calls = {"n": 0}
    real_urlopen = C.urllib.request.urlopen

    def counting(*a, **kw):
        calls["n"] += 1
        return real_urlopen(*a, **kw)

    with mock.patch.object(C.urllib.request, "urlopen", counting):
        with pytest.raises(GalleryServiceError) as ei:
            g.upsert(["a", "b", "c"], vecs, pls)
    assert ei.value.status == 400
    assert calls["n"] == 1, "validation 400 must not be resent as JSON"


def test_get_by_path_pre_route_404_falls_back_to_scroll(rng, monkeypatch):
    """Against a server predating /points/by-path the 404 must trigger
    the exact-match scroll fallback (the handler used to read e.code,
    which GalleryServiceError never defines — AttributeError instead of
    fallback); non-404 errors must re-raise as themselves."""
    from retrieval_based_object_detection_tpu.gallery import client as C

    gc = C.GalleryClient.__new__(C.GalleryClient)
    gc.base = "http://x"
    gc.name = "c"

    def raise404(method, url, body=None, **kw):
        raise C.GalleryServiceError(404, "not found")

    monkeypatch.setattr(C, "_request", raise404)
    sentinel = object()
    monkeypatch.setattr(
        gc, "scroll",
        lambda flt, limit, with_vectors: ([sentinel], None))
    assert gc.get_by_path("/a.png") is sentinel
    monkeypatch.setattr(gc, "scroll",
                        lambda flt, limit, with_vectors: ([], None))
    assert gc.get_by_path("/a.png") is None

    def raise500(method, url, body=None, **kw):
        raise C.GalleryServiceError(500, "boom")

    monkeypatch.setattr(C, "_request", raise500)
    with pytest.raises(C.GalleryServiceError, match="500"):
        gc.get_by_path("/a.png")


def test_client_refuses_neg_filters_against_old_server(service, rng,
                                                       monkeypatch):
    """must_not/should must never be SILENTLY dropped by an older
    server (it reads only body['filter']): the client probes /healthz
    capability once and fails loudly when unsupported."""
    from retrieval_based_object_detection_tpu.gallery import client as C

    base = service
    store = RemoteVectorStore(base)
    store.create_collection("c", dim=8)
    gc = C.GalleryClient(base, "c")
    gc_old = C.GalleryClient(base, "c")
    ids = [f"n{i}" for i in range(6)]
    gc.upsert(ids, rng.normal(size=(6, 8)).astype(np.float32),
              [Payload(data_type="original_images",
                       class_name="a" if i % 2 else "b",
                       img_path=f"/n/{i}.png").to_dict()
               for i in range(6)])
    # Current server advertises support: the clause works end to end.
    n = gc.count(Filter(must_not=(("class_name", "a"),)))
    assert n == gc.count(Filter(must={"class_name": "b"}))
    # Simulate an old server: healthz 404s -> loud error, not misfilter.
    orig = C._request

    def no_healthz(method, url, body=None, **kw):
        if url.endswith("/healthz"):
            raise C.GalleryServiceError(404, "not found")
        return orig(method, url, body, **kw)

    monkeypatch.setattr(C, "_request", no_healthz)
    with pytest.raises(C.GalleryServiceError, match="must_not"):
        gc_old.count(Filter(must_not=(("class_name", "a"),)))
    # must-only filters keep working against the old server.
    assert gc_old.count(Filter(must={"class_name": "b"})) == n


def test_transport_blip_does_not_cache_probe_result(service, rng,
                                                    monkeypatch):
    """A TRANSIENT healthz failure (timeout, reset) must not brand the
    server incapable forever: the call fails with a retryable 503 and
    the next call re-probes (ADVICE r4). Only a definitive answer — a
    healthz response, or an HTTP error proving no /healthz route —
    caches."""
    from retrieval_based_object_detection_tpu.gallery import client as C

    store = RemoteVectorStore(service)
    store.create_collection("tb", dim=8)
    gc = C.GalleryClient(service, "tb")
    gc.upsert(["a", "b"], rng.normal(size=(2, 8)).astype(np.float32),
              [Payload(data_type="original_images", class_name=c,
                       img_path=f"/t/{c}.png") for c in "ab"])
    orig = C._request

    def flaky_healthz(method, url, body=None, **kw):
        if url.endswith("/healthz"):
            raise ConnectionError("reset by peer")
        return orig(method, url, body, **kw)

    monkeypatch.setattr(C, "_request", flaky_healthz)
    flt = Filter(must_not=(("class_name", "a"),))
    with pytest.raises(C.GalleryServiceError) as ei:
        gc.count(flt)
    assert ei.value.status == 503
    assert gc._neg_filters_ok is None  # NOT cached as False
    # Transport recovers: the same client object now succeeds.
    monkeypatch.setattr(C, "_request", orig)
    assert gc.count(flt) == 1


def test_client_warm_endpoint(service, rng):
    """POST /collections/<n>/warm: server-side Gallery.warm on demand
    (post-bulk-ingest, pre-cutover)."""
    store = RemoteVectorStore(service)
    g = store.create_collection("wm", dim=8)
    g.upsert([f"p{i}" for i in range(10)],
             rng.normal(size=(10, 8)).astype(np.float32),
             [Payload(data_type="original_images", class_name="c",
                      img_path=f"/w/{i}.png") for i in range(10)])
    secs = GalleryClient(service, "wm").warm()
    assert secs >= 0.0
