"""Concurrent reads in the gallery service (VERDICT r4 weak #1).

The reference's vector service was real Qdrant, which serves concurrent
reads (02_qdrant_environment_setting.txt:1-8); round 4 serialized every
operation — including searches to *different* collections — under one
global RLock. These tests pin the round-5 locking design:

* ``RWLock`` semantics (shared readers, exclusive writer-preferring
  writer, write-implies-read reentrancy),
* searches genuinely overlap (measured via a gate inside a read
  section),
* a long write on one collection does NOT block reads on another,
* a storm of concurrent searches interleaved with writes/deletes always
  returns results equal to a serial oracle evaluated on a consistent
  store state, and the final state matches the serial expectation.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.gallery import server as GS
from retrieval_based_object_detection_tpu.utils.locks import RWLock


# ---------------------------------------------------------------- RWLock
def test_rwlock_readers_share():
    lk = RWLock()
    inside = threading.Barrier(4, timeout=10)

    def reader():
        with lk.read():
            inside.wait()  # all 4 readers inside the lock TOGETHER

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert not any(t.is_alive() for t in threads)


def test_rwlock_writer_excludes_readers_and_writers():
    lk = RWLock()
    log: list[str] = []

    def writer(tag):
        with lk.write():
            log.append(f"{tag}+")
            time.sleep(0.02)
            log.append(f"{tag}-")

    def reader(tag):
        with lk.read():
            log.append(f"{tag}+")
            time.sleep(0.01)
            log.append(f"{tag}-")

    threads = [threading.Thread(target=writer, args=(f"w{i}",))
               for i in range(2)]
    threads += [threading.Thread(target=reader, args=(f"r{i}",))
                for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    # No section may be open while a writer's section is open.
    open_set: set[str] = set()
    for ev in log:
        tag, op = ev[:-1], ev[-1]
        if op == "+":
            assert not any(o.startswith("w") for o in open_set), log
            if tag.startswith("w"):
                assert not open_set, log
            open_set.add(tag)
        else:
            open_set.remove(tag)
    assert not open_set


def test_rwlock_writer_not_starved_by_reader_stream():
    lk = RWLock()
    done = threading.Event()
    t0 = time.monotonic()

    def writer():
        with lk.write():
            done.set()

    def reader_stream():
        while not done.is_set() and time.monotonic() - t0 < 10:
            with lk.read():
                time.sleep(0.002)

    readers = [threading.Thread(target=reader_stream) for _ in range(4)]
    for t in readers:
        t.start()
    time.sleep(0.02)  # let the stream establish
    w = threading.Thread(target=writer)
    w.start()
    w.join(timeout=5)
    assert done.is_set(), "writer starved by a steady reader stream"
    for t in readers:
        t.join(timeout=10)


def test_rwlock_write_implies_read_reentrant():
    lk = RWLock()
    with lk.write():
        with lk.read():  # nested ops (maintain → snapshot) must not hang
            with lk.write():
                pass
    # Fully released: another thread can take the write side.
    ok = threading.Event()
    t = threading.Thread(target=lambda: (lk.write().__enter__(), ok.set()))
    t.start()
    t.join(timeout=5)
    assert ok.is_set()


# ----------------------------------------------------- service behaviour
@pytest.fixture
def svc(tmp_path):
    return GS.GalleryService(tmp_path / "store")


def _mk(svc, name, rng, n=64, dim=16):
    svc.create(name, {"dim": dim})
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    svc.upsert(name, {
        "ids": [f"{name}-{i}" for i in range(n)],
        "vectors": vecs,
        "payloads": [{"data_type": "original_images",
                      "class_name": name, "img_path": f"/{name}/{i}.png"}
                     for i in range(n)]})
    return vecs


def test_searches_overlap_in_time(svc, rng):
    """Two searches hold the read side together — the r4 global lock
    could never co-admit them."""
    vecs = _mk(svc, "a", rng)
    gate = threading.Barrier(2, timeout=10)
    results = []

    def search():
        with svc.read_locked("a"):
            gate.wait()  # both threads INSIDE the collection read lock
            out = svc.search("a", {"queries": [vecs[0].tolist()], "k": 1})
            results.append(out["results"][0][0]["id"])

    ts = [threading.Thread(target=search) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=15)
    assert results == ["a-0", "a-0"]


def test_write_on_one_collection_does_not_block_other(svc, rng):
    _mk(svc, "busy", rng)
    vecs_b = _mk(svc, "idle", rng)
    entered = threading.Event()
    release = threading.Event()

    def long_write():
        with svc.write_locked("busy"):
            entered.set()
            release.wait(timeout=10)

    w = threading.Thread(target=long_write)
    w.start()
    assert entered.wait(timeout=5)
    try:
        # A search on the OTHER collection must complete while the
        # write lock on "busy" is held (r4: it would queue globally).
        done = threading.Event()
        out: list = []

        def search_idle():
            out.append(svc.search(
                "idle", {"queries": [vecs_b[3].tolist()], "k": 1}))
            done.set()

        s = threading.Thread(target=search_idle)
        s.start()
        assert done.wait(timeout=10), \
            "search on 'idle' blocked behind a write on 'busy'"
        assert out[0]["results"][0][0]["id"] == "idle-3"
    finally:
        release.set()
        w.join(timeout=10)


def test_concurrent_search_write_storm_matches_serial_oracle(svc, rng):
    """16 reader threads search while writers upsert/delete; every
    response must equal the serial oracle on SOME consistent state, and
    the final store state equals the serial end state.

    Oracle design: queries target anchor points that no writer ever
    touches, so the correct top-1 is invariant across all interleavings
    — any torn read (search seeing a half-applied write) would surface
    as a wrong id or a non-finite score."""
    dim = 16
    svc.create("s", {"dim": dim})
    anchors = rng.normal(size=(8, dim)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    svc.upsert("s", {
        "ids": [f"anchor-{i}" for i in range(8)],
        "vectors": anchors,
        "payloads": [{"data_type": "original_images", "class_name":
                      "anchor", "img_path": f"/a/{i}.png"}
                     for i in range(8)]})

    stop = threading.Event()
    errors: list[str] = []

    def writer(seed):
        # Seed offset: the conftest rng that drew the anchors is also
        # default_rng-seeded, and cosine is scale-invariant — a writer
        # re-drawing the anchor's exact stream (×0.1) would TIE it at
        # score 1.0 and legitimately win top-1.
        r = np.random.default_rng(7000 + seed)
        for step in range(30):
            if stop.is_set():
                break
            ids = [f"w{seed}-{step}-{j}" for j in range(4)]
            # Orthogonal-ish noise, scaled down: can never outscore an
            # anchor for its own query.
            vecs = r.normal(size=(4, dim)).astype(np.float32) * 0.1
            try:
                svc.upsert("s", {
                    "ids": ids, "vectors": vecs,
                    "payloads": [{"data_type": "natural_images",
                                  "class_name": f"w{seed}",
                                  "img_path": f"/w/{seed}/{step}/{j}.png"}
                                 for j in range(4)]})
                if step % 3 == 2:
                    svc.delete_points("s", {"ids": ids[:2]})
            except Exception as e:  # noqa: BLE001
                errors.append(f"writer: {type(e).__name__}: {e}")
                return

    def reader(i):
        q = anchors[i % 8]
        for _ in range(40):
            if stop.is_set():
                break
            try:
                out = svc.search("s", {"queries": [q.tolist()], "k": 3})
                hit = out["results"][0][0]
                if hit["id"] != f"anchor-{i % 8}":
                    errors.append(f"reader{i}: top-1 {hit['id']}")
                    return
                if not (0.999 <= hit["score"] <= 1.001):
                    errors.append(f"reader{i}: score {hit['score']}")
                    return
                # Filtered count must be internally consistent (a torn
                # payload column would break mask/row agreement).
                c = svc.count("s", {"filter": {"class_name": "anchor"}})
                if c["count"] != 8:
                    errors.append(f"reader{i}: anchor count {c['count']}")
                    return
            except Exception as e:  # noqa: BLE001
                errors.append(f"reader{i}: {type(e).__name__}: {e}")
                return

    writers = [threading.Thread(target=writer, args=(s,)) for s in range(3)]
    readers = [threading.Thread(target=reader, args=(i,)) for i in range(16)]
    for t in writers + readers:
        t.start()
    for t in writers + readers:
        t.join(timeout=120)
    stop.set()
    assert not errors, errors[:5]

    # Serial end-state oracle: anchors + every surviving writer point.
    expect = 8
    for seed in range(3):
        for step in range(30):
            expect += 4 - (2 if step % 3 == 2 else 0)
    assert svc.store.get("s").count() == expect


def test_topology_storm_with_concurrent_snapshot(svc, rng):
    """Create/delete collections while snapshotting: the snapshot's
    topology-recheck loop must converge, never deadlock, and every
    response stays well-formed."""
    _mk(svc, "stable", rng, n=8)
    errors: list[str] = []

    def churn(seed):
        for step in range(15):
            name = f"tmp{seed}"
            try:
                svc.create(name, {"dim": 8, "force": True})
                svc.delete_collection(name)
            except Exception as e:  # noqa: BLE001
                errors.append(f"churn: {type(e).__name__}: {e}")
                return

    def snapshotter():
        for _ in range(8):
            try:
                out = svc.snapshot()
                if "stable" not in out["saved"]:
                    errors.append(f"snapshot missed stable: {out}")
                    return
            except RuntimeError:
                pass  # unstable-topology bailout is an allowed outcome
            except Exception as e:  # noqa: BLE001
                errors.append(f"snapshot: {type(e).__name__}: {e}")
                return

    ts = [threading.Thread(target=churn, args=(s,)) for s in range(2)]
    ts += [threading.Thread(target=snapshotter)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not any(t.is_alive() for t in ts), "topology storm deadlocked"
    assert not errors, errors[:5]


def test_http_concurrent_search_over_wire(tmp_path, rng):
    """End-to-end over ThreadingHTTPServer: 8 wire clients search
    concurrently while one writes — all responses correct."""
    srv = GS.serve(tmp_path / "store", host="127.0.0.1", port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        svc = srv.service
        vecs = _mk(svc, "wire", rng, n=32)

        def call(method, url, body):
            req = urllib.request.Request(
                url, data=json.dumps(body).encode(), method=method)
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read())

        errors: list[str] = []

        def client(i):
            for _ in range(10):
                out = call("POST",
                           f"{base}/collections/wire/points/search",
                           {"queries": [vecs[i].tolist()], "k": 1})
                if out["results"][0][0]["id"] != f"wire-{i}":
                    errors.append(f"client{i}: {out['results'][0][0]}")
                    return

        def wire_writer():
            for step in range(10):
                call("POST", f"{base}/collections/wire/points",
                     {"ids": [f"x{step}"],
                      "vectors": [(rng.normal(size=16).astype(np.float32)
                                   * 0.01).tolist()],
                      "payloads": [{"data_type": "natural_images",
                                    "class_name": "x",
                                    "img_path": f"/x/{step}.png"}]})

        ts = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        ts += [threading.Thread(target=wire_writer)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert not errors, errors[:5]
    finally:
        srv.shutdown()
