"""Format-3 binary snapshot meta (VERDICT r3 #4): roundtrip fidelity,
lazy id/path materialisation, v2 backward compatibility, delta interop."""

import json

import numpy as np
import pytest

from retrieval_based_object_detection_tpu import native
from retrieval_based_object_detection_tpu.gallery import persist
from retrieval_based_object_detection_tpu.gallery.schema import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.store import (
    Gallery,
    VectorStore,
)

DIM = 16


def _mk(rng, n, start=0):
    ids = [f"{start + i:032x}" for i in range(n)]
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    pls = [Payload(data_type="original_images",
                   class_name=f"cls{(start + i) % 3}",
                   img_path=f"/data/c{(start + i) % 3}/img_{start + i}.png",
                   is_segmented=bool(i % 2),
                   is_delegate=False) for i in range(n)]
    return ids, vecs, pls


def _roundtrip(store, tmp_path, mmap_vectors=False):
    persist.save_store(store, tmp_path)
    return persist.load_store(tmp_path, mmap_vectors=mmap_vectors)


@pytest.mark.parametrize("mmap_vectors", [False, True])
def test_binary_roundtrip_full_fidelity(rng, tmp_path, mmap_vectors):
    store = VectorStore()
    g = store.create_collection("bin", dim=DIM)
    ids, vecs, pls = _mk(rng, 300)
    g.upsert(ids, vecs, pls)
    # A delegate row with None delegate_type decode + unicode strings.
    g.upsert(["dlg"], rng.normal(size=(1, DIM)).astype(np.float32),
             [Payload(data_type="original_images", class_name="콜라-제로",
                      img_path="/데이터/콜라.png", is_delegate=True,
                      delegate_type="average")])
    g2 = _roundtrip(store, tmp_path, mmap_vectors).get("bin")
    assert len(g2) == 301
    assert g2._ids == g._ids
    for pid in [ids[0], ids[157], "dlg"]:
        a = g.retrieve([pid])[0]
        b = g2.retrieve([pid])[0]
        np.testing.assert_allclose(a.vector, b.vector)
        assert a.payload == b.payload
    # Filters over the re-imported coded/bool columns.
    for flt in (Filter(must={"class_name": "cls1"}),
                Filter(must={"is_segmented": True}),
                Filter(must={"is_delegate": True}),
                Filter(must={"delegate_type": None, "class_name": "cls2"})):
        assert g2.count(flt) == g.count(flt), flt
    # Path lookup through the lazily-built index.
    assert g2.get_by_path("/데이터/콜라.png").id == "dlg"
    assert g2.get_by_path(ids and f"/data/c1/img_1.png").id == ids[1]
    # Search parity.
    q = vecs[42]
    assert [h.id for h in g2.search(q, k=3)[0]] == \
        [h.id for h in g.search(q, k=3)[0]]


def test_load_is_lazy_until_first_use(rng, tmp_path):
    store = VectorStore()
    g = store.create_collection("lazy", dim=DIM)
    ids, vecs, pls = _mk(rng, 2000)
    g.upsert(ids, vecs, pls)
    persist.save_store(store, tmp_path)
    g2 = persist.load_store(tmp_path, mmap_vectors=True).get("lazy")
    # Nothing materialised by the load itself:
    assert g2._ids_list is None and g2._ids_arr is not None
    assert g2._id_map is None
    assert g2._payloads._paths_lazy is not None
    # len/count don't materialise (header-sized work only).
    assert len(g2) == 2000
    assert g2._ids_list is None and g2._id_map is None
    # Read-only id lookups go through the sorted probe — the dict stays
    # lazy (retrieve right after a 10M restart must not pay an ~18 s
    # dict build); result payloads slice their path off the lazy blob.
    assert g2.retrieve([ids[5]])[0].payload.class_name == "cls2"
    assert g2._id_map is None and g2._ids_sorted is not None
    assert g2.retrieve([ids[5]])[0].payload.img_path == \
        "/data/c2/img_5.png"
    assert g2._payloads._paths_lazy is not None  # still unsplit
    # get_by_path needs the full reverse index — that materialises it.
    assert g2.get_by_path("/data/c0/img_0.png").id == ids[0]
    assert g2._payloads._paths_lazy is None
    # A write builds the real dict (mutation path) and drops the probe.
    assert g2._id_map is None
    g2.upsert(["new"], rng.normal(size=(1, DIM)).astype(np.float32),
              [Payload(data_type="original_images", class_name="cls0",
                       img_path="/data/new.png")])
    assert g2._id_map is not None and g2._ids_sorted is None
    assert g2.get_by_path("/data/new.png").id == "new"


def test_write_after_lazy_load_before_any_read(rng, tmp_path):
    """An upsert as the VERY FIRST op after a lazy load must materialise
    whatever it needs (grow + path bookkeeping + id map) correctly."""
    store = VectorStore()
    g = store.create_collection("wfirst", dim=DIM)
    ids, vecs, pls = _mk(rng, 1500)
    g.upsert(ids, vecs, pls)
    persist.save_store(store, tmp_path)
    g2 = persist.load_store(tmp_path, mmap_vectors=True).get("wfirst")
    # Overwrite an existing id + append, NO reads first.
    nv = rng.normal(size=(2, DIM)).astype(np.float32)
    g2.upsert([ids[7], "fresh"], nv,
              [Payload(data_type="original_images", class_name="x",
                       img_path="/data/seven.png"),
               Payload(data_type="original_images", class_name="x",
                       img_path="/data/fresh.png")])
    assert len(g2) == 1501
    np.testing.assert_allclose(g2.retrieve([ids[7]])[0].vector, nv[0])
    assert g2.get_by_path("/data/seven.png").id == ids[7]
    # The OLD path of the overwritten row no longer resolves to it.
    assert g2.get_by_path("/data/c1/img_7.png") is None
    # Delete as first op also works on a fresh lazy load.
    g3 = persist.load_store(tmp_path, mmap_vectors=True).get("wfirst")
    assert g3.delete(ids=[ids[3]]) == 1
    assert g3.retrieve([ids[3]]) == []


def test_delta_chain_over_binary_base(rng, tmp_path):
    store = VectorStore()
    g = store.create_collection("mix", dim=DIM)
    ids, vecs, pls = _mk(rng, 200)
    g.upsert(ids, vecs, pls)
    persist.save_store(store, tmp_path)  # format-3 base
    g.upsert(["extra"], rng.normal(size=(1, DIM)).astype(np.float32),
             [Payload(data_type="original_images", class_name="z",
                      img_path="/z.png")])
    g.delete(ids=[ids[5]])
    persist.save_store(store, tmp_path)  # v2-JSON delta over binary base
    assert (tmp_path / "mix.rbod.d1").exists()
    g2 = persist.load_store(tmp_path, mmap_vectors=True).get("mix")
    assert len(g2) == 200
    assert g2.retrieve(["extra"])[0].payload.class_name == "z"
    assert g2.retrieve([ids[5]]) == []
    # Clean reload + save is still a no-op (chain identity carried).
    base_m = (tmp_path / "mix.rbod").stat().st_mtime_ns
    store2 = VectorStore()
    store2._collections["mix"] = g2
    persist.save_store(store2, tmp_path)
    assert (tmp_path / "mix.rbod").stat().st_mtime_ns == base_m


def test_format2_snapshots_still_load(rng, tmp_path):
    """Round-3 (v2 JSON) snapshots remain loadable."""
    g = Gallery("old", dim=DIM)
    ids, vecs, pls = _mk(rng, 64)
    g.upsert(ids, vecs, pls)
    g.compact()
    meta = {
        "format": 2,
        "snapshot_id": "abc",
        "name": "old",
        "dim": DIM,
        "distance": "cosine",
        "ids": list(g._ids),
        "columns": g._payloads.export_columns(64),
    }
    native.snapshot_write(tmp_path / "old.rbod", g._vectors[:64],
                          json.dumps(meta).encode())
    (tmp_path / "manifest.json").write_text(
        json.dumps({"collections": ["old"]}))
    for mm in (False, True):
        g2 = persist.load_store(tmp_path, mmap_vectors=mm).get("old")
        assert g2._ids == ids
        assert g2.get_by_path("/data/c1/img_1.png").id == ids[1]
        np.testing.assert_allclose(g2.retrieve([ids[3]])[0].vector,
                                   vecs[3])


def test_empty_and_tiny_collections(rng, tmp_path):
    store = VectorStore()
    store.create_collection("empty", dim=DIM)
    g = store.create_collection("one", dim=DIM)
    g.upsert(["solo"], rng.normal(size=(1, DIM)).astype(np.float32),
             [Payload(data_type="original_images", class_name="s",
                      img_path="")])  # empty path stays out of the index
    s2 = _roundtrip(store, tmp_path, mmap_vectors=True)
    assert len(s2.get("empty")) == 0
    assert s2.get("empty").search(np.zeros(DIM, np.float32), k=3) == [[]]
    assert len(s2.get("one")) == 1
    assert s2.get("one").retrieve(["solo"])[0].payload.img_path == ""
    assert s2.get("one").get_by_path("") is None


def test_variable_width_ids(rng, tmp_path):
    store = VectorStore()
    g = store.create_collection("vw", dim=DIM)
    ids = ["a", "id-with-some-length", "x" * 200, "유니코드-아이디"]
    vecs = rng.normal(size=(4, DIM)).astype(np.float32)
    g.upsert(ids, vecs,
             [Payload(data_type="original_images", class_name="c",
                      img_path=f"/p{i}.png") for i in range(4)])
    g2 = _roundtrip(store, tmp_path).get("vw")
    assert g2._ids == ids
    for i, pid in enumerate(ids):
        np.testing.assert_allclose(g2.retrieve([pid])[0].vector, vecs[i])

def _sem_state(g):
    """Semantic content: id -> (vector, payload) for every live point."""
    out = {}
    for r in g.scroll_all(None, with_vectors=True):
        out[r.id] = (np.asarray(r.vector).round(5).tobytes(), r.payload)
    return out


def test_row_indexed_delta_replays_lazily(rng, tmp_path):
    """A row-bearing delta chain (overwrite + append + delete +
    delete-then-readd) replays WITHOUT materialising the id map, id
    list, or path index — and reproduces the live gallery exactly."""
    store = VectorStore()
    g = store.create_collection("rowd", dim=DIM)
    ids, vecs, pls = _mk(rng, 2000)
    g.upsert(ids, vecs, pls)
    persist.save_store(store, tmp_path)  # base

    # churn: overwrite, append, plain delete, delete-then-readd
    nv = rng.normal(size=(4, DIM)).astype(np.float32)
    g.upsert([ids[17]], nv[:1],
             [Payload(data_type="original_images", class_name="over",
                      img_path="/new/seventeen.png")])
    g.upsert(["appended"], nv[1:2],
             [Payload(data_type="original_images", class_name="app",
                      img_path="/new/appended.png")])
    g.delete(ids=[ids[99]])
    g.delete(ids=[ids[42]])
    g.upsert([ids[42]], nv[2:3],
             [Payload(data_type="original_images", class_name="readd",
                      img_path="/new/fortytwo.png")])
    persist.save_store(store, tmp_path)  # delta 1 (row-indexed)
    meta = json.loads(native.snapshot_read(
        tmp_path / "rowd.rbod.d1")[1].decode())
    assert meta.get("rows") is not None and meta.get("dead_rows")

    # second delta in the chain: another overwrite
    g.upsert([ids[3]], nv[3:4],
             [Payload(data_type="original_images", class_name="late",
                      img_path="/new/three.png")])
    persist.save_store(store, tmp_path)  # delta 2

    g2 = persist.load_store(tmp_path, mmap_vectors=True).get("rowd")
    # Replay itself must not have materialised the lazy structures.
    assert g2._ids_list is None and g2._id_map is None
    assert g2._payloads._paths_lazy is not None
    # Read-only lookups through the sorted probe, against replayed
    # state: the re-added id has TWO table entries (tombstoned old row
    # + appended row) and must resolve to the alive one; deleted ids
    # resolve to nothing; appended ids are probe-visible. All without
    # building the id dict.
    assert g2.retrieve([ids[42]])[0].payload.class_name == "readd"
    assert g2.retrieve([ids[99]]) == []
    assert g2.retrieve(["appended"])[0].payload.class_name == "app"
    assert g2.retrieve([ids[17]])[0].payload.img_path == \
        "/new/seventeen.png"
    assert g2._id_map is None and g2._payloads._paths_lazy is not None
    # Full semantic parity with the live gallery (incl. row layout).
    assert len(g2) == len(g)
    assert _sem_state(g2) == _sem_state(g)
    assert g2._nrows == g._nrows            # identical physical layout
    assert list(g2._alive[:g2._nrows]) == list(g._alive[:g._nrows])
    # Path index correctness through the overlay.
    assert g2.get_by_path("/new/fortytwo.png").id == ids[42]
    assert g2.get_by_path(f"/data/c0/img_99.png") is None  # deleted
    assert g2.get_by_path(f"/data/c2/img_17.png") is None  # overwritten
    q = nv[2]
    assert g2.search(q, k=1)[0][0].id == ids[42]


def test_compaction_downgrades_delta_chain_to_id_keyed(rng, tmp_path):
    """Compaction renumbers rows, so deltas saved after it must NOT
    carry row indices — and the id-keyed replay still lands right."""
    store = VectorStore()
    g = store.create_collection("comp", dim=DIM)
    ids, vecs, pls = _mk(rng, 300)
    g.upsert(ids, vecs, pls)
    persist.save_store(store, tmp_path)
    g.delete(ids=ids[:5])
    g.maintain(force=True)              # compacts -> rows shift
    nv = rng.normal(size=(1, DIM)).astype(np.float32)
    g.upsert([ids[200]], nv,
             [Payload(data_type="original_images", class_name="after",
                      img_path="/after.png")])
    persist.save_store(store, tmp_path)
    meta = json.loads(native.snapshot_read(
        tmp_path / "comp.rbod.d1")[1].decode())
    assert meta.get("rows") is None     # downgraded
    g2 = persist.load_store(tmp_path, mmap_vectors=True).get("comp")
    assert len(g2) == 295
    assert g2.retrieve([ids[200]])[0].payload.class_name == "after"
    assert g2.retrieve([ids[0]]) == []


def test_id_keyed_delta_poisons_rest_of_chain(rng, tmp_path, monkeypatch):
    """Once one delta replays by id, later row-indexed deltas must too
    (the id-keyed path may lay re-added points out differently)."""
    from retrieval_based_object_detection_tpu.gallery import (
        persist as P,
    )

    store = VectorStore()
    g = store.create_collection("mixchain", dim=DIM)
    ids, vecs, pls = _mk(rng, 500)
    g.upsert(ids, vecs, pls)
    persist.save_store(store, tmp_path)
    # delta 1 WITHOUT rows (simulate an old writer)
    g._snap_rows_valid = False
    nv = rng.normal(size=(2, DIM)).astype(np.float32)
    g.delete(ids=[ids[10]])
    g.upsert([ids[10]], nv[:1],
             [Payload(data_type="original_images", class_name="readd",
                      img_path="/re.png")])
    persist.save_store(store, tmp_path)
    # delta 2 WITH rows (new writer again)
    g._snap_rows_valid = True
    g._snap_dead_rows.clear()
    g.upsert([ids[20]], nv[1:],
             [Payload(data_type="original_images", class_name="later",
                      img_path="/later.png")])
    persist.save_store(store, tmp_path)
    meta2 = json.loads(native.snapshot_read(
        tmp_path / "mixchain.rbod.d2")[1].decode())
    assert meta2.get("rows") is not None

    calls = []
    real = P._replay_delta_fast
    monkeypatch.setattr(P, "_replay_delta_fast",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    g2 = persist.load_store(tmp_path, mmap_vectors=True).get("mixchain")
    assert calls == []                  # chain never re-entered fast mode
    assert g2.retrieve([ids[10]])[0].payload.class_name == "readd"
    assert g2.retrieve([ids[20]])[0].payload.class_name == "later"
    assert len(g2) == 500

def test_fast_replay_rearms_deferred_compaction(rng, tmp_path,
                                                monkeypatch):
    """Row-indexed replay must re-evaluate the dead-row threshold like
    the id-keyed path (which routes through g.delete): a maintain()
    window scheduled after a restart must reclaim tombstone space
    accrued before it (review finding)."""
    monkeypatch.setattr(Gallery, "_COMPACT_DEAD_MIN", 64)
    monkeypatch.setattr(Gallery, "_COMPACT_INLINE_MAX_ROWS", 1)  # defer
    store = VectorStore()
    g = store.create_collection("rearm", dim=DIM)
    ids, vecs, pls = _mk(rng, 4000)
    g.upsert(ids, vecs, pls)
    persist.save_store(store, tmp_path)
    # Tombstones accrue across TWO delta saves (each under the 25%
    # delta-churn ceiling; together past the 25% dead-row threshold).
    assert g.delete(ids=ids[:600]) == 600
    persist.save_store(store, tmp_path)       # row-indexed delta 1
    assert g.delete(ids=ids[600:1200]) == 600
    assert g._compact_due                     # live writer is armed
    persist.save_store(store, tmp_path)       # row-indexed delta 2
    g2 = persist.load_store(tmp_path, mmap_vectors=True).get("rearm")
    assert g2._ids_list is None               # fast replay ran
    assert g2._n_dead == 1200 and g2._compact_due
    assert g2.maintain() == 1200              # non-force window reclaims
    assert len(g2) == 2800


def test_direct_save_gallery_refreshes_manifest_count(rng, tmp_path):
    """A delta written via save_gallery DIRECTLY (not save_store) must
    keep list_snapshots' live count fresh — the manifest carries counts
    precisely because delta saves leave the base header stale
    (ADVICE r4)."""
    store = VectorStore()
    g = store.create_collection("mc", dim=DIM)
    ids, vecs, pls = _mk(rng, 100)
    g.upsert(ids, vecs, pls)
    persist.save_store(store, tmp_path)  # base + manifest at count 100
    ids2, vecs2, pls2 = _mk(rng, 7, start=100)
    g.upsert(ids2, vecs2, pls2)
    persist.save_gallery(g, tmp_path)  # delta, bypassing save_store
    assert dict(persist.list_snapshots(tmp_path))["mc"] == 107
