"""C++ host runtime: build, filter kernel, snapshot format, fallbacks."""

import numpy as np
import pytest

from retrieval_based_object_detection_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of librbod_native.so failed"


def test_filter_mask_matches_numpy(rng):
    n = 10_000
    codes = rng.integers(0, 5, n).astype(np.int32)
    codes2 = rng.integers(0, 3, n).astype(np.int32)
    flags = (rng.random(n) < 0.5)
    got = native.filter_mask([codes, codes2], [2, 1], [flags], [True], n)
    ref = (codes == 2) & (codes2 == 1) & flags
    np.testing.assert_array_equal(got, ref)
    assert native._filter_mask_numpy(
        [codes, codes2], [2, 1], [flags], [True], n).tolist() == ref.tolist()


def test_filter_mask_no_predicates():
    got = native.filter_mask([], [], [], [], 5)
    np.testing.assert_array_equal(got, np.ones(5, bool))


def test_snapshot_roundtrip(tmp_path, rng):
    vectors = rng.normal(size=(100, 16)).astype(np.float32)
    blob = b'{"hello": "world"}'
    path = tmp_path / "g.rbod"
    native.snapshot_write(path, vectors, blob)
    v2, b2 = native.snapshot_read(path)
    np.testing.assert_array_equal(v2, vectors)
    assert b2 == blob


def test_snapshot_python_fallback_same_format(tmp_path, rng):
    """C++ and Python writers/readers must interoperate byte-for-byte."""
    vectors = rng.normal(size=(7, 4)).astype(np.float32)
    blob = b"metadata"
    p1 = tmp_path / "cc.rbod"
    p2 = tmp_path / "py.rbod"
    native.snapshot_write(p1, vectors, blob)
    native._snapshot_write_py(p2, vectors, blob)
    assert p1.read_bytes() == p2.read_bytes()
    v_a, b_a = native._snapshot_read_py(p1)
    np.testing.assert_array_equal(v_a, vectors)
    assert b_a == blob


def test_snapshot_empty_gallery(tmp_path):
    native.snapshot_write(tmp_path / "e.rbod", np.zeros((0, 8), np.float32),
                          b"{}")
    v, b = native.snapshot_read(tmp_path / "e.rbod")
    assert v.shape == (0, 8) and b == b"{}"


def test_snapshot_bad_file(tmp_path):
    bad = tmp_path / "bad.rbod"
    bad.write_bytes(b"garbage")
    # Corrupt BYTES raise the format error (so delta replay prunes);
    # a missing file stays OSError (environmental -> never prune).
    with pytest.raises(native.SnapshotFormatError):
        native.snapshot_read(bad)
    with pytest.raises(OSError):
        native.snapshot_read(tmp_path / "missing.rbod")


def test_gallery_persist_uses_rbod(tmp_path, rng):
    from retrieval_based_object_detection_tpu.gallery import Payload
    from retrieval_based_object_detection_tpu.gallery.persist import (
        load_store,
        save_store,
    )
    from retrieval_based_object_detection_tpu.gallery.store import VectorStore

    store = VectorStore()
    g = store.create_collection("c1", dim=8)
    g.upsert(["a"], rng.normal(size=(1, 8)).astype(np.float32),
             [Payload(data_type="original_images", class_name="x")])
    save_store(store, tmp_path)
    assert (tmp_path / "c1.rbod").exists()
    loaded = load_store(tmp_path)
    assert len(loaded.get("c1")) == 1
    # Rename drops the stale snapshot on next save.
    store.rename_collection("c1", "c2")
    save_store(store, tmp_path)
    assert not (tmp_path / "c1.rbod").exists()
    assert (tmp_path / "c2.rbod").exists()


def test_snapshot_truncated_body_is_format_error(tmp_path, rng):
    """A torn write (file shorter than its header promises) is bad
    BYTES -> SnapshotFormatError on BOTH backends, so delta replay
    prunes it; only errno failures (missing file, EIO) stay OSError.
    The native path used to collapse truncation and EIO into one rc."""
    p = tmp_path / "torn.rbod"
    vecs = rng.normal(size=(8, 4)).astype(np.float32)
    native.snapshot_write(p, vecs, b'{"k": 1}')
    whole = p.read_bytes()
    p.write_bytes(whole[: len(whole) - 7])  # tear the vector block
    with pytest.raises(native.SnapshotFormatError):
        native.snapshot_read(p)
    with pytest.raises(native.SnapshotFormatError):
        native._snapshot_read_py(p)
    # Tear inside the payload blob too.
    p.write_bytes(whole[: 32 + 4])
    with pytest.raises(native.SnapshotFormatError):
        native.snapshot_read(p)
    with pytest.raises(native.SnapshotFormatError):
        native._snapshot_read_py(p)
