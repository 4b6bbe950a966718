"""Capacity-mode searcher: chunked build correctness, parity with the
store's int4 tier (within bf16 rescore drift), filters, edge shapes."""

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.gallery import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.capacity import (
    CapacitySearcher,
)
from retrieval_based_object_detection_tpu.gallery.store import Gallery

DIM = 64


def _vectors(rng, n):
    return rng.normal(size=(n, DIM)).astype(np.float32)


def test_capacity_matches_exact_topk(rng):
    n = 1500
    vecs = _vectors(rng, n)
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=512)
    q = vecs[42] + rng.normal(size=DIM).astype(np.float32) * 0.01
    scores, idx = s.search(q, k=5)
    # Exact reference on host.
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    exact = np.argsort(-vn @ qn)[:5]
    assert idx[0, 0] == exact[0] == 42
    assert set(idx[0]) == set(exact)
    np.testing.assert_allclose(scores[0], np.sort(vn @ qn)[::-1][:5],
                               atol=2e-2)


def test_chunked_build_equals_single_chunk(rng):
    """Rows must land at the same offsets whatever the chunk size."""
    n = 700  # not a multiple of any chunk
    vecs = _vectors(rng, n)
    a = CapacitySearcher(vecs, np.ones(n, bool), chunk=256)
    b = CapacitySearcher(vecs, np.ones(n, bool), chunk=1 << 18)
    np.testing.assert_array_equal(np.asarray(a.dev_packed)[:n],
                                  np.asarray(b.dev_packed)[:n])
    np.testing.assert_allclose(np.asarray(a.dev_scales)[:n],
                               np.asarray(b.dev_scales)[:n], rtol=1e-6)
    q = _vectors(rng, 3)
    sa, ia = a.search(q, k=7)
    sb, ib = b.search(q, k=7)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, atol=1e-6)


def test_padding_rows_never_win(rng):
    n = 300  # padded to 512; padding rows are zero (score 0 > -inf only)
    vecs = _vectors(rng, n)
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=512)
    q = _vectors(rng, 2)
    _, idx = s.search(q, k=10)
    assert (idx < n).all()


def test_from_gallery_with_filter(rng):
    g = Gallery("t", dim=DIM)
    vecs = _vectors(rng, 200)
    g.upsert([f"id{i}" for i in range(200)], vecs,
             [Payload(data_type="original_images",
                      class_name="a" if i < 100 else "b",
                      img_path=f"/{i}.png") for i in range(200)])
    s = CapacitySearcher.from_gallery(
        g, flt=Filter(must={"class_name": "b"}), chunk=256)
    q = vecs[10]  # class "a" — its own row is masked out
    _, idx = s.search(q, k=5)
    assert (idx >= 100).all()


def test_extra_mask(rng):
    n = 400
    vecs = _vectors(rng, n)
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=256)
    q = vecs[7]
    _, idx = s.search(q, k=1)
    assert idx[0, 0] == 7
    extra = np.ones(n, bool)
    extra[7] = False
    _, idx2 = s.search(q, k=1, extra_mask=extra)
    assert idx2[0, 0] != 7


def test_rejects_odd_dim_and_noncosine(rng):
    with pytest.raises(ValueError, match="even dim"):
        CapacitySearcher(rng.normal(size=(10, 33)).astype(np.float32),
                         np.ones(10, bool))
    g = Gallery("d", dim=DIM, distance="dot")
    with pytest.raises(ValueError, match="cosine"):
        CapacitySearcher.from_gallery(g)


def test_ids_of(rng):
    g = Gallery("t", dim=DIM)
    vecs = _vectors(rng, 50)
    g.upsert([f"pt{i}" for i in range(50)], vecs,
             [Payload(data_type="original_images", class_name="c",
                      img_path=f"/{i}.png") for i in range(50)])
    s = CapacitySearcher.from_gallery(g, chunk=256)
    _, idx = s.search(vecs[7], k=1)
    assert s.ids_of(idx) == [["pt7"]]
    raw = CapacitySearcher(vecs, np.ones(50, bool), chunk=256)
    import pytest

    with pytest.raises(ValueError, match="ids"):
        raw.ids_of(idx)


def test_upsert_rows_overwrite_matches_rebuild(rng):
    """Incremental tile patch == full rebuild, for full-tile AND
    partial-edge-tile writes (VERDICT r2 weak #3: writable capacity).

    Compared at the PLANE level (deterministic) rather than by deep
    top-k ranks: random near-tie data makes int4 rank order sensitive
    to reduction order, and edge-tile requantisation may shift codes
    by bf16 rounding (±1)."""
    n = 1200
    vecs = _vectors(rng, n)
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=512)
    # Partial edge write (crosses no tile boundary cleanly).
    new = _vectors(rng, 37)
    s.upsert_rows(100, new)
    vecs2 = vecs.copy()
    vecs2[100:137] = new
    ref = CapacitySearcher(vecs2, np.ones(n, bool), chunk=512)
    np.testing.assert_array_equal(np.asarray(s.dev_bf16)[:n],
                                  np.asarray(ref.dev_bf16)[:n])
    dp = (np.asarray(s.dev_packed)[:n].astype(np.int32)
          - np.asarray(ref.dev_packed)[:n].astype(np.int32))
    assert np.abs(dp).max() <= 17, np.abs(dp).max()  # ±1 per nibble
    np.testing.assert_allclose(np.asarray(s.dev_scales)[:n],
                               np.asarray(ref.dev_scales)[:n], rtol=1e-2)
    # Functional probe with a real margin: a patched row finds itself.
    _, idx = s.search(new[5], k=1)
    assert idx[0, 0] == 105
    _, idx = s.search(vecs[500], k=1)  # untouched row unaffected
    assert idx[0, 0] == 500


def test_upsert_rows_append_with_headroom(rng):
    n = 500
    vecs = _vectors(rng, n)
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=256, headroom=300)
    assert s.capacity_left() >= 300
    extra = _vectors(rng, 60)
    s.upsert_rows(n, extra)
    assert s.n_rows == n + 60
    q = extra[7]
    scores, idx = s.search(q, k=1)
    assert idx[0, 0] == n + 7
    # Beyond capacity raises cleanly.
    with pytest.raises(ValueError, match="exceeds capacity"):
        s.upsert_rows(s.n_rows, _vectors(rng, s.capacity_left() + 1))
    # Non-contiguous append start rejected.
    with pytest.raises(ValueError, match="contiguous"):
        s.upsert_rows(s.n_rows + 5, _vectors(rng, 1))


def test_id_keyed_upsert_and_delete(rng):
    g = Gallery("capw", dim=DIM)
    n = 400
    vecs = _vectors(rng, n)
    g.upsert([f"p{i}" for i in range(n)], vecs,
             [Payload(data_type="original_images", class_name="c",
                      img_path=f"/c/{i}.png") for i in range(n)])
    s = CapacitySearcher.from_gallery(g, headroom=100)
    # Overwrite p10 + append two new ids in one batch.
    batch = _vectors(rng, 3)
    assert s.upsert(["p10", "new_a", "new_b"], batch) == 3
    assert s.n_rows == n + 2
    for vec, expect in zip(batch, ["p10", "new_a", "new_b"]):
        _, idx = s.search(vec, k=1)
        assert s.ids_of(idx)[0][0] == expect
    # Delete tombstones via the mask; planes untouched.
    planes = s.dev_packed
    assert s.delete(["p10"]) == 1
    assert s.dev_packed is planes
    _, idx = s.search(batch[0], k=1)
    assert s.ids_of(idx)[0][0] != "p10"
    assert s.delete(["p10"]) == 0  # idempotent


def test_scattered_id_upsert_groups_runs(rng):
    n = 600
    vecs = _vectors(rng, n)
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=256,
                         ids=[f"p{i}" for i in range(n)])
    rows = [3, 4, 5, 250, 251, 580]
    new = _vectors(rng, len(rows))
    calls = []
    orig = s.upsert_rows
    s.upsert_rows = lambda st, v: (calls.append((st, len(v))),
                                   orig(st, v))[1]
    s.upsert([f"p{r}" for r in rows], new)
    assert calls == [(3, 3), (250, 2), (580, 1)]
    for vec, r in zip(new, rows):
        _, idx = s.search(vec, k=1)
        assert idx[0, 0] == r


def test_upsert_overflow_leaves_id_map_clean(rng):
    """A capacity-overflow upsert must raise BEFORE registering ids —
    phantom mappings made later appends collide on the same row
    (review finding)."""
    n = 256
    s = CapacitySearcher(_vectors(rng, n), np.ones(n, bool), chunk=256,
                         ids=[f"p{i}" for i in range(n)])
    left = s.capacity_left()
    with pytest.raises(ValueError, match="exceed capacity"):
        s.upsert([f"x{i}" for i in range(left + 3)],
                 _vectors(rng, left + 3))
    assert len(s.ids) == n and s.n_rows == n  # nothing registered
    if left:
        v = _vectors(rng, 1)
        s.upsert(["q0"], v)
        _, idx = s.search(v[0], k=1)
        assert s.ids_of(idx)[0][0] == "q0"


def test_from_device_planes_pads_short_mask(rng):
    import jax.numpy as jnp

    n, pad, d = 300, 512, DIM
    base = CapacitySearcher(_vectors(rng, n), np.ones(n, bool), chunk=512)
    assert base._padded == pad
    view = CapacitySearcher.from_device_planes(
        base.dev_bf16, base.dev_packed, base.dev_scales,
        np.ones(n, bool), n)  # rows-length mask, padded planes
    assert view.dev_mask.shape == (pad,)
    q = _vectors(rng, 2)
    sa, ia = base.search(q, k=5)
    sb, ib = view.search(q, k=5)
    np.testing.assert_array_equal(ia, ib)


def test_batched_delete_single_tile_pass(rng):
    n = 600
    vecs = _vectors(rng, n)
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=256,
                         ids=[f"p{i}" for i in range(n)])
    vdel = [f"p{i}" for i in range(0, 60, 2)]
    assert s.delete(vdel) == 30
    assert s.delete(vdel) == 0  # idempotent
    # A deleted point's own vector no longer finds it; a live one does.
    _, idx = s.search(vecs[2], k=1)
    assert s.ids_of(idx)[0][0] != "p2"
    _, idx = s.search(vecs[3], k=1)
    assert s.ids_of(idx)[0][0] == "p3"


def test_from_device_planes_rejects_unaligned_rows(rng):
    """Plane row counts that no tile divides must raise, not silently
    misplace edge-tile writes (dynamic_update_slice clamps out-of-range
    starts — ADVICE r3, confirmed corrupting a different row)."""
    import jax.numpy as jnp

    with pytest.raises(ValueError, match="multiple of 256"):
        CapacitySearcher.from_device_planes(
            jnp.zeros((300, DIM), jnp.bfloat16),
            jnp.zeros((300, DIM // 2), jnp.int8),
            jnp.zeros(300, jnp.float32),
            np.ones(300, bool), 300)


def test_midloop_write_failure_leaves_usable_view(rng, monkeypatch):
    """_fill_chunk donates the old buffers; a failure partway through a
    multi-tile write must leave self.dev_* on the LIVE buffers (ADVICE
    r3: the old code assigned only after the loop, so the view was
    bricked by any mid-loop error)."""
    from retrieval_based_object_detection_tpu.gallery import capacity

    n = 600
    vecs = _vectors(rng, n)
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=256)
    real = capacity._fill_chunk
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated device OOM")
        return real(*a, **kw)

    monkeypatch.setattr(capacity, "_fill_chunk", flaky)
    new = _vectors(rng, 520)  # spans >2 tiles at tile=256
    with pytest.raises(RuntimeError, match="simulated"):
        s.upsert_rows(0, new)
    monkeypatch.setattr(capacity, "_fill_chunk", real)
    # The view must still answer queries (buffers are live, consistent).
    q = _vectors(rng, 2)
    scores, idx = s.search(q, k=5)
    assert np.isfinite(scores).all()
    # And a retried write completes.
    s.upsert_rows(0, new)
    _, idx = s.search(new[10], k=1)
    assert idx[0, 0] == 10


def test_staged_transfers_never_alias_host_memory(rng):
    """On CPU, jnp.asarray zero-copy ALIASES aligned NumPy buffers — a
    later in-place host write corrupts the device value (root cause of
    a nondeterministic wrong row in the chunked build: the reused
    staging buffer raced still-pending _fill_chunk dispatches; seen as
    an exact-rank-1338 row inside a top-5). search_lib.staged must
    copy-guard the transfer."""
    from retrieval_based_object_detection_tpu.gallery import (
        search as search_lib,
    )

    buf = np.full((256, DIM), 1.0, np.float32)
    dev = search_lib.staged(buf)
    buf[:] = 2.0  # caller reuses its staging buffer
    np.testing.assert_array_equal(np.asarray(dev), 1.0)


def test_build_immune_to_caller_buffer_reuse(rng):
    """End-to-end: mutating the source vectors right after the chunked
    build (while fills may still be pending) must not change what the
    view serves — the staging path copies before handing to JAX."""
    n = 1500
    vecs = _vectors(rng, n)
    want = vecs.copy()
    s = CapacitySearcher(vecs, np.ones(n, bool), chunk=512)
    vecs[:] = 0.0  # caller reclaims its buffer immediately
    vn = want / np.linalg.norm(want, axis=1, keepdims=True)
    got = np.asarray(s.dev_bf16)[:n].astype(np.float32)
    np.testing.assert_allclose(got, vn, atol=1e-2)


def test_ids_of_out_of_range_rows_map_to_none(rng):
    """Rows past the id list (row-keyed appends, approx_max_k padding
    next to -inf sentinels) map to None — parity with the sharded
    twin's ids_of, which documents this as shared behaviour."""
    g = Gallery("t", dim=DIM)
    vecs = _vectors(rng, 20)
    g.upsert([f"pt{i}" for i in range(20)], vecs,
             [Payload(data_type="original_images", class_name="c",
                      img_path=f"/{i}.png") for i in range(20)])
    s = CapacitySearcher.from_gallery(g, chunk=256, headroom=256)
    s.upsert_rows(20, _vectors(rng, 4))  # row-keyed append: no ids
    out = s.ids_of(np.array([[0, 21, 5000]]))
    assert out == [["pt0", None, None]]


def test_extra_mask_shorter_than_view_after_append(rng):
    """A host mask built BEFORE an append stays valid for the rows it
    covers; appended rows default to excluded (sharded-twin parity)
    instead of a broadcast ValueError."""
    vecs = _vectors(rng, 30)
    s = CapacitySearcher(vecs, np.ones(30, bool), chunk=256, headroom=256)
    pre_mask = np.zeros(30, bool)
    pre_mask[7] = True
    extra = _vectors(rng, 4)
    s.upsert_rows(30, extra)
    scores, idx = s.search(vecs[7], k=3, extra_mask=pre_mask)
    assert int(np.asarray(idx)[0, 0]) == 7
    # Only one row passes the mask: the rest are -inf sentinels.
    import math
    assert float(np.asarray(scores)[0, 1]) < -1e30 or math.isinf(
        float(np.asarray(scores)[0, 1]))
