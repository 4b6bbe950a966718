"""Multi-device tests on the 8-way virtual CPU mesh: sharded gallery
top-k exactness and the dp x tp train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retrieval_based_object_detection_tpu.gallery import search as search_lib
from retrieval_based_object_detection_tpu.gallery.sharded import (
    ShardedGallerySearcher,
    build_sharded,
    sharded_topk,
)
from retrieval_based_object_detection_tpu.models.clip.model import CLIPVisionConfig
from retrieval_based_object_detection_tpu.parallel.mesh import gallery_mesh, make_mesh
from retrieval_based_object_detection_tpu.train import train as T

TINY = CLIPVisionConfig(image_size=32, patch_size=16, width=64, layers=2,
                        heads=1, embed_dim=32)


def test_make_mesh_axes():
    mesh = make_mesh({"dp": 2, "tp": 4})
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh({"dp": 3})


def test_sharded_topk_matches_single_device(rng):
    mesh = gallery_mesh(8)
    n, d, q, k = 1000, 64, 7, 10
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    mask = rng.random(n) < 0.8
    queries = rng.normal(size=(q, d)).astype(np.float32)

    # Single-device reference path.
    padded = search_lib.pad_rows(n)
    buf = np.zeros((padded, d), np.float32)
    buf[:n] = vectors
    mbuf = np.zeros(padded, bool)
    mbuf[:n] = mask
    ref_s, ref_i = search_lib.masked_cosine_topk(
        jnp.asarray(queries), jnp.asarray(buf), jnp.asarray(mbuf), k=k)

    searcher = ShardedGallerySearcher(vectors, mask, mesh)
    got_s, got_i = searcher.search(queries, k=k)

    np.testing.assert_allclose(got_s, np.asarray(ref_s), atol=1e-5)
    # Indices: sharded padding changes global row numbering of padded rows,
    # but all real top-k rows must be identical.
    ref_rows = np.asarray(ref_i)
    np.testing.assert_array_equal(got_i, ref_rows)


def test_sharded_topk_respects_mask(rng):
    mesh = gallery_mesh(8)
    n, d = 256, 32
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    # Only rows 100..110 allowed.
    mask = np.zeros(n, bool)
    mask[100:110] = True
    searcher = ShardedGallerySearcher(vectors, mask, mesh)
    scores, idx = searcher.search(vectors[105], k=5)
    assert idx[0, 0] == 105
    assert scores[0, 0] > 0.999
    assert all(100 <= i < 110 for i in idx[0])


def test_sharded_gallery_from_gallery(rng):
    from retrieval_based_object_detection_tpu.gallery import Filter, Payload
    from retrieval_based_object_detection_tpu.gallery.store import Gallery

    g = Gallery("t", dim=16)
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    g.upsert(
        [f"p{i}" for i in range(40)], vecs,
        [Payload(data_type="original_images",
                 class_name="a" if i < 20 else "b") for i in range(40)],
    )
    mesh = gallery_mesh(8)
    s = ShardedGallerySearcher.from_gallery(
        g, mesh, Filter(must={"class_name": "b"}))
    scores, idx = s.search(vecs[5], k=3)
    assert all(i >= 20 for i in idx[0])  # class a (rows < 20) masked out


def test_train_step_dp_tp(rng):
    mesh = make_mesh({"dp": 2, "tp": 4})
    cfg = T.TrainConfig(num_classes=5, compute_dtype="float32", remat=True)
    params, opt_state = T.init_state(TINY, cfg, seed=0)
    params, opt_state = T.place(params, opt_state, mesh)
    step = T.make_train_step(TINY, cfg, mesh)

    images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 5, size=(8,)).astype(np.int32)
    p1, o1, m1 = step(params, opt_state, images, labels)
    p2, o2, m2 = step(p1, o1, images, labels)
    assert np.isfinite(float(m1["loss"]))
    # Same batch twice: loss must decrease (it's actually learning).
    assert float(m2["loss"]) < float(m1["loss"])
    # Params follow the tp sharding (w_fc output dim split over tp=4).
    w_fc = p1["tower"]["blocks"]["w_fc"]
    assert w_fc.sharding.spec == jax.sharding.PartitionSpec(None, None, "tp")
    # AdamW moments take the SAME tp layout — replicating them would
    # re-spend the HBM the tower sharding saves (place() contract).
    import optax

    adam = next(s for s in o1 if isinstance(s, optax.ScaleByAdamState))
    mu_fc = adam.mu["tower"]["blocks"]["w_fc"]
    assert mu_fc.sharding.spec == jax.sharding.PartitionSpec(
        None, None, "tp")


def test_train_step_dp_only(rng):
    mesh = make_mesh({"dp": 8})
    cfg = T.TrainConfig(num_classes=3, compute_dtype="float32", remat=False)
    params, opt_state = T.init_state(TINY, cfg, seed=1)
    params, opt_state = T.place(params, opt_state, mesh)
    step = T.make_train_step(TINY, cfg, mesh)
    images = rng.normal(size=(16, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(16,)).astype(np.int32)
    _, _, metrics = step(params, opt_state, images, labels)
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_int8_matches_exact(rng):
    """Per-shard tiled int8 Pallas scan (interpret off-TPU) + f32 rescore
    + all_gather merge equals the exact sharded path."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("gallery",))
    n, d = 700, 64
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[::11] = False
    q = rng.normal(size=(3, d)).astype(np.float32)

    s = ShardedGallerySearcher(vectors, mask, mesh)
    ex_s, ex_i = s.search(q, k=5, method="exact")
    i8_s, i8_i = s.search(q, k=5, method="int8")
    np.testing.assert_allclose(i8_s, ex_s, atol=1e-5)
    assert (i8_i == ex_i).mean() > 0.9  # ties may permute


def test_sharded_extra_mask(rng):
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("gallery",))
    n, d = 300, 32
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    s = ShardedGallerySearcher(vectors, np.ones(n, bool), mesh)
    q = vectors[5][None]
    # Exclude the true nearest row via a per-query mask.
    extra = np.ones(n, bool)
    extra[5] = False
    _, idx = s.search(q, k=1)
    assert idx[0, 0] == 5
    _, idx2 = s.search(q, k=1, extra_mask=extra)
    assert idx2[0, 0] != 5


def test_sharded_int4_matches_exact(rng):
    """Per-shard int4 Pallas scan (interpret off-TPU) + f32 rescore
    + all_gather merge equals the exact sharded path."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("gallery",))
    n, d = 700, 64
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[::11] = False
    q = rng.normal(size=(3, d)).astype(np.float32)

    s = ShardedGallerySearcher(vectors, mask, mesh)
    ex_s, ex_i = s.search(q, k=5, method="exact")
    i4_s, i4_i = s.search(q, k=5, method="int4")
    np.testing.assert_allclose(i4_s, ex_s, atol=1e-5)
    assert (i4_i == ex_i).mean() > 0.9  # ties may permute


def test_sharded_capacity_mode(rng):
    """Pod-scale capacity mode: bf16 per-shard rescore mirror + int4
    planes; auto-routes to int4, matches the full-precision sharded
    searcher's top-k within bf16 drift, and refuses method='exact'."""
    import jax
    import pytest
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("gallery",))
    n, d = 700, 64
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    mask = np.ones(n, bool)
    q = rng.normal(size=(3, d)).astype(np.float32)

    full = ShardedGallerySearcher(vectors, mask, mesh)
    cap = ShardedGallerySearcher(vectors, mask, mesh, capacity=True)
    assert cap.dev_vectors.dtype == jnp.bfloat16
    ex_s, ex_i = full.search(q, k=5, method="exact")
    c_s, c_i = cap.search(q, k=5)  # auto int4
    assert (c_i == ex_i).mean() > 0.85  # int4 margin + bf16 ties
    np.testing.assert_allclose(c_s, ex_s, atol=2e-2)
    with pytest.raises(ValueError, match="capacity mode"):
        cap.search(q, k=5, method="exact")
    # int8 tier also runs off the bf16 mirror.
    i8_s, i8_i = cap.search(q, k=5, method="int8")
    assert (i8_i == ex_i).mean() > 0.85


def test_sharded_writable_upsert_matches_rebuild(rng):
    """Incremental sharded writes: patch == fresh build, for overwrite
    AND append, across all built mirrors (the pod-scale sibling of the
    writable CapacitySearcher)."""
    mesh = gallery_mesh()
    n, d = 700, 64
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    s = ShardedGallerySearcher(vectors, np.ones(n, bool), mesh)
    s.search(vectors[:2], k=3)  # exact tier warm

    new = rng.normal(size=(37, d)).astype(np.float32)
    s.upsert_rows(100, new)           # overwrite, partial tiles
    extra = rng.normal(size=(5, d)).astype(np.float32)
    s.upsert_rows(s.n_rows, extra)    # append into the padded tail
    assert s.n_rows == n + 5

    vec2 = vectors.copy()
    vec2[100:137] = new
    ref = ShardedGallerySearcher(np.concatenate([vec2, extra]),
                                 np.ones(n + 5, bool), mesh)
    q = rng.normal(size=(4, d)).astype(np.float32)
    ss, si = s.search(q, k=7)
    rs, ri = ref.search(q, k=7)
    np.testing.assert_array_equal(si, ri)
    np.testing.assert_allclose(ss, rs, atol=1e-5)
    # The appended rows are findable by their own vectors.
    _, idx = s.search(extra[2], k=1)
    assert idx[0, 0] == n + 2

    # Tombstone via the sharded mask.
    assert s.delete_rows([100]) == 1
    assert s.delete_rows([100]) == 0
    _, idx = s.search(new[0], k=1)
    assert idx[0, 0] != 100


def test_sharded_writable_capacity_mode(rng):
    mesh = gallery_mesh()
    n, d = 600, 64
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    s = ShardedGallerySearcher(vectors, np.ones(n, bool), mesh,
                               capacity=True)
    new = rng.normal(size=(8, d)).astype(np.float32)
    s.upsert_rows(50, new)
    ref_vec = vectors.copy()
    ref_vec[50:58] = new
    ref = ShardedGallerySearcher(ref_vec, np.ones(n, bool), mesh,
                                 capacity=True)
    q = rng.normal(size=(3, d)).astype(np.float32)
    ss, si = s.search(q, k=5, method="int4")
    rs, ri = ref.search(q, k=5, method="int4")
    # int4 codes of patched rows derive from f32 staging vs the fresh
    # build's bf16 mirror (±1 code), and random near-tie data makes
    # deep int4 ranks order-sensitive — so compare SCORES, not deep
    # index sets (the functional margin probe below pins correctness).
    np.testing.assert_allclose(np.sort(ss, axis=1), np.sort(rs, axis=1),
                               atol=2e-2)
    _, idx = s.search(new[3], k=1, method="int4")
    assert idx[0, 0] == 53


def test_sharded_ids_of(rng):
    from retrieval_based_object_detection_tpu.gallery.schema import Payload
    from retrieval_based_object_detection_tpu.gallery.store import Gallery

    mesh = gallery_mesh(8)
    g = Gallery("sid", dim=32)
    n = 120
    vecs = rng.normal(size=(n, 32)).astype(np.float32)
    g.upsert([f"p{i}" for i in range(n)], vecs,
             [Payload(data_type="original_images", class_name="c",
                      img_path=f"/{i}.png") for i in range(n)])
    s = ShardedGallerySearcher.from_gallery(g, mesh)
    _, idx = s.search(vecs[11], k=1)
    assert s.ids_of(idx)[0][0] == "p11"
    with pytest.raises(ValueError, match="ids"):
        ShardedGallerySearcher(vecs, np.ones(n, bool), mesh).ids_of(idx)


def test_sharded_write_preserves_neighbor_mask_state(rng):
    """Edge-tile writes must not revive tombstoned neighbours or mark
    padded rows live (review finding: the mask was overwritten for the
    WHOLE tile, not just the written rows)."""
    mesh = gallery_mesh(8)
    n, d = 700, 64
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    s = ShardedGallerySearcher(vectors, np.ones(n, bool), mesh)
    assert s.delete_rows([3]) == 1
    # Edge-tile write in the SAME tile as the tombstone.
    s.upsert_rows(100, rng.normal(size=(1, d)).astype(np.float32))
    _, idx = s.search(vectors[3], k=1)
    assert idx[0, 0] != 3  # still tombstoned
    # Append 1 row: padded rows after it must stay masked out.
    extra = rng.normal(size=(1, d)).astype(np.float32)
    s.upsert_rows(s.n_rows, extra)
    total = s.dev_vectors.shape[0]
    q = np.zeros(d, np.float32)
    q[0] = 1e-3  # near-zero query: padded zero rows would score ~0,
    # beating genuinely-negative rows if their mask leaked to True
    _, idx = s.search(q, k=10)
    assert (np.asarray(idx)[0] < s.n_rows).all(), (idx, s.n_rows, total)
