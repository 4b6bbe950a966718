"""int4 packed scan tier: pack/unpack bit-exactness, kernel parity
(interpret mode) against the XLA oracle, and store-level exactness of
the full candidates+rescore path vs the f32 reference."""

import jax.numpy as jnp
import numpy as np

from retrieval_based_object_detection_tpu.gallery import Filter, Payload
from retrieval_based_object_detection_tpu.gallery import search as S
from retrieval_based_object_detection_tpu.gallery.store import Gallery
from retrieval_based_object_detection_tpu.ops.int4_scan import (
    int4_scan_scores,
)

DIM = 64


def _normed(rng, n, d=DIM):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _unpack_np(packed):
    """NumPy oracle for the nibble layout (b = 16*hi + lo + 8)."""
    p = packed.astype(np.int32)
    hi = p >> 4
    lo = (p & 15) - 8
    return np.concatenate([lo, hi], axis=1)


def test_pack_roundtrip_bits(rng):
    rows = _normed(rng, 100)
    packed, scales = S.pack_rows_int4(jnp.asarray(rows))
    packed, scales = np.asarray(packed), np.asarray(scales)
    assert packed.shape == (100, DIM // 2) and packed.dtype == np.int8
    # Unpacked values must equal direct per-row quantisation.
    s = np.maximum(np.abs(rows).max(axis=1, keepdims=True), 1e-12) / 7.0
    q = np.clip(np.round(rows / s), -8, 7).astype(np.int32)
    np.testing.assert_array_equal(_unpack_np(packed), q)
    np.testing.assert_allclose(scales, s[:, 0], rtol=1e-6)
    # Dequantisation error bounded by half a step per coordinate.
    deq = _unpack_np(packed) * scales[:, None]
    assert np.abs(deq - rows).max() <= (scales.max() / 2) * 1.001


def test_pack_handles_zero_rows(rng):
    rows = np.zeros((4, DIM), np.float32)
    packed, scales = S.pack_rows_int4(jnp.asarray(rows))
    assert (_unpack_np(np.asarray(packed)) == 0).all()
    assert np.asarray(scales).min() > 0


def test_kernel_interpret_matches_oracle(rng):
    """The float-unpack kernel (interpret mode) reproduces the int32
    shift oracle's scores bit-for-bit (both are exact integer math
    scaled by the same f32 per-row factor)."""
    n, q_n = 512, 4
    rows = _normed(rng, n)
    queries = rng.normal(size=(q_n, DIM)).astype(np.float32)
    packed, scales = S.pack_rows_int4(jnp.asarray(rows))
    qn = S.l2_normalize(jnp.asarray(queries))
    q_i8 = S.quantize_rows_int8(qn)
    mask = np.ones(n, bool)
    mask[::7] = False
    penalty = jnp.where(jnp.asarray(mask), 0.0, S.NEG_INF
                        ).astype(jnp.float32)

    kernel = np.asarray(int4_scan_scores(q_i8, packed, scales, penalty,
                                         interpret=True))
    ints = (np.asarray(q_i8, np.float32)
            @ _unpack_np(np.asarray(packed)).T.astype(np.float32))
    oracle = ints * np.asarray(scales)[None, :]
    oracle = np.where(mask[None, :], oracle, S.NEG_INF)
    np.testing.assert_array_equal(kernel, oracle.astype(np.float32))


def test_int4_scan_topk_interpret_matches_xla_tier(rng):
    n = 1024
    rows = _normed(rng, n)
    queries = rng.normal(size=(8, DIM)).astype(np.float32)
    packed, scales = S.pack_rows_int4(jnp.asarray(rows))
    mask = jnp.ones(n, bool)
    g32 = jnp.asarray(rows)
    s1, i1 = S.int4_scan_topk(jnp.asarray(queries), packed, scales, g32,
                              mask, k=10, rescore=64, interpret=True)
    s2, i2 = S.int4_cosine_topk(jnp.asarray(queries), packed, scales, g32,
                                mask, k=10, rescore=64)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def fill(g, n, rng, cls="c"):
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    g.upsert([f"{cls}{i}" for i in range(n)], vecs,
             [Payload(data_type="original_images", class_name=cls,
                      img_path=f"/{cls}/{i}.png") for i in range(n)])
    return vecs


def test_int4_matches_exact_topk(rng):
    g = Gallery("t", dim=DIM)
    fill(g, 2000, rng)
    queries = rng.normal(size=(8, DIM)).astype(np.float32)
    exact = g.search(queries, k=10, method="exact")
    fast = g.search(queries, k=10, method="int4")
    for e_hits, f_hits in zip(exact, fast):
        assert [h.id for h in e_hits] == [h.id for h in f_hits]
        for e, f in zip(e_hits, f_hits):
            assert abs(e.score - f.score) < 1e-4


def test_int4_respects_filter(rng):
    g = Gallery("t", dim=DIM)
    fill(g, 300, rng, cls="a")
    vb = fill(g, 300, rng, cls="b")
    hits = g.search(vb[0], k=5, method="int4",
                    flt=Filter(must={"class_name": "a"}))[0]
    assert all(h.payload.class_name == "a" for h in hits)


def test_int4_mirror_patches_after_write(rng):
    """A small write after the int4 mirror exists must be visible in the
    next int4 search (incremental patch, not a stale mirror)."""
    g = Gallery("t", dim=DIM)
    fill(g, 500, rng)
    probe = rng.normal(size=(DIM,)).astype(np.float32)
    g.search(probe, k=3, method="int4")  # builds the mirror
    target = rng.normal(size=(DIM,)).astype(np.float32)
    g.upsert(["hit"], target[None, :],
             [Payload(data_type="original_images", class_name="new",
                      img_path="/new/0.png")])
    hits = g.search(target, k=1, method="int4")[0]
    assert hits[0].id == "hit" and hits[0].score > 0.999


def test_int4_bf16_rescore_mirror(rng):
    """Capacity mode: rescoring against a bf16 mirror (the 10M-rows/chip
    configuration) returns the same top-k with ~1e-2 score drift."""
    n = 1024
    rows = _normed(rng, n)
    queries = rng.normal(size=(4, DIM)).astype(np.float32)
    packed, scales = S.pack_rows_int4(jnp.asarray(rows))
    mask = jnp.ones(n, bool)
    g32 = jnp.asarray(rows)
    s32, i32 = S.int4_scan_topk(jnp.asarray(queries), packed, scales,
                                g32, mask, k=5, rescore=64, interpret=True)
    s16, i16 = S.int4_scan_topk(jnp.asarray(queries), packed, scales,
                                g32.astype(jnp.bfloat16), mask, k=5,
                                rescore=64, interpret=True)
    assert (np.asarray(i32) == np.asarray(i16)).mean() > 0.9  # bf16 ties
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=2e-2)


def test_int4_rejects_odd_dim(rng):
    g = Gallery("odd", dim=33)
    vecs = rng.normal(size=(10, 33)).astype(np.float32)
    g.upsert([f"o{i}" for i in range(10)], vecs,
             [Payload(data_type="original_images", class_name="o",
                      img_path=f"/o/{i}.png") for i in range(10)])
    import pytest

    with pytest.raises(ValueError, match="even dim"):
        g.search(rng.normal(size=(33,)).astype(np.float32), method="int4")


# ---------------------------------------------------------------- property
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**32 - 1), st.sampled_from([1.0, 1e-8, 1e8]))
def test_pack_oracle_property(seed, scale_mag):
    """For ANY row distribution — adversarial dynamic range included —
    the packed bytes decode to the direct per-row quantisation and the
    XLA oracle reproduces exact integer scores. (The Pallas kernel is
    bit-identical to this oracle, pinned by the interpret test above.)"""
    r = np.random.default_rng(seed)
    rows = (r.normal(size=(32, DIM)) * scale_mag).astype(np.float32)
    # Sprinkle exact zeros and single-dominant-coordinate rows.
    rows[0] = 0.0
    rows[1] = 0.0
    rows[1, 3] = scale_mag
    packed, scales = S.pack_rows_int4(jnp.asarray(rows))
    packed, scales = np.asarray(packed), np.asarray(scales)
    s = np.maximum(np.abs(rows).max(axis=1, keepdims=True), 1e-12) / 7.0
    q = np.clip(np.round(rows / s), -8, 7).astype(np.int32)
    np.testing.assert_array_equal(_unpack_np(packed), q)
    assert np.isfinite(scales).all() and (scales > 0).all()
