"""Property test of the FULL filter algebra (must + must_not + should).

Round 3 added ``must_not`` and ``should`` clauses to the core Filter
(Qdrant parity: 02's server accepts them even though the reference
pipeline only ever issues must-conjunctions, 32_create_delegate_vector.py
:104-131, 33_run_all_experiments.py:117-137). The example-based tests in
test_gallery.py pin the headline cases; this file drives randomly
generated clause combinations — including unknown dictionary values,
bool fields, ``delegate_type`` None-matching and ``img_path`` hash-index
lookups — through ``count``/``scroll_all``/``search`` and checks every
observable against a per-row pure-Python oracle evaluating the same
boolean semantics on the stored Payloads. The wire codec round-trip
(``to_wire`` → JSON → ``from_wire``) must preserve filter identity.
"""

import json

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from retrieval_based_object_detection_tpu.gallery.schema import (
    BOOL_FIELDS, Filter, Payload,
)
from retrieval_based_object_detection_tpu.gallery.store import Gallery

DIM = 8
N_ROWS = 24

cond = st.one_of(
    st.tuples(st.just("class_name"), st.sampled_from(["a", "b", "c", "zzz"])),
    st.tuples(st.just("data_type"),
              st.sampled_from(["original_images", "natural_images", "nope"])),
    st.tuples(st.just("delegate_type"),
              st.sampled_from([None, "average", "medoid"])),
    st.tuples(st.just("is_segmented"), st.booleans()),
    st.tuples(st.just("is_delegate"), st.booleans()),
    st.tuples(st.just("img_path"),
              st.sampled_from(["/f/3.jpg", "/f/11.jpg", "/f/999.jpg"])),
)

filters = st.builds(
    Filter,
    must=st.lists(cond, max_size=2).map(dict),
    must_not=st.lists(cond, max_size=3).map(tuple),
    should=st.lists(cond, max_size=3).map(tuple),
)


def _cond_match(payload: Payload, fieldname: str, value) -> bool:
    if fieldname in BOOL_FIELDS:
        return bool(getattr(payload, fieldname)) == bool(value)
    return getattr(payload, fieldname) == value


def _oracle(payload: Payload, flt: Filter) -> bool:
    if not all(_cond_match(payload, k, v) for k, v in flt.must.items()):
        return False
    if any(_cond_match(payload, k, v) for k, v in flt.must_not):
        return False
    if flt.should and not any(
            _cond_match(payload, k, v) for k, v in flt.should):
        return False
    return True


def _population():
    """24 rows covering every value the conditions can probe (paths are
    unique per row — the reference content-addresses ids by path,
    31_clip_embedding_and_save_vector.py:42-43, so duplicate live paths
    cannot occur and the hash index may assume uniqueness)."""
    rng = np.random.default_rng(11)
    g = Gallery("filterprop", dim=DIM)
    ids, pls = [], []
    for i in range(N_ROWS):
        pls.append(Payload(
            data_type="natural_images" if i % 2 else "original_images",
            class_name="abc"[i % 3],
            is_segmented=bool(i % 2),
            is_augmented=bool(i % 5 == 0),
            is_delegate=bool(i % 4 == 0),
            delegate_type=(None, "average", "medoid")[i % 3]
            if i % 4 == 0 else None,
            img_path=f"/f/{i}.jpg"))
        ids.append(f"r{i}")
    vecs = rng.normal(size=(N_ROWS, DIM)).astype(np.float32)
    g.upsert(ids, vecs, pls)
    return g, ids, vecs, pls


_G, _IDS, _VECS, _PLS = _population()


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(flt=filters, seed=st.integers(0, 2 ** 16))
def test_filter_algebra_matches_oracle(flt, seed):
    expect = [i for i, p in enumerate(_PLS) if _oracle(p, flt)]

    assert _G.count(flt) == len(expect)
    assert [r.id for r in _G.scroll_all(flt)] == [_IDS[i] for i in expect]

    rng = np.random.default_rng(seed)
    q = rng.normal(size=DIM).astype(np.float32)
    hits = _G.search(q, k=5, flt=flt)[0]
    if not expect:
        assert hits == []
        return
    qn = q / np.linalg.norm(q)
    sims = {_IDS[i]: float(qn @ (_VECS[i] / np.linalg.norm(_VECS[i])))
            for i in expect}
    assert {r.id for r in hits} <= set(sims)
    assert len(hits) == min(5, len(expect))
    want = sorted(sims.values(), reverse=True)[: len(hits)]
    got = [r.score for r in hits]
    np.testing.assert_allclose(got, want, atol=1e-5)


@settings(max_examples=120, deadline=None)
@given(flt=filters)
def test_wire_roundtrip_preserves_identity(flt):
    body = json.loads(json.dumps(flt.to_wire()))
    back = Filter.from_wire(body)
    if not flt.must and not flt.must_not and not flt.should:
        assert back is None
        return
    assert back is not None
    assert back.cache_key() == flt.cache_key()
    # and the decoded twin filters identically
    assert [r.id for r in _G.scroll_all(back)] == \
        [r.id for r in _G.scroll_all(flt)]


def test_filter_and_contradictory_must_raises():
    """f1 & f2 with conflicting equality on one key matches NOTHING —
    silently letting the right side win returns wrong rows; fail loudly
    like the should-AND-should case."""
    import pytest

    from retrieval_based_object_detection_tpu.gallery.schema import Filter

    a = Filter(must={"class_name": "a"})
    b = Filter(must={"class_name": "b"})
    with pytest.raises(ValueError, match="contradictory"):
        _ = a & b
    # Identical values still compose fine.
    c = a & Filter(must={"class_name": "a", "is_cropped": True})
    assert c.must["class_name"] == "a" and c.must["is_cropped"] is True
