"""Delegate-vector build stage (the 32_* stage, on-device).

For each requested class × preprocessing case, gathers the matching raw
vectors from the gallery and computes all four representative vectors in a
single jitted program (``ops.delegates.compute_all_delegates``), then
upserts them with the reference's deterministic delegate IDs and payload
conventions (32_create_delegate_vector.py:34-42, 104-131).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from retrieval_based_object_detection_tpu.gallery.schema import (
    Filter,
    PRE_CASES,
    Payload,
)
from retrieval_based_object_detection_tpu.gallery.store import Gallery
from retrieval_based_object_detection_tpu.ops import delegates as D
from retrieval_based_object_detection_tpu.utils.ids import delegate_id


# Above this member count the dense [n, n] medoid matrix (n² · 4 bytes)
# stops being worth materialising; the blocked kernel streams tiles.
LARGE_CLASS_THRESHOLD = 8192


@dataclasses.dataclass
class DelegateBuildResult:
    # (class, case, data_type) -> number of member vectors used (0 = skipped)
    member_counts: dict[tuple[str, str, str], int]
    n_delegates_written: int


def _pad_pow2(n: int, floor: int = 64) -> int:
    """Round class size up to a power of two so jit re-traces are O(log n)
    distinct shapes rather than one per class size."""
    size = floor
    while size < n:
        size *= 2
    return size


def list_classes(gallery: Gallery) -> list[str]:
    """Distinct non-delegate class names (32_create_delegate_vector.py:78-86),
    straight from the dictionary-encoded payload column — O(rows), no
    scroll limit to outgrow."""
    return gallery.distinct("class_name",
                            Filter(must={"is_delegate": False}))


def build_delegates(
    gallery: Gallery,
    classes: list[str] | None = None,
    cases: list[str] | None = None,
    alpha: float = 2.0,
) -> DelegateBuildResult:
    """Build average/centroid/weighted/medoid delegates per class × case
    × data_type.

    Payload of a delegate inherits the base fields of its members and sets
    ``is_delegate=True, delegate_type=<strategy>`` (32:34-42). Cases with no
    matching members are skipped, mirroring 32:133-135.

    Deliberate fix vs the reference: 32's member scroll (32:123-131) does
    not filter by data_type but stamps the delegate's ``data_type`` from
    whichever record Qdrant returns first (32:138-141) — order-dependent
    when a collection mixes original and natural vectors, and the
    experiment stage then filters delegates by the test image's data_type
    (33:128). We partition members by data_type instead: deterministic, and
    identical to the reference whenever a collection holds one data_type
    (the committed-run scenario).
    """
    if classes is None:
        classes = list_classes(gallery)
    if cases is None:
        cases = list(PRE_CASES)

    member_counts: dict[tuple[str, str, str], int] = {}
    written = 0
    for cls in classes:
        for case in cases:
            for data_type in ("original_images", "natural_images"):
                flt = (
                    Filter(must={
                        "class_name": cls,
                        "is_delegate": False,
                        "data_type": data_type,
                    })
                    & Filter.for_case(case)
                )
                members = gallery.vectors_matching(flt)
                member_counts[(cls, case, data_type)] = members.shape[0]
                if members.shape[0] == 0:
                    continue
                recs, _ = gallery.scroll(flt, limit=1)
                base = recs[0].payload

                padded_n = _pad_pow2(members.shape[0])
                padded = np.zeros((padded_n, members.shape[1]), np.float32)
                padded[: members.shape[0]] = members
                mask = np.zeros(padded_n, bool)
                mask[: members.shape[0]] = True

                if members.shape[0] > LARGE_CLASS_THRESHOLD:
                    # Dense O(n²) pairwise would blow HBM; medoid goes
                    # through the blocked Pallas kernel (SURVEY.md §7
                    # hard part 5), the cheap reductions stay fused.
                    outs = dict(D.compute_partial_delegates(
                        padded, mask, alpha=alpha))
                    from retrieval_based_object_detection_tpu.ops.medoid import (
                        medoid_large,
                    )

                    outs["medoid"] = medoid_large(members)
                else:
                    outs = D.compute_all_delegates(padded, mask, alpha=alpha)
                for dtype in D.DELEGATE_TYPES:
                    payload = Payload(
                        data_type=base.data_type,
                        is_cropped=base.is_cropped,
                        is_segmented=base.is_segmented,
                        is_augmented=base.is_augmented,
                        class_name=cls,
                        is_delegate=True,
                        delegate_type=dtype,
                        img_path="",
                    )
                    pid = delegate_id(payload.to_dict(), dtype)
                    gallery.upsert(
                        [pid], np.asarray(outs[dtype])[None], [payload]
                    )
                    written += 1
    return DelegateBuildResult(
        member_counts=member_counts, n_delegates_written=written
    )
