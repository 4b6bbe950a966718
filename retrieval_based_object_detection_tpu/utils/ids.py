"""Deterministic content-addressed point IDs.

The reference makes every vector upsert idempotent by deriving point IDs from
content: MD5 of the resolved image path for raw crop vectors
(31_clip_embedding_and_save_vector.py:42-43) and MD5 of
``class::delegate_type::data_type::is_segmented::is_augmented`` for delegate
vectors (32_create_delegate_vector.py:29-31). We keep the exact same key
construction so re-runs overwrite rather than duplicate, and so IDs are
interchangeable with artifacts produced by the reference pipeline.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Mapping


def point_id_from_path(img_path: str | Path) -> str:
    """MD5 of the resolved absolute image path (hex digest)."""
    return hashlib.md5(str(Path(img_path).resolve()).encode()).hexdigest()


def delegate_id(payload: Mapping[str, object], delegate_type: str) -> str:
    """MD5 of the delegate identity key.

    Key layout mirrors 32_create_delegate_vector.py:29-31 —
    ``{class_name}::{delegate_type}::{data_type}::{is_segmented}::{is_augmented}``
    with Python ``str()`` of the boolean flags.
    """
    key = (
        f"{payload.get('class_name')}::{delegate_type}::{payload.get('data_type')}"
        f"::{payload.get('is_segmented')}::{payload.get('is_augmented')}"
    )
    return hashlib.md5(key.encode()).hexdigest()


def batch_point_ids(paths: list[str | Path]) -> list[str]:
    """Vectorised-at-the-host version of :func:`point_id_from_path`."""
    return [point_id_from_path(p) for p in paths]
