"""Snapshot persistence for the vector store.

Replaces the durability Qdrant got from its Docker volume
(02_qdrant_environment_setting.txt:2-7): each collection snapshots to
``<root>/<name>.npz`` (vectors, float32) plus ``<root>/<name>.json``
(ids, payloads, meta). Snapshots are atomic (write-temp-then-rename) so a
crash mid-save never corrupts the previous snapshot.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from retrieval_based_object_detection_tpu.gallery.store import Gallery, VectorStore


def save_gallery(gallery: Gallery, root: str | Path) -> None:
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    data = gallery.to_arrays()
    npz_tmp = root / f".{gallery.name}.npz.tmp"
    json_tmp = root / f".{gallery.name}.json.tmp"
    with open(npz_tmp, "wb") as f:  # file object: savez won't append ".npz"
        np.savez_compressed(f, vectors=data["vectors"])
    with open(json_tmp, "w") as f:
        json.dump(
            {
                "name": gallery.name,
                "dim": data["dim"],
                "distance": data["distance"],
                "ids": data["ids"],
                "payloads": data["payloads"],
            },
            f,
        )
    os.replace(npz_tmp, root / f"{gallery.name}.npz")
    os.replace(json_tmp, root / f"{gallery.name}.json")


def load_gallery(name: str, root: str | Path) -> Gallery:
    root = Path(root)
    with open(root / f"{name}.json") as f:
        meta = json.load(f)
    with np.load(root / f"{name}.npz") as z:
        vectors = z["vectors"]
    return Gallery.from_arrays(
        name,
        {
            "ids": meta["ids"],
            "vectors": vectors,
            "payloads": meta["payloads"],
            "dim": meta["dim"],
            "distance": meta.get("distance", "cosine"),
        },
    )


def save_store(store: VectorStore, root: str | Path) -> None:
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    names = [n for n, _ in store.list_collections()]
    for name in names:
        save_gallery(store.get(name), root)
    tmp = root / ".manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump({"collections": names}, f)
    os.replace(tmp, root / "manifest.json")


def load_store(root: str | Path) -> VectorStore:
    root = Path(root)
    store = VectorStore()
    manifest = root / "manifest.json"
    if not manifest.exists():
        return store
    with open(manifest) as f:
        names = json.load(f)["collections"]
    for name in names:
        store._collections[name] = load_gallery(name, root)
    return store
