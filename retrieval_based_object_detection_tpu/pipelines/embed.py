"""Batched CLIP embedding + gallery upsert (the 31_* stage, TPU-first).

The reference embeds one image at a time and issues one HTTP upsert per
image (31_clip_embedding_and_save_vector.py:161-180). Here the host pipeline
decodes and preprocesses images into fixed-size padded batches while the
device runs the previous batch (double buffering via dispatch-ahead: JAX's
async dispatch overlaps host decode with TPU compute for free), then vectors
are upserted into the in-process gallery in one batch per chunk.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_based_object_detection_tpu.gallery.schema import Payload
from retrieval_based_object_detection_tpu.gallery.store import Gallery
from retrieval_based_object_detection_tpu.models.clip import model as clip_model
from retrieval_based_object_detection_tpu.models.clip import preprocess as pp
from retrieval_based_object_detection_tpu.utils import tree
from retrieval_based_object_detection_tpu.utils.ids import point_id_from_path


@dataclasses.dataclass
class EmbedConfig:
    root_dir: str  # dataset_cropped | dataset_segmented | dataset_augmented
    img_type: str = "original"  # original | natural
    classes: list[str] | None = None  # None = all
    batch_size: int = 64
    image_size: int = 224  # must match the encoder's config.image_size
    # NB: numeric precision is the ENCODER's property — set it where the
    # encoder is built (make_encoder(compute_dtype=..., exact=...)).


@dataclasses.dataclass
class EmbedResult:
    per_class_counts: dict[str, int]
    n_failed: int

    @property
    def total(self) -> int:
        return sum(self.per_class_counts.values())


def make_encoder(
    params,
    config: clip_model.CLIPVisionConfig = clip_model.VIT_B_32,
    compute_dtype: str = "float32",
    exact: bool = True,
) -> Callable[[np.ndarray], np.ndarray]:
    """Returns a jitted batch encoder: [B,H,W,3] float32 → [B,512] np."""
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def _encode(p, x):
        prec = "highest" if exact else "default"
        with jax.default_matmul_precision(prec):
            return clip_model.encode_image(p, x, config, compute_dtype=dtype)

    def encode(batch: np.ndarray) -> np.ndarray:
        return np.asarray(_encode(params, batch))

    return encode


def make_sharded_encoder(
    params,
    mesh,
    config: clip_model.CLIPVisionConfig = clip_model.VIT_B_32,
    compute_dtype: str = "bfloat16",
) -> Callable[[np.ndarray], np.ndarray]:
    """Data-parallel batch encoder over a mesh's ``dp`` axis.

    Params are replicated, the image batch shards over dp, outputs gather
    back to host — the multi-chip replacement for the reference's per-image
    single-device loop. Batch size must divide by the dp size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("dp"))
    params = jax.tree.map(lambda a: jax.device_put(a, rep), params)

    @partial(jax.jit, in_shardings=(rep, batch_sh), out_shardings=batch_sh)
    def _encode(p, x):
        return clip_model.encode_image(p, x, config, compute_dtype=dtype)

    def encode(batch: np.ndarray) -> np.ndarray:
        return np.asarray(_encode(params, batch))

    return encode


def embed_tree(
    gallery: Gallery,
    encoder: Callable[[np.ndarray], np.ndarray],
    cfg: EmbedConfig,
    logger=None,
) -> EmbedResult:
    """Embed every image under the stage root and upsert into the gallery.

    Payload derivation matches 31_clip_embedding_and_save_vector.py:154-175:
    data_type from the img_type, is_segmented/is_augmented from the root
    basename, class from the directory name, MD5-of-path point IDs.

    The host side decodes/preprocesses the NEXT batch in a worker thread
    while the device encodes the current one (utils.loader.PrefetchIterator
    + JAX async dispatch = double buffering).
    """
    from retrieval_based_object_detection_tpu.utils.loader import (
        PrefetchIterator,
        batched,
        parallel_map,
    )

    flags = tree.stage_flags(cfg.root_dir)
    entries = tree.walk(cfg.root_dir, cfg.img_type, cfg.classes)
    counts: dict[str, int] = {}
    n_failed = 0
    B = cfg.batch_size

    def prepare(chunk: list[tree.ImageEntry]):
        # Per-image decode fans out over the shared pool (PIL releases
        # the GIL): on a many-core TPU host the decode loop, not the
        # chip, caps real ingest throughput.
        arrs = parallel_map(
            lambda e: pp.load_and_preprocess(e.path, size=cfg.image_size),
            chunk)
        imgs, paths, classes, failed = [], [], [], 0
        for e, arr in zip(chunk, arrs):
            if arr is None:
                failed += 1
                continue
            imgs.append(arr)
            paths.append(e.path)
            classes.append(e.class_name)
        return imgs, paths, classes, failed

    from retrieval_based_object_detection_tpu.utils.logging import (
        ThroughputTimer,
    )

    timer = ThroughputTimer("crops")
    loader = PrefetchIterator(batched(entries, B), prepare, depth=2)
    try:
        for imgs, paths, classes, failed in loader:
            n_failed += failed
            if not imgs:
                continue
            padded, _ = pp.pad_batch(imgs, B)
            vecs = encoder(padded)[: len(imgs)]
            ids = [point_id_from_path(p) for p in paths]
            payloads = [
                Payload(
                    data_type=f"{cfg.img_type}_images",
                    is_cropped=True,
                    is_segmented=flags["is_segmented"],
                    is_augmented=flags["is_augmented"],
                    class_name=c,
                    is_delegate=False,
                    delegate_type=None,
                    img_path=str(p),
                )
                for p, c in zip(paths, classes)
            ]
            gallery.upsert(ids, vecs.astype(np.float32), payloads)
            timer.add(len(imgs))
            for c in classes:
                counts[c] = counts.get(c, 0) + 1
    finally:
        loader.close()
    if logger is not None:
        logger.summary(total=timer.n, failed=n_failed,
                       crops_per_sec=round(timer.per_sec, 1))
    return EmbedResult(per_class_counts=counts, n_failed=n_failed)


def embed_arrays(
    gallery: Gallery,
    encoder: Callable[[np.ndarray], np.ndarray],
    images: np.ndarray,  # [N, H, W, 3] already preprocessed
    paths: Sequence[str],
    class_names: Sequence[str],
    img_type: str = "original",
    is_segmented: bool = False,
    is_augmented: bool = False,
    batch_size: int = 64,
) -> int:
    """In-memory variant (no filesystem): embed + upsert preprocessed arrays."""
    n = images.shape[0]
    for start in range(0, n, batch_size):
        chunk = images[start : start + batch_size]
        real = chunk.shape[0]
        if real < batch_size:
            padded = np.zeros((batch_size,) + chunk.shape[1:], chunk.dtype)
            padded[:real] = chunk
            chunk = padded
        vecs = encoder(chunk)[:real]
        sl = slice(start, start + real)
        gallery.upsert(
            [point_id_from_path(p) for p in paths[sl]],
            vecs.astype(np.float32),
            [
                Payload(
                    data_type=f"{img_type}_images",
                    is_cropped=True,
                    is_segmented=is_segmented,
                    is_augmented=is_augmented,
                    class_name=c,
                    img_path=str(p),
                )
                for p, c in zip(paths[sl], class_names[sl])
            ],
        )
    return n
