"""Bounding-box crop stage (the 21_* stage).

Reads YOLO-format labels next to each image, converts normalised
coordinates to pixels, applies the 20% margin rule clamped to image bounds
and writes one ``<stem>_cropped_obj<i><ext>`` file per box into
``dataset_cropped/{type}_images/<class>/`` — the exact filename and layout
contract of 21_crop_image.py:99-103, so artifacts remain interchangeable
with the reference tree.

The device-fused variant for serving (no filesystem round trip) is
``ops.image.crop_resize_batch``.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from retrieval_based_object_detection_tpu.ops.image import expand_box_with_margin
from retrieval_based_object_detection_tpu.utils import tree


@dataclasses.dataclass
class CropConfig:
    src_root: str = "dataset_jpeg"
    dst_root: str = "dataset_cropped"
    img_type: str = "original"
    classes: list[str] | None = None
    margin_ratio: float = 0.2  # 21_crop_image.py:9
    # 21 globs *.jpg only — which silently misses the .jpeg files the
    # ingest stage (01:85-86) produces; we accept both.
    suffixes: tuple[str, ...] = (".jpg", ".jpeg")


@dataclasses.dataclass
class CropResult:
    n_objects: int
    n_no_label: int
    n_empty_label: int


def parse_yolo_label(label_path: Path) -> list[tuple[int, float, float, float, float]]:
    """YOLO lines: ``<cls> <xc> <yc> <w> <h>`` normalised; malformed lines
    are skipped (21_crop_image.py:71-75)."""
    out = []
    with open(label_path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) != 5:
                continue
            cls, xc, yc, w, h = parts
            out.append((int(float(cls)), float(xc), float(yc),
                        float(w), float(h)))
    return out


def yolo_to_xyxy(box, img_w: int, img_h: int) -> tuple[int, int, int, int]:
    """Normalised (xc, yc, w, h) → integer pixel xyxy (21:78-87)."""
    _, xc, yc, bw, bh = box
    xc, yc, bw, bh = xc * img_w, yc * img_h, bw * img_w, bh * img_h
    return (int(xc - bw / 2), int(yc - bh / 2),
            int(xc + bw / 2), int(yc + bh / 2))


def crop_image_with_labels(
    image: np.ndarray,  # [H, W, C]
    boxes_xyxy: list[tuple[int, int, int, int]],
    margin_ratio: float = 0.2,
) -> list[np.ndarray]:
    h, w = image.shape[:2]
    crops = []
    for box in boxes_xyxy:
        x1, y1, x2, y2 = expand_box_with_margin(box, w, h, margin_ratio)
        crops.append(image[y1:y2, x1:x2])
    return crops


def run_crop(cfg: CropConfig) -> CropResult:
    from PIL import Image

    n_obj = n_nolabel = n_empty = 0
    for cls in (cfg.classes if cfg.classes is not None
                else tree.list_classes(cfg.src_root, cfg.img_type)):
        dst_dir = tree.type_dir(cfg.dst_root, cfg.img_type) / cls
        dst_dir.mkdir(parents=True, exist_ok=True)
        for img_path in tree.list_images(cfg.src_root, cfg.img_type, cls,
                                         cfg.suffixes):
            label_path = img_path.with_suffix(".txt")
            if not label_path.exists():
                n_nolabel += 1
                continue
            labels = parse_yolo_label(label_path)
            if not labels:
                n_empty += 1
                continue
            with Image.open(img_path) as im:
                arr = np.asarray(im.convert("RGB"))
            boxes = [yolo_to_xyxy(b, arr.shape[1], arr.shape[0])
                     for b in labels]
            ext = img_path.suffix.lower()
            for i, crop in enumerate(
                crop_image_with_labels(arr, boxes, cfg.margin_ratio)
            ):
                Image.fromarray(crop).save(
                    dst_dir / f"{img_path.stem}_cropped_obj{i}{ext}")
                n_obj += 1
    return CropResult(n_objects=n_obj, n_no_label=n_nolabel,
                      n_empty_label=n_empty)
