"""YOLOv8 as the labeling-slot detector callable.

Drop-in for ``pipelines/labeling.py``'s pluggable detector interface
(images [B, H, W, 3] → (boxes [B, K, 4] xyxy px, scores [B, K])) with
the reference's exact semantics: conf-0.25 gate, top-K by confidence
(11_dataset_labeling.py:159, 178-180). The forward runs as one jitted
batch on device; NMS and the top-K cut are host-side NumPy.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from retrieval_based_object_detection_tpu.models.yolo import model as Y


@dataclasses.dataclass(frozen=True)
class _DetConfig:
    image_size: int  # labeling letterboxes to this square (÷32)


class YoloDetector:
    """Detector-callable around a converted YOLOv8 checkpoint."""

    def __init__(self, params: list, config: Y.YoloConfig,
                 image_size: int = 640, conf_threshold: float = 0.25,
                 iou_threshold: float = 0.45, max_det: int = 16):
        if image_size % 32:
            raise ValueError(
                f"image_size must be divisible by 32 (stride-32 head); "
                f"got {image_size}")
        self.params = params
        self.yolo_config = config
        self.config = _DetConfig(image_size=image_size)
        self.conf_threshold = conf_threshold
        self.iou_threshold = iou_threshold
        self.max_det = max_det

    @classmethod
    def from_checkpoint(cls, path: str | Path, **kw) -> "YoloDetector":
        from retrieval_based_object_detection_tpu.models.yolo.convert import (
            load_torch_checkpoint,
        )

        params, config = load_torch_checkpoint(path)
        return cls(params, config, **kw)

    @classmethod
    def from_variant(cls, variant: str = "yolov8s",
                     cache_dir: str | Path = "model",
                     **kw) -> "YoloDetector":
        """Official weights by name — downloads into ``model/`` exactly
        once (the reference's own asset location, 11:10)."""
        from retrieval_based_object_detection_tpu.models.yolo.download import (
            ensure_checkpoint,
        )

        return cls.from_checkpoint(
            ensure_checkpoint(variant, cache_dir=cache_dir), **kw)

    def __call__(self, images: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
        imgs = np.asarray(images, np.float32)
        if imgs.max() > 1.5:  # uint8-range canvases from the letterbox
            imgs = imgs / 255.0
        if imgs.shape[1] % 32 or imgs.shape[2] % 32:
            raise ValueError(
                f"input {imgs.shape[1]}x{imgs.shape[2]} not divisible by "
                f"32 — letterbox to a stride-32 size (e.g. "
                f"{self.config.image_size})")
        boxes, cls_probs = Y.predict(self.params, jnp.asarray(imgs),
                                     self.yolo_config)
        dets = Y.postprocess(np.asarray(boxes), np.asarray(cls_probs),
                             conf_threshold=self.conf_threshold,
                             iou_threshold=self.iou_threshold,
                             max_det=self.max_det)
        B, K = imgs.shape[0], self.max_det
        out_b = np.zeros((B, K, 4), np.float32)
        out_s = np.zeros((B, K), np.float32)
        for i, d in enumerate(dets):
            n = min(K, d["boxes"].shape[0])
            out_b[i, :n] = d["boxes"][:n]
            out_s[i, :n] = d["scores"][:n]
        return out_b, out_s
