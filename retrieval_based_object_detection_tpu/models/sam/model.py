"""SAM model wrapper: preprocessing + encode-once/predict-many interface.

Mirrors the SamPredictor usage pattern the reference drives
(22_segment_image_auto.py:139-152): ``set_image`` runs the ViT encoder
once (the expensive part), then each ``predict`` call decodes point
prompts into 3 candidate masks + IoU scores in milliseconds — the
interactive-latency split that matters for the manual click UI (22m).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_based_object_detection_tpu.models.sam import decoder as D
from retrieval_based_object_detection_tpu.models.sam import encoder as E

# SAM pixel normalisation (ImageNet stats on 0..255 scale).
SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclasses.dataclass(frozen=True)
class SamConfig:
    encoder: E.EncoderConfig = E.EncoderConfig()
    decoder: D.DecoderConfig = D.DecoderConfig()

    @property
    def img_size(self) -> int:
        return self.encoder.img_size


SAM_VIT_B = SamConfig()
# Small config for CPU tests: 128px input, 2 layers, tiny dims.
SAM_TINY = SamConfig(
    encoder=E.EncoderConfig(img_size=128, patch_size=16, embed_dim=64,
                            depth=2, heads=2, out_chans=32, window_size=4,
                            global_attn_indexes=(1,)),
    decoder=D.DecoderConfig(embed_dim=32, depth=2, heads=2, mlp_dim=64,
                            iou_head_hidden=32),
)


def init_params(config: SamConfig = SAM_TINY, seed: int = 0):
    return {
        "encoder": E.init_params(config.encoder, seed),
        "decoder": D.init_params(config.decoder, seed + 1),
    }


def preprocess_image(img: np.ndarray, img_size: int
                     ) -> tuple[np.ndarray, tuple[int, int]]:
    """Resize longest side to img_size, normalise, zero-pad to square.
    Returns (padded [S, S, 3] float32, (new_h, new_w))."""
    from PIL import Image

    h, w = img.shape[:2]
    scale = img_size / max(h, w)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    resized = np.asarray(
        Image.fromarray(img).resize((nw, nh), Image.BILINEAR), np.float32)
    resized = (resized - SAM_MEAN) / SAM_STD
    out = np.zeros((img_size, img_size, 3), np.float32)
    out[:nh, :nw] = resized
    return out, (nh, nw)


@partial(jax.jit, static_argnames=("enc_cfg", "compute_dtype"))
def _encode(params, images, enc_cfg, compute_dtype=jnp.float32):
    return E.forward(params, images, enc_cfg, compute_dtype)


@partial(jax.jit, static_argnames=("dec_cfg",))
def _decode(params, embedding, points, labels, dec_cfg):
    return D.decode_masks(params, embedding, points, labels, dec_cfg)


class SamPredictor:
    """set_image → predict(point) interface over the functional model."""

    def __init__(self, params, config: SamConfig = SAM_TINY,
                 compute_dtype=jnp.float32):
        self.params = params
        self.config = config
        self.compute_dtype = compute_dtype
        self._embedding = None
        self._orig_hw: tuple[int, int] | None = None
        self._resized_hw: tuple[int, int] | None = None

    def set_image(self, img: np.ndarray) -> None:
        """Run the image encoder once for this image ([H, W, 3] uint8)."""
        padded, resized_hw = preprocess_image(img, self.config.img_size)
        self._embedding = _encode(
            self.params["encoder"], jnp.asarray(padded)[None],
            self.config.encoder, self.compute_dtype)
        self._orig_hw = img.shape[:2]
        self._resized_hw = resized_hw

    def predict(
        self,
        point_coords: np.ndarray,  # [P, 2] pixel (x, y) in ORIGINAL image
        point_labels: np.ndarray,  # [P] 1=fg, 0=bg
        multimask_output: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        """→ (masks [M, H, W] bool in original resolution, scores [M])."""
        assert self._embedding is not None, "call set_image first"
        oh, ow = self._orig_hw
        nh, nw = self._resized_hw
        S = self.config.img_size
        # Map original pixels → padded-square normalised coords.
        pts = np.asarray(point_coords, np.float32)
        # +0.5 pixel-center shift matches segment-anything's prompt
        # encoder (and our grid_pe's cell-center convention).
        pts = np.stack([(pts[:, 0] * (nw / ow) + 0.5) / S,
                        (pts[:, 1] * (nh / oh) + 0.5) / S], axis=1)
        masks, iou = _decode(
            self.params["decoder"], self._embedding,
            jnp.asarray(pts)[None], jnp.asarray(point_labels)[None],
            self.config.decoder)
        masks = np.asarray(masks)[0]  # [tokens, 4g, 4g]
        iou = np.asarray(iou)[0]
        if multimask_output:
            masks, iou = masks[1:], iou[1:]  # tokens 1..3 (multimask)
        else:
            masks, iou = masks[:1], iou[:1]
        return (_masks_to_original(masks, (nh, nw), (oh, ow), S), iou)

    def segment_batch(
        self,
        images: list[np.ndarray],   # [H_i, W_i, 3] uint8, any sizes
        point_coords: list[np.ndarray] | None = None,  # per-image [P, 2]
        point_labels: list[np.ndarray] | None = None,  # per-image [P]
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Batched encode→decode for throughput jobs (the auto-segment
        stage): ONE encoder dispatch for the whole batch instead of a
        set_image per image — the 1024² ViT underutilises the chip at
        batch 1 and each dispatch pays a host round trip. Defaults to
        the reference's center-point prompt (22a:141-143); multi-point
        prompts must share one P across the batch (static shapes), with
        ``point_labels`` 1=fg/0=bg per point like ``predict``. Returns
        per-image (3 candidate masks at original resolution, scores)."""
        S = self.config.img_size
        P = (len(np.asarray(point_coords[0]))
             if point_coords is not None else 1)
        padded, hw = [], []
        pts = np.zeros((len(images), P, 2), np.float32)
        labels = np.ones((len(images), P), np.float32)
        for i, img in enumerate(images):
            p, (nh, nw) = preprocess_image(img, S)
            padded.append(p)
            hw.append(((nh, nw), img.shape[:2]))
            oh, ow = img.shape[:2]
            raw = (np.asarray(point_coords[i], np.float32)
                   if point_coords is not None
                   else np.array([[ow / 2, oh / 2]], np.float32))
            if raw.shape != (P, 2):
                raise ValueError(
                    f"image {i}: expected {P} prompt points, got "
                    f"{raw.shape} (batched prompts share one P)")
            pts[i, :, 0] = (raw[:, 0] * (nw / ow) + 0.5) / S
            pts[i, :, 1] = (raw[:, 1] * (nh / oh) + 0.5) / S
            if point_labels is not None:
                labels[i] = np.asarray(point_labels[i], np.float32)
        emb = _encode(self.params["encoder"], jnp.asarray(np.stack(padded)),
                      self.config.encoder, self.compute_dtype)
        masks, iou = _decode(
            self.params["decoder"], emb, jnp.asarray(pts),
            jnp.asarray(labels), self.config.decoder)
        masks = np.asarray(masks)[:, 1:]  # multimask tokens 1..3
        iou = np.asarray(iou)[:, 1:]
        return [
            (_masks_to_original(masks[i], *hw[i], S), iou[i])
            for i in range(len(images))
        ]


def _masks_to_original(mask_logits: np.ndarray, resized_hw, orig_hw,
                       img_size: int) -> np.ndarray:
    """[M, 4g, 4g] logits → [M, H, W] bool: upsample to the padded
    square, crop the content area, resize to original, threshold at 0."""
    from PIL import Image

    nh, nw = resized_hw
    oh, ow = orig_hw
    out = []
    for m in mask_logits:
        big = np.asarray(Image.fromarray(m.astype(np.float32)).resize(
            (img_size, img_size), Image.BILINEAR))
        crop = big[: int(nh), : int(nw)]
        full = np.asarray(Image.fromarray(crop).resize(
            (ow, oh), Image.BILINEAR))
        out.append(full > 0.0)
    return np.stack(out)
