"""CLIP image preprocessing: host (PIL-parity) and device (fused) paths.

The reference preprocesses with the torchvision Compose returned by
``clip.load`` — Resize(224, bicubic) → CenterCrop(224) → ToTensor →
Normalize — applied one image at a time on the host
(31_clip_embedding_and_save_vector.py:32-33).

Two equivalent paths here:
  * ``preprocess_pil`` — byte-for-byte parity with the torch pipeline
    (PIL bicubic resize of the shorter side, center crop, CLIP mean/std).
    Used when reproducing reference embeddings exactly.
  * ``preprocess_batch`` — batched pure-JAX resize+normalize that runs
    fused on device for the high-throughput embed pipeline. Numerically
    close (bicubic) but not bit-identical to PIL's resampler.

RGBA inputs (segmented PNGs) are reduced with ``convert("RGB")`` exactly as
the reference does — alpha is dropped, not composited.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # PIL is required for the host path only.
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_pil(img, size: int = 224) -> np.ndarray:
    """PIL path: [size, size, 3] float32, normalised. Parity with torch."""
    if img.mode != "RGB":
        img = img.convert("RGB")
    w, h = img.size
    # torchvision Resize(int): shorter side -> size, longer side truncated
    # (int(), not round() — matches torchvision and HF exactly), bicubic.
    if w < h:
        new_w, new_h = size, max(size, int(size * h / w))
    else:
        new_w, new_h = max(size, int(size * w / h)), size
    img = img.resize((new_w, new_h), Image.BICUBIC)
    # CenterCrop(size) — torchvision rounds the same way.
    left = int(round((new_w - size) / 2.0))
    top = int(round((new_h - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


def load_and_preprocess(path, size: int = 224) -> np.ndarray | None:
    """Open → RGB → preprocess; returns None on unreadable files (the
    reference logs and skips, 31_clip_embedding_and_save_vector.py:30-39)."""
    try:
        with Image.open(path) as img:
            return preprocess_pil(img, size)
    except Exception:
        return None


@partial(jax.jit, static_argnames=("size",))
def preprocess_batch(images: jax.Array, size: int = 224) -> jax.Array:
    """Device path: uint8/float [B, H, W, 3] → normalised [B, size, size, 3].

    Resizes the shorter side to ``size`` with bicubic interpolation then
    center-crops — all shapes static per (H, W) bucket, fully fused by XLA.
    """
    images = images.astype(jnp.float32) / 255.0
    B, H, W, C = images.shape
    if H < W:
        new_h, new_w = size, max(size, int(size * W / H))
    else:
        new_h, new_w = max(size, int(size * H / W)), size
    resized = jax.image.resize(
        images, (B, new_h, new_w, C), method="bicubic", antialias=True
    )
    top = int(round((new_h - size) / 2.0))
    left = int(round((new_w - size) / 2.0))
    crop = jax.lax.dynamic_slice(
        resized, (0, top, left, 0), (B, size, size, C)
    )
    crop = jnp.clip(crop, 0.0, 1.0)
    return (crop - CLIP_MEAN) / CLIP_STD


def pad_batch(arrs: list[np.ndarray], batch_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad a list of preprocessed images to a fixed batch (static shapes).

    Returns (batch [batch_size, ...], valid mask [batch_size]).
    """
    assert arrs and len(arrs) <= batch_size
    out = np.zeros((batch_size,) + arrs[0].shape, np.float32)
    valid = np.zeros(batch_size, bool)
    for i, a in enumerate(arrs):
        out[i] = a
        valid[i] = True
    return out, valid
