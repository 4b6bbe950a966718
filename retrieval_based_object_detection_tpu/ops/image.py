"""Batched image ops for the preprocessing/augmentation stages, in JAX.

Covers the reference's augmentation grid (23_augmentation.py:10-13):
  * brightness scaling           (23:86-91, PIL ImageEnhance.Brightness)
  * rotation with expand +
    transparent fill             (23:94-97, PIL rotate(expand=True))
  * gaussian noise               (23:43-47)
  * gaussian blur                (23:49-51, radius = 2*level*100)
  * salt & pepper                (23:53-64)

and the device-fused crop→resize→normalize path that replaces the host
crop stage (21_crop_image.py:60-106) when feeding the embedder directly.

Conventions: images are float32 [*, H, W, C] in 0..255 (alpha included);
angles are degrees counter-clockwise like PIL. Rotation uses
nearest-neighbour sampling (PIL's rotate default). Exact bit-parity with
PIL's resampler is a non-goal — outputs feed CLIP preprocessing, which
resizes anyway — but output SIZES match PIL's expand formula exactly and
the noise/brightness math matches the reference formulas.

Note: the reference's salt&pepper variants are silently never produced
(loop key 's&p' vs dispatch key 'snp', 23:12 vs 23:108). We fix that bug:
the type key and filename token are both ``snp``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

BRIGHTNESS_RATES = (1.2, 1.1, 1.05, 0.95, 0.9, 0.8)
ROTATION_ANGLES = (30, 60, 90, 120, 150, 180, 210, 240, 270, 300, 330)
NOISE_TYPES = ("gaussian", "blur", "snp")
NOISE_LEVELS = (0.01, 0.02, 0.03)


# ------------------------------------------------------------ brightness
@partial(jax.jit, static_argnames=("rate",))
def brightness(images: jax.Array, rate: float) -> jax.Array:
    """PIL ImageEnhance.Brightness semantics: colour bands scale by
    ``rate`` with truncation; the alpha band (4-channel input) is
    preserved — PIL blends with a black image that keeps the alpha."""
    scaled = jnp.clip(jnp.floor(images * rate), 0.0, 255.0)
    if images.shape[-1] == 4:
        scaled = scaled.at[..., 3].set(images[..., 3])
    return scaled


# ------------------------------------------------------------ rotation
def _pil_rotation_matrix(w: int, h: int, angle_deg: float) -> list[float]:
    """PIL's destination→source affine matrix for rotate() about the image
    center: trig rounded to 15 decimals, offsets via center transform."""
    a_rad = -math.radians(angle_deg % 360.0)
    m = [round(math.cos(a_rad), 15), round(math.sin(a_rad), 15), 0.0,
         round(-math.sin(a_rad), 15), round(math.cos(a_rad), 15), 0.0]
    cx, cy = w / 2.0, h / 2.0
    m[2] = m[0] * (-cx) + m[1] * (-cy) + cx
    m[5] = m[3] * (-cx) + m[4] * (-cy) + cy
    return m


def rotate_expand_size(w: int, h: int, angle_deg: float) -> tuple[int, int]:
    """Output (w, h) of PIL rotate(expand=True) — exact replica of PIL's
    corner-transform + ceil/floor computation (including the 90/180/270
    transpose fast paths)."""
    angle = angle_deg % 360.0
    if angle == 0 or angle == 180:
        return w, h
    if angle in (90, 270):
        return h, w
    m = _pil_rotation_matrix(w, h, angle_deg)
    xx, yy = [], []
    for x, y in ((0, 0), (w, 0), (w, h), (0, h)):
        xx.append(m[0] * x + m[1] * y + m[2])
        yy.append(m[3] * x + m[4] * y + m[5])
    return (
        int(math.ceil(max(xx)) - math.floor(min(xx))),
        int(math.ceil(max(yy)) - math.floor(min(yy))),
    )


@partial(jax.jit, static_argnames=("angle_deg",))
def rotate_expand(image: jax.Array, angle_deg: float) -> jax.Array:
    """Rotate one [H, W, C] image CCW with an expanded transparent canvas,
    nearest-neighbour sampling — PIL rotate(expand=True) semantics,
    including the exact transpose fast paths at 90/180/270."""
    h, w = image.shape[0], image.shape[1]
    angle = angle_deg % 360.0
    if angle == 0:
        return image
    if angle in (90, 180, 270):
        return jnp.rot90(image, k=int(angle) // 90, axes=(0, 1))
    ow, oh = rotate_expand_size(w, h, angle_deg)
    m = _pil_rotation_matrix(w, h, angle_deg)
    # Expand adjustment: shift so the rotated bbox starts at the origin.
    tx = m[0] * (-(ow - w) / 2.0) + m[1] * (-(oh - h) / 2.0) + m[2]
    ty = m[3] * (-(ow - w) / 2.0) + m[4] * (-(oh - h) / 2.0) + m[5]
    # PIL nearest: src = trunc(m @ (x+0.5, y+0.5)), negatives fall outside.
    oy = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0) + 0.5
    ox = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1) + 0.5
    sx = m[0] * ox + m[1] * oy + tx
    sy = m[3] * ox + m[4] * oy + ty
    ix = sx.astype(jnp.int32)  # trunc-toward-zero like PIL's COORD macro
    iy = sy.astype(jnp.int32)
    inside = (sx >= 0) & (ix < w) & (sy >= 0) & (iy < h)
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    out = image[iy, ix]
    return jnp.where(inside[..., None], out, 0.0)


# ------------------------------------------------------------ noise
@jax.jit
def gaussian_noise(images: jax.Array, amount: float | jax.Array,
                   key: jax.Array) -> jax.Array:
    """img + N(0, 25)·amount, clipped (23_augmentation.py:43-47)."""
    noise = 25.0 * jax.random.normal(key, images.shape, jnp.float32)
    return jnp.clip(images + noise * amount, 0.0, 255.0)


def _gaussian_kernel(radius: int) -> jnp.ndarray:
    """PIL semantics: GaussianBlur(radius) treats radius as the Gaussian
    STANDARD DEVIATION; support extends to ~3 sigma."""
    sigma = max(float(radius), 1e-6)
    support = max(1, int(3 * radius))
    x = jnp.arange(-support, support + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


@partial(jax.jit, static_argnames=("radius",))
def gaussian_blur(images: jax.Array, radius: int) -> jax.Array:
    """Separable gaussian blur over H and W of [B, H, W, C] (or [H, W, C])."""
    if radius <= 0:
        return images
    squeeze = images.ndim == 3
    if squeeze:
        images = images[None]
    k = _gaussian_kernel(radius)
    x = images.astype(jnp.float32)
    # Depthwise separable via conv over each axis; edge-pad like PIL.
    pad = max(1, int(3 * radius))
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="edge")
    xh = jax.vmap(  # convolve along H for each (b, w, c) line
        lambda col: jnp.convolve(col, k, mode="valid"),
    )(xp.transpose(0, 2, 3, 1).reshape(-1, xp.shape[1]))
    x = xh.reshape(x.shape[0], x.shape[2], x.shape[3], x.shape[1]
                   ).transpose(0, 3, 1, 2)
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="edge")
    xw = jax.vmap(
        lambda row: jnp.convolve(row, k, mode="valid"),
    )(xp.transpose(0, 1, 3, 2).reshape(-1, xp.shape[2]))
    x = xw.reshape(images.shape[0], images.shape[1], images.shape[3],
                   images.shape[2]).transpose(0, 1, 3, 2)
    x = jnp.clip(jnp.round(x), 0.0, 255.0)
    return x[0] if squeeze else x


@jax.jit
def salt_pepper(images: jax.Array, amount: float | jax.Array,
                key: jax.Array) -> jax.Array:
    """Set ~amount·(H·W) random pixels (all channels) to 0 or 255
    (23_augmentation.py:53-64 semantics, vectorised)."""
    spatial = images.shape[:-1]
    k1, k2 = jax.random.split(key)
    hit = jax.random.uniform(k1, spatial) < amount
    salt = jax.random.uniform(k2, spatial) < 0.5
    val = jnp.where(salt, 255.0, 0.0)[..., None]
    return jnp.where(hit[..., None], val, images)


# ---------------------------------------------- fused crop-resize-normalize
@partial(jax.jit, static_argnames=("out_size",))
def crop_resize_batch(
    images: jax.Array,   # [B, H, W, C] float32 0..255
    boxes: jax.Array,    # [B, 4] pixel xyxy (already margin-expanded)
    out_size: int = 224,
) -> jax.Array:
    """Device-fused crop + bilinear resize for detection→embed serving.

    Each image's box is resampled to [out_size, out_size] with
    scale-and-translate (one gather-free XLA op per image via vmap) —
    replaces the host crop stage when boxes come from the detector.
    """
    def one(img, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        scale = jnp.stack([
            out_size / jnp.maximum(y2 - y1, 1.0),
            out_size / jnp.maximum(x2 - x1, 1.0),
        ])
        translation = -jnp.stack([y1, x1]) * scale
        return jax.image.scale_and_translate(
            img, (out_size, out_size, img.shape[-1]),
            spatial_dims=(0, 1),
            scale=scale, translation=translation,
            method="bilinear", antialias=True,
        )

    return jax.vmap(one)(images.astype(jnp.float32), boxes.astype(jnp.float32))


def expand_box_with_margin(
    box_xyxy, img_w: int, img_h: int, margin_ratio: float = 0.2
):
    """Grow each side by margin_ratio × box size, clamped to image
    bounds (the 21_crop_image.py:89-95 rule SHAPE). Works on [..., 4].
    For float detector boxes this is exact; for YOLO labels the
    byte-parity path is pipelines.crop.yolo_crop_bounds, whose margins
    come from the float pixel dims rather than this function's corner
    differences (one-pixel divergence when the corners are
    pre-truncated ints)."""
    import numpy as np

    box = np.asarray(box_xyxy, np.float32)
    w = box[..., 2] - box[..., 0]
    h = box[..., 3] - box[..., 1]
    mx = (w * margin_ratio).astype(np.int32)
    my = (h * margin_ratio).astype(np.int32)
    out = np.stack([
        np.maximum(box[..., 0].astype(np.int32) - mx, 0),
        np.maximum(box[..., 1].astype(np.int32) - my, 0),
        np.minimum(box[..., 2].astype(np.int32) + mx, img_w),
        np.minimum(box[..., 3].astype(np.int32) + my, img_h),
    ], axis=-1)
    return out
