"""TinyDet: trainable anchor-free single-stage detector (FCOS-style).

Fills the YOLO slot of the labeling stage (11_dataset_labeling.py:96-99,
159) for deployments that train on their own product data instead of the
weight-free saliency proposer. TPU-first shape discipline: fixed input
size, one stride-16 feature map, dense per-cell predictions, static-K
decode with an O(K²) vectorised greedy NMS — no dynamic shapes anywhere.

Architecture: 4 stride-2 conv stages (LayerNorm + GELU) → head with two
1×1 branches: objectness logit and LTRB distances (softplus-scaled). Loss:
sigmoid focal loss on objectness (positives = cells inside a GT box) +
IoU loss at positive cells.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TinyDetConfig:
    image_size: int = 256
    channels: tuple[int, ...] = (32, 64, 128, 256)
    head_dim: int = 128
    max_det: int = 16

    @property
    def stride(self) -> int:
        return 2 ** len(self.channels)

    @property
    def grid(self) -> int:
        return self.image_size // self.stride


def init_params(config: TinyDetConfig = TinyDetConfig(), seed: int = 0
                ) -> Params:
    rng = np.random.default_rng(seed)

    def conv(cin, cout, k):
        std = (k * k * cin) ** -0.5
        return {
            "kernel": rng.normal(0, std, (k, k, cin, cout)).astype(np.float32),
            "bias": np.zeros(cout, np.float32),
            "ln_scale": np.ones(cout, np.float32),
            "ln_bias": np.zeros(cout, np.float32),
        }

    chans = config.channels
    params: Params = {
        "stages": [conv(3 if i == 0 else chans[i - 1], chans[i], 3)
                   for i in range(len(chans))],
        "head_conv": conv(chans[-1], config.head_dim, 3),
        "obj": {
            "kernel": rng.normal(0, config.head_dim ** -0.5,
                                 (1, 1, config.head_dim, 1)).astype(np.float32),
            # Bias init so initial objectness ~ 1% (focal-loss convention).
            "bias": np.full(1, -4.59, np.float32),
        },
        "ltrb": {
            "kernel": rng.normal(0, config.head_dim ** -0.5,
                                 (1, 1, config.head_dim, 4)).astype(np.float32),
            "bias": np.zeros(4, np.float32),
        },
    }
    return jax.tree.map(jnp.asarray, params)


def _conv_ln_gelu(x, p, stride):
    x = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + p["bias"]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    x = x * p["ln_scale"] + p["ln_bias"]
    return jax.nn.gelu(x)


def forward(params: Params, images: jax.Array,
            config: TinyDetConfig = TinyDetConfig()) -> tuple[jax.Array, jax.Array]:
    """[B, S, S, 3] 0..255 → (obj_logits [B, g, g], ltrb [B, g, g, 4] px)."""
    x = images.astype(jnp.float32) / 127.5 - 1.0
    for p in params["stages"]:
        x = _conv_ln_gelu(x, p, 2)
    x = _conv_ln_gelu(x, params["head_conv"], 1)
    obj = jax.lax.conv_general_dilated(
        x, params["obj"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )[..., 0] + params["obj"]["bias"][0]
    ltrb = jax.lax.conv_general_dilated(
        x, params["ltrb"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + params["ltrb"]["bias"]
    ltrb = jax.nn.softplus(ltrb) * config.stride
    return obj, ltrb


def _cell_centers(g: int, stride: int):
    ys = (jax.lax.broadcasted_iota(jnp.float32, (g, g), 0) + 0.5) * stride
    xs = (jax.lax.broadcasted_iota(jnp.float32, (g, g), 1) + 0.5) * stride
    return xs, ys


@partial(jax.jit, static_argnames=("config", "conf_threshold", "iou_threshold"))
def decode(
    params: Params,
    images: jax.Array,
    config: TinyDetConfig = TinyDetConfig(),
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.5,
) -> tuple[jax.Array, jax.Array]:
    """→ (boxes [B, max_det, 4] xyxy px, scores [B, max_det]).

    conf_threshold defaults to the reference's 0.25
    (11_dataset_labeling.py:159); suppressed/empty slots score 0.
    """
    obj, ltrb = forward(params, images, config)
    B, g = obj.shape[0], obj.shape[1]
    xs, ys = _cell_centers(g, config.stride)
    boxes = jnp.stack([
        xs[None] - ltrb[..., 0], ys[None] - ltrb[..., 1],
        xs[None] + ltrb[..., 2], ys[None] + ltrb[..., 3],
    ], axis=-1)
    boxes = jnp.clip(boxes, 0.0, config.image_size)
    scores = jax.nn.sigmoid(obj).reshape(B, g * g)
    boxes = boxes.reshape(B, g * g, 4)

    K = config.max_det
    top_scores, top_idx = jax.lax.top_k(scores, K)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_scores = jnp.where(top_scores >= conf_threshold, top_scores, 0.0)

    # Vectorised greedy NMS over the K candidates (K small, static).
    iou = _pairwise_iou(top_boxes, top_boxes)  # [B, K, K]

    def nms_body(i, keep):
        # Suppress j>i overlapping a kept i with IoU>threshold.
        keep_i = jnp.take(keep, i, axis=1)[:, None]
        sup = (jnp.take(iou, i, axis=1) > iou_threshold) & keep_i & \
            (jnp.arange(K)[None, :] > i)
        return keep & ~sup

    keep = top_scores > 0.0
    keep = jax.lax.fori_loop(0, K, nms_body, keep)
    return top_boxes, jnp.where(keep, top_scores, 0.0)


def _pairwise_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """[..., K, 4] x [..., K, 4] → [..., K, K] IoU."""
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0) * \
        jnp.maximum(a[..., 3] - a[..., 1], 0)
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0) * \
        jnp.maximum(b[..., 3] - b[..., 1], 0)
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-6)


# ------------------------------------------------------------ training
def loss_fn(params, images, gt_boxes, gt_valid, config: TinyDetConfig):
    """Focal objectness + IoU box loss.

    gt_boxes [B, M, 4] xyxy px, gt_valid [B, M] bool (padded GT slots).
    """
    obj, ltrb = forward(params, images, config)
    B, g = obj.shape[0], obj.shape[1]
    xs, ys = _cell_centers(g, config.stride)

    # Cell (x, y) positive iff inside any valid GT box.
    inside = (
        (xs[None, :, :, None] >= gt_boxes[:, None, None, :, 0]) &
        (xs[None, :, :, None] < gt_boxes[:, None, None, :, 2]) &
        (ys[None, :, :, None] >= gt_boxes[:, None, None, :, 1]) &
        (ys[None, :, :, None] < gt_boxes[:, None, None, :, 3]) &
        gt_valid[:, None, None, :]
    )  # [B, g, g, M]
    pos = jnp.any(inside, axis=-1)
    # Each positive cell regresses to the first box containing it.
    first = jnp.argmax(inside, axis=-1)  # [B, g, g]
    tgt = jnp.take_along_axis(
        gt_boxes[:, None, None, :, :],
        first[..., None, None], axis=3,
    )[..., 0, :]  # [B, g, g, 4]

    # Focal BCE on objectness.
    p = jax.nn.sigmoid(obj)
    t = pos.astype(jnp.float32)
    pt = p * t + (1 - p) * (1 - t)
    alpha = 0.25 * t + 0.75 * (1 - t)
    bce = -jnp.log(jnp.clip(pt, 1e-6))
    focal = jnp.mean(alpha * (1 - pt) ** 2 * bce)

    # IoU loss at positive cells.
    pred = jnp.stack([
        xs[None] - ltrb[..., 0], ys[None] - ltrb[..., 1],
        xs[None] + ltrb[..., 2], ys[None] + ltrb[..., 3],
    ], axis=-1)
    lt = jnp.maximum(pred[..., :2], tgt[..., :2])
    rb = jnp.minimum(pred[..., 2:], tgt[..., 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_p = jnp.maximum(pred[..., 2] - pred[..., 0], 0) * \
        jnp.maximum(pred[..., 3] - pred[..., 1], 0)
    area_t = jnp.maximum(tgt[..., 2] - tgt[..., 0], 0) * \
        jnp.maximum(tgt[..., 3] - tgt[..., 1], 0)
    iou = inter / jnp.maximum(area_p + area_t - inter, 1e-6)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    iou_loss = jnp.sum(jnp.where(pos, 1.0 - iou, 0.0)) / n_pos
    return focal * 10.0 + iou_loss, {"focal": focal, "iou_loss": iou_loss,
                                     "n_pos": n_pos}


def make_train_step(config: TinyDetConfig, learning_rate: float = 1e-3):
    import optax

    tx = optax.adam(learning_rate)

    @jax.jit
    def step(params, opt_state, images, gt_boxes, gt_valid):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, gt_boxes, gt_valid, config)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, **aux}

    def init(params):
        return tx.init(params)

    return step, init
