"""YOLOv8 detection graph in JAX — the reference's auto-label model.

The reference labels every image with pretrained ``model/yolov8s.pt`` at
conf 0.25, keeping top-K boxes by confidence
(11_dataset_labeling.py:10, 96-99, 159, 178-180). This module rebuilds
the v8 detect architecture TPU-natively: NHWC convs jit-compiled as one
fused dispatch per batch, static shapes throughout, anchor-free DFL
decode on device, NMS host-side (tiny K, data-dependent control flow —
exactly what should NOT live inside jit).

Architecture (ultralytics v8 detect layout, all variants n/s/m/l/x by
depth/width multiples): CSPDarknet backbone (Conv stem → C2f stages →
SPPF) + PAN-FPN neck (upsample/concat C2f, downsample Convs) + decoupled
head per stride {8, 16, 32}: a box branch emitting 4×reg_max DFL logits
and a class branch emitting nc logits. Param tree indices mirror the
torch checkpoint's ``model.{i}.…`` module numbering 1:1 so conversion
(models/yolo/convert.py) is a pure rename.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    """Static architecture description (hashable → jit static arg)."""
    depth_mult: float = 0.33          # yolov8s
    width_mult: float = 0.50
    max_channels: int = 1024
    num_classes: int = 80
    reg_max: int = 16
    strides: tuple[int, ...] = (8, 16, 32)

    def ch(self, c: int) -> int:
        """make_divisible(min(c, max_channels) * width, 8)."""
        return max(8, int(
            math.ceil(min(c, self.max_channels) * self.width_mult / 8) * 8))

    def n(self, n: int) -> int:
        return max(1, round(n * self.depth_mult))


# The named variants (ultralytics yolov8.yaml scales).
VARIANTS: dict[str, YoloConfig] = {
    "yolov8n": YoloConfig(0.33, 0.25, 1024),
    "yolov8s": YoloConfig(0.33, 0.50, 1024),
    "yolov8m": YoloConfig(0.67, 0.75, 768),
    "yolov8l": YoloConfig(1.00, 1.00, 512),
    "yolov8x": YoloConfig(1.00, 1.25, 512),
}

# (kind, args) per torch module index. conv: (c_out, k, stride);
# c2f: (c_out, base_repeats, shortcut); concat: source layer index
# (plus the running tensor); detect: the three feature layer indices.
SPEC: tuple = (
    ("conv", 64, 3, 2),        # 0  P1/2
    ("conv", 128, 3, 2),       # 1  P2/4
    ("c2f", 128, 3, True),     # 2
    ("conv", 256, 3, 2),       # 3  P3/8
    ("c2f", 256, 6, True),     # 4
    ("conv", 512, 3, 2),       # 5  P4/16
    ("c2f", 512, 6, True),     # 6
    ("conv", 1024, 3, 2),      # 7  P5/32
    ("c2f", 1024, 3, True),    # 8
    ("sppf", 1024, 5),         # 9
    ("upsample",),             # 10
    ("concat", 6),             # 11
    ("c2f", 512, 3, False),    # 12
    ("upsample",),             # 13
    ("concat", 4),             # 14
    ("c2f", 256, 3, False),    # 15 (P3 head in)
    ("conv", 256, 3, 2),       # 16
    ("concat", 12),            # 17
    ("c2f", 512, 3, False),    # 18 (P4 head in)
    ("conv", 512, 3, 2),       # 19
    ("concat", 9),             # 20
    ("c2f", 1024, 3, False),   # 21 (P5 head in)
    ("detect", (15, 18, 21)),  # 22
)


# ------------------------------------------------------------------ init
def _init_conv(rng, c_in, c_out, k) -> dict:
    w = rng.normal(size=(k, k, c_in, c_out)).astype(np.float32)
    w *= 1.0 / np.sqrt(k * k * c_in)
    return {"w": w,
            "bn": {"gamma": np.ones(c_out, np.float32),
                   "beta": np.zeros(c_out, np.float32),
                   "mean": np.zeros(c_out, np.float32),
                   "var": np.ones(c_out, np.float32)}}


def _init_c2f(rng, c_in, c_out, n) -> dict:
    c = c_out // 2
    return {
        "cv1": _init_conv(rng, c_in, 2 * c, 1),
        "cv2": _init_conv(rng, (2 + n) * c, c_out, 1),
        "m": [{"cv1": _init_conv(rng, c, c, 3),
               "cv2": _init_conv(rng, c, c, 3)} for _ in range(n)],
    }


def init_params(config: YoloConfig, seed: int = 0) -> list:
    """Random-init param list, one entry per SPEC index (shapes identical
    to a converted official checkpoint — the converter's parity oracle)."""
    rng = np.random.default_rng(seed)
    ch: list[int] = []   # output channels per layer
    params: list = []
    c_prev = 3
    for spec in SPEC:
        kind = spec[0]
        if kind == "conv":
            c_out = config.ch(spec[1])
            params.append(_init_conv(rng, c_prev, c_out, spec[2]))
            c_prev = c_out
        elif kind == "c2f":
            c_out = config.ch(spec[1])
            params.append(_init_c2f(rng, c_prev, c_out, config.n(spec[2])))
            c_prev = c_out
        elif kind == "sppf":
            c_out = config.ch(spec[1])
            c_h = c_prev // 2
            params.append({"cv1": _init_conv(rng, c_prev, c_h, 1),
                           "cv2": _init_conv(rng, c_h * 4, c_out, 1)})
            c_prev = c_out
        elif kind == "upsample":
            params.append({})
        elif kind == "concat":
            params.append({})
            c_prev = c_prev + ch[spec[1]]
        elif kind == "detect":
            srcs = spec[1]
            chs = [ch[i] for i in srcs]
            c2 = max(16, chs[0] // 4, config.reg_max * 4)
            c3 = max(chs[0], min(config.num_classes, 100))
            det = {"cv2": [], "cv3": [],
                   "dfl": np.arange(config.reg_max,
                                    dtype=np.float32).reshape(
                       1, 1, config.reg_max, 1)}
            for c_in in chs:
                det["cv2"].append([
                    _init_conv(rng, c_in, c2, 3),
                    _init_conv(rng, c2, c2, 3),
                    {"w": rng.normal(size=(1, 1, c2, 4 * config.reg_max)
                                     ).astype(np.float32) / np.sqrt(c2),
                     "b": np.ones(4 * config.reg_max, np.float32)},
                ])
                det["cv3"].append([
                    _init_conv(rng, c_in, c3, 3),
                    _init_conv(rng, c3, c3, 3),
                    {"w": rng.normal(size=(1, 1, c3, config.num_classes)
                                     ).astype(np.float32) / np.sqrt(c3),
                     "b": np.full(config.num_classes, -5.0, np.float32)},
                ])
            params.append(det)
        else:  # pragma: no cover - spec is a closed set
            raise ValueError(kind)
        ch.append(c_prev)
    return params


# --------------------------------------------------------------- forward
def _conv(p: dict, x: jax.Array, stride: int = 1, act: bool = True
          ) -> jax.Array:
    k = p["w"].shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bn" in p:
        bn = p["bn"]
        inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + 1e-3)
        scale = (bn["gamma"] * inv).astype(x.dtype)
        shift = (bn["beta"] - bn["mean"] * bn["gamma"] * inv).astype(x.dtype)
        y = y * scale + shift
    else:
        y = y + p["b"].astype(x.dtype)
    return jax.nn.silu(y) if act else y


def _c2f(p: dict, x: jax.Array, shortcut: bool) -> jax.Array:
    y = _conv(p["cv1"], x)
    a, b = jnp.split(y, 2, axis=-1)
    outs = [a, b]
    for m in p["m"]:
        h = _conv(m["cv2"], _conv(m["cv1"], outs[-1]))
        outs.append(outs[-1] + h if shortcut else h)
    return _conv(p["cv2"], jnp.concatenate(outs, axis=-1))


def _sppf(p: dict, x: jax.Array, k: int) -> jax.Array:
    y = _conv(p["cv1"], x)
    pads = [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)]
    outs = [y]
    for _ in range(3):
        outs.append(jax.lax.reduce_window(
            outs[-1], -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
            pads))
    return _conv(p["cv2"], jnp.concatenate(outs, axis=-1))


def _upsample2x(x: jax.Array) -> jax.Array:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def forward_features(params: list, images: jax.Array,
                     config: YoloConfig) -> list[jax.Array]:
    """images [B, H, W, 3] float 0..1 → per-stride raw heads
    [B, Hi, Wi, 4*reg_max + nc] (box DFL logits then class logits)."""
    x = images
    saved: dict[int, jax.Array] = {}
    needed = {6, 4, 12, 9} | set(SPEC[-1][1])
    for i, spec in enumerate(SPEC):
        kind = spec[0]
        if kind == "conv":
            x = _conv(params[i], x, stride=spec[3])
        elif kind == "c2f":
            x = _c2f(params[i], x, shortcut=spec[3])
        elif kind == "sppf":
            x = _sppf(params[i], x, k=spec[2])
        elif kind == "upsample":
            x = _upsample2x(x)
        elif kind == "concat":
            x = jnp.concatenate([x, saved[spec[1]]], axis=-1)
        elif kind == "detect":
            det = params[i]
            outs = []
            for s, src in enumerate(spec[1]):
                f = saved[src]
                box = _conv(det["cv2"][s][1],
                            _conv(det["cv2"][s][0], f))
                box = _conv(det["cv2"][s][2], box, act=False)
                cls = _conv(det["cv3"][s][1],
                            _conv(det["cv3"][s][0], f))
                cls = _conv(det["cv3"][s][2], cls, act=False)
                outs.append(jnp.concatenate([box, cls], axis=-1))
            return outs
        if i in needed:
            saved[i] = x
    raise AssertionError("SPEC has no detect layer")  # pragma: no cover


@partial(jax.jit, static_argnames=("config",))
def predict(params: list, images: jax.Array, config: YoloConfig
            ) -> tuple[jax.Array, jax.Array]:
    """One fused dispatch: [B, H, W, 3] float 0..1 →
    (boxes [B, A, 4] xyxy px, class_probs [B, A, nc]) over all anchors
    A = Σ (H/s)(W/s). DFL decode: softmax over reg_max bins per side →
    expectation → ltrb cell distances → xyxy at the anchor's stride."""
    heads = forward_features(params, images, config)
    rm, nc = config.reg_max, config.num_classes
    dfl_w = jnp.asarray(params[-1]["dfl"]).reshape(rm)
    boxes_all, cls_all = [], []
    for head, stride in zip(heads, config.strides):
        B, H, W, _ = head.shape
        box = head[..., : 4 * rm].reshape(B, H * W, 4, rm)
        dist = jnp.sum(jax.nn.softmax(box.astype(jnp.float32), axis=-1)
                       * dfl_w, axis=-1)                 # [B, HW, 4] ltrb
        ys = (jnp.arange(H, dtype=jnp.float32) + 0.5)
        xs = (jnp.arange(W, dtype=jnp.float32) + 0.5)
        cx = jnp.tile(xs[None, :], (H, 1)).reshape(-1)
        cy = jnp.tile(ys[:, None], (1, W)).reshape(-1)
        x1 = (cx[None] - dist[..., 0]) * stride
        y1 = (cy[None] - dist[..., 1]) * stride
        x2 = (cx[None] + dist[..., 2]) * stride
        y2 = (cy[None] + dist[..., 3]) * stride
        boxes_all.append(jnp.stack([x1, y1, x2, y2], axis=-1))
        cls_all.append(jax.nn.sigmoid(
            head[..., 4 * rm:].astype(jnp.float32)).reshape(B, H * W, nc))
    return (jnp.concatenate(boxes_all, axis=1),
            jnp.concatenate(cls_all, axis=1))


# ------------------------------------------------------------------- NMS
def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float = 0.45,
        max_det: int = 300) -> np.ndarray:
    """Host-side greedy NMS → kept indices (scores descending)."""
    order = np.argsort(-scores)
    keep: list[int] = []
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    while order.size and len(keep) < max_det:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = (np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0))
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return np.asarray(keep, np.int64)


def postprocess(boxes: np.ndarray, cls_probs: np.ndarray,
                conf_threshold: float = 0.25, iou_threshold: float = 0.45,
                max_det: int = 300, agnostic: bool = False
                ) -> list[dict]:
    """Per image: conf gate on the best class, per-class NMS (offset
    trick — ultralytics semantics), detections sorted by confidence.
    Returns [{"boxes": [K,4], "scores": [K], "classes": [K]}] per image.
    """
    out = []
    for b in range(boxes.shape[0]):
        conf = cls_probs[b].max(axis=1)
        cls = cls_probs[b].argmax(axis=1)
        m = conf >= conf_threshold
        bb, cc, kk = boxes[b][m], conf[m], cls[m]
        if bb.shape[0] == 0:
            out.append({"boxes": np.zeros((0, 4), np.float32),
                        "scores": np.zeros(0, np.float32),
                        "classes": np.zeros(0, np.int64)})
            continue
        off = (0 if agnostic
               else (kk[:, None] * (bb.max() + 1.0)).astype(np.float32))
        keep = nms(bb + off, cc, iou_threshold, max_det)
        out.append({"boxes": bb[keep].astype(np.float32),
                    "scores": cc[keep].astype(np.float32),
                    "classes": kk[keep]})
    return out
