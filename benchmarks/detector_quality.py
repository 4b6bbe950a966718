"""Detector quality benchmark: IoU@0.5 recall on labeled synthetic scenes.

The auto-labeler's proposer fills the reference's YOLOv8s slot
(11_dataset_labeling.py:96-99, conf 0.25 at :159); its output quality
gates every downstream stage, so it gets a measured number here instead
of vibes. Two scene families, ground-truth boxes known by construction:

  * studio   — near-uniform background, centered-ish textured object
               (the data 01/21 actually ingest: product shots)
  * cluttered— textured multi-gradient background, off-center object,
               distractor shapes, shadow, vignette (natural-photo stand-in)

Run: python benchmarks/detector_quality.py  (CPU fine)
Metrics: recall@IoU0.5, mean IoU of the primary box, per family.
"""

from __future__ import annotations

import numpy as np


def _texture(rng, h, w, cells=6, lo=0.0, hi=1.0):
    """Smooth random field in [lo, hi] (upsampled random grid)."""
    g = rng.random((cells, cells))
    ys = np.linspace(0, cells - 1, h)
    xs = np.linspace(0, cells - 1, w)
    y0 = np.clip(ys.astype(int), 0, cells - 2)
    x0 = np.clip(xs.astype(int), 0, cells - 2)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = g[y0][:, x0]
    b = g[y0][:, x0 + 1]
    c = g[y0 + 1][:, x0]
    d = g[y0 + 1][:, x0 + 1]
    v = a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx \
        + c * fy * (1 - fx) + d * fy * fx
    return lo + (hi - lo) * v


def _paint_shape(img, rng, cy, cx, ry, rx, color, power=2.5):
    h, w, _ = img.shape
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    m = (np.abs((ys - cy) / ry) ** power
         + np.abs((xs - cx) / rx) ** power) <= 1.0
    tex = 0.75 + 0.5 * _texture(rng, h, w, cells=8)
    for ch in range(3):
        img[..., ch] = np.where(m, np.clip(color[ch] * tex, 0, 255),
                                img[..., ch])
    return m


def make_scene(rng, family: str, h: int = 240, w: int = 320
               ) -> tuple[np.ndarray, np.ndarray]:
    """→ (uint8 image [h, w, 3], gt box xyxy)."""
    img = np.zeros((h, w, 3), np.float32)
    if family == "studio":
        base = rng.uniform(170, 240, 3)
        for ch in range(3):
            img[..., ch] = base[ch] * (0.92 + 0.08 * _texture(rng, h, w, 4))
        cy = rng.uniform(0.38, 0.62) * h
        cx = rng.uniform(0.38, 0.62) * w
        ry = rng.uniform(0.18, 0.33) * h
        rx = rng.uniform(0.14, 0.28) * w
        color = rng.uniform(20, 150, 3)
    else:  # cluttered
        for ch in range(3):
            img[..., ch] = 255 * _texture(rng, h, w, cells=5,
                                          lo=0.25, hi=0.8)
        # distractor shapes (smaller than the object)
        for _ in range(rng.integers(2, 5)):
            dcy = rng.uniform(0.1, 0.9) * h
            dcx = rng.uniform(0.1, 0.9) * w
            _paint_shape(img, rng, dcy, dcx,
                         rng.uniform(0.02, 0.06) * h,
                         rng.uniform(0.02, 0.06) * w,
                         rng.uniform(0, 255, 3))
        cy = rng.uniform(0.3, 0.7) * h
        cx = rng.uniform(0.3, 0.7) * w
        ry = rng.uniform(0.16, 0.3) * h
        rx = rng.uniform(0.12, 0.26) * w
        # saturated object colour, far from the mid-grey clutter band
        color = np.array([rng.uniform(180, 255), rng.uniform(0, 60),
                          rng.uniform(0, 60)])
        rng.shuffle(color)
        # soft shadow under the object
        sm_cy, sm_cx = cy + 0.6 * ry, cx + 0.25 * rx
        ys = np.arange(h)[:, None]
        xs = np.arange(w)[None, :]
        sh = (((ys - sm_cy) / (1.1 * ry)) ** 2
              + ((xs - sm_cx) / (1.2 * rx)) ** 2) <= 1.0
        img *= np.where(sh, 0.75, 1.0)[..., None]
    _paint_shape(img, rng, cy, cx, ry, rx, color)
    # vignette + sensor noise
    img *= (0.9 + 0.1 * _texture(rng, h, w, 3))[..., None]
    img += rng.normal(0, 4, img.shape)
    gt = np.array([cx - rx, cy - ry, cx + rx, cy + ry], np.float32)
    gt[0::2] = np.clip(gt[0::2], 0, w)
    gt[1::2] = np.clip(gt[1::2], 0, h)
    return np.clip(img, 0, 255).astype(np.uint8), gt


def iou(a: np.ndarray, b: np.ndarray) -> float:
    x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
    x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return float(inter / max(area_a + area_b - inter, 1e-9))


def evaluate(proposer, family: str, n: int = 64, seed: int = 0,
             conf_threshold: float = 0.25) -> dict:
    """Batched eval → {recall@0.5, mean_iou, detected_frac}."""
    rng = np.random.default_rng(seed)
    imgs, gts = [], []
    for _ in range(n):
        im, gt = make_scene(rng, family)
        imgs.append(im)
        gts.append(gt)
    boxes, conf = proposer(np.stack(imgs))
    ious, detected = [], 0
    for i in range(n):
        if conf[i, 0] < conf_threshold:
            ious.append(0.0)
            continue
        detected += 1
        ious.append(iou(np.asarray(boxes[i, 0]), gts[i]))
    ious = np.array(ious)
    return {
        "family": family,
        "recall@0.5": float((ious >= 0.5).mean()),
        "mean_iou": float(ious.mean()),
        "detected_frac": detected / n,
    }


def write_labeled_tree(root, rng, families=("studio", "cluttered"),
                       n_per_family: int = 48, size: int = 128) -> None:
    """Synthetic labeled dataset in the pipeline's directory contract
    (original_images/<class>/<img>.png + YOLO .txt), for training the
    TinyDet that fills the YOLOv8s slot."""
    from pathlib import Path

    from PIL import Image

    for family in families:
        d = Path(root) / "original_images" / family
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_per_family):
            img, gt = make_scene(rng, family, h=size, w=size)
            Image.fromarray(img).save(d / f"s{i}.png")
            xc = (gt[0] + gt[2]) / 2 / size
            yc = (gt[1] + gt[3]) / 2 / size
            w = (gt[2] - gt[0]) / size
            h = (gt[3] - gt[1]) / size
            (d / f"s{i}.txt").write_text(
                f"0 {xc:.6f} {yc:.6f} {w:.6f} {h:.6f}\n")


def evaluate_tinydet(tmp_dir: str | None = None, epochs: int = 30) -> dict:
    """Train TinyDet on synthetic scenes and score it with the same IoU
    harness (at its native square input size)."""
    import tempfile

    from retrieval_based_object_detection_tpu.models.detector import tinydet
    from retrieval_based_object_detection_tpu.train.detector_loop import (
        DetFitConfig,
        TinyDetDetector,
        fit_detector,
    )

    rng = np.random.default_rng(7)
    own_tmp = tmp_dir is None
    tmp = tmp_dir or tempfile.mkdtemp(prefix="tinydet_bench_")
    cfg = tinydet.TinyDetConfig(image_size=128)
    try:
        write_labeled_tree(tmp, rng, n_per_family=48, size=cfg.image_size)
        params, metrics = fit_detector(
            cfg, DetFitConfig(root_dir=tmp, img_type="original",
                              epochs=epochs, batch_size=16))
    finally:
        if own_tmp:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    det = TinyDetDetector(params, cfg, conf_threshold=0.25)

    def square_eval(family):
        imgs, gts = [], []
        eval_rng = np.random.default_rng(99)
        for _ in range(32):
            im, gt = make_scene(eval_rng, family, h=cfg.image_size,
                                w=cfg.image_size)
            imgs.append(im)
            gts.append(gt)
        boxes, conf = det(np.stack(imgs))
        ious = []
        for i in range(32):
            if conf[i, 0] < 0.25:
                ious.append(0.0)
                continue
            ious.append(iou(np.asarray(boxes[i, 0]), gts[i]))
        ious = np.array(ious)
        return {"family": family, "recall@0.5": float((ious >= 0.5).mean()),
                "mean_iou": float(ious.mean())}

    return {"train_loss": float(metrics.get("loss", float("nan"))),
            "studio": square_eval("studio"),
            "cluttered": square_eval("cluttered")}


def main():
    from retrieval_based_object_detection_tpu.models.detector import (
        SaliencyProposer,
    )
    from retrieval_based_object_detection_tpu.utils.platform import force_cpu

    force_cpu()
    prop = SaliencyProposer()
    for family in ("studio", "cluttered"):
        print(evaluate(prop, family))
    print({"tinydet": evaluate_tinydet()})


if __name__ == "__main__":
    main()
