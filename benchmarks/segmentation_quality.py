"""Segmentation quality benchmark: center-point best-of-3 mask IoU
(VERDICT r2 missing #3 / weak #5).

The reference's SAM contract is a single center-point prompt with
``multimask_output=True`` and best-of-3 selection by predicted score
(22_segment_image_auto.py:141-152). The detector got a measured quality
number in round 2 (benchmarks/detector_quality.py); this gives the
segmenter the same treatment on synthetic scenes whose ground-truth
masks are known by construction:

  * random-init SAM        — the floor this repo's zero-egress hardware
                             runs necessarily operate at
  * fitted SAM             — the in-repo training path
                             (train.sam_loop.fit_sam) on held-out scenes

(The converted-official-checkpoint path is container-validated in
tests/test_official_checkpoint_format.py; real-weight mask quality needs
the real fetch.)

Metrics per family: mean IoU of the score-picked mask, IoU@0.5 rate, and
the best-of-3 ORACLE mean IoU (how good selection could be — the gap is
the IoU head's ranking error).

Run: JAX_PLATFORMS=cpu python benchmarks/segmentation_quality.py
"""

from __future__ import annotations

import numpy as np

from benchmarks.detector_quality import _paint_shape, _texture


def make_masked_scene(rng, family: str, size: int = 64
                      ) -> tuple[np.ndarray, np.ndarray]:
    """→ (uint8 [S, S, 3], bool [S, S] ground-truth object mask). The
    object straddles the center so the center-point prompt lands on it
    (the contract under test is mask quality, not prompt robustness)."""
    h = w = size
    img = np.zeros((h, w, 3), np.float32)
    if family == "studio":
        base = rng.uniform(170, 240, 3)
        for ch in range(3):
            img[..., ch] = base[ch] * (0.92 + 0.08 * _texture(rng, h, w, 4))
        color = rng.uniform(20, 150, 3)
    else:  # cluttered
        for ch in range(3):
            img[..., ch] = 255 * _texture(rng, h, w, cells=5,
                                          lo=0.25, hi=0.8)
        for _ in range(rng.integers(2, 5)):
            _paint_shape(img, rng,
                         rng.uniform(0.1, 0.9) * h,
                         rng.uniform(0.1, 0.9) * w,
                         rng.uniform(0.03, 0.08) * h,
                         rng.uniform(0.03, 0.08) * w,
                         rng.uniform(0, 255, 3))
        color = np.array([rng.uniform(180, 255), rng.uniform(0, 60),
                          rng.uniform(0, 60)])
        rng.shuffle(color)
    cy = (0.5 + rng.uniform(-0.06, 0.06)) * h
    cx = (0.5 + rng.uniform(-0.06, 0.06)) * w
    ry = rng.uniform(0.22, 0.38) * h
    rx = rng.uniform(0.2, 0.36) * w
    m = _paint_shape(img, rng, cy, cx, ry, rx, color,
                     power=rng.uniform(1.5, 4.0))
    img *= (0.9 + 0.1 * _texture(rng, h, w, 3))[..., None]
    img += rng.normal(0, 4, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8), m


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter / max(union, 1))


def _scenes(rng, family: str, n: int, size: int):
    imgs, gts = [], []
    for _ in range(n):
        im, m = make_masked_scene(rng, family, size)
        imgs.append(im)
        gts.append(m)
    return imgs, gts


def evaluate_predictor(predictor, imgs, gts, batch: int = 16) -> dict:
    """Center-point best-of-3 protocol (22a:141-152) over scenes."""
    picked, oracle = [], []
    for i in range(0, len(imgs), batch):
        out = predictor.segment_batch(imgs[i: i + batch])
        for (masks, scores), gt in zip(out, gts[i: i + batch]):
            ious = [mask_iou(m, gt) for m in masks]
            picked.append(ious[int(np.argmax(scores))])
            oracle.append(max(ious))
    picked = np.array(picked)
    return {
        "mean_iou": round(float(picked.mean()), 4),
        "iou@0.5": round(float((picked >= 0.5).mean()), 4),
        "oracle_mean_iou": round(float(np.mean(oracle)), 4),
    }


def _bench_config():
    from retrieval_based_object_detection_tpu.models.sam.decoder import (
        DecoderConfig,
    )
    from retrieval_based_object_detection_tpu.models.sam.encoder import (
        EncoderConfig,
    )
    from retrieval_based_object_detection_tpu.models.sam.model import (
        SamConfig,
    )

    return SamConfig(
        encoder=EncoderConfig(img_size=64, patch_size=8, embed_dim=64,
                              depth=2, heads=2, out_chans=32,
                              window_size=4, global_attn_indexes=(1,)),
        decoder=DecoderConfig(embed_dim=32, depth=2, heads=2, mlp_dim=64,
                              iou_head_hidden=32),
    )


def evaluate(n_train: int = 96, n_test: int = 24, epochs: int = 25,
             seed: int = 0) -> dict:
    """→ {"floor": {family: metrics}, "fitted": {...}, "train": m}."""
    from retrieval_based_object_detection_tpu.models.sam import model as SM
    from retrieval_based_object_detection_tpu.train.sam_loop import (
        SamFitConfig,
        fit_sam,
    )

    config = _bench_config()
    size = config.img_size
    rng = np.random.default_rng(seed)
    tr_imgs, tr_gts = [], []
    for fam in ("studio", "cluttered"):
        i, g = _scenes(rng, fam, n_train // 2, size)
        tr_imgs += i
        tr_gts += g
    fitted, train_metrics = fit_sam(
        config, np.stack(tr_imgs), np.stack(tr_gts),
        cfg=SamFitConfig(epochs=epochs, seed=seed))
    floor = SM.init_params(config, seed=seed)

    out: dict = {"train": train_metrics}
    test_rng = np.random.default_rng(seed + 1000)  # held-out draws
    for fam in ("studio", "cluttered"):
        te_imgs, te_gts = _scenes(test_rng, fam, n_test, size)
        for name, params in (("floor", floor), ("fitted", fitted)):
            pred = SM.SamPredictor(params, config)
            out.setdefault(name, {})[fam] = evaluate_predictor(
                pred, te_imgs, te_gts)
    return out


def main():
    from retrieval_based_object_detection_tpu.utils.platform import force_cpu

    force_cpu()
    res = evaluate()
    print("center-point best-of-3 mask IoU (held-out scenes); train",
          res["train"])
    for name in ("floor", "fitted"):
        for fam, m in res[name].items():
            print(f"  {name:7s} {fam:9s}: {m}")


if __name__ == "__main__":
    main()
