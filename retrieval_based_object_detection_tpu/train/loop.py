"""Training loop driver: fine-tune the CLIP tower on a labeled crop tree.

Completes the training story around train.train's sharded step: walks a
``dataset_cropped``-style tree, builds (image, class-id) batches with the
prefetching loader, runs the dp×tp step, logs throughput, and checkpoints
with resume (utils.checkpoint.TrainCheckpointer).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from retrieval_based_object_detection_tpu.models.clip import model as clip_model
from retrieval_based_object_detection_tpu.models.clip import preprocess as pp
from retrieval_based_object_detection_tpu.train import train as T
from retrieval_based_object_detection_tpu.utils import tree
from retrieval_based_object_detection_tpu.utils.loader import (
    PrefetchIterator,
    batched,
)
from retrieval_based_object_detection_tpu.utils.logging import (
    StageLogger,
    ThroughputTimer,
)


@dataclasses.dataclass
class FitConfig:
    root_dir: str
    img_type: str = "original"
    epochs: int = 1
    batch_size: int = 32
    learning_rate: float = 1e-4
    checkpoint_dir: str | None = None
    checkpoint_every: int = 100
    seed: int = 0
    compute_dtype: str = "bfloat16"
    head: str = "linear"  # "linear" | "cosine" (see train.TrainConfig)
    lr_schedule: str = "constant"  # "constant" | "cosine" (warmup+decay)
    # Train-time augmentation (label-preserving for product crops:
    # brightness jitter, wraparound translation, pixel noise — NO flips
    # or right-angle rotations, which remap oriented textures across
    # classes). Stochastic per epoch, so fixed trees stop being
    # memorised verbatim. Measured: DESIGN "Retrieval quality (r5)".
    augment: bool = False


def fit(
    clip_config: clip_model.CLIPVisionConfig,
    cfg: FitConfig,
    mesh,
    params=None,
) -> tuple[dict, dict]:
    """Runs the fine-tune; returns (final_params, last_metrics)."""
    entries = tree.walk(cfg.root_dir, cfg.img_type)
    classes = sorted({e.class_name for e in entries})
    class_to_id = {c: i for i, c in enumerate(classes)}
    if not entries:
        raise ValueError(f"no images under {cfg.root_dir}/{cfg.img_type}_images")

    steps_per_epoch = len(entries) // cfg.batch_size
    tcfg = T.TrainConfig(num_classes=len(classes),
                         learning_rate=cfg.learning_rate,
                         compute_dtype=cfg.compute_dtype,
                         head=cfg.head,
                         lr_schedule=cfg.lr_schedule,
                         total_steps=max(cfg.epochs * steps_per_epoch, 1))
    state_params, opt_state = T.init_state(clip_config, tcfg,
                                           seed=cfg.seed, params=params)
    state_params, opt_state = T.place(state_params, opt_state, mesh)
    step_fn = T.make_train_step(clip_config, tcfg, mesh)

    ckptr = None
    start_step = 0
    if cfg.checkpoint_dir:
        from retrieval_based_object_detection_tpu.utils.checkpoint import (
            TrainCheckpointer,
        )

        ckptr = TrainCheckpointer(cfg.checkpoint_dir)
        latest = ckptr.latest_step()
        # Pin the label mapping to the checkpoint: class_to_id derives
        # from the CURRENT tree, so resuming after a class was renamed
        # or swapped (same count, head shape matches) would silently
        # train on remapped supervision. classes.json records the
        # mapping at first save; a mismatch on resume fails loudly.
        import json as _json
        from pathlib import Path as _Path

        classes_file = _Path(cfg.checkpoint_dir) / "classes.json"
        if latest is not None and classes_file.exists():
            saved = _json.loads(classes_file.read_text())
            if saved != classes:
                raise ValueError(
                    f"checkpoint {cfg.checkpoint_dir} was trained on "
                    f"classes {saved} but the tree now has {classes}; "
                    "label ids would be silently remapped — train into "
                    "a fresh --checkpoint-dir (or restore the tree)")
        if not classes_file.exists():
            classes_file.parent.mkdir(parents=True, exist_ok=True)
            classes_file.write_text(_json.dumps(classes))
        if latest is not None:
            restored = ckptr.restore(
                {"params": state_params, "opt_state": opt_state})
            state_params = restored["params"]
            opt_state = restored["opt_state"]
            state_params, opt_state = T.place(state_params, opt_state, mesh)
            start_step = latest

    log = StageLogger("train")
    timer = ThroughputTimer("images")
    rng = np.random.default_rng(cfg.seed)
    aug_rng = np.random.default_rng(cfg.seed + 7919)
    # Brightness jitter operates on RAW pixel values; in normalised
    # space (x - m)/s a raw scale b becomes b·x + (b-1)·m/s.
    mean_over_std = (pp.CLIP_MEAN / pp.CLIP_STD).astype(np.float32)
    metrics = {}
    step = start_step

    def augment(arr: np.ndarray) -> np.ndarray:
        b = np.float32(aug_rng.uniform(0.85, 1.15))
        arr = b * arr + (b - 1.0) * mean_over_std
        s = arr.shape[0]
        ty, tx = aug_rng.integers(-(s // 8), s // 8 + 1, size=2)
        # Wraparound translation: cheap, static-shape; the wrapped strip
        # is background/clutter, never the (centered) object.
        arr = np.roll(arr, (ty, tx), axis=(0, 1))
        arr = arr + aug_rng.normal(0.0, 0.04, arr.shape)
        return arr.astype(np.float32)

    def prepare(chunk):
        imgs, labels = [], []
        for e in chunk:
            arr = pp.load_and_preprocess(e.path, size=clip_config.image_size)
            if arr is None:
                continue
            imgs.append(augment(arr) if cfg.augment else arr)
            labels.append(class_to_id[e.class_name])
        return imgs, labels

    for epoch in range(cfg.epochs):
        order = rng.permutation(len(entries))
        shuffled = [entries[i] for i in order]
        # Drop the ragged tail: the jitted step needs static batch shapes.
        full = shuffled[: len(shuffled) - len(shuffled) % cfg.batch_size]
        if not full:
            raise ValueError(
                f"batch_size {cfg.batch_size} exceeds dataset size "
                f"{len(shuffled)}")
        loader = PrefetchIterator(batched(full, cfg.batch_size), prepare)
        n_fill = 0
        try:
            for imgs, labels in loader:
                if not imgs:
                    continue
                # Decode failures shrink the batch; refill by cycling the
                # good samples (static shapes) instead of dropping the
                # whole batch — counted and logged below.
                orig_n = len(imgs)
                while len(imgs) < cfg.batch_size:
                    j = (len(imgs) - orig_n) % orig_n
                    imgs.append(imgs[j])
                    labels.append(labels[j])
                    n_fill += 1
                x = np.stack(imgs)
                y = np.asarray(labels, np.int32)
                state_params, opt_state, metrics = step_fn(
                    state_params, opt_state, x, y)
                step += 1
                timer.add(len(imgs))
                if ckptr and step % cfg.checkpoint_every == 0:
                    ckptr.save(step, {
                        "params": jax.device_get(state_params),
                        "opt_state": jax.device_get(opt_state)})
        finally:
            loader.close()
        if n_fill:
            log.event("refill", repeated_samples=n_fill)
        if not metrics:
            raise ValueError(
                "no trainable batches survived decoding — check the tree "
                f"under {cfg.root_dir}")
        log.event("epoch", epoch=epoch,
                  loss=round(float(metrics["loss"]), 4),
                  accuracy=round(float(metrics["accuracy"]), 4),
                  throughput=round(timer.per_sec, 1))

    if ckptr:
        ckptr.save(step, {"params": jax.device_get(state_params),
                          "opt_state": jax.device_get(opt_state)})
        ckptr.close()
    log.summary(steps=step, classes=len(classes))
    return state_params, {k: float(v) for k, v in metrics.items()}
