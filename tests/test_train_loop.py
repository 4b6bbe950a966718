"""Training loop driver + multihost helpers + sharded encoder."""

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.models.clip.model import (
    CLIPVisionConfig,
)
from retrieval_based_object_detection_tpu.parallel import multihost as MH
from retrieval_based_object_detection_tpu.parallel.mesh import make_mesh
from retrieval_based_object_detection_tpu.train import loop as TL
from retrieval_based_object_detection_tpu.train import train as T

TINY = CLIPVisionConfig(image_size=32, patch_size=16, width=64, layers=1,
                        heads=1, embed_dim=16)


@pytest.fixture
def crop_tree(tmp_path, rng):
    for cls, col in (("a", (200, 30, 30)), ("b", (30, 30, 200))):
        d = tmp_path / "original_images" / cls
        d.mkdir(parents=True)
        for i in range(8):
            arr = np.full((40, 40, 3), col, np.uint8)
            arr += rng.integers(0, 30, arr.shape, dtype=np.uint8)
            Image.fromarray(arr).save(d / f"x{i}.png")
    return tmp_path


def test_fit_learns_and_checkpoints(crop_tree, tmp_path):
    mesh = make_mesh({"dp": 2, "tp": 4})
    cfg = TL.FitConfig(
        root_dir=str(crop_tree), epochs=3, batch_size=8,
        learning_rate=3e-3, compute_dtype="float32",
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=2)
    params, metrics = TL.fit(TINY, cfg, mesh)
    assert np.isfinite(metrics["loss"])
    # Two well-separated colour classes: should fit quickly.
    assert metrics["accuracy"] > 0.7, metrics

    # Resume path: restores the latest step and continues without error.
    cfg2 = TL.FitConfig(
        root_dir=str(crop_tree), epochs=1, batch_size=8,
        learning_rate=3e-3, compute_dtype="float32",
        checkpoint_dir=str(tmp_path / "ckpt"))
    params2, metrics2 = TL.fit(TINY, cfg2, mesh)
    assert metrics2["accuracy"] >= 0.7


def test_fit_augment_and_cosine_schedule(crop_tree):
    """The round-5 quality levers: train-time augmentation (label-
    preserving jitter in the loader) + warmup-cosine LR both run through
    fit() and still learn the two-colour toy problem."""
    mesh = make_mesh({"dp": 8})
    cfg = TL.FitConfig(
        root_dir=str(crop_tree), epochs=3, batch_size=8,
        learning_rate=3e-3, compute_dtype="float32",
        augment=True, lr_schedule="cosine")
    params, metrics = TL.fit(TINY, cfg, mesh)
    assert np.isfinite(metrics["loss"])
    assert metrics["accuracy"] > 0.7, metrics


def test_cosine_schedule_needs_horizon():
    with pytest.raises(ValueError, match="total_steps"):
        T.make_optimizer(T.TrainConfig(num_classes=2,
                                       lr_schedule="cosine"))
    with pytest.raises(ValueError, match="lr_schedule"):
        T.make_optimizer(T.TrainConfig(num_classes=2,
                                       lr_schedule="linear"))


def test_fit_errors_on_oversized_batch(crop_tree):
    mesh = make_mesh({"dp": 8})
    cfg = TL.FitConfig(root_dir=str(crop_tree), batch_size=64,
                       compute_dtype="float32")
    with pytest.raises(ValueError, match="batch_size"):
        TL.fit(TINY, cfg, mesh)


def test_sharded_encoder(rng):
    from retrieval_based_object_detection_tpu.models.clip.model import (
        init_params,
    )
    from retrieval_based_object_detection_tpu.pipelines.embed import (
        make_encoder,
        make_sharded_encoder,
    )

    mesh = make_mesh({"dp": 8})
    params = init_params(TINY, seed=0)
    enc_sharded = make_sharded_encoder(params, mesh, TINY,
                                       compute_dtype="float32")
    enc_single = make_encoder(params, TINY)
    x = rng.normal(size=(16, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(enc_sharded(x), enc_single(x), atol=2e-5)


# ------------------------------------------------------------ multihost
def test_host_shard_range_partition():
    ranges = [MH.host_shard_range(103, pid, 4) for pid in range(4)]
    assert ranges[0][0] == 0 and ranges[-1][1] == 103
    sizes = [e - s for s, e in ranges]
    assert sorted(sizes) == [25, 26, 26, 26]
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert e1 == s2


def test_merge_host_topk(rng):
    q, k = 3, 5
    s1 = rng.random((q, k)).astype(np.float32)
    s2 = rng.random((q, k)).astype(np.float32)
    i1 = rng.integers(0, 100, (q, k))
    i2 = rng.integers(100, 200, (q, k))
    ms, mi = MH.merge_host_topk([s1, s2], [i1, i2], k)
    all_s = np.concatenate([s1, s2], axis=1)
    ref = -np.sort(-all_s, axis=1)[:, :k]
    np.testing.assert_allclose(ms, ref)
    assert (np.diff(ms, axis=1) <= 0).all()


def test_initialize_noop_single_process():
    MH.initialize()  # must not raise without coordinator args
    pid, pcount = MH.process_info()
    assert pid == 0 and pcount == 1


def test_train_step_bf16(rng):
    """bf16 training path (the TPU default) must differentiate cleanly —
    regression for the conv-VJP mixed-dtype TypeError found on hardware."""
    mesh = make_mesh({"dp": 8})
    cfg = T.TrainConfig(num_classes=3, compute_dtype="bfloat16", remat=True)
    params, opt_state = T.init_state(TINY, cfg, seed=2)
    params, opt_state = T.place(params, opt_state, mesh)
    step = T.make_train_step(TINY, cfg, mesh)
    images = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(8,)).astype(np.int32)
    _, _, metrics = step(params, opt_state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
