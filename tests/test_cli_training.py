"""CLI training commands: fit-detector -> label --detector tinydet, and
finetune -> embed with the produced checkpoint dir."""

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.cli.main import main


@pytest.fixture
def labeled_project(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    for cls, col in (("cola", (210, 40, 40)), ("fanta", (240, 140, 30))):
        d = tmp_path / "dataset_jpeg" / "original_images" / cls
        d.mkdir(parents=True)
        for i in range(5):
            a = np.full((96, 96, 3), 228, np.uint8)
            a[24:72, 20:76] = col
            a += rng.integers(0, 8, a.shape, dtype=np.uint8)
            Image.fromarray(a).save(d / f"p{i}.jpg")
            (d / f"p{i}.txt").write_text("0 0.5 0.5 0.58 0.5\n")
    return tmp_path


def test_fit_detector_then_label(labeled_project, capsys):
    assert main(["fit-detector", "--epochs", "3", "--batch-size", "4",
                 "--image-size", "96", "--out", "det_ckpt"]) == 0
    assert (labeled_project / "det_ckpt" / "tinydet_config.json").exists()
    # relabel with the trained detector (overwrite the synthetic labels)
    assert main(["label", "--type", "original", "--detector", "tinydet",
                 "--detector-checkpoint", "det_ckpt", "--overwrite"]) == 0
    out = capsys.readouterr().out
    assert "labeled=" in out


def test_label_tinydet_requires_checkpoint(labeled_project, capsys):
    assert main(["label", "--detector", "tinydet"]) == 2


def test_finetune_then_embed(labeled_project, capsys):
    # Tiny tower via a converted-checkpoint dir so the test stays fast.
    import dataclasses
    import json

    from retrieval_based_object_detection_tpu.models.clip.model import (
        CLIPVisionConfig,
        init_params,
    )
    from retrieval_based_object_detection_tpu.utils.checkpoint import (
        save_params,
    )

    tiny = CLIPVisionConfig(image_size=32, patch_size=16, width=64,
                            layers=2, heads=2, embed_dim=32)
    (labeled_project / "tiny").mkdir()
    (labeled_project / "tiny" / "clip_config.json").write_text(
        json.dumps(dataclasses.asdict(tiny)))
    save_params(init_params(tiny, seed=0), labeled_project / "tiny/params")

    assert main(["finetune", "--root", "dataset_jpeg", "--epochs", "1",
                 "--batch-size", "4", "--compute-dtype", "float32",
                 "--clip-checkpoint", "tiny", "--out", "ft_ckpt",
                 "--dp", "2", "--tp", "2"]) == 0
    out = capsys.readouterr().out
    assert "finetune done" in out and "dp=2 tp=2" in out
    # The output dir is a loadable --clip-checkpoint.
    assert main(["embed", "--root", "dataset_jpeg", "--type", "original",
                 "--store", "gs", "--collection", "m",
                 "--clip-checkpoint", "ft_ckpt", "--batch-size", "4"]) == 0


def test_resume_rejects_changed_class_set(labeled_project, rng):
    """Resuming into a checkpoint dir after a class was renamed (same
    count — the head shape would still match) must fail loudly: label
    ids would silently remap otherwise."""
    import dataclasses
    import json
    import shutil

    from retrieval_based_object_detection_tpu.models.clip.model import (
        CLIPVisionConfig,
        init_params,
    )
    from retrieval_based_object_detection_tpu.parallel.mesh import make_mesh
    from retrieval_based_object_detection_tpu.train.loop import (
        FitConfig,
        fit,
    )

    tiny = CLIPVisionConfig(image_size=32, patch_size=16, width=64,
                            layers=2, heads=2, embed_dim=32)
    mesh = make_mesh({"dp": 4, "tp": 2})
    cfg = FitConfig(root_dir="dataset_jpeg", epochs=1, batch_size=4,
                    compute_dtype="float32",
                    checkpoint_dir=str(labeled_project / "ck"))
    fit(tiny, cfg, mesh, params=init_params(tiny, seed=0))
    assert json.loads(
        (labeled_project / "ck" / "classes.json").read_text()
    ) == ["cola", "fanta"]
    # Rename a class directory, keeping the count at 2.
    root = labeled_project / "dataset_jpeg" / "original_images"
    shutil.move(str(root / "fanta"), str(root / "cherry"))
    with pytest.raises(ValueError, match="remapped"):
        fit(tiny, cfg, mesh, params=init_params(tiny, seed=0))
