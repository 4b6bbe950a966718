"""`rbod e2e` covers the FULL reference chain: ingest (01) and the
augment stage (23) included, so pre_c (augmented) experiment rows exist
in the result CSV — closing the reference's own gap (its committed run
at results/2025-06-20-1 has no pre_c rows; BASELINE.md note)."""

import csv
import dataclasses
import json

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.cli.main import main
from retrieval_based_object_detection_tpu.models.clip.model import (
    CLIPVisionConfig,
    init_params,
)
from retrieval_based_object_detection_tpu.utils.checkpoint import save_params

TINY = CLIPVisionConfig(image_size=64, patch_size=16, width=64, layers=2,
                        heads=1, embed_dim=32)


@pytest.fixture
def project(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    for cls, col in (("cola", (210, 40, 40)), ("fanta", (240, 140, 30))):
        for t, n in (("original", 2), ("natural", 2)):
            d = tmp_path / "dataset_raw" / f"{t}_images" / cls
            d.mkdir(parents=True)
            for i in range(n):
                a = np.full((120, 160, 3), 228, np.uint8)
                a[30:90, 40:130] = col
                a += rng.integers(0, 10, a.shape, dtype=np.uint8)
                Image.fromarray(a).save(d / f"p{i}.png")
    # A converted-checkpoint dir with a tiny tower keeps the embed stage
    # fast; e2e must honour it end to end.
    ckpt = tmp_path / "tiny_clip"
    ckpt.mkdir()
    (ckpt / "clip_config.json").write_text(
        json.dumps(dataclasses.asdict(TINY)))
    save_params(init_params(TINY, seed=0), ckpt / "params")
    return tmp_path


def test_e2e_includes_ingest_and_pre_c(project):
    assert main([
        "e2e", "--raw", "dataset_raw", "--clip-checkpoint", "tiny_clip",
        "--no-plots",
    ]) == 0
    results = sorted((project / "results").iterdir())
    assert results, "e2e produced no results dir"
    csvs = list(results[-1].glob("result_*.csv"))
    assert csvs
    with open(csvs[0]) as f:
        rows = list(csv.DictReader(f))
    cases = {r["case"] for r in rows}
    assert "pre_c" in cases, f"augmented case missing; cases={cases}"
    assert {"pre_a", "pre_b"} <= cases
    # Ingest ran: the jpeg tree exists.
    assert (project / "dataset_jpeg" / "original_images" / "cola").is_dir()
    # Augment ran: augmented variants on disk.
    aug = [p for p in (project / "dataset_augmented").rglob("*.*")
           if p.suffix in (".png", ".jpg", ".jpeg")]
    assert len(aug) > 0
