"""Wizard: every interactive decision point drives the same stage
commands as the flags (VERDICT 'missing' #5 — review/segment/restore
coverage, SAM-variant pick, collection-pick-with-counts)."""

import builtins

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.cli.main import main


@pytest.fixture
def project(tmp_path, monkeypatch, rng):
    monkeypatch.chdir(tmp_path)
    d = tmp_path / "dataset_jpeg" / "original_images" / "cola"
    d.mkdir(parents=True)
    a = np.full((80, 100, 3), 228, np.uint8)
    a[20:60, 30:80] = (210, 40, 40)
    Image.fromarray(a).save(d / "p0.jpg")
    return tmp_path


def _drive(monkeypatch, answers):
    it = iter(answers)
    monkeypatch.setattr(builtins, "input", lambda prompt="": next(it))


def test_wizard_review_status(project, monkeypatch, capsys):
    main(["label", "--type", "original"])
    # stage=review(3), type=original(1), action=status(1), confirm=y
    _drive(monkeypatch, ["3", "1", "1", "y"])
    assert main(["wizard"]) == 0
    assert "items=" in capsys.readouterr().out


def test_wizard_restore(project, monkeypatch, capsys):
    # stage=restore(5), type=original(1), confirm=y
    _drive(monkeypatch, ["5", "1", "y"])
    assert main(["wizard"]) == 0
    assert "restored=" in capsys.readouterr().out


def test_wizard_segment_variant_none(project, monkeypatch, capsys):
    main(["label", "--type", "original"])
    main(["crop", "--type", "original"])
    # stage=segment(7), type=original(1), variant=none(4), confirm=y
    _drive(monkeypatch, ["7", "1", "4", "y"])
    assert main(["wizard"]) == 0
    assert "segmented=" in capsys.readouterr().out


def test_wizard_collection_pick_with_counts(project, monkeypatch, capsys):
    main(["store", "create", "--name", "main", "--store", "gallery_store",
          "--dim", "8"])
    # stage=delegates(11), collection menu shows "main (0 points)" -> 1,
    # confirm=y. Empty collection -> delegates runs and reports 0.
    _drive(monkeypatch, ["11", "1", "y"])
    assert main(["wizard"]) == 0
    out = capsys.readouterr().out
    assert "main (0 points)" in out


def test_wizard_abort(project, monkeypatch, capsys):
    _drive(monkeypatch, ["5", "1", "n"])
    assert main(["wizard"]) == 1
    assert "aborted" in capsys.readouterr().out
