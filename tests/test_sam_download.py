"""SAM checkpoint auto-download: cache hit, offline error, URL map."""

import pytest

from retrieval_based_object_detection_tpu.models.sam import download as dl


def test_cached_checkpoint_is_returned_without_network(tmp_path):
    dest = dl.checkpoint_path("vit_b", tmp_path)
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_bytes(b"fake checkpoint")
    assert dl.ensure_checkpoint("vit_b", tmp_path) == dest


def test_offline_raises_actionable_error(tmp_path, monkeypatch):
    def boom(*a, **kw):
        raise OSError("no network")

    from retrieval_based_object_detection_tpu.utils import download as dlh

    monkeypatch.setattr(dlh.urllib.request, "urlopen", boom)
    with pytest.raises(dl.CheckpointUnavailable) as ei:
        dl.ensure_checkpoint("vit_b", tmp_path, quiet=True)
    msg = str(ei.value)
    assert "--sam-checkpoint" in msg and "vit_b" in msg
    # no truncated .part left behind
    assert list(tmp_path.rglob("*.part")) == []


def test_unknown_variant_rejected(tmp_path):
    with pytest.raises(KeyError):
        dl.ensure_checkpoint("vit_xxl", tmp_path)


def test_url_map_matches_reference():
    # 22_segment_image_auto.py:24-31
    for variant, url in dl.SAM_CHECKPOINT_URLS.items():
        assert url.startswith(
            "https://dl.fbaipublicfiles.com/segment_anything/sam_")
        assert variant.replace("_", "_") in url
