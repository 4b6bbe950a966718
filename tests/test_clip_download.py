"""CLIP checkpoint auto-download: cache hit, offline error, sha mismatch."""

import hashlib

import pytest

from retrieval_based_object_detection_tpu.models.clip import download as dl


def test_cached_checkpoint_skips_network(tmp_path):
    dest = dl.checkpoint_path("ViT-B/32", tmp_path)
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_bytes(b"fake")
    assert dl.ensure_checkpoint("ViT-B/32", tmp_path) == dest


def test_offline_raises_actionable_error(tmp_path, monkeypatch):
    def boom(*a, **kw):
        raise OSError("no network")

    from retrieval_based_object_detection_tpu.utils import download as dlh

    monkeypatch.setattr(dlh.urllib.request, "urlopen", boom)
    with pytest.raises(dl.CheckpointUnavailable) as ei:
        dl.ensure_checkpoint("ViT-B/32", tmp_path, quiet=True)
    assert "--clip-checkpoint" in str(ei.value)
    assert list(tmp_path.rglob("*.part")) == []


def test_sha_mismatch_rejected(tmp_path, monkeypatch):
    import io

    class FakeResp(io.BytesIO):
        headers = {}  # the shared helper reads Content-Length via .get

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    from retrieval_based_object_detection_tpu.utils import download as dlh

    monkeypatch.setattr(dlh.urllib.request, "urlopen",
                        lambda *a, **kw: FakeResp(b"not the real weights"))
    with pytest.raises(dl.CheckpointUnavailable) as ei:
        dl.ensure_checkpoint("ViT-B/32", tmp_path, quiet=True)
    assert "SHA256" in str(ei.value)
    assert not dl.checkpoint_path("ViT-B/32", tmp_path).exists()


def test_url_map_has_embedded_hashes():
    for variant, url in dl.CLIP_CHECKPOINT_URLS.items():
        sha = url.split("/")[-2]
        assert len(sha) == 64 and all(c in "0123456789abcdef" for c in sha)
