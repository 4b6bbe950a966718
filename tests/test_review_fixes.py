"""Regression tests for code-review findings."""

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.gallery import Filter, Payload
from retrieval_based_object_detection_tpu.gallery.persist import (
    load_store,
    save_store,
)
from retrieval_based_object_detection_tpu.gallery.store import VectorStore


def _fill(store, name, n, rng, dim=8):
    g = store.create_collection(name, dim=dim)
    g.upsert([f"{name}{i}" for i in range(n)],
             rng.normal(size=(n, dim)).astype(np.float32),
             [Payload(data_type="x", class_name=name)] * n)
    return g


def test_save_store_preserves_unloadable_snapshots(tmp_path, rng):
    """A collection that fails to LOAD must survive unrelated saves."""
    store = VectorStore()
    _fill(store, "good", 3, rng)
    _fill(store, "fragile", 2, rng)
    save_store(store, tmp_path)

    # Corrupt 'fragile' so the next load skips it with a warning.
    (tmp_path / "fragile.rbod").write_bytes(b"garbage")
    store2 = load_store(tmp_path)
    assert "fragile" not in store2 and "good" in store2

    # Unrelated write: must NOT delete fragile.rbod or drop it from the
    # manifest.
    store2.create_collection("newcol", dim=8)
    save_store(store2, tmp_path)
    assert (tmp_path / "fragile.rbod").exists()
    import json

    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert "fragile" in manifest["collections"]

    # Explicit delete DOES remove the snapshot.
    store2.delete_collection("good")
    save_store(store2, tmp_path)
    assert not (tmp_path / "good.rbod").exists()


def test_rename_removes_old_snapshot_only(tmp_path, rng):
    store = VectorStore()
    _fill(store, "a", 2, rng)
    save_store(store, tmp_path)
    store.rename_collection("a", "b")
    save_store(store, tmp_path)
    assert not (tmp_path / "a.rbod").exists()
    assert (tmp_path / "b.rbod").exists()
    assert len(load_store(tmp_path).get("b")) == 2


def test_cli_store_create_refuses_overwrite(tmp_path, monkeypatch, rng,
                                            capsys):
    from retrieval_based_object_detection_tpu.cli.main import main

    monkeypatch.chdir(tmp_path)
    assert main(["store", "create", "--name", "c", "--store", "gs"]) == 0
    store = load_store("gs")
    store.get("c").upsert(
        ["p"], rng.normal(size=(1, 512)).astype(np.float32),
        [Payload(data_type="x", class_name="k")])
    save_store(store, "gs")

    # Without --force: refused, data intact.
    assert main(["store", "create", "--name", "c", "--store", "gs"]) == 1
    assert "--force" in capsys.readouterr().err
    assert len(load_store("gs").get("c")) == 1
    # With --force: recreated empty.
    assert main(["store", "create", "--name", "c", "--store", "gs",
                 "--force"]) == 0
    assert len(load_store("gs").get("c")) == 0


def test_augment_jpeg_inputs(tmp_path, rng):
    """JPEG sources must produce RGB JPEG variants, not crash on RGBA."""
    from retrieval_based_object_detection_tpu.pipelines.augment import (
        AugmentConfig,
        run_augment,
    )

    src = tmp_path / "dataset_cropped" / "original_images" / "c"
    src.mkdir(parents=True)
    Image.fromarray(rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)).save(
        src / "crop.jpg")
    res = run_augment(AugmentConfig(
        src_root=str(tmp_path / "dataset_cropped"),
        dst_root=str(tmp_path / "dataset_augmented"),
        img_type="original"))
    assert res.n_written == 26 and res.n_failed == 0
    out = tmp_path / "dataset_augmented" / "original_images" / "c"
    sample = Image.open(out / "crop_rot30.jpg")
    assert sample.mode == "RGB"


def test_sharded_search_k_exceeds_shard_rows(rng):
    from retrieval_based_object_detection_tpu.gallery.sharded import (
        ShardedGallerySearcher,
    )
    from retrieval_based_object_detection_tpu.parallel.mesh import gallery_mesh

    mesh = gallery_mesh(8)
    n = 2048  # 256 rows per shard after padding
    vectors = rng.normal(size=(n, 16)).astype(np.float32)
    s = ShardedGallerySearcher(vectors, np.ones(n, bool), mesh)
    scores, idx = s.search(vectors[0], k=300)  # > per-shard rows
    assert scores.shape[1] <= 300 and scores.shape[1] > 0
    assert idx[0, 0] == 0


def test_load_torch_checkpoint_infers_config(tmp_path, rng):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from retrieval_based_object_detection_tpu.models.clip.convert import (
        load_torch_checkpoint,
    )

    hf = transformers.CLIPVisionModelWithProjection(
        transformers.CLIPVisionConfig(
            hidden_size=128, intermediate_size=512, num_hidden_layers=2,
            num_attention_heads=2, image_size=96, patch_size=16,
            projection_dim=64))
    pt = tmp_path / "m.pt"
    torch.save(hf.state_dict(), pt)
    params, config = load_torch_checkpoint(str(pt))
    assert config.image_size == 96 and config.embed_dim == 64
    assert params["positional_embedding"].shape[0] == config.seq_len


def test_cli_embed_follows_checkpoint_config(tmp_path, monkeypatch, rng,
                                             capsys):
    """embed derives collection dim + preprocess size from the loaded
    checkpoint config (regression: hardcoded 512/224 broke non-B/32)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from retrieval_based_object_detection_tpu.cli.main import main

    monkeypatch.chdir(tmp_path)
    hf = transformers.CLIPVisionModelWithProjection(
        transformers.CLIPVisionConfig(
            hidden_size=128, intermediate_size=512, num_hidden_layers=2,
            num_attention_heads=2, image_size=96, patch_size=16,
            projection_dim=256))
    torch.save(hf.state_dict(), "m.pt")
    assert main(["convert-weights", "--model", "clip", "--input", "m.pt",
                 "--output", "conv"]) == 0

    d = tmp_path / "dataset_cropped" / "original_images" / "c"
    d.mkdir(parents=True)
    Image.fromarray(rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)).save(
        d / "i.png")
    assert main(["embed", "--root", "dataset_cropped", "--type", "original",
                 "--store", "gs", "--collection", "x",
                 "--clip-checkpoint", "conv"]) == 0
    assert load_store("gs").get("x").dim == 256

    # Mismatched pre-existing collection → clean error.
    assert main(["store", "create", "--name", "w512", "--store", "gs"]) == 0
    rc = main(["embed", "--root", "dataset_cropped", "--type", "original",
               "--store", "gs", "--collection", "w512",
               "--clip-checkpoint", "conv"])
    assert rc == 1
    assert "256-d" in capsys.readouterr().err
