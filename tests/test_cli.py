"""CLI: drive the full pipeline through the rbod subcommands."""

import numpy as np
import pytest
from PIL import Image

from retrieval_based_object_detection_tpu.cli.main import main


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
    return tmp_path


def run(argv):
    assert main(argv) == 0


def test_full_cli_chain(project, capsys):
    for t in ("original", "natural"):
        run(["ingest", "--src", "dataset_raw", "--type", t])
        run(["label", "--type", t])
        run(["crop", "--type", t, "--suffixes"] if False else
            ["crop", "--type", t])
        run(["segment", "--type", t, "--src", "dataset_cropped"])
    out = capsys.readouterr().out
    assert "converted=4" in out

    # Store admin + embed + delegates + experiments + analyze.
    run(["store", "create", "--name", "main", "--store", "gs"])
    for root in ("dataset_cropped", "dataset_segmented"):
        for t in ("original", "natural"):
            run(["embed", "--root", root, "--type", t, "--store", "gs",
                 "--collection", "main", "--batch-size", "8"])
    run(["store", "list", "--store", "gs"])
    out = capsys.readouterr().out
    assert "main\t" in out

    run(["delegates", "--store", "gs", "--collection", "main"])
    run(["experiments", "--store", "gs", "--collection", "main",
         "--test-group", "TestGroup1"])
    out = capsys.readouterr().out
    assert "rows=" in out and "csv=results/" in out

    run(["analyze", "--no-plots"])
    out = capsys.readouterr().out
    assert "pre_a" in out and "pre_b" in out


def test_crop_suffix_handles_jpeg(project, capsys):
    """Ingest writes .jpeg files; crop must pick them up."""
    run(["ingest", "--src", "dataset_raw", "--type", "original"])
    run(["label", "--type", "original"])
    run(["crop", "--type", "original"])
    out = capsys.readouterr().out
    assert "objects=4" in out, out


def test_review_cli(project, capsys):
    run(["ingest", "--src", "dataset_raw", "--type", "original"])
    run(["label", "--type", "original"])
    run(["review", "status"])
    out = capsys.readouterr().out
    assert "items=4" in out
    run(["review", "render", "--out", "prev.png"])
    assert (project / "prev.png").exists()
    run(["review", "select", "--box", "0"])
    run(["restore"])
    out = capsys.readouterr().out
    assert "restored=0" in out


def test_store_admin_cycle(project, capsys):
    run(["store", "create", "--name", "a", "--store", "gs", "--dim", "16"])
    run(["store", "rename", "--name", "a", "--new-name", "b", "--store", "gs"])
    run(["store", "list", "--store", "gs"])
    out = capsys.readouterr().out
    assert "b\t0" in out and "a\t" not in out
    run(["store", "delete", "--name", "b", "--store", "gs"])
    run(["store", "list", "--store", "gs"])
    assert "b\t" not in capsys.readouterr().out


def test_profile_dir_captures_trace(project, tmp_path):
    run(["--profile-dir", str(tmp_path / "trace"), "store", "create",
         "--name", "prof", "--store", "gs", "--dim", "8"])
    # jax.profiler writes plugins/profile/<ts>/*; presence = captured.
    assert list((tmp_path / "trace").rglob("*.xplane.pb")), \
        list((tmp_path / "trace").rglob("*"))


def test_doctor_runs_clean(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from retrieval_based_object_detection_tpu.cli.main import main

    assert main(["doctor"]) == 0
    out = capsys.readouterr().out
    assert "all checks passed" in out


def test_store_maintain_cli(tmp_path, rng):
    """`rbod store maintain` runs the deferred-compaction window."""
    import numpy as np

    from retrieval_based_object_detection_tpu.cli.main import main
    from retrieval_based_object_detection_tpu.gallery import persist
    from retrieval_based_object_detection_tpu.gallery.schema import Payload
    from retrieval_based_object_detection_tpu.gallery.store import (
        VectorStore,
    )

    store = VectorStore()
    g = store.create_collection("m", dim=8)
    g.upsert([f"p{i}" for i in range(40)],
             rng.normal(size=(40, 8)).astype(np.float32),
             [Payload(data_type="original_images", class_name="a",
                      img_path=f"/m/{i}.png") for i in range(40)])
    persist.save_store(store, tmp_path)          # base (compacted)
    g.delete(ids=[f"p{i}" for i in range(5)])    # under the 25% churn
    persist.save_store(store, tmp_path)          # -> delta with deletions
    # A fresh load replays the delta -> 5 tombstones below the floor.
    probe = persist.load_store(tmp_path).get("m")
    assert probe._n_dead == 5 and probe._nrows == 40
    assert main(["store", "maintain", "--store", str(tmp_path),
                 "--force"]) == 0
    g2 = persist.load_store(tmp_path).get("m")
    assert len(g2) == 35 and g2._n_dead == 0 and g2._nrows == 35


def test_store_maintain_missing_name_clean_error(tmp_path, capsys):
    """`store maintain --name <missing>` prints the same clean
    no-such-collection error as rename/delete/count — not a KeyError."""
    from retrieval_based_object_detection_tpu.cli.main import main
    from retrieval_based_object_detection_tpu.gallery import persist
    from retrieval_based_object_detection_tpu.gallery.store import (
        VectorStore,
    )

    persist.save_store(VectorStore(), tmp_path)
    assert main(["store", "maintain", "--store", str(tmp_path),
                 "--name", "typo"]) == 1
    assert "no such collection" in capsys.readouterr().err


def test_store_warm_cli(tmp_path, rng, capsys):
    """`rbod store warm --store http://…` warms server-side; a local
    path gets the actionable error (warming a CLI-local copy would
    build device state in a process about to exit)."""
    import threading

    import numpy as np

    from retrieval_based_object_detection_tpu.cli.main import main
    from retrieval_based_object_detection_tpu.gallery import (
        persist,
        server as GS,
    )
    from retrieval_based_object_detection_tpu.gallery.schema import Payload
    from retrieval_based_object_detection_tpu.gallery.store import (
        VectorStore,
    )

    store = VectorStore()
    g = store.create_collection("w", dim=8)
    g.upsert([f"p{i}" for i in range(6)],
             rng.normal(size=(6, 8)).astype(np.float32),
             [Payload(data_type="original_images", class_name="c",
                      img_path=f"/w/{i}.png") for i in range(6)])
    persist.save_store(store, tmp_path / "store")
    assert main(["store", "warm", "--store", str(tmp_path / "store")]) == 2
    assert "gallery-server --warm" in capsys.readouterr().err
    srv = GS.serve(tmp_path / "store", host="127.0.0.1", port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        assert main(["store", "warm", "--store", base, "--name", "w"]) == 0
        out = capsys.readouterr().out
        assert out.startswith("w\t") and out.rstrip().endswith("s")
        g2 = srv.service.store.get("w")
        assert g2._dev_f32 is not None  # server-side state really built
    finally:
        srv.shutdown()
