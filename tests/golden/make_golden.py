"""Regenerate the golden experiment-run fixture.

Mirrors the reference's committed ``results/2025-06-20-1`` regression
oracle (SURVEY.md §4): a deterministic tiny end-to-end run whose outputs
are committed and compared by test_golden.py. Regenerate (and review the
diff deliberately!) with:

    JAX_PLATFORMS=cpu python tests/golden/make_golden.py
"""

import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent.parent))


def build_run(out_dir: Path):
    import numpy as np
    from PIL import Image

    from retrieval_based_object_detection_tpu.gallery.store import Gallery
    from retrieval_based_object_detection_tpu.models.clip.model import (
        CLIPVisionConfig,
        init_params,
    )
    from retrieval_based_object_detection_tpu.pipelines import (
        delegates as dp,
        embed as ep,
        experiments as xp,
    )

    tiny = CLIPVisionConfig(image_size=64, patch_size=16, width=64,
                            layers=2, heads=1, embed_dim=32)
    rng = np.random.default_rng(1234)
    data = out_dir / "dataset_segmented"
    colors = {"alpha": (200, 40, 40), "beta": (40, 40, 200)}
    for cls, col in colors.items():
        for t, n in (("original", 4), ("natural", 3)):
            d = data / f"{t}_images" / cls
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                a = np.full((72, 96, 3), 228, np.uint8)
                a[18:54, 24:72] = col
                a += rng.integers(0, 12, a.shape, dtype=np.uint8)
                Image.fromarray(a).save(d / f"g{i}.png")

    g = Gallery("golden", dim=32)
    enc = ep.make_encoder(init_params(tiny, seed=7), tiny)
    for t in ("original", "natural"):
        ep.embed_tree(g, enc, ep.EmbedConfig(
            root_dir=str(data), img_type=t, image_size=64, batch_size=8))
    dp.build_delegates(g)
    out = xp.run_experiments(g, xp.ExperimentConfig(
        root_dir=str(data), results_dir=str(out_dir / "results")),
        write_outputs=True)
    return out


def main():
    import csv
    import shutil
    import tempfile

    tmp = Path(tempfile.mkdtemp())
    out = build_run(tmp)

    # Strip the tmp prefix from image paths so the fixture is stable.
    rows = []
    with open(out.csv_path) as f:
        for row in csv.DictReader(f):
            row["image_path"] = row["image_path"].replace(str(tmp) + "/", "")
            rows.append(row)
    golden_csv = HERE / "golden_result.csv"
    with open(golden_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {golden_csv} ({len(rows)} rows)")
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
