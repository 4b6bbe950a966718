"""Pipeline stages mirroring the reference's numbered entry points.

Stage → reference script map:
  ingest       ← 01_heic_to_jpeg.py
  labeling     ← 11_dataset_labeling.py
  review       ← 12_labeling_check.py + 13_restore_manual_labeled.py
  crop         ← 21_crop_image.py
  segment      ← 22_segment_image_auto.py + 22_segment_image_manual.py
  augment      ← 23_augmentation.py
  embed        ← 31_clip_embedding_and_save_vector.py
  delegates    ← 32_create_delegate_vector.py
  experiments  ← 33_run_all_experiments.py
  analysis     ← 41_results_analysis_and_visualization.py

Unlike the reference (interactive scripts wired by filesystem contracts),
these are library functions with dataclass configs; the thin CLI in ``cli``
adds the interactive prompts for drop-in familiarity.
"""
