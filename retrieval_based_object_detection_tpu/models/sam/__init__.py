"""SAM-style point-prompted segmentation (the 22_* stages' model).

The reference drives Meta's segment-anything predictor: encoder forward
once per image, then point-prompted decoding with ``multimask_output=True``
and best-of-3 selection by predicted IoU (22_segment_image_auto.py:139-152,
22_segment_image_manual.py:152-205). This package is a TPU-native
implementation with the same component structure — ViT image encoder
(windowed attention + decomposed relative positions + neck), prompt
encoder (random-Fourier point embeddings), two-way transformer mask
decoder (3 masks + IoU head) — so official SAM checkpoints convert
weight-for-weight (``convert.py``) while small configs train/test from
scratch.
"""

from retrieval_based_object_detection_tpu.models.sam.model import (  # noqa: F401
    SamConfig,
    SAM_VIT_B,
    SamPredictor,
    init_params,
)
