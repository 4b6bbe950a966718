"""Detectors for the auto-labeling stage (the YOLO role of
11_dataset_labeling.py).

The labeling contract is class-agnostic: boxes + confidences in, YOLO-format
labels out, with the class id taken from the directory name
(11_dataset_labeling.py:104-106, 182-189). Two interchangeable detectors:

  * ``saliency.SaliencyProposer`` — deterministic, weight-free
    background-contrast proposer, fully batched JAX. Well matched to the
    studio/product photos this pipeline targets and usable in a zero-egress
    environment (no pretrained checkpoint needed).
  * ``tinydet`` — a trainable anchor-free (FCOS-style) conv detector for
    deployments that fine-tune on their own labels.
"""

from retrieval_based_object_detection_tpu.models.detector.saliency import (  # noqa: F401
    SaliencyProposer,
)
from retrieval_based_object_detection_tpu.models.detector import tinydet  # noqa: F401
