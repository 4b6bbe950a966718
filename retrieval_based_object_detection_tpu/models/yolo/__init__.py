"""YOLOv8 in JAX — the reference's pretrained auto-label model family
(11_dataset_labeling.py:10, 96-99): graph (model), official-checkpoint
conversion (convert), release-asset download (download), and the
labeling-slot detector callable (detector)."""

from retrieval_based_object_detection_tpu.models.yolo.detector import (
    YoloDetector,
)
from retrieval_based_object_detection_tpu.models.yolo.model import (
    VARIANTS,
    YoloConfig,
    init_params,
    predict,
)

__all__ = ["VARIANTS", "YoloConfig", "YoloDetector", "init_params",
           "predict"]
