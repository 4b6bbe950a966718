"""CLIP ViT image tower (the embedding model behind the retrieval pipeline).

The reference embeds every crop with OpenAI CLIP ViT-B/32 via torch, one
image at a time (31_clip_embedding_and_save_vector.py:23-39). Here the tower
is a pure-JAX functional model with scan-stacked transformer blocks, batched
preprocessing, and a weight converter from torch checkpoints.
"""

from retrieval_based_object_detection_tpu.models.clip.model import (  # noqa: F401
    CLIPVisionConfig,
    VIT_B_32,
    encode_image,
    init_params,
)
from retrieval_based_object_detection_tpu.models.clip.preprocess import (  # noqa: F401
    CLIP_MEAN,
    CLIP_STD,
    preprocess_batch,
    preprocess_pil,
)
