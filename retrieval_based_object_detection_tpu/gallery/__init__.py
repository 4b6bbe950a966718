"""HBM-resident, mesh-shardable vector gallery (the Qdrant replacement).

The reference coordinates all retrieval stages through an external Qdrant
server and an 8-field payload schema (31_clip_embedding_and_save_vector.py:
166-175). Here the gallery is an in-process columnar store: payload columns
live host-side as NumPy arrays, vectors live device-side as a padded
``jax.Array`` so that every query is a single fused matmul + top-k on the MXU,
with payload filters lowered to additive score masks (never dynamic shapes).
"""

from retrieval_based_object_detection_tpu.gallery.schema import (  # noqa: F401
    FIELDS,
    Filter,
    Payload,
    UnknownFieldError,
)
from retrieval_based_object_detection_tpu.gallery.store import (  # noqa: F401
    Gallery,
    Record,
    VectorStore,
)
from retrieval_based_object_detection_tpu.gallery.capacity import (  # noqa: F401,E402
    CapacitySearcher,
)
