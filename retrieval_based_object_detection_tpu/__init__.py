"""TPU-native retrieval-based object detection framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
reference ``dmweapon/Retrieval_based_object_detection`` pipeline: ingest →
label → crop/segment/augment → CLIP embed → vector gallery → delegate
vectors → retrieval experiments → analysis.

Design stance (see SURVEY.md §7): the reference's per-image Python loops and
external Qdrant server are replaced by batched, jit-compiled pipelines and an
HBM-resident, mesh-shardable vector gallery with tiled-matmul cosine top-k.
"""

__version__ = "0.1.0"

from retrieval_based_object_detection_tpu.gallery.schema import (  # noqa: F401
    Filter,
    Payload,
)
from retrieval_based_object_detection_tpu.gallery.store import (  # noqa: F401
    Gallery,
    VectorStore,
)
