"""Online serving: retrieval-as-detection in one device dispatch.

The reference's inference story is a batch pipeline of separate scripts
(detect → crop files → embed files → query Qdrant per image). For
production serving this module fuses the whole chain into ONE jitted
program per image batch:

    saliency proposal → margin box → crop+resize (scale_and_translate)
    → CLIP normalise → ViT encode (bf16) → cosine vs the delegate matrix
    → argmax class + similarity

No host round trips between stages; the only host work is JPEG decode.
A stdlib HTTP endpoint (``serve_http``) exposes it as
``POST /detect`` (image bytes) → JSON detections.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from retrieval_based_object_detection_tpu.gallery.schema import Filter
from retrieval_based_object_detection_tpu.gallery.store import Gallery
from retrieval_based_object_detection_tpu.models.clip import model as clip_model
from retrieval_based_object_detection_tpu.models.clip.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
)
from retrieval_based_object_detection_tpu.models.detector import saliency
from retrieval_based_object_detection_tpu.ops.image import crop_resize_batch


@partial(jax.jit, static_argnames=("clip_config", "margin_ratio"))
def detect_embed_classify(
    clip_params,
    images: jax.Array,        # [B, H, W, 3] uint8/float 0..255 (fixed size)
    delegates: jax.Array,     # [C, D] delegate matrix (rows per class)
    clip_config: clip_model.CLIPVisionConfig = clip_model.VIT_B_32,
    margin_ratio: float = 0.2,
) -> dict[str, jax.Array]:
    """One fused dispatch: boxes, confidences, class ids, similarities."""
    images = images.astype(jnp.float32)
    B, H, W, _ = images.shape

    boxes, conf = saliency.propose_boxes(images)   # [B, 2, 4], [B, 2]
    boxes, conf = boxes[:, 0], conf[:, 0]          # best blob per image
    out = _margin_embed_classify(clip_params, images, boxes, delegates,
                                 clip_config, margin_ratio)
    return {**out, "confidence": conf}


def _margin_embed_classify(clip_params, images, boxes, delegates,
                           clip_config, margin_ratio):
    """Shared fused stage: margin rule (21:89-95) → crop/resize → CLIP
    normalise+encode → cosine vs delegates → argmax class."""
    B, H, W, _ = images.shape
    bw = boxes[:, 2] - boxes[:, 0]
    bh = boxes[:, 3] - boxes[:, 1]
    mx = jnp.floor(bw * margin_ratio)
    my = jnp.floor(bh * margin_ratio)
    expanded = jnp.stack([
        jnp.clip(boxes[:, 0] - mx, 0, W),
        jnp.clip(boxes[:, 1] - my, 0, H),
        jnp.clip(boxes[:, 2] + mx, 0, W),
        jnp.clip(boxes[:, 3] + my, 0, H),
    ], axis=1)
    crops = crop_resize_batch(images, expanded,
                              out_size=clip_config.image_size)
    crops = jnp.clip(crops / 255.0, 0.0, 1.0)
    crops = (crops - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    emb = clip_model.encode_image(clip_params, crops, clip_config,
                                  compute_dtype=jnp.bfloat16)
    emb = emb / jnp.maximum(
        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    dn = delegates / jnp.maximum(
        jnp.linalg.norm(delegates, axis=-1, keepdims=True), 1e-12)
    sims = jnp.dot(emb, dn.T, preferred_element_type=jnp.float32)
    return {"boxes": expanded, "class_id": jnp.argmax(sims, axis=1),
            "similarity": jnp.max(sims, axis=1), "all_sims": sims}


@partial(jax.jit, static_argnames=("clip_config", "margin_ratio"))
def embed_classify_boxes(
    clip_params,
    images: jax.Array,        # [B, H, W, 3] 0..255
    boxes: jax.Array,         # [B, 4] xyxy px (detector output, no margin)
    delegates: jax.Array,     # [C, D]
    clip_config: clip_model.CLIPVisionConfig = clip_model.VIT_B_32,
    margin_ratio: float = 0.2,
) -> dict[str, jax.Array]:
    """Fused margin→crop→embed→classify for EXTERNAL detector boxes
    (TinyDet or any boxes source); the saliency path lives in
    detect_embed_classify."""
    return _margin_embed_classify(clip_params, images.astype(jnp.float32),
                                  boxes, delegates, clip_config,
                                  margin_ratio)


@dataclasses.dataclass
class RetrievalDetector:
    """Serving wrapper: gallery delegates + CLIP params → detections.

    ``detector=None`` uses the fully-fused saliency path; passing a
    detector callable (e.g. ``train.detector_loop.TinyDetDetector``)
    routes its best box through the fused margin→embed→classify stage.
    """

    clip_params: dict
    gallery: Gallery
    clip_config: clip_model.CLIPVisionConfig = clip_model.VIT_B_32
    delegate_type: str = "average"
    case: str = "pre_a"
    data_type: str = "original_images"
    detector: object = None

    def __post_init__(self):
        flt = (
            Filter(must={"is_delegate": True,
                         "delegate_type": self.delegate_type,
                         "data_type": self.data_type})
            & Filter.for_case(self.case)
        )
        recs = self.gallery.scroll_all(flt, with_vectors=True)
        if not recs:
            raise ValueError(
                f"no delegates for {self.case}/{self.delegate_type}/"
                f"{self.data_type} — run the delegates stage first")
        self.classes = [r.payload.class_name for r in recs]
        self._delegates = jnp.asarray(
            np.stack([r.vector for r in recs]))

    def detect(self, images: np.ndarray) -> list[dict]:
        """[B, H, W, 3] uint8 (uniform size) → per-image detection dicts."""
        if self.detector is None:
            out = detect_embed_classify(
                self.clip_params, jnp.asarray(images), self._delegates,
                self.clip_config)
            conf = np.asarray(out["confidence"])
        else:
            det_boxes, det_scores = self.detector(images)
            best = np.argmax(det_scores, axis=1)
            top_boxes = np.take_along_axis(
                det_boxes, best[:, None, None].repeat(4, 2), axis=1)[:, 0]
            conf = np.take_along_axis(det_scores, best[:, None], axis=1)[:, 0]
            out = embed_classify_boxes(
                self.clip_params, jnp.asarray(images),
                jnp.asarray(top_boxes, jnp.float32), self._delegates,
                self.clip_config)
        boxes = np.asarray(out["boxes"])
        cls = np.asarray(out["class_id"])
        sim = np.asarray(out["similarity"])
        return [
            {
                "box": [float(v) for v in boxes[i]],
                "confidence": float(conf[i]),
                "class_name": self.classes[int(cls[i])],
                "similarity": float(sim[i]),
            }
            for i in range(images.shape[0])
        ]


def serve_http(detector: RetrievalDetector, host: str = "0.0.0.0",
               port: int = 8080, serving_size: int = 512):
    """POST /detect with image bytes → JSON detection. Returns the server
    (call serve_forever).

    Uploads are letterboxed to one fixed ``serving_size`` square before
    the jitted pipeline runs — otherwise every distinct upload resolution
    retraces and recompiles the whole encoder and the jit cache grows
    without bound in a long-lived service. Returned boxes are mapped back
    to the original image's pixel coordinates.
    """
    import io
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from retrieval_based_object_detection_tpu.pipelines.labeling import (
        letterbox,
    )

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/detect":
                self._json({"error": "not found"}, 404)
                return
            from PIL import Image

            length = int(self.headers.get("Content-Length") or 0)
            data = self.rfile.read(length)
            try:
                with Image.open(io.BytesIO(data)) as im:
                    arr = np.asarray(im.convert("RGB"))
            except Exception:
                self._json({"error": "not an image"}, 400)
                return
            canvas, scale = letterbox(arr, serving_size)
            det = detector.detect(canvas[None])[0]
            det["box"] = [
                float(np.clip(v / scale, 0,
                              arr.shape[1] if i % 2 == 0 else arr.shape[0]))
                for i, v in enumerate(det["box"])
            ]
            self._json(det)

    return ThreadingHTTPServer((host, port), Handler)
