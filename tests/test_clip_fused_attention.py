"""CLIP fused attention-core kernel: parity with the einsum path."""

import numpy as np

from retrieval_based_object_detection_tpu.models.clip import model as M
from retrieval_based_object_detection_tpu.ops.clip_attention import (
    clip_attention_core,
)

TINY = M.CLIPVisionConfig(image_size=64, patch_size=16, width=128, layers=2,
                          heads=2, embed_dim=32)


def test_kernel_matches_reference_core(rng):
    B, T, H, D = 3, 17, 2, 64
    W = H * D
    qkv = rng.normal(size=(B, T, 3 * W)).astype(np.float32)
    got = np.asarray(clip_attention_core(qkv, heads=H, interpret=True))

    q, k, v = np.split(qkv, 3, axis=-1)

    def hf(t):
        return t.reshape(B, T, H, D).transpose(0, 2, 1, 3)

    qh, kh, vh = map(hf, (q, k, v))
    logits = np.einsum("bhqd,bhkd->bhqk", qh, kh) * D ** -0.5
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, vh
                    ).transpose(0, 2, 1, 3).reshape(B, T, W)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_encode_fused_equals_einsum(rng):
    """Whole-model parity, fused kernel in interpret mode on CPU."""
    import retrieval_based_object_detection_tpu.ops.clip_attention as CA

    params = M.init_params(TINY, seed=0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    base = np.asarray(M.encode_image(params, x, TINY,
                                     fused_attention=False))

    orig = CA.clip_attention_core

    def interp(qkv, heads, interpret=False):
        return orig(qkv, heads=heads, interpret=True)

    CA.clip_attention_core = interp
    try:
        fused = np.asarray(M.encode_image(params, x, TINY,
                                          fused_attention=True))
    finally:
        CA.clip_attention_core = orig
    np.testing.assert_allclose(fused, base, atol=2e-4)
