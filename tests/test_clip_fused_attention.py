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


def test_kernel_grad_matches_einsum_path(rng):
    """The recompute-based custom VJP must match autodiff through the
    einsum reference (f32, CPU interpret)."""
    import jax
    import jax.numpy as jnp

    B, T, H, D = 2, 50, 2, 64
    W = H * D
    qkv = jnp.asarray(rng.normal(size=(B, T, 3 * W)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(B, T, W)).astype(np.float32))

    def loss_kernel(a):
        return jnp.sum(clip_attention_core(a, heads=H, interpret=True) * cot)

    def loss_ref(a):
        q, k, v = jnp.split(a, 3, axis=-1)

        def hf(t):
            return t.reshape(B, T, H, D).transpose(0, 2, 1, 3)

        qh, kh, vh = map(hf, (q, k, v))
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * D ** -0.5
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vh
                       ).transpose(0, 2, 1, 3).reshape(B, T, W)
        return jnp.sum(o * cot)

    g_kernel = np.asarray(jax.grad(loss_kernel)(qkv))
    g_ref = np.asarray(jax.grad(loss_ref)(qkv))
    np.testing.assert_allclose(g_kernel, g_ref, atol=2e-4, rtol=1e-4)


def test_train_grads_flow_through_fused_path(rng):
    """End-to-end: grads of the tiny tower with fused attention (interpret)
    match the einsum tower's grads."""
    import jax
    import jax.numpy as jnp
    import retrieval_based_object_detection_tpu.ops.clip_attention as CA

    params = M.init_params(TINY, seed=0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    def loss(p, fused):
        emb = M.encode_image(p, x, TINY, fused_attention=fused)
        return jnp.sum(emb ** 2)

    g_base = jax.grad(lambda p: loss(p, False))(params)

    orig = CA.clip_attention_core

    def interp(qkv, heads, interpret=False):
        return orig(qkv, heads=heads, interpret=True)

    CA.clip_attention_core = interp
    try:
        g_fused = jax.grad(lambda p: loss(p, True))(params)
    finally:
        CA.clip_attention_core = orig
    flat_b = jax.tree.leaves(g_base)
    flat_f = jax.tree.leaves(g_fused)
    for a, b in zip(flat_b, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-3, rtol=1e-3)


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
