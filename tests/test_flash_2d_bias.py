"""Flash attention with SAM's decomposed rel-pos bias vs the einsum oracle."""

import numpy as np

from retrieval_based_object_detection_tpu.ops import attention as A


def _oracle(q, k, v, bias_h, bias_w, gh, gw):
    import jax
    import jax.numpy as jnp

    B, H, T, D = q.shape
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * D ** -0.5
    attn = attn.reshape(B, H, T, gh, gw)
    attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
    attn = attn.reshape(B, H, T, T)
    p = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32)


def test_flash_2d_bias_matches_oracle(rng):
    B, H, gh, gw, D = 1, 2, 8, 8, 32
    T = gh * gw
    q = rng.normal(size=(B, H, T, D)).astype(np.float32)
    k = rng.normal(size=(B, H, T, D)).astype(np.float32)
    v = rng.normal(size=(B, H, T, D)).astype(np.float32)
    bias_h = rng.normal(size=(B, H, T, gh)).astype(np.float32)
    bias_w = rng.normal(size=(B, H, T, gw)).astype(np.float32)

    ref = np.asarray(_oracle(q, k, v, bias_h, bias_w, gh, gw))
    got = np.asarray(A.flash_attention_2d_bias(
        q, k, v, bias_h, bias_w, grid_h=gh, grid_w=gw,
        block_q=16, block_k=16, interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_flash_2d_bias_multi_row_ktile(rng):
    """block_k spanning several grid rows exercises the bias expansion."""
    B, H, gh, gw, D = 1, 1, 8, 4, 16
    T = gh * gw
    q = rng.normal(size=(B, H, T, D)).astype(np.float32)
    k = rng.normal(size=(B, H, T, D)).astype(np.float32)
    v = rng.normal(size=(B, H, T, D)).astype(np.float32)
    bias_h = rng.normal(size=(B, H, T, gh)).astype(np.float32)
    bias_w = rng.normal(size=(B, H, T, gw)).astype(np.float32)
    ref = np.asarray(_oracle(q, k, v, bias_h, bias_w, gh, gw))
    got = np.asarray(A.flash_attention_2d_bias(
        q, k, v, bias_h, bias_w, grid_h=gh, grid_w=gw,
        block_q=8, block_k=8, interpret=True))  # 2 grid rows per k tile
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_sam_encoder_flash_equals_einsum(rng):
    """Whole-encoder parity: flash path vs einsum path, same params."""
    from retrieval_based_object_detection_tpu.models.sam import encoder as SE

    cfg = SE.EncoderConfig(img_size=64, patch_size=4, embed_dim=32,
                           depth=2, heads=2, out_chans=16, window_size=4,
                           global_attn_indexes=(1,))  # grid 16 -> T=256
    params = SE.init_params(cfg, seed=0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    base = np.asarray(SE.forward(params, x, cfg, use_flash=False))

    # Route the global layer through the flash kernel in interpret mode.
    import retrieval_based_object_detection_tpu.ops.attention as At
    orig = At.flash_attention_2d_bias

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    At.flash_attention_2d_bias = interp
    try:
        flashed = np.asarray(SE.forward(params, x, cfg, use_flash=True))
    finally:
        At.flash_attention_2d_bias = orig
    np.testing.assert_allclose(flashed, base, atol=1e-4)
