"""CLIP vision transformer, TPU-first.

Functionally equivalent to the OpenAI CLIP visual tower the reference loads
at 31_clip_embedding_and_save_vector.py:26 (``clip.load("ViT-B/32")``):
patchify conv → [CLS] + positional embeddings → pre-LN transformer with
QuickGELU MLPs → ln_post on the CLS token → linear projection to the
embedding dimension (512-d for ViT-B/32).

TPU-first design choices:
  * The L transformer blocks are **stacked along a leading axis** and run
    under ``jax.lax.scan`` — one compiled block body regardless of depth,
    fast compiles, and XLA fuses LN + matmul + bias chains per block.
  * All matmuls take ``preferred_element_type=float32`` so bf16 weights and
    activations still accumulate in f32 on the MXU.
  * ``compute_dtype`` selects bf16 (throughput) or f32 (parity with the
    torch reference); params stay f32 and are cast at the call boundary.
  * No data-dependent control flow; shapes are static for any batch size.

Params are plain nested dicts (pytrees), so the tower drops straight into
``pjit``/``shard_map`` with ``NamedSharding`` annotations (see
``parallel.sharding``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768          # transformer hidden size
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512      # output projection dim
    mlp_ratio: int = 4

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1  # patches + CLS

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


VIT_B_32 = CLIPVisionConfig()
VIT_B_16 = CLIPVisionConfig(patch_size=16)
VIT_L_14 = CLIPVisionConfig(patch_size=14, width=1024, layers=24, heads=16,
                            embed_dim=768)


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702x) — CLIP's activation (not tanh-GELU)."""
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm with f32 statistics regardless of compute dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def init_params(config: CLIPVisionConfig = VIT_B_32,
                seed: int = 0) -> Params:
    """Random init matching torch defaults in scale (for tests/fine-tune)."""
    rng = np.random.default_rng(seed)
    w, L = config.width, config.layers
    d_mlp = config.mlp_ratio * w
    scale = w ** -0.5

    def normal(shape, std):
        return rng.normal(0.0, std, size=shape).astype(np.float32)

    blocks = {
        "ln_1_scale": np.ones((L, w), np.float32),
        "ln_1_bias": np.zeros((L, w), np.float32),
        "w_qkv": normal((L, w, 3 * w), scale),
        "b_qkv": np.zeros((L, 3 * w), np.float32),
        "w_out": normal((L, w, w), scale),
        "b_out": np.zeros((L, w), np.float32),
        "ln_2_scale": np.ones((L, w), np.float32),
        "ln_2_bias": np.zeros((L, w), np.float32),
        "w_fc": normal((L, w, d_mlp), scale),
        "b_fc": np.zeros((L, d_mlp), np.float32),
        "w_proj": normal((L, d_mlp, w), (2 * w) ** -0.5),
        "b_proj": np.zeros((L, w), np.float32),
    }
    params: Params = {
        "conv_kernel": normal(
            (config.patch_size, config.patch_size, 3, w), scale),  # HWIO
        "class_embedding": normal((w,), scale),
        "positional_embedding": normal((config.seq_len, w), 0.01),
        "ln_pre_scale": np.ones((w,), np.float32),
        "ln_pre_bias": np.zeros((w,), np.float32),
        "blocks": blocks,
        "ln_post_scale": np.ones((w,), np.float32),
        "ln_post_bias": np.zeros((w,), np.float32),
        "proj": normal((w, config.embed_dim), scale),
    }
    return jax.tree.map(jnp.asarray, params)


def _attention(x: jax.Array, block: Params, heads: int,
               fused: bool = False) -> jax.Array:
    """Bidirectional MHA for the (short) patch sequence.

    ``fused=True`` routes the attention core through the Pallas kernel in
    ``ops.clip_attention`` — the head split/transpose + [T, T] einsum +
    softmax + merge chain otherwise relayouts through HBM and costs ~40%
    of the encode for ~1% of its FLOPs (DESIGN.md ablations). The einsum
    path is the oracle and CPU fallback.
    """
    B, T, W = x.shape
    H = heads
    D = W // H
    qkv = jnp.dot(x, block["w_qkv"], preferred_element_type=jnp.float32)
    qkv = (qkv + block["b_qkv"]).astype(x.dtype)
    if fused:
        from retrieval_based_object_detection_tpu.ops.clip_attention import (
            clip_attention_core,
        )

        out = clip_attention_core(qkv, heads=H)
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (D ** -0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, W)
    out = jnp.dot(out, block["w_out"], preferred_element_type=jnp.float32)
    return (out + block["b_out"]).astype(x.dtype)


def _block(x: jax.Array, block: Params, heads: int,
           fused_attention: bool = False) -> jax.Array:
    """Pre-LN residual attention block with QuickGELU MLP.

    The MLP half stays inline XLA deliberately: a fused Pallas
    LN→fc→GELU→proj→residual kernel measured 0.508 vs XLA's 0.525 ms
    per half-block isolated (XLA is at 88% of the MXU floor here) and
    LOST 6% inside the layer scan, so it was deleted (DESIGN.md
    "things that did NOT help")."""
    h = layer_norm(x, block["ln_1_scale"], block["ln_1_bias"])
    x = x + _attention(h, block, heads, fused=fused_attention)
    h = layer_norm(x, block["ln_2_scale"], block["ln_2_bias"])
    h = jnp.dot(h, block["w_fc"], preferred_element_type=jnp.float32)
    # Activation in f32 (the dot already accumulated in f32), cast after:
    # XLA fuses this into the matmul epilogue, no extra HBM pass.
    h = quick_gelu(h + block["b_fc"]).astype(x.dtype)
    h = jnp.dot(h, block["w_proj"], preferred_element_type=jnp.float32)
    return x + (h + block["b_proj"]).astype(x.dtype)


def encode_image(
    params: Params,
    images: jax.Array,  # [B, H, W, 3] preprocessed (normalised) NHWC
    config: CLIPVisionConfig = VIT_B_32,
    compute_dtype: jnp.dtype = jnp.float32,
    fused_attention: bool | None = None,
) -> jax.Array:
    """Forward pass → [B, embed_dim] image embeddings (un-normalised,
    matching ``model.encode_image`` in the torch reference).

    ``fused_attention=None`` auto-enables the Pallas attention-core kernel
    on TPU for bf16 throughput runs; exact-parity (f32) runs keep the
    einsum path.
    """
    if fused_attention is None:
        # Hardware-validated: 13.9k vs 10.8k crops/s at batch 192 on v5e,
        # cos 0.99995 vs the einsum path (DESIGN.md). Auto-on for bf16
        # throughput runs; f32 parity runs keep the einsum oracle.
        fused_attention = (jax.default_backend() == "tpu"
                           and compute_dtype == jnp.bfloat16)
    x = images.astype(compute_dtype)
    kernel = params["conv_kernel"].astype(compute_dtype)
    # Patchify: 32x32 stride-32 conv == one big matmul per patch grid.
    # preferred_element_type matches the compute dtype: the MXU still
    # accumulates in f32 internally, and a f32 output here breaks the
    # conv VJP under bf16 training (mixed-dtype cotangent TypeError).
    x = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(config.patch_size, config.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
    )
    B = x.shape[0]
    x = x.reshape(B, config.grid * config.grid, config.width)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(compute_dtype), (B, 1, config.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(compute_dtype)[None]
    x = layer_norm(x, params["ln_pre_scale"], params["ln_pre_bias"])

    blocks = jax.tree.map(
        lambda a: a.astype(compute_dtype)
        if a.dtype in (jnp.float32, jnp.bfloat16) else a,
        params["blocks"],
    )

    def body(carry, layer):
        return _block(carry, layer, config.heads, fused_attention), None

    x, _ = jax.lax.scan(body, x, blocks)
    cls_out = layer_norm(
        x[:, 0, :], params["ln_post_scale"], params["ln_post_bias"]
    )
    emb = jnp.dot(
        cls_out.astype(compute_dtype), params["proj"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return emb


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_image_jit(params, images, config: CLIPVisionConfig = VIT_B_32,
                     compute_dtype=jnp.float32):
    return encode_image(params, images, config, compute_dtype)
