"""SAM prompt encoder + two-way transformer mask decoder.

Mirrors segment-anything's PromptEncoder/MaskDecoder structure (random
Fourier positional encoding for points, learned point-type embeddings,
two-way attention blocks with downsampled internal dim, IoU head,
per-mask hypernetwork MLPs, 4× transposed-conv upscaling) so official
checkpoints convert; dimensions come from config for small test models.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    embed_dim: int = 256          # prompt/mask transformer dim
    depth: int = 2                # two-way blocks
    heads: int = 8
    mlp_dim: int = 2048
    downsample_rate: int = 2      # internal attention dim = embed/rate
    num_multimask: int = 3        # 3 multimask outputs (+1 single)
    iou_head_hidden: int = 256
    iou_head_depth: int = 3

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask + 1


def init_params(cfg: DecoderConfig, seed: int = 0) -> Params:
    rng = np.random.default_rng(seed)
    d = cfg.embed_dim

    def lin(cin, cout):
        return {"w": rng.normal(0, cin ** -0.5, (cin, cout)).astype(np.float32),
                "b": np.zeros(cout, np.float32)}

    def attn(dim, inner):
        return {"q": lin(dim, inner), "k": lin(dim, inner),
                "v": lin(dim, inner), "out": lin(inner, dim)}

    inner = d // cfg.downsample_rate

    def twoway_block():
        return {
            "self_attn": attn(d, d),
            "ln1_s": np.ones(d, np.float32), "ln1_b": np.zeros(d, np.float32),
            "cross_t2i": attn(d, inner),
            "ln2_s": np.ones(d, np.float32), "ln2_b": np.zeros(d, np.float32),
            "fc1": lin(d, cfg.mlp_dim), "fc2": lin(cfg.mlp_dim, d),
            "ln3_s": np.ones(d, np.float32), "ln3_b": np.zeros(d, np.float32),
            "cross_i2t": attn(d, inner),
            "ln4_s": np.ones(d, np.float32), "ln4_b": np.zeros(d, np.float32),
        }

    def mlp(cin, hidden, cout, depth):
        dims = [cin] + [hidden] * (depth - 1) + [cout]
        return [lin(dims[i], dims[i + 1]) for i in range(depth)]

    params: Params = {
        # Prompt encoder.
        "pe_gaussian": rng.normal(0, 1.0, (2, d // 2)).astype(np.float32),
        "point_embed_neg": rng.normal(0, 0.02, (d,)).astype(np.float32),
        "point_embed_pos": rng.normal(0, 0.02, (d,)).astype(np.float32),
        "not_a_point": rng.normal(0, 0.02, (d,)).astype(np.float32),
        "no_mask_embed": rng.normal(0, 0.02, (d,)).astype(np.float32),
        # Decoder tokens.
        "iou_token": rng.normal(0, 0.02, (d,)).astype(np.float32),
        "mask_tokens": rng.normal(0, 0.02, (cfg.num_mask_tokens, d)
                                  ).astype(np.float32),
        "blocks": [twoway_block() for i in range(cfg.depth)],
        "final_t2i": attn(d, inner),
        "final_ln_s": np.ones(d, np.float32),
        "final_ln_b": np.zeros(d, np.float32),
        # Upscaling: two stride-2 transposed convs d -> d/4 -> d/8.
        "up0": rng.normal(0, d ** -0.5, (2, 2, d, d // 4)).astype(np.float32),
        "up_ln_s": np.ones(d // 4, np.float32),
        "up_ln_b": np.zeros(d // 4, np.float32),
        "up1": rng.normal(0, (d // 4) ** -0.5, (2, 2, d // 4, d // 8)
                          ).astype(np.float32),
        "hyper_mlps": [mlp(d, d, d // 8, 3)
                       for _ in range(cfg.num_mask_tokens)],
        "iou_mlp": mlp(d, cfg.iou_head_hidden, cfg.num_mask_tokens,
                       cfg.iou_head_depth),
    }
    return jax.tree.map(jnp.asarray, params)


def _ln(x, s, b, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * s + b).astype(x.dtype)


def _linear(x, p):
    return (jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
            + p["b"]).astype(x.dtype)


def _mha(q, k, v, p, heads: int):
    """Multi-head attention with per-projection params ([B, T, D] each)."""
    B, Tq, _ = q.shape
    qh = _linear(q, p["q"])
    kh = _linear(k, p["k"])
    vh = _linear(v, p["v"])
    inner = qh.shape[-1]
    hd = inner // heads

    def split(t):
        return t.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(qh), split(kh), split(vh)
    attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                      preferred_element_type=jnp.float32) * hd ** -0.5
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, Tq, inner)
    return _linear(out, p["out"])


def point_pe(coords: jax.Array, gaussian: jax.Array) -> jax.Array:
    """Random-Fourier positional encoding of [..., 2] coords in [0, 1]."""
    x = coords * 2.0 - 1.0
    proj = 2 * np.pi * jnp.matmul(x, gaussian)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def grid_pe(g: int, gaussian: jax.Array) -> jax.Array:
    """[g, g, D] positional encoding of the image-embedding grid."""
    ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    return point_pe(grid, gaussian)


def encode_points(params: Params, points: jax.Array, labels: jax.Array
                  ) -> jax.Array:
    """points [B, P, 2] in [0,1], labels [B, P] (1 pos, 0 neg, -1 pad)
    → sparse prompt tokens [B, P, D]."""
    pe = point_pe(points, params["pe_gaussian"])
    pos = params["point_embed_pos"]
    neg = params["point_embed_neg"]
    nap = params["not_a_point"]
    tok = jnp.where(labels[..., None] == 1, pe + pos,
                    jnp.where(labels[..., None] == 0, pe + neg, nap))
    return tok


def decode_masks(
    params: Params,
    image_embedding: jax.Array,  # [B, g, g, D]
    points: jax.Array,           # [B, P, 2] normalised to [0, 1]
    labels: jax.Array,           # [B, P]
    cfg: DecoderConfig,
) -> tuple[jax.Array, jax.Array]:
    """→ (mask_logits [B, num_mask_tokens, 4g, 4g], iou_pred [B, tokens])."""
    B, g, _, d = image_embedding.shape
    sparse = encode_points(params, points, labels)
    tokens = jnp.concatenate([
        jnp.broadcast_to(params["iou_token"], (B, 1, d)),
        jnp.broadcast_to(params["mask_tokens"], (B, cfg.num_mask_tokens, d)),
        sparse,
    ], axis=1)

    src = image_embedding.reshape(B, g * g, d)
    src = src + params["no_mask_embed"]  # dense prompt = none
    img_pe = grid_pe(g, params["pe_gaussian"]).reshape(1, g * g, d)
    tok_pe = tokens  # token PEs are the tokens themselves at entry

    q = tokens
    for bi, blk in enumerate(params["blocks"]):
        # Token self-attention. The first block skips the token PE (the
        # queries ARE the prompt embeddings at entry — segment-anything's
        # skip_first_layer_pe).
        if bi == 0:
            # No residual in the first self-attn (segment-anything replaces
            # the queries outright when skip_first_layer_pe is set).
            q = _ln(_mha(q, q, q, blk["self_attn"], cfg.heads),
                    blk["ln1_s"], blk["ln1_b"], eps=1e-5)
        else:
            q = _ln(q + _mha(q + tok_pe, q + tok_pe, q, blk["self_attn"],
                             cfg.heads), blk["ln1_s"], blk["ln1_b"],
                    eps=1e-5)
        # Tokens attend to image.
        q = _ln(q + _mha(q + tok_pe, src + img_pe, src, blk["cross_t2i"],
                         cfg.heads), blk["ln2_s"], blk["ln2_b"], eps=1e-5)
        # MLP.
        h = _linear(q, blk["fc1"])
        h = jax.nn.relu(h)
        q = _ln(q + _linear(h, blk["fc2"]), blk["ln3_s"], blk["ln3_b"],
                eps=1e-5)
        # Image attends to tokens.
        src = _ln(src + _mha(src + img_pe, q + tok_pe, q, blk["cross_i2t"],
                             cfg.heads), blk["ln4_s"], blk["ln4_b"],
                  eps=1e-5)

    q = q + _mha(q + tok_pe, src + img_pe, src, params["final_t2i"],
                 cfg.heads)
    q = _ln(q, params["final_ln_s"], params["final_ln_b"], eps=1e-5)

    iou_tok = q[:, 0]
    mask_toks = q[:, 1:1 + cfg.num_mask_tokens]

    # Upscale image features 4x.
    feat = src.reshape(B, g, g, d)
    feat = jax.lax.conv_transpose(
        feat, params["up0"], (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    feat = _ln(feat, params["up_ln_s"], params["up_ln_b"])
    feat = jax.nn.gelu(feat, approximate=False)
    feat = jax.lax.conv_transpose(
        feat, params["up1"], (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    feat = jax.nn.gelu(feat, approximate=False)  # [B, 4g, 4g, d/8]

    # Hypernetwork per mask token → dot with upscaled features.
    outs = []
    for i, mlp_params in enumerate(params["hyper_mlps"]):
        h = mask_toks[:, i]
        for j, lin_p in enumerate(mlp_params):
            h = _linear(h, lin_p)
            if j < len(mlp_params) - 1:
                h = jax.nn.relu(h)
        outs.append(jnp.einsum("bhwc,bc->bhw", feat, h,
                               preferred_element_type=jnp.float32))
    masks = jnp.stack(outs, axis=1)  # [B, tokens, 4g, 4g]

    h = iou_tok
    for j, lin_p in enumerate(params["iou_mlp"]):
        h = _linear(h, lin_p)
        if j < len(params["iou_mlp"]) - 1:
            h = jax.nn.relu(h)
    return masks, h
