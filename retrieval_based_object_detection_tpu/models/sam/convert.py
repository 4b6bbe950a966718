"""Official SAM checkpoint → JAX pytree conversion.

Maps Meta's segment-anything state-dict layout (sam_vit_b/l/h .pth files,
the exact checkpoints 22_segment_image_auto.py:24-38 downloads) onto the
pytrees of ``models.sam.encoder``/``models.sam.decoder``. Linear weights
transpose [out, in] → [in, out]; convs move OIHW → HWIO; transposed convs
move [in, out, h, w] → [h, w, in, out].

Unsupported prompt features (mask-prompt downscaling convs, box corners)
are parked under ``params["decoder"]["_unused"]`` so nothing silently
disappears; point + multimask decoding — everything the reference pipeline
uses — converts fully.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from retrieval_based_object_detection_tpu.models.sam.decoder import DecoderConfig
from retrieval_based_object_detection_tpu.models.sam.encoder import EncoderConfig
from retrieval_based_object_detection_tpu.models.sam.model import SamConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def infer_config(sd: Mapping[str, object]) -> SamConfig:
    patch = _np(sd["image_encoder.patch_embed.proj.weight"])
    embed_dim = patch.shape[0]
    depth = 1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith("image_encoder.blocks."))
    pos = _np(sd["image_encoder.pos_embed"])
    grid = pos.shape[1]
    out_chans = _np(sd["image_encoder.neck.0.weight"]).shape[0]
    # Global layers have rel-pos tables sized 2*grid-1.
    global_idx = tuple(
        i for i in range(depth)
        if _np(sd[f"image_encoder.blocks.{i}.attn.rel_pos_h"]).shape[0]
        == 2 * grid - 1
    )
    # Window size from a windowed block's table: (table+1)/2.
    win = 0
    for i in range(depth):
        if i not in global_idx:
            win = (_np(sd[f"image_encoder.blocks.{i}.attn.rel_pos_h"]
                       ).shape[0] + 1) // 2
            break
    # Head count from the rel-pos table's last dim (== head_dim), NOT
    # embed_dim // 64: ViT-H is 1280-dim with 16 heads of head_dim 80
    # (the //64 guess gives 20 heads and a 64-vs-80 contraction
    # mismatch in the rel-pos einsum); vit_b (768→12) and vit_l
    # (1024→16) agree with both derivations.
    head_dim = _np(sd["image_encoder.blocks.0.attn.rel_pos_h"]).shape[-1]
    enc = EncoderConfig(
        img_size=grid * patch.shape[2], patch_size=patch.shape[2],
        embed_dim=embed_dim, depth=depth, heads=embed_dim // head_dim,
        out_chans=out_chans, window_size=win, global_attn_indexes=global_idx,
    )
    dec_dim = _np(sd["mask_decoder.iou_token.weight"]).shape[1]
    dec_depth = 1 + max(
        int(k.split(".")[3]) for k in sd
        if k.startswith("mask_decoder.transformer.layers."))
    mlp_dim = _np(
        sd["mask_decoder.transformer.layers.0.mlp.lin1.weight"]).shape[0]
    num_masks = _np(sd["mask_decoder.mask_tokens.weight"]).shape[0]
    dec = DecoderConfig(embed_dim=dec_dim, depth=dec_depth, heads=8,
                        mlp_dim=mlp_dim, num_multimask=num_masks - 1)
    return SamConfig(encoder=enc, decoder=dec)


def _lin(sd, prefix) -> dict:
    return {"w": _np(sd[prefix + ".weight"]).T,
            "b": _np(sd[prefix + ".bias"])}


def _attn(sd, prefix) -> dict:
    return {"q": _lin(sd, prefix + ".q_proj"),
            "k": _lin(sd, prefix + ".k_proj"),
            "v": _lin(sd, prefix + ".v_proj"),
            "out": _lin(sd, prefix + ".out_proj")}


def convert_state_dict(sd: Mapping[str, object],
                       config: SamConfig | None = None) -> dict:
    config = config or infer_config(sd)
    enc_cfg = config.encoder

    encoder = {
        "patch_kernel": _np(sd["image_encoder.patch_embed.proj.weight"]
                            ).transpose(2, 3, 1, 0),
        "patch_bias": _np(sd["image_encoder.patch_embed.proj.bias"]),
        "pos_embed": _np(sd["image_encoder.pos_embed"])[0],
        "blocks": [],
        "neck0": _np(sd["image_encoder.neck.0.weight"]).transpose(2, 3, 1, 0),
        "neck_ln0_s": _np(sd["image_encoder.neck.1.weight"]),
        "neck_ln0_b": _np(sd["image_encoder.neck.1.bias"]),
        "neck1": _np(sd["image_encoder.neck.2.weight"]).transpose(2, 3, 1, 0),
        "neck_ln1_s": _np(sd["image_encoder.neck.3.weight"]),
        "neck_ln1_b": _np(sd["image_encoder.neck.3.bias"]),
    }
    for i in range(enc_cfg.depth):
        p = f"image_encoder.blocks.{i}."
        encoder["blocks"].append({
            "ln1_s": _np(sd[p + "norm1.weight"]),
            "ln1_b": _np(sd[p + "norm1.bias"]),
            "qkv": {"w": _np(sd[p + "attn.qkv.weight"]).T,
                    "b": _np(sd[p + "attn.qkv.bias"])},
            "proj": _lin(sd, p + "attn.proj"),
            "rel_h": _np(sd[p + "attn.rel_pos_h"]),
            "rel_w": _np(sd[p + "attn.rel_pos_w"]),
            "ln2_s": _np(sd[p + "norm2.weight"]),
            "ln2_b": _np(sd[p + "norm2.bias"]),
            "fc1": _lin(sd, p + "mlp.lin1"),
            "fc2": _lin(sd, p + "mlp.lin2"),
        })

    dec_cfg = config.decoder
    decoder = {
        "pe_gaussian": _np(
            sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]),
        "point_embed_neg": _np(sd["prompt_encoder.point_embeddings.0.weight"])[0],
        "point_embed_pos": _np(sd["prompt_encoder.point_embeddings.1.weight"])[0],
        "not_a_point": _np(sd["prompt_encoder.not_a_point_embed.weight"])[0],
        "no_mask_embed": _np(sd["prompt_encoder.no_mask_embed.weight"])[0],
        "iou_token": _np(sd["mask_decoder.iou_token.weight"])[0],
        "mask_tokens": _np(sd["mask_decoder.mask_tokens.weight"]),
        "blocks": [],
        "final_t2i": _attn(
            sd, "mask_decoder.transformer.final_attn_token_to_image"),
        "final_ln_s": _np(sd["mask_decoder.transformer.norm_final_attn.weight"]),
        "final_ln_b": _np(sd["mask_decoder.transformer.norm_final_attn.bias"]),
        # ConvTranspose2d: torch [in, out, kH, kW] → HWIO, PLUS a spatial
        # flip — jax.lax.conv_transpose does NOT reverse kernel spatial
        # dims (transpose_kernel=False default) while torch's op is the
        # gradient-derived (flipped) form.
        "up0": _np(sd["mask_decoder.output_upscaling.0.weight"]
                   ).transpose(2, 3, 0, 1)[::-1, ::-1],
        "up_ln_s": _np(sd["mask_decoder.output_upscaling.1.weight"]),
        "up_ln_b": _np(sd["mask_decoder.output_upscaling.1.bias"]),
        "up1": _np(sd["mask_decoder.output_upscaling.3.weight"]
                   ).transpose(2, 3, 0, 1)[::-1, ::-1],
        "hyper_mlps": [],
        "iou_mlp": [],
        "_unused": {},
    }
    for i in range(dec_cfg.depth):
        p = f"mask_decoder.transformer.layers.{i}."
        decoder["blocks"].append({
            "self_attn": _attn(sd, p + "self_attn"),
            "ln1_s": _np(sd[p + "norm1.weight"]),
            "ln1_b": _np(sd[p + "norm1.bias"]),
            "cross_t2i": _attn(sd, p + "cross_attn_token_to_image"),
            "ln2_s": _np(sd[p + "norm2.weight"]),
            "ln2_b": _np(sd[p + "norm2.bias"]),
            "fc1": _lin(sd, p + "mlp.lin1"),
            "fc2": _lin(sd, p + "mlp.lin2"),
            "ln3_s": _np(sd[p + "norm3.weight"]),
            "ln3_b": _np(sd[p + "norm3.bias"]),
            "cross_i2t": _attn(sd, p + "cross_attn_image_to_token"),
            "ln4_s": _np(sd[p + "norm4.weight"]),
            "ln4_b": _np(sd[p + "norm4.bias"]),
        })
    n_tokens = dec_cfg.num_mask_tokens
    for i in range(n_tokens):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}.layers."
        n_layers = 1 + max(
            int(k[len(p):].split(".")[0]) for k in sd if k.startswith(p))
        decoder["hyper_mlps"].append(
            [_lin(sd, f"{p}{j}") for j in range(n_layers)])
    p = "mask_decoder.iou_prediction_head.layers."
    n_layers = 1 + max(int(k[len(p):].split(".")[0])
                       for k in sd if k.startswith(p))
    decoder["iou_mlp"] = [_lin(sd, f"{p}{j}") for j in range(n_layers)]

    # Park the unconverted prompt-encoder extras for completeness.
    for k in sd:
        if k.startswith(("prompt_encoder.mask_downscaling",
                         "prompt_encoder.point_embeddings.2",
                         "prompt_encoder.point_embeddings.3")):
            decoder["_unused"][k] = _np(sd[k])

    import jax.numpy as jnp
    import jax

    return jax.tree.map(jnp.asarray, {"encoder": encoder, "decoder": decoder})


def load_torch_checkpoint(path: str, config: SamConfig | None = None):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_state_dict(sd, config), (config or infer_config(sd))
