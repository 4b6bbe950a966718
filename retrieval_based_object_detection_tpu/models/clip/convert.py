"""Torch → JAX weight conversion for the CLIP vision tower.

Accepts either of the two public checkpoint layouts:
  * OpenAI ``clip`` state dicts (``visual.*`` keys — the exact weights the
    reference loads at 31_clip_embedding_and_save_vector.py:26), or
  * HuggingFace ``CLIPVisionModelWithProjection`` state dicts
    (``vision_model.*`` + ``visual_projection``).

Both are mapped onto the scan-stacked params pytree of
``models.clip.model``. Torch linear weights are [out, in] and are transposed
to [in, out]; the patch conv moves OIHW → HWIO. The OpenAI fused
``in_proj_weight`` is already (q|k|v) along dim 0, matching our ``w_qkv``
column order after transpose.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from retrieval_based_object_detection_tpu.models.clip.model import (
    CLIPVisionConfig,
    Params,
    VIT_B_32,
)


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray → float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def detect_format(sd: Mapping[str, object]) -> str:
    if any(k.startswith("visual.") for k in sd):
        return "openai"
    if any(k.startswith("vision_model.") for k in sd):
        return "hf"
    raise ValueError("unrecognised CLIP checkpoint layout")


def infer_config(sd: Mapping[str, object]) -> CLIPVisionConfig:
    fmt = detect_format(sd)
    if fmt == "openai":
        conv = _np(sd["visual.conv1.weight"])  # [W, 3, P, P]
        width, _, patch, _ = conv.shape
        seq = _np(sd["visual.positional_embedding"]).shape[0]
        layers = 1 + max(
            int(k.split(".")[3]) for k in sd
            if k.startswith("visual.transformer.resblocks.")
        )
        embed_dim = _np(sd["visual.proj"]).shape[1]
        heads = width // 64
    else:
        conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])
        width, _, patch, _ = conv.shape
        seq = _np(sd["vision_model.embeddings.position_embedding.weight"]).shape[0]
        layers = 1 + max(
            int(k.split(".")[3]) for k in sd
            if k.startswith("vision_model.encoder.layers.")
        )
        embed_dim = _np(sd["visual_projection.weight"]).shape[0]
        heads = width // 64
    grid = int(round((seq - 1) ** 0.5))
    return CLIPVisionConfig(
        image_size=grid * patch, patch_size=patch, width=width,
        layers=layers, heads=heads, embed_dim=embed_dim,
    )


def convert_state_dict(sd: Mapping[str, object],
                       config: CLIPVisionConfig | None = None) -> Params:
    """Convert a torch CLIP(-vision) state dict to our params pytree."""
    fmt = detect_format(sd)
    config = config or infer_config(sd)
    L = config.layers

    if fmt == "openai":
        p = "visual."
        conv = _np(sd[p + "conv1.weight"]).transpose(2, 3, 1, 0)  # OIHW→HWIO
        params: Params = {
            "conv_kernel": conv,
            "class_embedding": _np(sd[p + "class_embedding"]),
            "positional_embedding": _np(sd[p + "positional_embedding"]),
            "ln_pre_scale": _np(sd[p + "ln_pre.weight"]),
            "ln_pre_bias": _np(sd[p + "ln_pre.bias"]),
            "ln_post_scale": _np(sd[p + "ln_post.weight"]),
            "ln_post_bias": _np(sd[p + "ln_post.bias"]),
            "proj": _np(sd[p + "proj"]),
        }
        bp = p + "transformer.resblocks."
        blocks = {
            "ln_1_scale": [], "ln_1_bias": [], "w_qkv": [], "b_qkv": [],
            "w_out": [], "b_out": [], "ln_2_scale": [], "ln_2_bias": [],
            "w_fc": [], "b_fc": [], "w_proj": [], "b_proj": [],
        }
        for i in range(L):
            b = f"{bp}{i}."
            blocks["ln_1_scale"].append(_np(sd[b + "ln_1.weight"]))
            blocks["ln_1_bias"].append(_np(sd[b + "ln_1.bias"]))
            blocks["w_qkv"].append(_np(sd[b + "attn.in_proj_weight"]).T)
            blocks["b_qkv"].append(_np(sd[b + "attn.in_proj_bias"]))
            blocks["w_out"].append(_np(sd[b + "attn.out_proj.weight"]).T)
            blocks["b_out"].append(_np(sd[b + "attn.out_proj.bias"]))
            blocks["ln_2_scale"].append(_np(sd[b + "ln_2.weight"]))
            blocks["ln_2_bias"].append(_np(sd[b + "ln_2.bias"]))
            blocks["w_fc"].append(_np(sd[b + "mlp.c_fc.weight"]).T)
            blocks["b_fc"].append(_np(sd[b + "mlp.c_fc.bias"]))
            blocks["w_proj"].append(_np(sd[b + "mlp.c_proj.weight"]).T)
            blocks["b_proj"].append(_np(sd[b + "mlp.c_proj.bias"]))
    else:
        vp = "vision_model."
        conv = _np(sd[vp + "embeddings.patch_embedding.weight"]
                   ).transpose(2, 3, 1, 0)
        params = {
            "conv_kernel": conv,
            "class_embedding": _np(sd[vp + "embeddings.class_embedding"]),
            "positional_embedding": _np(
                sd[vp + "embeddings.position_embedding.weight"]),
            # NB: HF's key really is spelled "pre_layrnorm".
            "ln_pre_scale": _np(sd[vp + "pre_layrnorm.weight"]),
            "ln_pre_bias": _np(sd[vp + "pre_layrnorm.bias"]),
            "ln_post_scale": _np(sd[vp + "post_layernorm.weight"]),
            "ln_post_bias": _np(sd[vp + "post_layernorm.bias"]),
            "proj": _np(sd["visual_projection.weight"]).T,
        }
        bp = vp + "encoder.layers."
        blocks = {
            "ln_1_scale": [], "ln_1_bias": [], "w_qkv": [], "b_qkv": [],
            "w_out": [], "b_out": [], "ln_2_scale": [], "ln_2_bias": [],
            "w_fc": [], "b_fc": [], "w_proj": [], "b_proj": [],
        }
        for i in range(L):
            b = f"{bp}{i}."
            wq = _np(sd[b + "self_attn.q_proj.weight"])
            wk = _np(sd[b + "self_attn.k_proj.weight"])
            wv = _np(sd[b + "self_attn.v_proj.weight"])
            bq = _np(sd[b + "self_attn.q_proj.bias"])
            bk = _np(sd[b + "self_attn.k_proj.bias"])
            bv = _np(sd[b + "self_attn.v_proj.bias"])
            blocks["ln_1_scale"].append(_np(sd[b + "layer_norm1.weight"]))
            blocks["ln_1_bias"].append(_np(sd[b + "layer_norm1.bias"]))
            blocks["w_qkv"].append(np.concatenate([wq, wk, wv], axis=0).T)
            blocks["b_qkv"].append(np.concatenate([bq, bk, bv], axis=0))
            blocks["w_out"].append(_np(sd[b + "self_attn.out_proj.weight"]).T)
            blocks["b_out"].append(_np(sd[b + "self_attn.out_proj.bias"]))
            blocks["ln_2_scale"].append(_np(sd[b + "layer_norm2.weight"]))
            blocks["ln_2_bias"].append(_np(sd[b + "layer_norm2.bias"]))
            blocks["w_fc"].append(_np(sd[b + "mlp.fc1.weight"]).T)
            blocks["b_fc"].append(_np(sd[b + "mlp.fc1.bias"]))
            blocks["w_proj"].append(_np(sd[b + "mlp.fc2.weight"]).T)
            blocks["b_proj"].append(_np(sd[b + "mlp.fc2.bias"]))

    params["blocks"] = {k: np.stack(v) for k, v in blocks.items()}
    return params


def load_torch_checkpoint(
    path: str, config: CLIPVisionConfig | None = None
) -> tuple[Params, CLIPVisionConfig]:
    """Load a .pt/.bin torch checkpoint file and convert (CPU torch).
    Returns (params, config) — the config is inferred from the weights
    (so ViT-L/14 etc. load with their real layout) unless given."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except RuntimeError:
        # The official OpenAI releases (clip.load's download, e.g.
        # ViT-B-32.pt from openaipublic) are TorchScript archives.
        obj = torch.jit.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    config = config or infer_config(obj)
    return convert_state_dict(obj, config), config
