"""SAM checkpoint conversion: official-layout state dict → our pytree.

Builds a synthetic state dict in Meta's segment-anything key layout (tiny
dims), converts, and checks config inference plus a full forward pass —
validating every key mapping and transpose without needing the real
checkpoint file.
"""

import numpy as np

from retrieval_based_object_detection_tpu.models.sam import convert as SC
from retrieval_based_object_detection_tpu.models.sam import model as SM


def make_official_sd(rng):
    """Tiny official-layout state dict: img 64, patch 16 (grid 4), dim 32,
    2 blocks (block 1 global), decoder dim 16, depth 2."""
    sd = {}
    d, grid, out_c, dd = 32, 4, 16, 16
    sd["image_encoder.patch_embed.proj.weight"] = rng.normal(size=(d, 3, 16, 16))
    sd["image_encoder.patch_embed.proj.bias"] = rng.normal(size=(d,))
    sd["image_encoder.pos_embed"] = rng.normal(size=(1, grid, grid, d))
    for i, size in enumerate((2, grid)):  # block0 windowed ws=2, block1 global
        p = f"image_encoder.blocks.{i}."
        sd[p + "norm1.weight"] = np.ones(d)
        sd[p + "norm1.bias"] = np.zeros(d)
        sd[p + "attn.qkv.weight"] = rng.normal(size=(3 * d, d))
        sd[p + "attn.qkv.bias"] = rng.normal(size=(3 * d,))
        sd[p + "attn.proj.weight"] = rng.normal(size=(d, d))
        sd[p + "attn.proj.bias"] = rng.normal(size=(d,))
        head_dim = d // 2  # test model runs with heads=2
        sd[p + "attn.rel_pos_h"] = rng.normal(size=(2 * size - 1, head_dim))
        sd[p + "attn.rel_pos_w"] = rng.normal(size=(2 * size - 1, head_dim))
        sd[p + "norm2.weight"] = np.ones(d)
        sd[p + "norm2.bias"] = np.zeros(d)
        sd[p + "mlp.lin1.weight"] = rng.normal(size=(4 * d, d))
        sd[p + "mlp.lin1.bias"] = rng.normal(size=(4 * d,))
        sd[p + "mlp.lin2.weight"] = rng.normal(size=(d, 4 * d))
        sd[p + "mlp.lin2.bias"] = rng.normal(size=(d,))
    sd["image_encoder.neck.0.weight"] = rng.normal(size=(out_c, d, 1, 1))
    sd["image_encoder.neck.1.weight"] = np.ones(out_c)
    sd["image_encoder.neck.1.bias"] = np.zeros(out_c)
    sd["image_encoder.neck.2.weight"] = rng.normal(size=(out_c, out_c, 3, 3))
    sd["image_encoder.neck.3.weight"] = np.ones(out_c)
    sd["image_encoder.neck.3.bias"] = np.zeros(out_c)

    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
        rng.normal(size=(2, dd // 2))
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = \
            rng.normal(size=(1, dd))
    sd["prompt_encoder.not_a_point_embed.weight"] = rng.normal(size=(1, dd))
    sd["prompt_encoder.no_mask_embed.weight"] = rng.normal(size=(1, dd))
    sd["prompt_encoder.mask_downscaling.0.weight"] = rng.normal(size=(4, 1, 2, 2))

    sd["mask_decoder.iou_token.weight"] = rng.normal(size=(1, dd))
    sd["mask_decoder.mask_tokens.weight"] = rng.normal(size=(4, dd))
    for i in range(2):
        p = f"mask_decoder.transformer.layers.{i}."
        for attn, inner in (("self_attn", dd),
                            ("cross_attn_token_to_image", dd // 2),
                            ("cross_attn_image_to_token", dd // 2)):
            for proj, (o, in_) in {
                "q_proj": (inner, dd), "k_proj": (inner, dd),
                "v_proj": (inner, dd), "out_proj": (dd, inner),
            }.items():
                sd[f"{p}{attn}.{proj}.weight"] = rng.normal(size=(o, in_))
                sd[f"{p}{attn}.{proj}.bias"] = rng.normal(size=(o,))
        for n in ("norm1", "norm2", "norm3", "norm4"):
            sd[p + n + ".weight"] = np.ones(dd)
            sd[p + n + ".bias"] = np.zeros(dd)
        sd[p + "mlp.lin1.weight"] = rng.normal(size=(2 * dd, dd))
        sd[p + "mlp.lin1.bias"] = rng.normal(size=(2 * dd,))
        sd[p + "mlp.lin2.weight"] = rng.normal(size=(dd, 2 * dd))
        sd[p + "mlp.lin2.bias"] = rng.normal(size=(dd,))
    p = "mask_decoder.transformer.final_attn_token_to_image."
    for proj, (o, in_) in {"q_proj": (dd // 2, dd), "k_proj": (dd // 2, dd),
                           "v_proj": (dd // 2, dd), "out_proj": (dd, dd // 2)
                           }.items():
        sd[p + proj + ".weight"] = rng.normal(size=(o, in_))
        sd[p + proj + ".bias"] = rng.normal(size=(o,))
    sd["mask_decoder.transformer.norm_final_attn.weight"] = np.ones(dd)
    sd["mask_decoder.transformer.norm_final_attn.bias"] = np.zeros(dd)
    sd["mask_decoder.output_upscaling.0.weight"] = rng.normal(
        size=(dd, dd // 4, 2, 2))
    sd["mask_decoder.output_upscaling.1.weight"] = np.ones(dd // 4)
    sd["mask_decoder.output_upscaling.1.bias"] = np.zeros(dd // 4)
    sd["mask_decoder.output_upscaling.3.weight"] = rng.normal(
        size=(dd // 4, dd // 8, 2, 2))
    for i in range(4):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}.layers."
        dims = [(dd, dd), (dd, dd), (dd // 8, dd)]
        for j, (o, in_) in enumerate(dims):
            sd[f"{p}{j}.weight"] = rng.normal(size=(o, in_))
            sd[f"{p}{j}.bias"] = rng.normal(size=(o,))
    p = "mask_decoder.iou_prediction_head.layers."
    for j, (o, in_) in enumerate([(dd, dd), (dd, dd), (4, dd)]):
        sd[f"{p}{j}.weight"] = rng.normal(size=(o, in_))
        sd[f"{p}{j}.bias"] = rng.normal(size=(o,))
    return sd


def test_convert_and_forward(rng):
    sd = {k: v.astype(np.float32) for k, v in make_official_sd(rng).items()}
    cfg = SC.infer_config(sd)
    assert cfg.encoder.img_size == 64
    assert cfg.encoder.depth == 2
    assert cfg.encoder.global_attn_indexes == (1,)
    assert cfg.encoder.window_size == 2
    assert cfg.decoder.embed_dim == 16
    assert cfg.decoder.num_multimask == 3
    # Encoder heads derive from the rel-pos table width (head_dim 16 on
    # this tiny dict -> 32//16 = 2); embed//64 would give 0 here and 20
    # (wrong) on ViT-H. Only the decoder heads need patching for tiny
    # dims.
    assert cfg.encoder.heads == 2
    cfg = SamConfigFix(cfg)

    params = SC.convert_state_dict(sd, cfg)
    assert "_unused" in params["decoder"]
    pred = SM.SamPredictor(params, cfg)
    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    pred.set_image(img)
    masks, scores = pred.predict(np.array([[32.0, 24.0]]), np.array([1]))
    assert masks.shape == (3, 48, 64)
    assert np.isfinite(scores).all()


def SamConfigFix(cfg):
    import dataclasses

    enc = dataclasses.replace(cfg.encoder, heads=2)
    dec = dataclasses.replace(cfg.decoder, heads=2)
    return dataclasses.replace(cfg, encoder=enc, decoder=dec)


def test_infer_config_vit_h_head_count(rng):
    """ViT-H proportions: embed_dim not divisible into 64-wide heads
    (official ViT-H is 1280 dim / 16 heads / head_dim 80). The head
    count must come from the rel-pos table width; embed//64 would give
    a contraction mismatch in the rel-pos einsum. Scaled stand-in:
    embed 320 / head_dim 80 -> 4 heads (embed//64 would say 5)."""
    sd = make_official_sd(rng)
    d, grid = 320, 4
    sd["image_encoder.patch_embed.proj.weight"] = rng.normal(
        size=(d, 3, 16, 16))
    sd["image_encoder.pos_embed"] = rng.normal(size=(1, grid, grid, d))
    for i, size in enumerate((2, grid)):
        p = f"image_encoder.blocks.{i}."
        sd[p + "attn.rel_pos_h"] = rng.normal(size=(2 * size - 1, 80))
        sd[p + "attn.rel_pos_w"] = rng.normal(size=(2 * size - 1, 80))
    sd["image_encoder.neck.0.weight"] = rng.normal(size=(16, d, 1, 1))
    cfg = SC.infer_config({k: np.asarray(v, np.float32)
                           for k, v in sd.items()})
    assert cfg.encoder.embed_dim == 320
    assert cfg.encoder.heads == 4
