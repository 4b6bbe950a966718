"""CLIP vision tower: parity vs torch/transformers on random weights.

No network access: we instantiate HF ``CLIPVisionModelWithProjection`` with
a random-initialised small config, convert its state dict, and require the
JAX forward pass to match torch within float32 tolerance. This validates the
architecture (pre-LN, QuickGELU, fused qkv order, projection) independently
of any downloaded checkpoint; real ViT-B/32 weights convert through the same
code path.
"""

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.models.clip import convert as C
from retrieval_based_object_detection_tpu.models.clip import model as M
from retrieval_based_object_detection_tpu.models.clip import preprocess as P

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.CLIPVisionConfig(
        hidden_size=128,
        intermediate_size=512,
        num_hidden_layers=3,
        num_attention_heads=2,  # head_dim 64 so infer_config agrees
        image_size=64,
        patch_size=16,
        projection_dim=96,
    )
    torch.manual_seed(0)
    model = transformers.CLIPVisionModelWithProjection(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(hf_model):
    sd = hf_model.state_dict()
    config = C.infer_config(sd)
    params = C.convert_state_dict(sd, config)
    return config, params


def test_infer_config(converted):
    config, _ = converted
    assert config.width == 128
    assert config.layers == 3
    assert config.heads == 2
    assert config.patch_size == 16
    assert config.image_size == 64
    assert config.embed_dim == 96
    assert config.seq_len == 17


def test_forward_parity_with_torch(hf_model, converted, rng):
    config, params = converted
    x = rng.normal(size=(4, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(pixel_values=torch.from_numpy(x)).image_embeds.numpy()
    ours = np.asarray(
        M.encode_image(params, x.transpose(0, 2, 3, 1), config)
    )
    assert ours.shape == ref.shape == (4, 96)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_batch_invariance(converted, rng):
    """Embedding of an image must not depend on its batch neighbours."""
    config, params = converted
    x = rng.normal(size=(3, 64, 64, 3)).astype(np.float32)
    full = np.asarray(M.encode_image(params, x, config))
    solo = np.asarray(M.encode_image(params, x[1:2], config))
    np.testing.assert_allclose(full[1], solo[0], atol=1e-4)


def test_bf16_mode_close(converted, rng):
    import jax.numpy as jnp

    config, params = converted
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    f32 = np.asarray(M.encode_image(params, x, config))
    bf16 = np.asarray(
        M.encode_image(params, x, config, compute_dtype=jnp.bfloat16)
    )
    cos = np.sum(f32 * bf16, axis=-1) / (
        np.linalg.norm(f32, axis=-1) * np.linalg.norm(bf16, axis=-1)
    )
    assert np.all(cos > 0.999), cos


def test_openai_layout_roundtrip(converted):
    """OpenAI-layout conversion is the exact inverse of our pytree mapping."""
    config, params = converted
    sd = {}
    sd["visual.conv1.weight"] = np.asarray(params["conv_kernel"]).transpose(3, 2, 0, 1)
    sd["visual.class_embedding"] = np.asarray(params["class_embedding"])
    sd["visual.positional_embedding"] = np.asarray(params["positional_embedding"])
    sd["visual.ln_pre.weight"] = np.asarray(params["ln_pre_scale"])
    sd["visual.ln_pre.bias"] = np.asarray(params["ln_pre_bias"])
    sd["visual.ln_post.weight"] = np.asarray(params["ln_post_scale"])
    sd["visual.ln_post.bias"] = np.asarray(params["ln_post_bias"])
    sd["visual.proj"] = np.asarray(params["proj"])
    b = params["blocks"]
    for i in range(config.layers):
        pre = f"visual.transformer.resblocks.{i}."
        sd[pre + "ln_1.weight"] = np.asarray(b["ln_1_scale"][i])
        sd[pre + "ln_1.bias"] = np.asarray(b["ln_1_bias"][i])
        sd[pre + "attn.in_proj_weight"] = np.asarray(b["w_qkv"][i]).T
        sd[pre + "attn.in_proj_bias"] = np.asarray(b["b_qkv"][i])
        sd[pre + "attn.out_proj.weight"] = np.asarray(b["w_out"][i]).T
        sd[pre + "attn.out_proj.bias"] = np.asarray(b["b_out"][i])
        sd[pre + "ln_2.weight"] = np.asarray(b["ln_2_scale"][i])
        sd[pre + "ln_2.bias"] = np.asarray(b["ln_2_bias"][i])
        sd[pre + "mlp.c_fc.weight"] = np.asarray(b["w_fc"][i]).T
        sd[pre + "mlp.c_fc.bias"] = np.asarray(b["b_fc"][i])
        sd[pre + "mlp.c_proj.weight"] = np.asarray(b["w_proj"][i]).T
        sd[pre + "mlp.c_proj.bias"] = np.asarray(b["b_proj"][i])

    assert C.detect_format(sd) == "openai"
    config2 = C.infer_config(sd)
    assert config2 == config
    params2 = C.convert_state_dict(sd, config2)

    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params2,
    )


def test_preprocess_parity_with_hf_processor(rng):
    """PIL path matches transformers' CLIPImageProcessor output."""
    from PIL import Image

    proc = transformers.CLIPImageProcessor(
        size={"shortest_edge": 224},
        crop_size={"height": 224, "width": 224},
        image_mean=P.CLIP_MEAN.tolist(),
        image_std=P.CLIP_STD.tolist(),
    )
    img = Image.fromarray(
        rng.integers(0, 255, size=(300, 420, 3), dtype=np.uint8)
    )
    ref = proc(img, return_tensors="np")["pixel_values"][0]  # [3, 224, 224]
    ours = P.preprocess_pil(img).transpose(2, 0, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_device_preprocess_close_to_pil(rng):
    """Batched device resize is numerically close to the PIL path."""
    from PIL import Image

    raw = rng.integers(0, 255, size=(2, 320, 280, 3), dtype=np.uint8)
    dev = np.asarray(P.preprocess_batch(raw))
    for i in range(2):
        pil = P.preprocess_pil(Image.fromarray(raw[i]))
        # Different resamplers: require close agreement, not bit parity.
        err = np.abs(dev[i] - pil).mean()
        assert err < 0.12, err


def test_init_params_shapes():
    params = M.init_params(M.VIT_B_32)
    assert params["conv_kernel"].shape == (32, 32, 3, 768)
    assert params["positional_embedding"].shape == (50, 768)
    assert params["blocks"]["w_qkv"].shape == (12, 768, 2304)
    assert params["proj"].shape == (768, 512)
    emb = M.encode_image(params, np.zeros((1, 224, 224, 3), np.float32))
    assert emb.shape == (1, 512)
