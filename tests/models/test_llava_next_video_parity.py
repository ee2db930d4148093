"""LLaVA-NeXT-Video parity vs transformers: CLIP tower + spatial-pool
video resampler + shared projector."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402

VID_TOK = 56


def test_llava_next_video_features_parity(tmp_path):
    vc = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14)
    tc = transformers.LlamaConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0)
    cfg = transformers.LlavaNextVideoConfig(
        vision_config=vc, text_config=tc, image_token_index=VID_TOK + 1,
        video_token_index=VID_TOK, spatial_pool_stride=2,
        spatial_pool_mode="average", vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    hf = transformers.LlavaNextVideoForConditionalGeneration(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    rng = np.random.default_rng(0)
    # 3 frames of 2x2 patches -> pooled 1x1 -> 3 video tokens.
    frames = rng.standard_normal((1, 3, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_video_features(
            torch.tensor(frames), vision_feature_layer=-2,
            vision_feature_select_strategy="default")
    if isinstance(ref, (list, tuple)):
        ref = torch.cat(list(ref))
    ref = ref.reshape(-1, 48).float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "LlavaNextVideoForConditionalGeneration"
    model, params = load_model(mc, "safetensors")
    got = model.encode_mm(params, {"pixel_values_videos": frames})
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=4e-3, atol=4e-3)
