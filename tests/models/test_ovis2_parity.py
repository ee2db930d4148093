"""Ovis2 parity vs transformers: AIMv2 tower + probabilistic visual
tokenizer + visual embedding table + Qwen2 decoder."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402

IMG = 58


def test_ovis2_image_features_parity(tmp_path):
    vc = transformers.Ovis2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=56, patch_size=14,
        hidden_stride=2, vocab_size=64, num_visual_indicator_tokens=5,
        qkv_bias=False, tokenize_function="softmax")
    tc = transformers.Qwen2Config(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0)
    cfg = transformers.Ovis2Config(
        vision_config=vc, text_config=tc, image_token_id=IMG,
        vocab_size=128, hidden_size=48,
        visual_indicator_token_ids=[59, 60, 61, 62, 63])
    torch.manual_seed(0)
    hf = transformers.Ovis2ForConditionalGeneration(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.get_image_features(torch.tensor(pixels))
    if isinstance(ref, (list, tuple)):
        ref = ref[0]           # (features, visual_indicator_embeds)
    ref = ref.reshape(-1, 48).float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "Ovis2ForConditionalGeneration"
    assert mc.image_token_id == IMG
    model, params = load_model(mc, "safetensors")
    # 4x4 patches merged 2x2 -> 4 visual tokens.
    got = np.asarray(model.encode_images(params, jnp.asarray(pixels)))
    got = got.reshape(-1, 48)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=4e-3, atol=4e-3)
