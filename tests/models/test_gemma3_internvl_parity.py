"""Gemma3-MM and InternVL multimodal parity vs transformers.

Tiny random HF checkpoints → our loader → logits compared with image
features spliced at placeholder positions (same harness as
test_llava_parity.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402


def _run_ours(mc, model, params, ids, feats):
    T = len(ids)
    img_tok = mc.image_token_id
    mm_mask = np.asarray([t == img_tok for t in ids])
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = np.asarray(feats, np.float32).reshape(
        -1, mc.hidden_size)
    caches = [model.make_layer_cache(i, 8, 16, jnp.float32, max_reqs=2)
              for i in range(mc.num_hidden_layers)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[1]], jnp.int32),
        slot_mapping=(16 + jnp.arange(T)).astype(jnp.int32))
    hidden, _ = model(params, jnp.asarray(ids, jnp.int32),
                      jnp.arange(T, dtype=jnp.int32), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask))
    return np.asarray(model.compute_logits(params, hidden))


def _lsm(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


# ---- Gemma3 ----------------------------------------------------------------

GEMMA_IMG = 500


def _gemma3_hf(tmp_path):
    cfg = transformers.Gemma3Config(
        text_config=dict(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16,
            max_position_embeddings=128),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14),
        mm_tokens_per_image=1, image_token_index=GEMMA_IMG,
        boi_token_index=498, eoi_token_index=499)
    torch.manual_seed(0)
    model = transformers.Gemma3ForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(str(tmp_path), safe_serialization=True)
    return model


def test_gemma3_mm_image_features_match_hf(tmp_path):
    hf = _gemma3_hf(tmp_path)
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(pixels)).float().numpy()
    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    assert mc.architecture == "Gemma3ForConditionalGeneration"
    model, params = load_model(mc, "safetensors")
    ours = np.asarray(model.encode_images(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours.reshape(ref.shape), ref,
                               rtol=2e-3, atol=2e-3)


def test_gemma3_mm_logits_parity(tmp_path):
    hf = _gemma3_hf(tmp_path)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    ids = [2, GEMMA_IMG, 7, 11, 13]        # mm_tokens_per_image = 1
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels),
                 attention_mask=torch.ones(1, len(ids),
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()
    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    assert mc.image_token_id == GEMMA_IMG
    model, params = load_model(mc, "safetensors")
    feats = model.encode_images(params, jnp.asarray(pixels))
    ours = _run_ours(mc, model, params, ids, feats)
    np.testing.assert_allclose(_lsm(ours), _lsm(ref), rtol=8e-3, atol=8e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))


# ---- InternVL ---------------------------------------------------------------

IVL_IMG = 60


def _internvl_hf(tmp_path, use_qk_norm=False):
    cfg = transformers.InternVLConfig(
        text_config=dict(
            architectures=["Qwen2ForCausalLM"], vocab_size=64,
            hidden_size=48, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rope_theta=10000.0),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=(28, 28),
            patch_size=(14, 14), use_qk_norm=use_qk_norm),
        image_token_id=IVL_IMG, downsample_ratio=0.5)
    torch.manual_seed(0)
    model = transformers.InternVLForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(str(tmp_path), safe_serialization=True)
    return model


def test_internvl_image_features_match_hf(tmp_path):
    hf = _internvl_hf(tmp_path)
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(pixels)).float().numpy()
    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    assert mc.architecture == "InternVLForConditionalGeneration"
    model, params = load_model(mc, "safetensors")
    ours = np.asarray(model.encode_images(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours.reshape(ref.shape), ref,
                               rtol=2e-3, atol=2e-3)


def test_internvl_qk_norm_features_match_hf(tmp_path):
    hf = _internvl_hf(tmp_path, use_qk_norm=True)
    rng = np.random.default_rng(3)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(pixels)).float().numpy()
    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    model, params = load_model(mc, "safetensors")
    ours = np.asarray(model.encode_images(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours.reshape(ref.shape), ref,
                               rtol=2e-3, atol=2e-3)


def test_internvl_logits_parity(tmp_path):
    hf = _internvl_hf(tmp_path)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    # 4 patches * 0.5^2 = 1 image token per image.
    ids = [1, IVL_IMG, 5, 9, 11]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels),
                 attention_mask=torch.ones(1, len(ids),
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()
    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    assert mc.image_token_id == IVL_IMG
    model, params = load_model(mc, "safetensors")
    feats = model.encode_images(params, jnp.asarray(pixels))
    ours = _run_ours(mc, model, params, ids, feats)
    np.testing.assert_allclose(_lsm(ours), _lsm(ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
