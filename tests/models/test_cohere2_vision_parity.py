"""Cohere2 Vision (Command A Vision) parity vs transformers: SigLIP2
last_hidden_state + pixel-shuffle SwiGLU projector (no adapter LN) +
Cohere2 decoder (reference: vllm models/cohere2_vision.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG_TOK = 59


def test_cohere2_vision_logits_parity(tmp_path):
    vc = transformers.Siglip2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=56, patch_size=14)
    tc = transformers.Cohere2Config(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        layer_norm_eps=1e-5, sliding_window=16,
        sliding_window_pattern=2, logit_scale=0.25)
    cfg = transformers.Cohere2VisionConfig(
        vision_config=vc, text_config=tc, image_token_id=IMG_TOK,
        downsample_factor=2, alignment_intermediate_size=64)
    torch.manual_seed(0)
    hf = transformers.Cohere2VisionForConditionalGeneration(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    # 4x4 patches, downsample 2 -> 4 image tokens.
    ids = [1, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 5, 9, 11]
    T = len(ids)
    # This transformers build's Cohere2Vision glue calls the naflex tower
    # without spatial_shapes; drive the HF pieces directly instead (same
    # numerics, working plumbing).
    from lvllm_tpu.models.vision import patchify_chw
    patches_np, grid = patchify_chw(pixels, 14)
    with torch.no_grad():
        tower = hf.model.vision_tower(
            pixel_values=torch.tensor(patches_np),
            pixel_attention_mask=torch.ones(1, 16, dtype=torch.long),
            spatial_shapes=torch.tensor([[4, 4]])).last_hidden_state
        feats_ref = hf.model.multi_modal_projector(tower)[0].float()
        emb = hf.get_input_embeddings()(torch.tensor([ids]))
        mask_t = torch.tensor([t == IMG_TOK for t in ids])
        emb[0, mask_t] = feats_ref.reshape(-1, emb.shape[-1])
        lm_out = hf.model.language_model(
            inputs_embeds=emb,
            attention_mask=torch.ones(1, T, dtype=torch.long))
        ref = hf.lm_head(lm_out.last_hidden_state)[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "Cohere2VisionForConditionalGeneration"
    assert mc.image_token_id == IMG_TOK
    model, params = load_model(mc, "safetensors")
    assert model.num_image_tokens == 4

    feats = model.encode_images(params, jnp.asarray(pixels))
    mm_mask = np.asarray([t == IMG_TOK for t in ids])
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = np.asarray(feats[0], np.float32)

    caches = [model.make_layer_cache(i, 8, 16, jnp.float32, 2)
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
    ours = np.asarray(model.compute_logits(params, hidden), np.float32)
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)
