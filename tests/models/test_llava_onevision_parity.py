"""LLaVA-OneVision parity vs transformers (SigLIP tower + GELU projector
+ image_newline + Qwen2 decoder). Logits-allclose, not greedy-token-only
(the mamba1 lesson, CLAUDE.md r04)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG_TOK = 60


def _hf_model(tmp_path):
    vc = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14)
    tc = transformers.Qwen2Config(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0)
    cfg = transformers.LlavaOnevisionConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        video_token_index=IMG_TOK + 1, vision_feature_layer=-1,
        vision_feature_select_strategy="full",
        image_grid_pinpoints=[[28, 28], [28, 56], [56, 28]])
    torch.manual_seed(0)
    model = transformers.LlavaOnevisionForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(str(tmp_path), safe_serialization=True)
    return model


def test_llava_onevision_logits_parity(tmp_path):
    hf = _hf_model(tmp_path)
    rng = np.random.default_rng(0)
    # anyres layout: patch 0 = resized base image + 1x1 grid tile
    # (pinpoint 28x28) -> base 4 + unpadded grid 2x(2+newline) = 10
    # placeholder tokens.
    pixels = rng.standard_normal((1, 2, 3, 28, 28)).astype(np.float32)
    image_sizes = torch.tensor([[28, 28]])
    ids = [1] + [IMG_TOK] * 10 + [5, 9, 11]

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels),
                 image_sizes=image_sizes,
                 attention_mask=torch.ones(1, len(ids),
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    assert mc.architecture == "LlavaOnevisionForConditionalGeneration"
    assert mc.image_token_id == IMG_TOK
    model, params = load_model(mc, "safetensors")

    feats = model.encode_mm(params, {
        "pixel_values": pixels,
        "image_sizes": np.asarray([[28, 28]])})      # [10, H]
    assert feats.shape[0] == 10
    T = len(ids)
    mm_mask = np.asarray([t == IMG_TOK for t in ids])
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = feats

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
    ours = np.asarray(model.compute_logits(params, hidden))

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
