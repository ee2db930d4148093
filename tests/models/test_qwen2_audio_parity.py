"""Qwen2-Audio parity vs transformers: Whisper tower + avg-pool + linear
projector + Qwen2 decoder with audio-placeholder splice."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

AUD_TOK = 58


def test_qwen2_audio_logits_parity(tmp_path):
    ac = transformers.Qwen2AudioEncoderConfig(
        num_mel_bins=16, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=64, d_model=32, max_source_positions=16)
    tc = transformers.Qwen2Config(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0)
    cfg = transformers.Qwen2AudioConfig(
        audio_config=ac, text_config=tc, audio_token_index=AUD_TOK)
    torch.manual_seed(0)
    hf = transformers.Qwen2AudioForConditionalGeneration(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    rng = np.random.default_rng(0)
    T_mel = 32    # = 2*max_source_positions; conv -> 16 -> pool -> 8
    feats = rng.standard_normal((1, 16, T_mel)).astype(np.float32)
    ids = [1] + [AUD_TOK] * 8 + [5, 9, 11]
    T = len(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 input_features=torch.tensor(feats),
                 feature_attention_mask=torch.ones(1, T_mel,
                                                   dtype=torch.long),
                 attention_mask=torch.ones(1, T, dtype=torch.long)
                 ).logits[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "Qwen2AudioForConditionalGeneration"
    assert mc.image_token_id == AUD_TOK
    model, params = load_model(mc, "safetensors")

    out = model.encode_mm(params, {"input_features": feats})  # [8, H]
    assert out.shape[0] == 8
    mm_mask = np.asarray([t == AUD_TOK for t in ids])
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = out

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
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
