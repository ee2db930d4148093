"""Voxtral parity vs transformers: Whisper tower + frame-stacking GELU
projector + Llama decoder with audio-placeholder splice."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

AUD_TOK = 57


def test_voxtral_logits_parity(tmp_path):
    ac = transformers.VoxtralEncoderConfig(
        num_mel_bins=16, num_hidden_layers=2, num_attention_heads=2,
        hidden_size=32, intermediate_size=128, max_source_positions=16)
    tc = transformers.LlamaConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0)
    cfg = transformers.VoxtralConfig(
        audio_config=ac, text_config=tc, audio_token_id=AUD_TOK,
        projector_hidden_act="gelu")
    torch.manual_seed(0)
    hf = transformers.VoxtralForConditionalGeneration(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    rng = np.random.default_rng(0)
    T_mel = 32    # conv -> 16 frames, stacked by 4 -> 4 audio tokens
    feats = rng.standard_normal((1, 16, T_mel)).astype(np.float32)
    ids = [1] + [AUD_TOK] * 4 + [5, 9, 11]
    T = len(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 input_features=torch.tensor(feats),
                 attention_mask=torch.ones(1, T, dtype=torch.long)
                 ).logits[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "VoxtralForConditionalGeneration"
    assert mc.image_token_id == AUD_TOK
    model, params = load_model(mc, "safetensors")

    out = model.encode_mm(params, {"input_features": feats})  # [4, H]
    assert out.shape[0] == 4
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


def test_ultravox_structural_and_engine():
    """Ultravox is trust-remote (no transformers oracle): pin the
    stacking/projector geometry + engine generation with audio splice."""
    import jax.numpy as jnp

    from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                  SchedulerConfig)
    from lvllm_tpu.engine.llm_engine import LLMEngine
    from lvllm_tpu.models.ultravox import UltravoxModel
    from lvllm_tpu.sampling_params import SamplingParams

    AUD = 55
    mc = ModelConfig(
        model="dummy", architecture="UltravoxModel", dtype="float32",
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, max_model_len=128, eos_token_id=-1,
        image_token_id=AUD, seed=9,
        vision_config={"num_mel_bins": 16, "encoder_layers": 2,
                       "encoder_attention_heads": 2, "encoder_ffn_dim": 64,
                       "d_model": 32, "max_source_positions": 16,
                       "stack_factor": 8, "projector_ln_mid": True})
    model = UltravoxModel(mc)
    params = model.init_params(0)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 16, 32)).astype(np.float32)
    out = model.encode_mm(params, {"input_features": feats})
    # 16 conv frames stacked by 8 -> 2 audio tokens of text width.
    assert out.shape == (2, 48)
    assert np.all(np.isfinite(out))

    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=2,
                                         max_model_len=128))
    eng = LLMEngine(cfg, load_format="dummy")
    ids = [1, AUD, AUD, 5, 9]
    eng.add_request("u0", ids, SamplingParams(temperature=0.0,
                                              max_tokens=5),
                    mm_data={"input_features": feats})
    outs, steps = {}, 0
    while eng.has_unfinished_requests() and steps < 60:
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
    assert len(outs["u0"].outputs[0].token_ids) == 5
