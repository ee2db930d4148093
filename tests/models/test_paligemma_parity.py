"""PaliGemma parity vs transformers PaliGemmaForConditionalGeneration:
SigLIP + linear projector + Gemma LM with prefix-LM (bidirectional
image+prompt) attention, through the real loader (reference:
vllm models/paligemma.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG_TOK = 61


def _hf_model(tmp_path):
    vc = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=48)
    tc = transformers.GemmaConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=128, rope_theta=10000.0)
    cfg = transformers.PaliGemmaConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        projection_dim=48)
    torch.manual_seed(0)
    model = transformers.PaliGemmaForConditionalGeneration(cfg).eval()
    model.save_pretrained(str(tmp_path), safe_serialization=True)
    return model


def test_paligemma_logits_parity_prefix_lm(tmp_path):
    hf = _hf_model(tmp_path)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    # 28/14 → 2x2 = 4 image tokens; 4 text prompt tokens.
    ids = [IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 2, 5, 9, 11]
    T = len(ids)

    with torch.no_grad():
        # token_type_ids=1 marks non-causal (prefix) text in HF; the
        # whole input here is the prefix, so full bidirectional.
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels),
                 attention_mask=torch.ones(1, T, dtype=torch.long),
                 token_type_ids=torch.ones(1, T, dtype=torch.long),
                 ).logits[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    assert mc.architecture == "PaliGemmaForConditionalGeneration"
    assert mc.image_token_id == IMG_TOK
    model, params = load_model(mc, "safetensors")
    assert model.prefix_lm

    feats = model.encode_images(params, jnp.asarray(pixels))
    mm_mask = np.asarray([t == IMG_TOK for t in ids])
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = np.asarray(feats[0], np.float32)

    caches = [model.make_layer_cache(i, 8, 16, jnp.float32, max_reqs=2)
              for i in range(mc.num_hidden_layers)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[1]], jnp.int32),
        slot_mapping=(16 + jnp.arange(T)).astype(jnp.int32),
        prefix_lens=jnp.asarray([T], jnp.int32))
    hidden, _ = model(params, jnp.asarray(ids, jnp.int32),
                      jnp.arange(T, dtype=jnp.int32), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask))
    ours = np.asarray(model.compute_logits(params, hidden), np.float32)
    np.testing.assert_allclose(ours, ref, rtol=4e-3, atol=4e-3)

    # Without prefix_lens (pure causal) the logits must differ — proves
    # the bidirectional mask actually engaged.
    md_causal = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[2]], jnp.int32),
        slot_mapping=(32 + jnp.arange(T)).astype(jnp.int32))
    hidden_c, _ = model(params, jnp.asarray(ids, jnp.int32),
                        jnp.arange(T, dtype=jnp.int32), caches, md_causal,
                        mm_embeds=jnp.asarray(mm_embeds),
                        mm_mask=jnp.asarray(mm_mask))
    ours_c = np.asarray(model.compute_logits(params, hidden_c), np.float32)
    assert np.abs(ours_c[0] - ref[0]).max() > 1e-3


def test_paligemma_engine_generates(tmp_path):
    """End-to-end decode through the engine: prefix-LM prefill + causal
    continuation."""
    _hf_model(tmp_path)
    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams

    from lvllm_tpu.config import (CacheConfig, EngineConfig,
                                  SchedulerConfig)
    from lvllm_tpu.engine.llm_engine import LLMEngine
    from lvllm_tpu.sampling_params import SamplingParams

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=2, max_model_len=64),
    )
    engine = LLMEngine(cfg, load_format="safetensors")
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    engine.add_request("p0", [IMG_TOK] * 4 + [2, 5, 9],
                       SamplingParams(temperature=0.0, max_tokens=4),
                       mm_data={"pixel_values": pixels})
    outs, steps = [], 0
    while engine.has_unfinished_requests() and steps < 30:
        outs.extend(o for o in engine.step() if o.finished)
        steps += 1
    assert outs and len(outs[0].outputs[0].token_ids) == 4
