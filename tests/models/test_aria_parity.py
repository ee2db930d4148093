"""Aria parity vs transformers: Idefics3 tower + learned-query cross-attn
projector + grouped-expert MoE Llama decoder."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG = 9


def test_aria_logits_parity(tmp_path):
    vc = transformers.Idefics3VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14)
    tc = transformers.AriaTextConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        moe_num_experts=4, moe_topk=2, moe_num_shared_experts=1,
        pad_token_id=0)
    cfg = transformers.AriaConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG,
        projector_patch_to_query_dict={4: 3})
    torch.manual_seed(0)
    hf = transformers.AriaForConditionalGeneration(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    # 2x2 patches -> 3 learned queries.
    ids = [1, IMG, IMG, IMG, 5, 7, 11]
    T = len(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels),
                 pixel_mask=torch.ones(1, 28, 28, dtype=torch.long),
                 attention_mask=torch.ones(1, T, dtype=torch.long)
                 ).logits[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "AriaForConditionalGeneration"
    assert mc.image_token_id == IMG
    assert mc.num_experts == 4 and mc.router_scoring_fn == "softmax_topk"
    model, params = load_model(mc, "safetensors")
    assert model.num_image_tokens() == 3

    feats = model.encode_images(params, jnp.asarray(pixels))
    mm_mask = np.asarray([t == IMG for t in ids])
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
    # Text path is exact (1e-7) and the tower matches to 1.6e-4; the
    # remaining spread is that tower delta amplified through the LM.
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
