"""BLIP-2 parity vs transformers Blip2ForConditionalGeneration.

Tiny random HF model (EVA ViT + Q-Former + OPT) → safetensors → our
loader → logits compared with the query-token features spliced at the
placeholder positions.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG_TOK = 63
NUM_QUERY = 4


def _hf_model(tmp_path):
    vc = transformers.Blip2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14)
    qc = transformers.Blip2QFormerConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=2, cross_attention_frequency=2)
    tc = transformers.OPTConfig(
        vocab_size=64, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        word_embed_proj_dim=48)
    cfg = transformers.Blip2Config(
        vision_config=vc.to_dict(), qformer_config=qc.to_dict(),
        text_config=tc.to_dict(), num_query_tokens=NUM_QUERY,
        image_token_index=IMG_TOK)
    torch.manual_seed(0)
    model = transformers.Blip2ForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(str(tmp_path), safe_serialization=True)
    return model


def test_blip2_logits_parity(tmp_path):
    hf = _hf_model(tmp_path)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    ids = [1] + [IMG_TOK] * NUM_QUERY + [5, 9, 11]

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels),
                 attention_mask=torch.ones(1, len(ids),
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    assert mc.architecture == "Blip2ForConditionalGeneration"
    assert mc.image_token_id == IMG_TOK
    model, params = load_model(mc, "safetensors")
    assert model.num_image_tokens == NUM_QUERY

    feats = model.encode_images(params, jnp.asarray(pixels))
    T = len(ids)
    mm_mask = np.asarray([t == IMG_TOK for t in ids])
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = np.asarray(feats[0], np.float32)

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


def test_blip2_image_features_match_hf(tmp_path):
    """ViT + Q-Former + language_projection alone match HF
    get_image_features (the projected query states)."""
    hf = _hf_model(tmp_path)
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(pixels))
    if not torch.is_tensor(ref):
        ref = ref[0]
    ref = ref.float().numpy()
    mc = load_model_config(str(tmp_path), max_model_len=64, dtype="float32")
    model, params = load_model(mc, "safetensors")
    ours = np.asarray(model.encode_images(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, ref.reshape(ours.shape),
                               rtol=2e-3, atol=2e-3)
