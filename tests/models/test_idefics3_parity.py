"""Idefics3 / SmolVLM parity vs transformers (SigLIP tower + pixel
shuffle connector + Llama LM; reference models/idefics3.py, smolvlm.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG = 50


def _cfg(cls):
    vision = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=2,
                  patch_size=16, image_size=64, num_channels=3)
    text = dict(vocab_size=64, hidden_size=48, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=256,
                rope_theta=10000.0, pad_token_id=0,
                tie_word_embeddings=False)
    return cls(vision_config=vision, text_config=text, scale_factor=2,
               image_token_id=IMG, pad_token_id=0)


def _run_pair(tmp_path, cfg_cls, model_cls, seed):
    cfg = _cfg(cfg_cls)
    torch.manual_seed(seed)
    hf = model_cls(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    rng = np.random.default_rng(seed)
    pix = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    # 64/16=4 grid → 16 patches → /4 shuffle → 4 image tokens.
    ids = [1, 2] + [IMG] * 4 + [3, 4, 5]

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pix[None]),
                 attention_mask=torch.ones(1, len(ids),
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")
    assert model.num_image_tokens() == 4
    feats = np.asarray(model.encode_images(params, jnp.asarray(pix)),
                       np.float32).reshape(-1, mc.hidden_size)
    T = len(ids)
    mm_mask = np.asarray([t == IMG for t in ids])
    mm_embeds = np.zeros((T, mc.hidden_size), np.float32)
    mm_embeds[mm_mask] = feats
    caches = [model.make_layer_cache(i, 8, 32, jnp.float32, max_reqs=2)
              for i in range(mc.num_hidden_layers)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[1]], jnp.int32),
        slot_mapping=(32 + jnp.arange(T)).astype(jnp.int32))
    hidden, _ = model(params, jnp.asarray(ids, jnp.int32),
                      jnp.arange(T), caches, md,
                      mm_embeds=jnp.asarray(mm_embeds),
                      mm_mask=jnp.asarray(mm_mask))
    ours = np.asarray(model.compute_logits(params, hidden))

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))


def test_idefics3_logits_parity(tmp_path):
    _run_pair(tmp_path, transformers.Idefics3Config,
              transformers.Idefics3ForConditionalGeneration, 0)


def test_smolvlm_logits_parity(tmp_path):
    _run_pair(tmp_path, transformers.SmolVLMConfig,
              transformers.SmolVLMForConditionalGeneration, 1)
