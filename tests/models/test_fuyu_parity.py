"""Fuyu parity vs transformers (linear patch embed + Persimmon decoder;
reference models/fuyu.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402

IMG = 60


def test_fuyu_logits_parity(tmp_path):
    text = dict(model_type="persimmon", vocab_size=96, hidden_size=64,
                intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, max_position_embeddings=256,
                partial_rotary_factor=0.5, qk_layernorm=True,
                hidden_act="relu2", tie_word_embeddings=False,
                pad_token_id=0)
    cfg = transformers.FuyuConfig(text_config=text, hidden_size=64,
                                  num_attention_heads=4,
                                  num_hidden_layers=2,
                                  intermediate_size=128, vocab_size=96,
                                  patch_size=4, num_channels=3,
                                  image_token_id=IMG, pad_token_id=0)
    torch.manual_seed(0)
    hf = transformers.FuyuForCausalLM(cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    rng = np.random.default_rng(1)
    n_patches = 6
    patches = rng.standard_normal((n_patches, 3 * 4 * 4)).astype(np.float32)
    ids = [1, 2] + [IMG] * n_patches + [3, 4, 5]
    indices = np.full(len(ids), -1, np.int64)
    for j in range(n_patches):
        indices[2 + j] = j

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 image_patches=torch.tensor(patches)[None],
                 image_patches_indices=torch.tensor(indices[None]),
                 attention_mask=torch.ones(1, len(ids),
                                           dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    assert mc.architecture == "FuyuForCausalLM"
    model, params = load_model(mc, "safetensors")
    feats = np.asarray(model.encode_images(params, jnp.asarray(patches)),
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
