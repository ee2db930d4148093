"""Gemma 3n text parity vs transformers Gemma3nForCausalLM: AltUp,
Laurel, per-layer embeddings, KV sharing, activation sparsity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.model_base import AttentionMetadata  # noqa: E402


def _hf_model(tmp_path):
    cfg = transformers.Gemma3nTextConfig(
        vocab_size=64, vocab_size_per_layer_input=48, hidden_size=32,
        hidden_size_per_layer_input=8,
        intermediate_size=[64, 64, 48, 48, 48, 48],
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, altup_num_inputs=4, altup_active_idx=0,
        laurel_rank=4, num_kv_shared_layers=2,
        activation_sparsity_pattern=[0.95, 0.95, 0.0, 0.0, 0.0, 0.0],
        layer_types=["sliding_attention", "full_attention"] * 3,
        sliding_window=8, max_position_embeddings=128,
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(0)
    model = transformers.Gemma3nForCausalLM(cfg)
    model.eval()
    model.save_pretrained(str(tmp_path), safe_serialization=True)
    return model


def test_gemma3n_logits_parity(tmp_path):
    hf = _hf_model(tmp_path)
    # > sliding_window tokens so local attention and KV sharing both
    # matter (HF's text-only path indexes the PLE table directly, so all
    # ids stay < vocab_size_per_layer_input).
    ids = [1, 5, 9, 11, 30, 31, 44, 7, 3, 22, 40, 18, 2, 33]
    T = len(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 attention_mask=torch.ones(1, T, dtype=torch.long)).logits
    ref = ref[0].float().numpy()

    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "Gemma3nForCausalLM"
    assert mc.gemma3n["num_kv_shared_layers"] == 2
    model, params = load_model(mc, "safetensors")

    caches = [model.make_layer_cache(i, 8, 16, jnp.float32, max_reqs=2)
              for i in range(mc.num_hidden_layers)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_table=jnp.asarray([[1]], jnp.int32),
        slot_mapping=(16 + jnp.arange(T)).astype(jnp.int32))
    hidden, _ = model(params, jnp.asarray(ids, jnp.int32),
                      jnp.arange(T, dtype=jnp.int32), caches, md)
    ours = np.asarray(model.compute_logits(params, hidden))

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))


def test_gemma3n_decode_matches_prefill(tmp_path):
    """KV sharing through the paged cache: decode one token at a time
    equals full prefill logits at the last position."""
    hf = _hf_model(tmp_path)
    del hf
    ids = [1, 5, 9, 11, 30, 31, 7, 3]
    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    model, params = load_model(mc, "safetensors")

    def run(chunks):
        caches = [model.make_layer_cache(i, 8, 16, jnp.float32,
                                         max_reqs=2)
                  for i in range(mc.num_hidden_layers)]
        done = 0
        hidden = None
        for chunk in chunks:
            n = len(chunk)
            md = AttentionMetadata(
                query_start_loc=jnp.asarray([0, n], jnp.int32),
                seq_lens=jnp.asarray([done + n], jnp.int32),
                block_table=jnp.asarray([[1]], jnp.int32),
                slot_mapping=(16 + done + jnp.arange(n)).astype(
                    jnp.int32))
            hidden, caches = model(
                params, jnp.asarray(chunk, jnp.int32),
                (done + jnp.arange(n)).astype(jnp.int32), caches, md)
            done += n
        return np.asarray(model.compute_logits(params, hidden))[-1]

    full = run([ids])
    stepped = run([ids[:3]] + [[t] for t in ids[3:]])
    np.testing.assert_allclose(stepped, full, rtol=2e-3, atol=2e-3)
