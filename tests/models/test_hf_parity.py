"""Golden-reference parity vs HuggingFace transformers.

The reference's core correctness strategy (SURVEY.md §4: HfRunner vs
VllmRunner logprob comparison): build a tiny random-weight HF model, save a
real safetensors checkpoint, load it through OUR loader (exercising the
full load_weights mapping), and compare logits / greedy generations.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402


def save_hf_model(cfg, tmpdir):
    torch.manual_seed(0)
    model = transformers.AutoModelForCausalLM.from_config(cfg)
    model.eval()
    model.save_pretrained(tmpdir, safe_serialization=True)
    return model


def hf_logits(model, token_ids):
    with torch.no_grad():
        out = model(torch.tensor([token_ids]))
    return out.logits[0].float().numpy()


def our_logits(model_dir, token_ids, max_len=128):
    from tests.models.test_qwen3 import run_tokens

    mc = load_model_config(model_dir, max_model_len=max_len, dtype="float32")
    model, params = load_model(mc, "safetensors")
    hidden = run_tokens(model, params, [token_ids], block_size=8,
                        num_blocks=64)
    return np.asarray(model.compute_logits(params, jnp.asarray(hidden)))


def compare(hf, ours, label):
    # Compare log-softmax (logits may differ by a constant) and argmax.
    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))
    a, b = lsm(hf), lsm(ours)
    np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-3, err_msg=label)
    np.testing.assert_array_equal(hf.argmax(-1), ours.argmax(-1))


def test_qwen3_dense_parity(tmp_path):
    cfg = transformers.Qwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, use_sliding_window=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [1, 5, 9, 200, 3, 77, 400, 23, 8, 151]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "qwen3-dense")


def test_qwen3_moe_parity(tmp_path):
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=True,
        use_sliding_window=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [2, 8, 100, 340, 55, 7, 260, 19]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "qwen3-moe")


def test_llama_parity(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [3, 9, 27, 81, 243, 217, 139, 417]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "llama")


def test_mixtral_parity(tmp_path):
    cfg = transformers.MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, num_local_experts=4,
        num_experts_per_tok=2, sliding_window=None)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [4, 44, 444, 36, 250, 18, 99]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "mixtral")


def test_glm4_moe_parity(tmp_path):
    cfg = transformers.Glm4MoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, norm_topk_prob=True,
        routed_scaling_factor=1.0, partial_rotary_factor=0.5,
        use_qk_norm=False, n_group=1, topk_group=1, attention_bias=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [7, 70, 300, 9, 410, 27, 151]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "glm4-moe")


def test_qwen2_parity(tmp_path):
    cfg = transformers.Qwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, use_sliding_window=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [11, 22, 33, 44, 55, 66]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "qwen2")
