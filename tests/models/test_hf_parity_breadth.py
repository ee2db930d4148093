"""HF logit parity for the LayerNorm / non-gated / post-norm families:
GPT-2, Starcoder2, StableLM, Nemotron, OLMo2, OLMoE (SURVEY §2.8 registry
breadth). Same recipe as test_hf_parity.py: random-weight HF checkpoint →
our loader → logit comparison.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tests.models.test_hf_parity import (compare, hf_logits,  # noqa: E402
                                         our_logits, save_hf_model)


def test_gpt2_parity(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=512, n_embd=64, n_layer=2, n_head=4, n_positions=256,
        n_inner=128, activation_function="gelu_new")
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [5, 55, 505, 43, 210, 87, 399, 21]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "gpt2")


def test_starcoder2_parity(tmp_path):
    cfg = transformers.Starcoder2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, use_bias=True,
        tie_word_embeddings=False, sliding_window=None)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [9, 19, 29, 139, 339, 77, 410]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "starcoder2")


def test_stablelm_parity(tmp_path):
    cfg = transformers.StableLmConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        partial_rotary_factor=0.25, use_qkv_bias=True,
        tie_word_embeddings=False, use_parallel_residual=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [7, 70, 170, 270, 370, 470, 35]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "stablelm")


def test_nemotron_parity(tmp_path):
    cfg = transformers.NemotronConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        partial_rotary_factor=0.5, tie_word_embeddings=False,
        hidden_act="relu2")
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [2, 22, 222, 42, 142, 342, 58]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "nemotron")


def test_olmo2_parity(tmp_path):
    cfg = transformers.Olmo2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [6, 66, 366, 46, 146, 246, 81]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "olmo2")


def test_olmoe_parity(tmp_path):
    cfg = transformers.OlmoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        num_experts=8, num_experts_per_tok=2, norm_topk_prob=False,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [3, 33, 333, 63, 163, 263, 97]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "olmoe")
