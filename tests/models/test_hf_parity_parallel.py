"""HF logit parity for the parallel-residual families: GPT-NeoX, Phi,
Falcon (7B single-ln, 40B dual-ln, non-parallel RW), GPTBigCode
(SURVEY §2.8 registry breadth).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tests.models.test_hf_parity import (compare, hf_logits,  # noqa: E402
                                         our_logits, save_hf_model)


def test_gpt_neox_parity(tmp_path):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=256, rotary_pct=0.25,
        rotary_emb_base=10000, use_parallel_residual=True,
        tie_word_embeddings=False, hidden_act="gelu")
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [3, 30, 300, 42, 142, 342, 71]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "gpt-neox")


def test_gpt_neox_sequential_parity(tmp_path):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=256, rotary_pct=1.0,
        use_parallel_residual=False, tie_word_embeddings=False,
        hidden_act="gelu")
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [4, 40, 401, 43, 143, 343, 72]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "gpt-neox-seq")


def test_phi_parity(tmp_path):
    cfg = transformers.PhiConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rope_theta=10000.0,
        partial_rotary_factor=0.5, tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [5, 50, 500, 44, 144, 344, 73]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "phi")


def test_falcon_7b_style_parity(tmp_path):
    cfg = transformers.FalconConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
        rope_theta=10000.0, max_position_embeddings=256,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [6, 60, 160, 45, 145, 345, 74]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "falcon-7b-style")


def test_falcon_40b_style_parity(tmp_path):
    cfg = transformers.FalconConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, multi_query=False,
        parallel_attn=True, new_decoder_architecture=True, bias=False,
        alibi=False, rope_theta=10000.0, max_position_embeddings=256,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [7, 71, 171, 46, 146, 346, 75]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "falcon-40b-style")


def test_gpt_bigcode_parity(tmp_path):
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=512, n_embd=64, n_layer=2, n_head=4, n_positions=256,
        n_inner=128, multi_query=True,
        activation_function="gelu_pytorch_tanh")
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [8, 81, 181, 47, 147, 347, 76]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "gpt-bigcode")
