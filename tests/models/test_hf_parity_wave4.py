"""HF logit parity, fourth breadth wave: OPT, GPT-J, Cohere(+2),
Persimmon, OLMo-v1, Arcee, GraniteMoeShared (SURVEY §2.8 registry;
reference models/: opt.py, gpt_j.py, commandr.py, persimmon.py, olmo.py,
arcee.py, granitemoeshared.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tests.models.test_hf_parity import (compare, hf_logits,  # noqa: E402
                                         our_logits, save_hf_model)

TOKENS = [5, 55, 505, 43, 210, 87, 399, 21]


def test_opt_parity(tmp_path):
    cfg = transformers.OPTConfig(
        vocab_size=512, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=256,
        activation_function="relu", do_layer_norm_before=True,
        enable_bias=True, tie_word_embeddings=True,
        word_embed_proj_dim=64)
    hf_model = save_hf_model(cfg, tmp_path)
    compare(hf_logits(hf_model, TOKENS), our_logits(str(tmp_path), TOKENS),
            "opt")


def test_gptj_parity(tmp_path):
    cfg = transformers.GPTJConfig(
        vocab_size=512, n_embd=64, n_layer=2, n_head=4, n_positions=256,
        rotary_dim=8, n_inner=None, activation_function="gelu_new",
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    compare(hf_logits(hf_model, TOKENS), our_logits(str(tmp_path), TOKENS),
            "gptj")


def test_cohere_parity(tmp_path):
    cfg = transformers.CohereConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, logit_scale=0.25,
        use_qk_norm=True, tie_word_embeddings=True)
    hf_model = save_hf_model(cfg, tmp_path)
    compare(hf_logits(hf_model, TOKENS), our_logits(str(tmp_path), TOKENS),
            "cohere")


def test_cohere2_parity(tmp_path):
    cfg = transformers.Cohere2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=8, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, logit_scale=0.25,
        sliding_window=16, sliding_window_pattern=4,
        tie_word_embeddings=True)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = list(range(3, 60, 3))   # long enough to engage the window
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "cohere2")


def test_persimmon_parity(tmp_path):
    cfg = transformers.PersimmonConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=256, partial_rotary_factor=0.5,
        qk_layernorm=True, hidden_act="relu2", tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    compare(hf_logits(hf_model, TOKENS), our_logits(str(tmp_path), TOKENS),
            "persimmon")


def test_olmo_parity(tmp_path):
    cfg = transformers.OlmoConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, clip_qkv=8.0,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    compare(hf_logits(hf_model, TOKENS), our_logits(str(tmp_path), TOKENS),
            "olmo")


def test_arcee_parity(tmp_path):
    cfg = transformers.ArceeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, hidden_act="relu2",
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    compare(hf_logits(hf_model, TOKENS), our_logits(str(tmp_path), TOKENS),
            "arcee")


def test_granitemoe_shared_parity(tmp_path):
    cfg = transformers.GraniteMoeSharedConfig(
        vocab_size=512, hidden_size=64, intermediate_size=32,
        shared_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, num_local_experts=4,
        num_experts_per_tok=2, tie_word_embeddings=False,
        embedding_multiplier=1.0, attention_multiplier=0.5,
        residual_multiplier=1.0, logits_scaling=1.0)
    hf_model = save_hf_model(cfg, tmp_path)
    compare(hf_logits(hf_model, TOKENS), our_logits(str(tmp_path), TOKENS),
            "granitemoeshared")
