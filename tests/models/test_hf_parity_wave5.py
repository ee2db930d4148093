"""HF logit parity, fifth breadth wave: Glm (glm-4-0414), VaultGemma,
FlexOlmo, PhiMoE, Apertus (SURVEY §2.8 registry; reference models/:
glm.py, vaultgemma analog, flex_olmo, phimoe.py, apertus)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tests.models.test_hf_parity import (compare, hf_logits,  # noqa: E402
                                         our_logits, save_hf_model)

TOKENS = [5, 55, 505, 43, 210, 87, 399, 21]


def test_glm_parity(tmp_path):
    cfg = transformers.GlmConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256,
        partial_rotary_factor=0.5, attention_bias=True,
        pad_token_id=0, tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    compare(hf_logits(hf_model, TOKENS), our_logits(str(tmp_path), TOKENS),
            "glm")


def test_vaultgemma_parity(tmp_path):
    cfg = transformers.VaultGemmaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, sliding_window=16,
        query_pre_attn_scalar=16, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, tie_word_embeddings=True)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = list(range(3, 60, 3))   # engage the alternating window
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "vaultgemma")


def test_flexolmo_parity(tmp_path):
    cfg = transformers.FlexOlmoConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=False, pad_token_id=0, tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    compare(hf_logits(hf_model, TOKENS), our_logits(str(tmp_path), TOKENS),
            "flexolmo")


def test_phimoe_parity(tmp_path):
    cfg = transformers.PhimoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, num_local_experts=4,
        num_experts_per_tok=2, router_jitter_noise=0.01,
        attention_bias=True, lm_head_bias=True, rope_scaling=None,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    compare(hf_logits(hf_model, TOKENS), our_logits(str(tmp_path), TOKENS),
            "phimoe")


def test_apertus_parity(tmp_path):
    cfg = transformers.ApertusConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_scaling=None,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    compare(hf_logits(hf_model, TOKENS), our_logits(str(tmp_path), TOKENS),
            "apertus")
