"""HF logit parity for the second breadth batch: ERNIE 4.5 (dense + MoE),
Hunyuan V1 (dense + MoE), DBRX, Dots1, Seed-OSS (SURVEY §2.8 registry).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from tests.models.test_hf_parity import (compare, hf_logits,  # noqa: E402
                                         our_logits, save_hf_model)


def test_ernie45_dense_parity(tmp_path):
    cfg = transformers.Ernie4_5Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, use_bias=True,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [4, 40, 400, 44, 140, 240, 80]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "ernie45-dense")


def test_ernie45_moe_parity(tmp_path):
    cfg = transformers.Ernie4_5_MoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, use_bias=False,
        moe_intermediate_size=32, moe_k=2, moe_num_experts=8,
        moe_num_shared_experts=1, moe_layer_start_index=1,
        moe_layer_interval=1, tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    # Perturb the correction bias so selection-vs-weight separation is
    # actually exercised.
    with torch.no_grad():
        for layer in hf_model.model.layers:
            if hasattr(layer.mlp, "moe_statics"):
                layer.mlp.moe_statics.e_score_correction_bias.add_(
                    torch.randn_like(
                        layer.mlp.moe_statics.e_score_correction_bias) * 0.1)
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    tokens = [8, 80, 180, 280, 380, 480, 16]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "ernie45-moe")


def test_hunyuan_dense_parity(tmp_path):
    cfg = transformers.HunYuanDenseV1Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [5, 50, 150, 250, 350, 450, 31]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "hunyuan-dense")


def test_hunyuan_moe_parity(tmp_path):
    cfg = transformers.HunYuanMoEV1Config(
        vocab_size=512, hidden_size=64, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        num_experts=8, moe_topk=2, attention_bias=False, head_dim=16,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [6, 60, 160, 260, 360, 460, 13]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "hunyuan-moe")


def test_dbrx_parity(tmp_path):
    cfg = transformers.DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=256, vocab_size=512,
        attn_config=dict(kv_n_heads=2, clip_qkv=8.0, rope_theta=10000.0),
        ffn_config=dict(ffn_hidden_size=32, moe_num_experts=8, moe_top_k=2,
                        moe_normalize_expert_weights=1.0),
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [7, 70, 170, 270, 370, 470, 99]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "dbrx")


def test_dots1_parity(tmp_path):
    cfg = transformers.Dots1Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, n_group=2, topk_group=1,
        routed_scaling_factor=1.5, norm_topk_prob=True,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    with torch.no_grad():
        for layer in hf_model.model.layers:
            if hasattr(layer.mlp, "gate") and hasattr(
                    layer.mlp.gate, "e_score_correction_bias"):
                layer.mlp.gate.e_score_correction_bias.add_(
                    torch.randn_like(
                        layer.mlp.gate.e_score_correction_bias) * 0.1)
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    tokens = [9, 90, 190, 290, 390, 490, 27]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "dots1")


def test_seed_oss_parity(tmp_path):
    cfg = transformers.SeedOssConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        attention_bias=True, tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [11, 111, 211, 311, 411, 37, 73]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "seed-oss")
