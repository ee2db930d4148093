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


def test_granitemoehybrid_parity(tmp_path):
    """Granite 4.0 hybrid (GraniteMoeHybridForCausalLM): Bamba-style
    mamba2/attention mix + GraniteMoE FFN + shared MLP + NoPE attention
    + Granite multipliers."""
    cfg = transformers.GraniteMoeHybridConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        layer_types=["mamba", "attention", "mamba", "mamba"],
        num_local_experts=4, num_experts_per_tok=2,
        shared_intermediate_size=96,
        mamba_n_heads=4, mamba_d_head=32, mamba_d_state=16,
        mamba_n_groups=1, mamba_d_conv=4, mamba_expand=2,
        embedding_multiplier=2.0, attention_multiplier=0.1,
        residual_multiplier=0.5, logits_scaling=2.0,
        max_position_embeddings=128, tie_word_embeddings=False,
        position_embedding_type=None)
    hf_model = save_hf_model(cfg, tmp_path)
    toks = [2, 7, 100, 3, 9, 55, 12]
    compare(hf_logits(hf_model, toks), our_logits(str(tmp_path), toks),
            "granitemoehybrid")


def test_emu3_text_parity(tmp_path):
    """Emu3 (VQ-token multimodal): the model side is the llama-structured
    text stack; images become discrete vocab ids in the PROCESSOR."""
    tc = transformers.Emu3TextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_scaling=None,
        pad_token_id=0, tie_word_embeddings=False)
    vq = transformers.Emu3VQVAEConfig(
        embed_dim=32, latent_channels=32, codebook_size=16, base_channels=32,
        channel_multiplier=[1, 1], num_res_blocks=1, attn_resolutions=[4])
    cfg = transformers.Emu3Config(
        text_config=tc.to_dict(), vq_config=vq.to_dict(),
        vocabulary_map={"<|extra_200|>": 3, "<image>": 4})
    torch.manual_seed(12)
    hf_full = transformers.Emu3ForConditionalGeneration(cfg).eval()
    hf_full.save_pretrained(tmp_path, safe_serialization=True)
    toks = TOKENS
    with torch.no_grad():
        want = hf_full(input_ids=torch.tensor([toks])
                       ).logits[0].float().numpy()
    got = our_logits(str(tmp_path), toks)
    compare(want, got, "emu3")


def test_chameleon_text_parity(tmp_path):
    """Chameleon: llama + per-head biased qk-layernorm (ChameleonLayerNorm
    applies per-head gamma/beta over head_dim); VQ image tokens come from
    the processor."""
    vq = transformers.ChameleonVQVAEConfig(
        embed_dim=32, latent_channels=32, num_embeddings=16,
        base_channels=32, channel_multiplier=[1, 1], num_res_blocks=1,
        attn_resolutions=[4], resolution=32)
    cfg = transformers.ChameleonConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, swin_norm=False,
        vq_config=vq.to_dict(),
        vocabulary_map={"<image>": 3}, tie_word_embeddings=False)
    torch.manual_seed(13)
    hf_full = transformers.ChameleonForConditionalGeneration(cfg).eval()
    hf_full.save_pretrained(tmp_path, safe_serialization=True)
    toks = TOKENS
    with torch.no_grad():
        want = hf_full(input_ids=torch.tensor([toks])
                       ).logits[0].float().numpy()
    got = our_logits(str(tmp_path), toks)
    compare(want, got, "chameleon")


def test_llama4_text_parity(tmp_path):
    """Llama4 text: interleaved NoPE + temperature tuning, weightless L2
    qk-norm on rope layers, top-1 sigmoid routing with the weight on the
    expert INPUT, dense interleave layers at intermediate_size_mlp."""
    cfg = transformers.Llama4TextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        intermediate_size_mlp=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, max_position_embeddings=256,
        rope_theta=10000.0, rope_scaling=None, use_qk_norm=True,
        attn_temperature_tuning=True, floor_scale=8, attn_scale=0.1,
        attention_chunk_size=1024, pad_token_id=0,
        tie_word_embeddings=False)
    torch.manual_seed(14)
    hf_model = save_hf_model(cfg, tmp_path)
    toks = TOKENS
    compare(hf_logits(hf_model, toks), our_logits(str(tmp_path), toks),
            "llama4")
