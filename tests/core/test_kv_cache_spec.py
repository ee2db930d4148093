"""Declarative KV-cache spec tests (reference: v1/kv_cache_interface.py
spec classes + tests/v1/core/test_kv_cache_utils.py grouping/sizing)."""

import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.core.kv_cache_spec import (FullAttentionSpec,
                                          LinearAttentionSpec,
                                          MLAAttentionSpec,
                                          SlidingWindowSpec, group_specs,
                                          num_blocks_for_budget,
                                          page_bytes_per_block)
from lvllm_tpu.models.registry import build_model


def test_full_attention_spec_bytes_and_make():
    s = FullAttentionSpec(num_kv_heads=4, head_dim=128, dtype=jnp.bfloat16)
    assert s.bytes_per_block(16) == 2 * 16 * 4 * 128 * 2
    cache = s.make(8, 16, max_reqs=2)
    assert cache.shape == (2, 8, 16, 4, 128)
    assert cache.dtype == jnp.bfloat16


def test_linear_spec_fixed_state():
    s = LinearAttentionSpec(conv_dim=96, conv_width=4, num_v_heads=4,
                            k_head_dim=16, v_head_dim=32)
    assert s.bytes_per_block(16) == 0
    assert s.fixed_bytes(max_reqs=3) == \
        4 * (96 * 3) * 4 + 4 * (4 * 16 * 32) * 4
    cache = s.make(8, 16, max_reqs=3)
    assert cache["conv"].shape == (4, 96, 3)
    assert cache["rec"].shape == (4, 4, 16, 32)


def test_grouping_hybrid():
    specs = [
        FullAttentionSpec(4, 128),
        LinearAttentionSpec(96, 4, 4, 16, 32),
        FullAttentionSpec(4, 128),
        SlidingWindowSpec(4, 128, sliding_window=512),
    ]
    groups = group_specs(specs)
    assert groups[specs[0].type_key] == [0, 2]
    assert groups[specs[1].type_key] == [1]
    assert groups[specs[3].type_key] == [3]
    assert page_bytes_per_block(specs, 16) == \
        3 * specs[0].bytes_per_block(16)


def test_budget_sizing():
    specs = [FullAttentionSpec(2, 64, jnp.bfloat16)] * 2
    per_block = page_bytes_per_block(specs, 16)
    assert num_blocks_for_budget(specs, 16, per_block * 10 + 1, 4) == 10
    # Fixed state is carved out first.
    specs2 = specs + [LinearAttentionSpec(96, 4, 4, 16, 32)]
    fixed = specs2[2].fixed_bytes(4)
    assert num_blocks_for_budget(specs2, 16, per_block * 10 + fixed, 4) == 10


def test_models_declare_specs():
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="bfloat16",
        vocab_size=64, hidden_size=64, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=64, max_model_len=64,
        eos_token_id=-1)
    m = build_model(mc)
    specs = m.kv_cache_specs(jnp.bfloat16)
    assert len(specs) == 2
    assert all(isinstance(s, FullAttentionSpec) for s in specs)
    # make_layer_cache delegates through the spec; sub-128 head dims
    # lane-pad to 128 so the Pallas attention kernel serves them.
    cache = m.make_layer_cache(0, 4, 16, jnp.bfloat16, 2)
    assert cache.shape == (2, 4, 16, 2, 128)


def test_mla_model_declares_latent_spec():
    mc = ModelConfig(
        model="dummy", architecture="DeepseekV2ForCausalLM",
        dtype="bfloat16", vocab_size=64, hidden_size=64,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=2, kv_lora_rank=64,
        q_lora_rank=None, qk_rope_head_dim=16, qk_nope_head_dim=32,
        v_head_dim=32, attention_type="mla", num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=32,
        mlp_only_layers=(0,), qk_norm=False,
        max_position_embeddings=64, max_model_len=64, eos_token_id=-1)
    m = build_model(mc)
    specs = m.kv_cache_specs(jnp.bfloat16)
    assert all(isinstance(s, MLAAttentionSpec) for s in specs)
    assert specs[0].num_kv_heads == 1
    assert specs[0].head_dim == 128  # 64+16 padded to 128 lanes
