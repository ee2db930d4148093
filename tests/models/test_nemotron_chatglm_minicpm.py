"""Structural tests for reference-only families (no HF class in this
image): NemotronH, (later) ChatGLM / MiniCPM. Coverage: engine runs all
layer-mixer types, multi-step equality, batch determinism."""

import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.entrypoints.llm import LLM
from lvllm_tpu.sampling_params import SamplingParams


def _nemotron_config(**kw):
    base = dict(
        model="dummy", architecture="NemotronHForCausalLM",
        dtype="float32", vocab_size=256, hidden_size=64,
        intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        layer_types=("linear_attention", "mlp", "full_attention", "moe"),
        mamba_num_heads=8, mamba_head_dim=16, mamba_state_size=8,
        mamba_n_groups=1, mamba_conv_kernel=4,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        num_shared_experts=1, shared_expert_intermediate_size=32,
        router_scoring_fn="sigmoid", norm_topk_prob=True,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        seed=5)
    base.update(kw)
    return ModelConfig(**base)


def _gen(mc, h=1, prompts=None, sp=None):
    llm = LLM(model_config=mc, load_format="dummy", max_num_seqs=4,
              max_num_batched_tokens=128, block_size=8, num_kv_blocks=64,
              multi_step_decode=h)
    prompts = prompts or [[1, 2, 3, 4, 5], [9] * 20, [7, 8]]
    sp = sp or SamplingParams(temperature=0.0, max_tokens=9)
    return [o.outputs[0].token_ids for o in llm.generate(prompts, sp)]


def test_nemotron_h_all_mixer_types_run():
    out = _gen(_nemotron_config())
    assert all(len(t) == 9 for t in out)


def test_nemotron_h_multi_step_identical():
    mc = _nemotron_config()
    assert _gen(mc, h=4) == _gen(mc, h=1)


def test_nemotron_h_batch_invariant():
    mc = _nemotron_config()
    full = _gen(mc)
    solo = _gen(mc, prompts=[[1, 2, 3, 4, 5]])
    assert solo[0] == full[0]


def test_chatglm_matches_glm_oracle(tmp_path):
    """ChatGLM-format checkpoints are GLM-4 dense weights under legacy
    names: fuse/rename a tiny HF GlmForCausalLM into chatglm format and
    require identical logits through our chatglm loader."""
    import json
    import os

    import pytest
    torch = pytest.importorskip("torch")
    import transformers
    from safetensors.torch import save_file

    from tests.models.test_hf_parity import (compare, hf_logits,
                                             our_logits, save_hf_model)

    cfg = transformers.GlmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, partial_rotary_factor=0.5,
        max_position_embeddings=256, rope_theta=10000.0,
        attention_bias=True, tie_word_embeddings=False, pad_token_id=0)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [1, 5, 9, 200, 3, 77, 40, 23]
    hf = hf_logits(hf_model, tokens)

    # Re-save in chatglm format.
    glm_dir = os.path.join(tmp_path, "chatglm")
    os.makedirs(glm_dir, exist_ok=True)
    sd = hf_model.state_dict()
    out = {}
    out["transformer.embedding.word_embeddings.weight"] = \
        sd["model.embed_tokens.weight"]
    out["transformer.encoder.final_layernorm.weight"] = \
        sd["model.norm.weight"]
    out["transformer.output_layer.weight"] = sd["lm_head.weight"]
    for i in range(2):
        p = f"model.layers.{i}"
        g = f"transformer.encoder.layers.{i}"
        out[f"{g}.self_attention.query_key_value.weight"] = torch.cat(
            [sd[f"{p}.self_attn.q_proj.weight"],
             sd[f"{p}.self_attn.k_proj.weight"],
             sd[f"{p}.self_attn.v_proj.weight"]], dim=0)
        out[f"{g}.self_attention.query_key_value.bias"] = torch.cat(
            [sd[f"{p}.self_attn.q_proj.bias"],
             sd[f"{p}.self_attn.k_proj.bias"],
             sd[f"{p}.self_attn.v_proj.bias"]], dim=0)
        out[f"{g}.self_attention.dense.weight"] = \
            sd[f"{p}.self_attn.o_proj.weight"]
        out[f"{g}.mlp.dense_h_to_4h.weight"] = \
            sd[f"{p}.mlp.gate_up_proj.weight"]
        out[f"{g}.mlp.dense_4h_to_h.weight"] = \
            sd[f"{p}.mlp.down_proj.weight"]
    save_file({k: v.clone().contiguous() for k, v in out.items()},
              os.path.join(glm_dir, "model.safetensors"))
    with open(os.path.join(glm_dir, "config.json"), "w") as f:
        json.dump({
            "architectures": ["ChatGLMForCausalLM"],
            "hidden_size": 64, "num_layers": 2, "ffn_hidden_size": 128,
            "num_attention_heads": 4, "padded_vocab_size": 256,
            "multi_query_attention": True, "multi_query_group_num": 2,
            "kv_channels": 16, "head_dim": 16,
            "add_qkv_bias": True, "add_bias_linear": False,
            "original_rope": True, "rope_ratio": 1.0,
            "layernorm_epsilon": cfg.rms_norm_eps, "seq_length": 256,
            "tie_word_embeddings": False,
        }, f)
    ours = our_logits(glm_dir, tokens)
    compare(hf, ours, "chatglm-vs-glm")


def test_minicpm_mup_scalings():
    """MiniCPM muP: embeds x scale_emb, sublayer outputs x
    scale_depth/sqrt(L), logits / (hidden/dim_model_base) — engine runs
    and the scalings change outputs vs the unscaled model."""
    def cfgs(**kw):
        base = dict(
            model="dummy", architecture="MiniCPMForCausalLM",
            dtype="float32", vocab_size=256, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            max_position_embeddings=256, max_model_len=128,
            eos_token_id=-1, tie_word_embeddings=True, seed=3)
        base.update(kw)
        return ModelConfig(**base)

    import jax.numpy as jnp

    from lvllm_tpu.models.registry import build_model
    from tests.models.test_qwen3 import run_tokens

    def logits(mc):
        model = build_model(mc)
        params = model.init_params(0)
        hidden = run_tokens(model, params, [[1, 2, 3, 4, 5]])
        return np.asarray(model.compute_logits(params,
                                               jnp.asarray(hidden)))

    plain = logits(cfgs())
    mup = logits(cfgs(embedding_multiplier=12.0,
                      residual_multiplier=1.4 / np.sqrt(2.0),
                      logits_scaling=64 / 16))
    assert plain.shape == mup.shape
    assert not np.allclose(plain, mup, atol=1e-3)
    # Engine smoke: the muP config serves end to end.
    llm = LLM(model_config=cfgs(embedding_multiplier=12.0,
                                residual_multiplier=0.99,
                                logits_scaling=4.0),
              load_format="dummy", max_num_seqs=2,
              max_num_batched_tokens=64, block_size=8, num_kv_blocks=32)
    out = llm.generate([[1, 2, 3, 4, 5]],
                       SamplingParams(temperature=0.0, max_tokens=8))
    assert len(out[0].outputs[0].token_ids) == 8
