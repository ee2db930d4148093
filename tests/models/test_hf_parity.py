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


def save_hf_model(cfg, tmpdir, attn_implementation=None):
    torch.manual_seed(0)
    kw = {}
    if attn_implementation:
        kw["attn_implementation"] = attn_implementation
    model = transformers.AutoModelForCausalLM.from_config(cfg, **kw)
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


def test_deepseek_v2_lite_parity(tmp_path):
    cfg = transformers.DeepseekV2Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False,
        q_lora_rank=None, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, norm_topk_prob=False,
        routed_scaling_factor=1.0, attention_dropout=0.0)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [5, 17, 80, 411, 32, 7, 150]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "deepseek-v2-lite")


def test_deepseek_v2_qlora_parity(tmp_path):
    cfg = transformers.DeepseekV2Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False,
        q_lora_rank=48, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=2, norm_topk_prob=False,
        attention_dropout=0.0)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [9, 90, 300, 42, 7]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "deepseek-v2-qlora")


def test_deepseek_engine_generates(tmp_path):
    """End-to-end engine run with MLA KV cache (dummy weights)."""
    from lvllm_tpu.config import ModelConfig
    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams

    mc = ModelConfig(
        model="dummy", architecture="DeepseekV2ForCausalLM", dtype="float32",
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        attention_type="mla", q_lora_rank=None, kv_lora_rank=32,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        mlp_only_layers=(0,), qk_norm=False, seed=33)
    llm = LLM(model_config=mc, load_format="dummy", max_num_seqs=4,
              max_num_batched_tokens=128, num_kv_blocks=64)
    outs = llm.generate([[1, 2, 3, 4], [9] * 20],
                        SamplingParams(temperature=0.0, max_tokens=6))
    assert all(len(o.outputs[0].token_ids) == 6 for o in outs)
    a = llm.generate([[1, 2, 3, 4]],
                     SamplingParams(temperature=0.0, max_tokens=6))
    assert a[0].outputs[0].token_ids == outs[0].outputs[0].token_ids


def test_group_limited_routing():
    """DeepSeek-V3 noaux-tc: only experts from the selected groups win."""
    import jax.numpy as jnp
    from lvllm_tpu.layers.moe import route_tokens

    rng = np.random.default_rng(0)
    T, H, E, G = 6, 32, 16, 4
    x = jnp.asarray(rng.standard_normal((T, H)), jnp.float32)
    router = jnp.asarray(rng.standard_normal((H, E)), jnp.float32)
    w, ids = route_tokens(x, router, top_k=4, scoring_fn="sigmoid",
                          n_group=G, topk_group=2)
    ids = np.asarray(ids)
    # Selected experts span at most topk_group distinct groups per token.
    for t in range(T):
        groups = set(int(e) // (E // G) for e in ids[t])
        assert len(groups) <= 2, groups


def test_qwen3_next_parity(tmp_path):
    """Hybrid linear-attention (GDN) + gated full attention + gated shared
    expert — the reference fork's headline model family."""
    cfg = transformers.Qwen3NextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, partial_rotary_factor=0.25,
        layer_types=["linear_attention", "full_attention"],
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=32, decoder_sparse_step=1,
        norm_topk_prob=True, mlp_only_layers=[])
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [3, 33, 333, 42, 7, 260, 19, 100]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "qwen3-next")


def test_qwen3_next_engine_chunked_decode(tmp_path):
    """Hybrid state cache correctness through the engine: chunked prefill +
    decode must match HF greedy continuation."""
    import torch as _torch
    cfg = transformers.Qwen3NextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, partial_rotary_factor=0.25,
        layer_types=["linear_attention", "full_attention"],
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=32, decoder_sparse_step=1,
        norm_topk_prob=True, mlp_only_layers=[])
    hf_model = save_hf_model(cfg, tmp_path)
    # Long prompt forces chunked prefill (budget 64 < 100 tokens), which
    # must thread the GDN recurrent state across chunks correctly.
    prompts = [[5, 50, 200, 7, 99, 123, 4],
               [(i * 13 + 7) % 256 for i in range(100)]]
    wants = []
    for prompt in prompts:
        with _torch.no_grad():
            out = hf_model.generate(
                _torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
                use_cache=False)
        wants.append(out[0][len(prompt):].tolist())

    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams
    llm = LLM(model=str(tmp_path), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=64)
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=6))
    for out, want in zip(outs, wants):
        assert out.outputs[0].token_ids == want, (out.outputs[0].token_ids,
                                                  want)


def test_gpt_oss_parity(tmp_path):
    """gpt-oss: attention sinks + alternating sliding window + clamped
    SwiGLU experts with biases + softmax-after-top-k router + YaRN rope
    (HF numerics: modeling_gpt_oss eager path)."""
    cfg = transformers.GptOssConfig(
        vocab_size=512, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256,
        num_local_experts=4, num_experts_per_tok=2,
        sliding_window=4, tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path, attn_implementation="eager")
    tokens = [7, 90, 411, 28, 3, 505, 77, 123, 8, 266, 14]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "gpt-oss")


def test_gpt_oss_engine_generates(tmp_path):
    """gpt-oss through the full engine: hybrid sliding/full KV specs,
    chunked prefill across the window boundary, greedy match vs HF."""
    import torch as _torch
    cfg = transformers.GptOssConfig(
        vocab_size=256, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256,
        num_local_experts=4, num_experts_per_tok=2,
        sliding_window=16, tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path, attn_implementation="eager")
    prompts = [[5, 50, 200, 7, 99, 123, 4],
               [(i * 13 + 7) % 256 for i in range(100)]]
    wants = []
    for prompt in prompts:
        with _torch.no_grad():
            out = hf_model.generate(
                _torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
                use_cache=False)
        wants.append(out[0][len(prompt):].tolist())

    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams
    llm = LLM(model=str(tmp_path), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=64)
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=6))
    for out, want in zip(outs, wants):
        assert out.outputs[0].token_ids == want, (out.outputs[0].token_ids,
                                                  want)


def test_gemma2_parity(tmp_path):
    """Gemma2: zero-centered norms, 4-norm sandwich layers, GeGLU, √H
    embedding scale, attention+final logit soft caps, alternating SWA."""
    cfg = transformers.Gemma2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        sliding_window=4, query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0)
    hf_model = save_hf_model(cfg, tmp_path, attn_implementation="eager")
    tokens = [3, 33, 333, 44, 77, 411, 29, 8, 190, 254]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "gemma2")


def test_gemma3_parity(tmp_path):
    """Gemma3: adds per-head q/k norms and dual rope (local base on
    sliding layers, scaled global rope on full layers)."""
    cfg = transformers.Gemma3TextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256,
        rope_theta=1_000_000.0, rope_local_base_freq=10000.0,
        rope_scaling={"rope_type": "linear", "factor": 8.0},
        sliding_window=4, query_pre_attn_scalar=16,
        layer_types=["sliding_attention", "full_attention"])
    hf_model = save_hf_model(cfg, tmp_path, attn_implementation="eager")
    tokens = [9, 18, 27, 316, 45, 254, 63, 72]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "gemma3")


def test_gemma1_parity(tmp_path):
    """Gemma 1: llama-style two-norm layers + zero-centered norms, GeGLU,
    √H embedding scale, tied head."""
    cfg = transformers.GemmaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0)
    hf_model = save_hf_model(cfg, tmp_path, attn_implementation="eager")
    tokens = [12, 24, 48, 96, 192, 384, 255, 31]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "gemma1")


def test_phi3_parity(tmp_path):
    """Phi-3: fused qkv/gate_up checkpoint split + LongRoPE scaling
    (short factors regime within the original window)."""
    cfg = transformers.Phi3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, original_max_position_embeddings=128,
        rope_theta=10000.0, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=2, bos_token_id=1,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0, 1.05, 1.1, 1.15,
                                       1.2, 1.25, 1.3, 1.35],
                      "long_factor": [2.0, 2.25, 2.5, 2.75,
                                      3.0, 3.25, 3.5, 4.0]},
        sliding_window=None)
    hf_model = save_hf_model(cfg, tmp_path, attn_implementation="eager")
    tokens = [6, 66, 166, 266, 366, 466, 52, 13]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "phi3")


def test_smollm3_parity(tmp_path):
    """SmolLM3: llama structure with NoPE (rope skipped on some layers)."""
    cfg = transformers.SmolLM3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        no_rope_layers=[1, 1, 1, 0], tie_word_embeddings=False,
        use_sliding_window=False, pad_token_id=0)
    hf_model = save_hf_model(cfg, tmp_path, attn_implementation="eager")
    tokens = [8, 88, 188, 288, 388, 488, 41]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "smollm3")


def test_granite_parity(tmp_path):
    """Granite: muP multipliers on embeddings, attention scale, residual
    deltas and logits."""
    cfg = transformers.GraniteConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, embedding_multiplier=12.0,
        attention_multiplier=0.03, residual_multiplier=0.22,
        logits_scaling=8.0)
    hf_model = save_hf_model(cfg, tmp_path, attn_implementation="eager")
    tokens = [14, 140, 240, 340, 440, 25, 52]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "granite")


def test_mamba2_parity(tmp_path):
    """Pure-SSM Mamba2: conv+SSD recurrence per request slot, gated norm
    (gate before norm), no attention layers at all."""
    cfg = transformers.Mamba2Config(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_heads=16, head_dim=8, state_size=16, n_groups=2,
        expand=2, conv_kernel=4, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [5, 55, 155, 255, 355, 455, 32, 64, 96]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "mamba2")


def test_bamba_parity(tmp_path):
    """Bamba hybrid: interleaved mamba2/attention layers + SwiGLU MLPs,
    partial rotary on the attention layers."""
    cfg = transformers.BambaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        mamba_n_heads=8, mamba_d_head=16, mamba_d_state=16,
        mamba_n_groups=2, mamba_expand=2, mamba_d_conv=4,
        attn_layer_indices=[1], max_position_embeddings=256,
        tie_word_embeddings=False, pad_token_id=0)
    hf_model = save_hf_model(cfg, tmp_path, attn_implementation="eager")
    tokens = [10, 110, 210, 310, 410, 51, 25, 17]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "bamba")


def test_mamba2_engine_chunked_decode(tmp_path):
    """Mamba2 through the engine: recurrent state across chunked prefill +
    decode; prefix caching is auto-disabled for recurrent models so a
    repeated prompt recomputes (and still matches HF greedy)."""
    import torch as _torch
    cfg = transformers.Mamba2Config(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_heads=16, head_dim=8, state_size=16, n_groups=2,
        expand=2, conv_kernel=4, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    hf_model = save_hf_model(cfg, tmp_path)
    prompts = [[5, 50, 200, 7, 99, 123, 4],
               [(i * 11 + 3) % 256 for i in range(100)]]
    wants = []
    for prompt in prompts:
        with _torch.no_grad():
            out = hf_model.generate(
                _torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
                use_cache=False)
        wants.append(out[0][len(prompt):].tolist())

    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams
    llm = LLM(model=str(tmp_path), dtype="float32", max_model_len=128,
              max_num_seqs=4, max_num_batched_tokens=64, num_kv_blocks=64)
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    outs = llm.generate(prompts, sp)
    for out, want in zip(outs, wants):
        assert out.outputs[0].token_ids == want, (out.outputs[0].token_ids,
                                                  want)
    # Repeat the long prompt: must NOT take a prefix-cache shortcut
    # (recurrent state has no per-block checkpoints).
    again = llm.generate([prompts[1]], sp)[0].outputs[0].token_ids
    assert again == wants[1], (again, wants[1])
    kvm = llm.engine.core.scheduler.kv_cache_manager
    assert kvm.prefix_cache_hits == 0


def test_glm4_dense_parity(tmp_path):
    # GLM-4 dense (HF Glm4ForCausalLM): sandwich output norms
    # (post_self_attn/post_mlp layernorm), fused gate_up MLP, qkv bias,
    # interleaved partial rotary (factor 0.5).
    cfg = transformers.Glm4Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, pad_token_id=0,
        partial_rotary_factor=0.5, attention_bias=True)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [7, 70, 470, 12, 311, 25, 93, 405]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "glm4-dense")


def test_longcat_flash_parity(tmp_path):
    """LongcatFlash dual-sublayer + shortcut zero-expert MoE (reference:
    models/longcat_flash.py; HF modeling_longcat_flash)."""
    cfg = transformers.LongcatFlashConfig(
        vocab_size=256, hidden_size=64, ffn_hidden_size=128,
        expert_ffn_hidden_size=32, num_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=48, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=8, zero_expert_num=4, moe_topk=3,
        routed_scaling_factor=1.5, max_position_embeddings=256,
        rope_theta=10000.0, tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [1, 5, 9, 200, 3, 77, 40, 23, 8, 151]
    hf = hf_logits(hf_model, tokens)
    ours = our_logits(str(tmp_path), tokens)
    compare(hf, ours, "longcat-flash")


def test_longcat_engine_generates(tmp_path):
    """End-to-end engine run on LongcatFlash's paired MLA caches
    (PairSpec dict leaves) with multi-step decode."""
    from lvllm_tpu.config import ModelConfig
    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams

    mc = ModelConfig(
        model="dummy", architecture="LongcatFlashForCausalLM",
        dtype="float32", vocab_size=256, hidden_size=64,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=256,
        max_model_len=128, eos_token_id=-1, attention_type="mla",
        q_lora_rank=48, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, num_experts=8,
        num_experts_per_tok=2, moe_intermediate_size=32,
        zero_expert_num=4, mla_scale_q_lora=1.15, mla_scale_kv_lora=1.41,
        routed_scaling_factor=1.5, seed=7)

    def gen(h):
        llm = LLM(model_config=mc, load_format="dummy", max_num_seqs=4,
                  max_num_batched_tokens=128, num_kv_blocks=64,
                  multi_step_decode=h)
        return [o.outputs[0].token_ids for o in llm.generate(
            [[1, 2, 3, 4], [9] * 20],
            SamplingParams(temperature=0.0, max_tokens=9))]

    single = gen(1)
    assert all(len(t) == 9 for t in single)
    assert gen(4) == single  # paired caches ride the multi-step scan
