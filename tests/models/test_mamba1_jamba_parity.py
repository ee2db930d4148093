"""Mamba1 / Jamba / LFM2 parity vs HuggingFace transformers (reference:
vllm models/mamba.py, jamba.py, lfm2.py; HF numerics modeling_mamba /
modeling_jamba / modeling_lfm2)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from tests.models.test_hf_parity import compare, hf_logits  # noqa: E402
from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402


def _our_logits_engine(model_dir, token_ids, max_len=128):
    """Run through the full engine (state-cache models need row slots)."""
    from lvllm_tpu.config import (CacheConfig, EngineConfig,
                                  SchedulerConfig)
    from lvllm_tpu.engine.llm_engine import LLMEngine
    from lvllm_tpu.sampling_params import SamplingParams

    mc = load_model_config(model_dir, max_model_len=max_len,
                           dtype="float32")
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64,
                                 enable_prefix_caching=False),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=2,
                                         max_model_len=max_len))
    eng = LLMEngine(cfg, load_format="safetensors")
    eng.add_request("p", list(token_ids),
                    SamplingParams(temperature=0.0, max_tokens=8))
    toks = None
    steps = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                toks = o.outputs[0].token_ids
        steps += 1
        assert steps < 40
    return toks


def _hf_greedy(model, token_ids, n=8):
    with torch.no_grad():
        out = model.generate(torch.tensor([token_ids]), max_new_tokens=n,
                             do_sample=False)
    return out[0, len(token_ids):].tolist()


def test_mamba1_parity(tmp_path):
    cfg = transformers.MambaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        state_size=8, num_hidden_layers=2, conv_kernel=4,
        time_step_rank=8, use_bias=False, use_conv_bias=True,
        tie_word_embeddings=True)
    torch.manual_seed(0)
    hf_model = transformers.MambaForCausalLM(cfg)
    hf_model.eval()
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    tokens = [1, 5, 9, 200, 3, 77, 40, 23]
    want = _hf_greedy(hf_model, tokens)
    got = _our_logits_engine(str(tmp_path), tokens)
    assert got == want, (got, want)


def test_jamba_parity(tmp_path):
    cfg = transformers.JambaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=1,
        num_experts=4, num_experts_per_tok=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        mamba_dt_rank=8, use_mamba_kernels=False,
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(1)
    hf_model = transformers.JambaForCausalLM(cfg)
    hf_model.eval()
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    tokens = [2, 7, 100, 3, 9, 55, 12]
    want = _hf_greedy(hf_model, tokens)
    got = _our_logits_engine(str(tmp_path), tokens)
    assert got == want, (got, want)


def test_lfm2_parity(tmp_path):
    cfg = transformers.Lfm2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        conv_L_cache=3, conv_bias=False,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        max_position_embeddings=128, tie_word_embeddings=False,
        block_ff_dim=128, block_auto_adjust_ff_dim=False)
    torch.manual_seed(2)
    hf_model = transformers.Lfm2ForCausalLM(cfg)
    hf_model.eval()
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    tokens = [3, 8, 120, 4, 6, 9]
    want = _hf_greedy(hf_model, tokens)
    got = _our_logits_engine(str(tmp_path), tokens)
    assert got == want, (got, want)


def test_falcon_mamba_parity(tmp_path):
    """FalconMamba = mamba1 + weightless dt/B/C RMSNorm (HF
    modeling_falcon_mamba rms_forward, mixer_rms_eps): engine greedy
    decode must match HF generate."""
    cfg = transformers.FalconMambaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        state_size=8, num_hidden_layers=2, conv_kernel=4,
        time_step_rank=8, use_bias=False, use_conv_bias=True,
        tie_word_embeddings=True)
    torch.manual_seed(3)
    hf_model = transformers.FalconMambaForCausalLM(cfg).eval()
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    tokens = [5, 77, 123, 9, 31, 2, 200]
    want = _hf_greedy(hf_model, tokens)
    got = _our_logits_engine(str(tmp_path), tokens)
    assert got == want, (got, want)

    # The weightless dt/B/C norm must actually matter: with it disabled
    # the decode diverges from HF.
    from lvllm_tpu.models.mamba1 import FalconMambaModel
    orig = FalconMambaModel.mixer_rms_eps
    try:
        FalconMambaModel.mixer_rms_eps = 0.0
        got_off = _our_logits_engine(str(tmp_path), tokens)
    finally:
        FalconMambaModel.mixer_rms_eps = orig
    assert got_off != want


def test_lfm2_moe_dense_prefix_and_moe_smoke(tmp_path):
    """Lfm2MoeForCausalLM (reference lfm2_moe.py): with num_dense_layers
    covering every layer the model is exactly Lfm2 (HF oracle); the MoE
    remap + sigmoid routing then runs end-to-end on dummy weights (the
    routing math itself is oracle-tested in the MoE parity suites)."""
    import json
    cfg = transformers.Lfm2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        conv_L_cache=3, conv_bias=False,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        max_position_embeddings=128, tie_word_embeddings=False,
        block_ff_dim=128, block_auto_adjust_ff_dim=False)
    torch.manual_seed(3)
    hf_model = transformers.Lfm2ForCausalLM(cfg)
    hf_model.eval()
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = ["Lfm2MoeForCausalLM"]
    d["num_dense_layers"] = 4
    d["num_experts"] = 8
    d["num_experts_per_tok"] = 2
    d["use_expert_bias"] = True
    (tmp_path / "config.json").write_text(json.dumps(d))
    tokens = [3, 8, 120, 4, 6, 9]
    want = _hf_greedy(hf_model, tokens)
    got = _our_logits_engine(str(tmp_path), tokens)
    assert got == want, (got, want)

    from lvllm_tpu.config import ModelConfig
    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams
    mc = ModelConfig(
        model="dummy", architecture="Lfm2MoeForCausalLM",
        dtype="float32", vocab_size=128, hidden_size=64,
        intermediate_size=96, moe_intermediate_size=32,
        num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        router_scoring_fn="sigmoid", mlp_only_layers=(0,),
        layer_types=("short_conv", "full_attention", "short_conv",
                     "full_attention"),
        mamba_conv_kernel=3, qk_norm=True,
        max_position_embeddings=128, max_model_len=64, eos_token_id=-1)
    o = LLM(model_config=mc).generate(
        [[1, 2, 3]], SamplingParams(max_tokens=4, temperature=0.0))
    assert len(o[0].outputs[0].token_ids) == 4
