"""Parity for wave 9: openPangu family and Sarvam.

Oracles: HF DeepseekV3 (PanguUltraMoE / SarvamMLA via arch rename — both
are checkpoint-compatible MLA+sigmoid-MoE layouts), HF Llama
(PanguEmbedded), HF Mixtral (SarvamMoE through the BailingMoe layout).
"""

import json
import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402
from safetensors.torch import load_file, save_file  # noqa: E402

from tests.models.test_hf_parity import (compare, hf_logits,  # noqa: E402
                                         our_logits, save_hf_model)


def _dsv3(tmp_path):
    cfg = transformers.DeepseekV3Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rope_theta=10000.0,
        q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, n_group=1,
        topk_group=1, routed_scaling_factor=1.0, norm_topk_prob=True,
        tie_word_embeddings=False)
    model = save_hf_model(cfg, tmp_path)
    with torch.no_grad():
        for layer in model.model.layers:
            if hasattr(layer.mlp, "gate") and hasattr(
                    layer.mlp.gate, "e_score_correction_bias"):
                layer.mlp.gate.e_score_correction_bias.add_(
                    torch.randn_like(
                        layer.mlp.gate.e_score_correction_bias) * 0.1)
    model.save_pretrained(tmp_path, safe_serialization=True)
    return cfg, model


def test_pangu_ultra_moe_parity_via_deepseekv3(tmp_path):
    cfg, hf_model = _dsv3(tmp_path)
    d = json.loads(cfg.to_json_string())
    d["architectures"] = ["PanguUltraMoEForCausalLM"]
    d["num_experts"] = d["n_routed_experts"]
    d["num_shared_experts"] = d["n_shared_experts"]
    d["sandwich_norm"] = False
    (tmp_path / "config.json").write_text(json.dumps(d))
    tokens = [18, 181, 281, 59, 159, 359, 86]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "pangu-ultra-moe")


def test_sarvam_mla_parity_via_deepseekv3(tmp_path):
    cfg, hf_model = _dsv3(tmp_path)
    d = json.loads(cfg.to_json_string())
    d["architectures"] = ["SarvamMLAForCausalLM"]
    d["num_experts"] = d["n_routed_experts"]
    d["num_shared_experts"] = d["n_shared_experts"]
    d["score_function"] = "sigmoid"
    d["first_k_dense_replace"] = 1
    d["moe_layer_freq"] = 1
    (tmp_path / "config.json").write_text(json.dumps(d))
    tokens = [19, 191, 291, 61, 162, 361, 87]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "sarvam-mla")


def test_pangu_embedded_parity_via_llama(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = ["PanguEmbeddedForCausalLM"]
    d["sandwich_norm"] = False
    (tmp_path / "config.json").write_text(json.dumps(d))
    tokens = [20, 201, 301, 62, 163, 363, 89]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "pangu-embedded")


def test_sarvam_moe_parity_via_mixtral(tmp_path):
    cfg = transformers.MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        num_local_experts=8, num_experts_per_tok=2,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    t = load_file(str(tmp_path / "model.safetensors"))
    out = {}
    for name, w in t.items():
        if m := re.match(r"model\.layers\.(\d+)\.(.+)", name):
            i, rest = m.group(1), m.group(2)
            p = f"model.layers.{i}."
            if rest == "self_attn.q_proj.weight":
                out[p + "attention.query_key_value.weight"] = torch.cat(
                    [w, t[p + "self_attn.k_proj.weight"],
                     t[p + "self_attn.v_proj.weight"]], dim=0)
            elif rest in ("self_attn.k_proj.weight",
                          "self_attn.v_proj.weight"):
                continue
            elif rest == "self_attn.o_proj.weight":
                out[p + "attention.dense.weight"] = w
            elif m2 := re.match(
                    r"block_sparse_moe\.experts\.(\d+)\.w([123])\.weight",
                    rest):
                which = {"1": "gate_proj", "2": "down_proj",
                         "3": "up_proj"}[m2.group(2)]
                out[p + f"mlp.experts.{m2.group(1)}.{which}.weight"] = w
            elif rest == "block_sparse_moe.gate.weight":
                out[p + "mlp.gate.weight"] = w
            else:
                out[p + rest] = w
        elif name == "model.embed_tokens.weight":
            out["model.word_embeddings.weight"] = w
        else:
            out[name] = w
    ck = tmp_path / "sarvam_moe"
    ck.mkdir()
    save_file(out, str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps({
        "architectures": ["SarvamMoEForCausalLM"],
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 96,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16,
        "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
        "num_experts": 8, "num_experts_per_tok": 2,
        "moe_intermediate_size": 96, "first_k_dense_replace": 0,
        "score_function": "softmax", "norm_topk_prob": True,
        "use_bias": False, "use_qkv_bias": False, "use_qk_norm": False}))
    tokens = [21, 211, 311, 63, 164, 364, 93]
    compare(hf_logits(hf_model, tokens), our_logits(str(ck), tokens),
            "sarvam-moe")


def test_pangu_sandwich_engine_smoke():
    """Sandwich-norm openPangu runs end-to-end (the sandwich math itself
    is oracle-verified via Afmoe, which shares the code path)."""
    import os
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    from lvllm_tpu.config import ModelConfig
    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams
    mc = ModelConfig(
        model="dummy", architecture="PanguEmbeddedForCausalLM",
        dtype="float32", vocab_size=128, hidden_size=64,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_experts=0, qk_norm=False,
        sandwich_output_norms=True, o_proj_bias=True,
        max_position_embeddings=256, max_model_len=64, eos_token_id=-1)
    o = LLM(model_config=mc).generate(
        [[1, 2, 3]], SamplingParams(max_tokens=4, temperature=0.0))
    assert len(o[0].outputs[0].token_ids) == 4


def test_internlm2_reward_and_ve(tmp_path):
    """InternLM2ForRewardModel (v_head per-token values) and
    InternLM2VEForCausalLM (visual-expert FFN inert for text), both via
    llama-repack (reference internlm2.py:408, internlm2_ve.py)."""
    from tests.models.test_hf_parity_batch4 import _llama_base
    import torch as _t
    cfg, hf_model, t = _llama_base(tmp_path)
    Hq, Hkv, D = 4, 2, 16
    out = {}
    for name, w in t.items():
        if m := re.match(r"model\.layers\.(\d+)\.(.+)", name):
            i, rest = m.group(1), m.group(2)
            p = f"model.layers.{i}."
            if rest.startswith("self_attn.q_proj"):
                q = w.reshape(Hkv, Hq // Hkv, D, -1)
                k = t[p + "self_attn.k_proj.weight"].reshape(Hkv, 1, D, -1)
                v = t[p + "self_attn.v_proj.weight"].reshape(Hkv, 1, D, -1)
                out[p + "attention.wqkv.weight"] = _t.cat(
                    [q, k, v], dim=1).reshape(-1, w.shape[-1])
            elif rest.startswith("self_attn.k_proj") or \
                    rest.startswith("self_attn.v_proj"):
                continue
            elif rest == "self_attn.o_proj.weight":
                out[p + "attention.wo.weight"] = w
            elif rest == "mlp.gate_proj.weight":
                out[p + "feed_forward.w1.weight"] = w
            elif rest == "mlp.up_proj.weight":
                out[p + "feed_forward.w3.weight"] = w
            elif rest == "mlp.down_proj.weight":
                out[p + "feed_forward.w2.weight"] = w
            elif rest == "input_layernorm.weight":
                out[p + "attention_norm.weight"] = w
            elif rest == "post_attention_layernorm.weight":
                out[p + "ffn_norm.weight"] = w
            else:
                out[name] = w
        elif name == "model.embed_tokens.weight":
            out["model.tok_embeddings.weight"] = w
        elif name == "lm_head.weight":
            out["output.weight"] = w
        else:
            out[name] = w
    base_cfg = {
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "bias": False,
        "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False}
    tokens = [22, 221, 321, 64, 166, 366, 94]

    # Reward model: per-token v_head values match llama hidden @ v.
    vhead = _t.randn(1, 64) * 0.1
    ck = tmp_path / "rm"
    ck.mkdir()
    rm = dict(out)
    rm.pop("output.weight")
    rm["v_head.weight"] = vhead
    save_file(rm, str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps(
        {**base_cfg, "architectures": ["InternLM2ForRewardModel"]}))
    from lvllm_tpu.engine.pooling import PoolingRunner
    from lvllm_tpu.model_loader.hf_config import load_model_config
    from lvllm_tpu.model_loader.loader import load_model
    mc = load_model_config(str(ck), max_model_len=128, dtype="float32")
    model, params = load_model(mc, "safetensors")
    vals = PoolingRunner(model, params, max_tokens=256).classify([tokens])
    with torch.no_grad():
        hs = hf_model(torch.tensor([tokens]),
                      output_hidden_states=True).hidden_states[-1][0]
        # HF hidden_states[-1] is pre-final-norm; apply the norm.
        hs = hf_model.model.norm(hs)
        want = (hs @ vhead.T).float().numpy()
    np.testing.assert_allclose(vals[0], want, rtol=5e-3, atol=5e-3)

    # VE variant: extra feed_forward_ve weights are inert for text.
    ck2 = tmp_path / "ve"
    ck2.mkdir()
    ve = dict(out)
    for i in range(2):
        for wn in ("w1", "w2", "w3"):
            ve[f"model.layers.{i}.feed_forward_ve.{wn}.weight"] = \
                _t.randn(128, 64) * 0.1 if wn != "w2" else \
                _t.randn(64, 128) * 0.1
    save_file(ve, str(ck2 / "model.safetensors"))
    (ck2 / "config.json").write_text(json.dumps(
        {**base_cfg, "architectures": ["InternLM2VEForCausalLM"]}))
    compare(hf_logits(hf_model, tokens), our_logits(str(ck2), tokens),
            "internlm2-ve")
