"""Parity for batch 4: GraniteMoE and EXAONE-4 (direct HF parity) plus
InternLM2 and Baichuan (no transformers implementation in this image —
verified by repacking an HF-Llama checkpoint into their fused layouts and
comparing against the Llama logits through our full loader).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402
from safetensors.torch import load_file, save_file  # noqa: E402

from tests.models.test_hf_parity import (compare, hf_logits,  # noqa: E402
                                         our_logits, save_hf_model)


def test_granitemoe_parity(tmp_path):
    cfg = transformers.GraniteMoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        num_local_experts=8, num_experts_per_tok=2,
        embedding_multiplier=2.0, attention_multiplier=0.3,
        residual_multiplier=0.5, logits_scaling=1.5,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    tokens = [3, 30, 300, 42, 142, 342, 71]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "granitemoe")


def test_exaone4_hybrid_parity(tmp_path):
    cfg = transformers.Exaone4Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        sliding_window=8, sliding_window_pattern=4,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    assert "sliding_attention" in cfg.layer_types
    tokens = [4, 41, 401, 43, 143, 343, 72, 9, 17, 88, 201, 333]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "exaone4")


def _llama_base(tmp_path, attention_bias=False):
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=attention_bias,
        mlp_bias=False)
    model = save_hf_model(cfg, tmp_path)
    return cfg, model, load_file(str(tmp_path / "model.safetensors"))


def test_internlm2_parity_via_llama(tmp_path):
    cfg, hf_model, t = _llama_base(tmp_path)
    Hq, Hkv, D = 4, 2, 16
    out = {}
    for name, w in t.items():
        if m := __import__("re").match(
                r"model\.layers\.(\d+)\.(.+)", name):
            i, rest = m.group(1), m.group(2)
            p = f"model.layers.{i}."
            if rest.startswith("self_attn.q_proj"):
                q = w.reshape(Hkv, Hq // Hkv, D, -1)
                k = t[p + "self_attn.k_proj.weight"].reshape(Hkv, 1, D, -1)
                v = t[p + "self_attn.v_proj.weight"].reshape(Hkv, 1, D, -1)
                out[p + "attention.wqkv.weight"] = torch.cat(
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
    ck = tmp_path / "internlm2"
    ck.mkdir()
    save_file(out, str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps({
        "architectures": ["InternLM2ForCausalLM"],
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "bias": False,
        "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False}))
    tokens = [5, 51, 501, 44, 144, 344, 73]
    compare(hf_logits(hf_model, tokens), our_logits(str(ck), tokens),
            "internlm2")


def test_baichuan_parity_via_llama(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    t = load_file(str(tmp_path / "model.safetensors"))
    out = {}
    import re
    for name, w in t.items():
        if m := re.match(r"(model\.layers\.\d+\.self_attn\.)q_proj\.weight",
                         name):
            p = m.group(1)
            out[p + "W_pack.weight"] = torch.cat(
                [w, t[p + "k_proj.weight"], t[p + "v_proj.weight"]], dim=0)
        elif ".k_proj." in name or ".v_proj." in name:
            continue
        else:
            out[name] = w
    ck = tmp_path / "baichuan"
    ck.mkdir()
    save_file(out, str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps({
        "architectures": ["BaichuanForCausalLM"],
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 4, "head_dim": 16,
        "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False}))
    tokens = [6, 61, 161, 45, 145, 345, 74]
    compare(hf_logits(hf_model, tokens), our_logits(str(ck), tokens),
            "baichuan")
