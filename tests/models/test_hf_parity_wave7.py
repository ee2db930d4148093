"""Parity for wave 7: HyperCLOVAX, BailingMoe (Ling), EXAONE-MoE,
Mistral-Large-3 and JAIS.

Oracles: Granite (HyperCLOVAX multipliers), Mixtral (BailingMoe layout),
Glm4Moe (EXAONE-MoE sigmoid routing), DeepseekV3 (Mistral-Large-3 naming),
and a compact torch implementation of the reference JAIS semantics
(vllm models/jais.py — GPT-2 Conv1D layout + ALiBi + swiglu + µP scales).
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


def test_hyperclovax_parity_via_granite(tmp_path):
    cfg = transformers.GraniteConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        embedding_multiplier=1.5, attention_multiplier=0.3,
        residual_multiplier=0.8, logits_scaling=2.0,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    t = load_file(str(tmp_path / "model.safetensors"))
    ck = tmp_path / "hcx"
    ck.mkdir()
    save_file(dict(t), str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps({
        "architectures": ["HyperCLOVAXForCausalLM"],
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16,
        "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
        "use_post_norm": False,
        "embedding_multiplier": 1.5, "attention_multiplier": 0.3,
        "residual_multiplier": 0.8, "logits_scaling": 2.0}))
    tokens = [12, 121, 221, 51, 151, 351, 80]
    compare(hf_logits(hf_model, tokens), our_logits(str(ck), tokens),
            "hyperclovax")


def test_bailing_moe_parity_via_mixtral(tmp_path):
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
    ck = tmp_path / "bailing"
    ck.mkdir()
    save_file(out, str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps({
        "architectures": ["BailingMoeForCausalLM"],
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 96,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16,
        "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
        "num_experts": 8, "num_experts_per_tok": 2,
        "moe_intermediate_size": 96, "first_k_dense_replace": 0,
        "score_function": "softmax", "norm_topk_prob": True,
        "use_bias": False, "use_qkv_bias": False, "use_qk_norm": False}))
    tokens = [13, 131, 231, 53, 153, 353, 81]
    compare(hf_logits(hf_model, tokens), our_logits(str(ck), tokens),
            "bailing-moe")


def test_exaone_moe_parity_via_glm4moe(tmp_path):
    cfg = transformers.Glm4MoeConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1,
        n_group=2, topk_group=1, routed_scaling_factor=1.2,
        norm_topk_prob=True, use_qk_norm=False, attention_bias=False,
        partial_rotary_factor=0.5, tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    with torch.no_grad():
        for layer in hf_model.model.layers:
            if hasattr(layer.mlp, "gate") and hasattr(
                    layer.mlp.gate, "e_score_correction_bias"):
                layer.mlp.gate.e_score_correction_bias.add_(
                    torch.randn_like(
                        layer.mlp.gate.e_score_correction_bias) * 0.1)
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    t = load_file(str(tmp_path / "model.safetensors"))
    out = {}
    for name, w in t.items():
        # EXAONE-MoE keeps the expert bias directly on the MoE module.
        out[name.replace("mlp.gate.e_score_correction_bias",
                         "mlp.e_score_correction_bias")] = w
    ck = tmp_path / "exaone_moe"
    ck.mkdir()
    save_file(out, str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps({
        "architectures": ["ExaoneMoEForCausalLM"],
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 96,
        "num_hidden_layers": 3, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16,
        "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
        "num_experts": 8, "num_experts_per_tok": 2,
        "moe_intermediate_size": 32, "num_shared_experts": 1,
        "first_k_dense_replace": 1, "n_group": 2, "topk_group": 1,
        "routed_scaling_factor": 1.2, "norm_topk_prob": True,
        "partial_rotary_factor": 0.5}))
    tokens = [14, 141, 241, 54, 154, 354, 82]
    compare(hf_logits(hf_model, tokens), our_logits(str(ck), tokens),
            "exaone-moe")


def test_mistral_large3_parity_via_deepseekv3(tmp_path):
    cfg = transformers.DeepseekV3Config(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rope_theta=10000.0,
        q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, n_group=1, topk_group=1,
        routed_scaling_factor=1.0, norm_topk_prob=True,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    t = load_file(str(tmp_path / "model.safetensors"))
    ren = [(r"model\.layers\.(\d+)\.input_layernorm\.weight",
            r"layers.\1.attention_norm.weight"),
           (r"model\.layers\.(\d+)\.self_attn\.q_a_proj\.(\w+)",
            r"layers.\1.attention.wq_a.\2"),
           (r"model\.layers\.(\d+)\.self_attn\.q_a_layernorm\.weight",
            r"layers.\1.attention.q_a_norm.weight"),
           (r"model\.layers\.(\d+)\.self_attn\.q_b_proj\.(\w+)",
            r"layers.\1.attention.wq_b.\2"),
           (r"model\.layers\.(\d+)\.self_attn\.kv_a_proj_with_mqa\.(\w+)",
            r"layers.\1.attention.wkv_a_with_mqa.\2"),
           (r"model\.layers\.(\d+)\.self_attn\.kv_a_layernorm\.weight",
            r"layers.\1.attention.kv_a_norm.weight"),
           (r"model\.layers\.(\d+)\.self_attn\.kv_b_proj\.(\w+)",
            r"layers.\1.attention.wkv_b.\2"),
           (r"model\.layers\.(\d+)\.self_attn\.o_proj\.(\w+)",
            r"layers.\1.attention.wo.\2"),
           (r"model\.layers\.(\d+)\.post_attention_layernorm\.weight",
            r"layers.\1.ffn_norm.weight"),
           (r"model\.layers\.(\d+)\.mlp\.gate_proj\.(\w+)",
            r"layers.\1.feed_forward.w1.\2"),
           (r"model\.layers\.(\d+)\.mlp\.down_proj\.(\w+)",
            r"layers.\1.feed_forward.w2.\2"),
           (r"model\.layers\.(\d+)\.mlp\.up_proj\.(\w+)",
            r"layers.\1.feed_forward.w3.\2"),
           (r"model\.layers\.(\d+)\.mlp\.gate\.weight",
            r"layers.\1.gate.weight"),
           (r"model\.layers\.(\d+)\.mlp\.gate\.e_score_correction_bias",
            r"layers.\1.gate.bias"),
           (r"model\.layers\.(\d+)\.mlp\.shared_experts\.gate_proj\.(\w+)",
            r"layers.\1.shared_experts.w1.\2"),
           (r"model\.layers\.(\d+)\.mlp\.shared_experts\.down_proj\.(\w+)",
            r"layers.\1.shared_experts.w2.\2"),
           (r"model\.layers\.(\d+)\.mlp\.shared_experts\.up_proj\.(\w+)",
            r"layers.\1.shared_experts.w3.\2"),
           (r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.gate_proj\.(\w+)",
            r"layers.\1.experts.\2.w1.\3"),
           (r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.down_proj\.(\w+)",
            r"layers.\1.experts.\2.w2.\3"),
           (r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.up_proj\.(\w+)",
            r"layers.\1.experts.\2.w3.\3"),
           (r"model\.norm\.weight", "norm.weight"),
           (r"model\.embed_tokens\.weight", "tok_embeddings.weight"),
           (r"lm_head\.weight", "output.weight")]
    out = {}
    for name, w in t.items():
        for pat, repl in ren:
            if re.fullmatch(pat, name):
                name = re.sub(pat, repl, name)
                break
        else:
            raise AssertionError(f"unmapped {name}")
        out[name] = w
    ck = tmp_path / "mistral_large3"
    ck.mkdir()
    save_file(out, str(ck / "model.safetensors"))
    hf_dict = json.loads(cfg.to_json_string())
    hf_dict["architectures"] = ["MistralLarge3ForCausalLM"]
    (ck / "config.json").write_text(json.dumps(hf_dict))
    tokens = [15, 151, 251, 55, 155, 355, 83]
    compare(hf_logits(hf_model, tokens), our_logits(str(ck), tokens),
            "mistral-large-3")


# ---------------------------------------------------------------------------
# JAIS: torch mini-oracle (GPT-2 Conv1D layout + ALiBi + swiglu + µP).

_J = dict(V=256, H=64, L=2, NH=4, D=16, I=96, EPS=1e-5,
          EMB=2.0, WIDTH=0.5)


def _alibi_slopes(n):
    import math
    closest = 2 ** math.floor(math.log2(n))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = [base ** i for i in range(1, closest + 1)]
    if closest < n:
        eb = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        slopes += [eb ** i for i in range(1, 2 * (n - closest) + 1, 2)]
    return torch.tensor(slopes)


def _ln(w, b, x, eps):
    v = x.float()
    mu = v.mean(-1, keepdim=True)
    var = v.var(-1, keepdim=True, unbiased=False)
    return (v - mu) / torch.sqrt(var + eps) * w + b


def _jais_oracle(w, tokens):
    g = _J
    T = len(tokens)
    h = w["wte"][tokens] * g["EMB"]
    slopes = _alibi_slopes(g["NH"])
    pos = torch.arange(T).float()
    rel = pos[None, :] - pos[:, None]          # key_pos - query_pos
    bias = slopes[:, None, None] * rel[None]
    mask = torch.full((T, T), float("-inf")).triu(1)
    for li in range(g["L"]):
        lw = w[f"l{li}"]
        hn = _ln(lw["ln1_w"], lw["ln1_b"], h, g["EPS"])
        qkv = hn @ lw["c_attn_w"] + lw["c_attn_b"]   # Conv1D: [in, out]
        q, k, v = qkv.split(g["NH"] * g["D"], dim=-1)
        q = q.view(T, g["NH"], g["D"])
        k = k.view(T, g["NH"], g["D"])
        v = v.view(T, g["NH"], g["D"])
        logits = torch.einsum("qhd,khd->hqk", q, k) / g["D"]  # qk-dot-by-d
        att = torch.softmax(logits + bias + mask[None], dim=-1)
        ao = torch.einsum("hqk,khd->qhd", att, v).reshape(T, -1)
        h = h + (ao @ lw["c_proj_w"] + lw["c_proj_b"])
        hn = _ln(lw["ln2_w"], lw["ln2_b"], h, g["EPS"])
        up = hn @ lw["c_fc_w"] + lw["c_fc_b"]
        gate = hn @ lw["c_fc2_w"] + lw["c_fc2_b"]
        y = up * torch.nn.functional.silu(gate)
        h = h + (y @ lw["mlp_proj_w"] + lw["mlp_proj_b"])
    h = _ln(w["lnf_w"], w["lnf_b"], h, g["EPS"])
    return (h @ w["wte"].T) * g["WIDTH"]


def test_jais_parity_vs_oracle(tmp_path):
    g = _J
    torch.manual_seed(11)
    rnd = lambda *s: torch.randn(*s) * 0.05  # noqa: E731
    w = {"wte": rnd(g["V"], g["H"]),
         "lnf_w": torch.rand(g["H"]) + 0.5, "lnf_b": rnd(g["H"])}
    sd = {"transformer.wte.weight": w["wte"],
          "transformer.ln_f.weight": w["lnf_w"],
          "transformer.ln_f.bias": w["lnf_b"]}
    for li in range(g["L"]):
        lw = {"ln1_w": torch.rand(g["H"]) + 0.5, "ln1_b": rnd(g["H"]),
              "ln2_w": torch.rand(g["H"]) + 0.5, "ln2_b": rnd(g["H"]),
              "c_attn_w": rnd(g["H"], 3 * g["H"]),
              "c_attn_b": rnd(3 * g["H"]),
              "c_proj_w": rnd(g["H"], g["H"]), "c_proj_b": rnd(g["H"]),
              "c_fc_w": rnd(g["H"], g["I"]), "c_fc_b": rnd(g["I"]),
              "c_fc2_w": rnd(g["H"], g["I"]), "c_fc2_b": rnd(g["I"]),
              "mlp_proj_w": rnd(g["I"], g["H"]),
              "mlp_proj_b": rnd(g["H"])}
        w[f"l{li}"] = lw
        p = f"transformer.h.{li}."
        sd[p + "ln_1.weight"] = lw["ln1_w"]
        sd[p + "ln_1.bias"] = lw["ln1_b"]
        sd[p + "ln_2.weight"] = lw["ln2_w"]
        sd[p + "ln_2.bias"] = lw["ln2_b"]
        sd[p + "attn.c_attn.weight"] = lw["c_attn_w"]   # Conv1D [in, out]
        sd[p + "attn.c_attn.bias"] = lw["c_attn_b"]
        sd[p + "attn.c_proj.weight"] = lw["c_proj_w"]
        sd[p + "attn.c_proj.bias"] = lw["c_proj_b"]
        sd[p + "mlp.c_fc.weight"] = lw["c_fc_w"]
        sd[p + "mlp.c_fc.bias"] = lw["c_fc_b"]
        sd[p + "mlp.c_fc2.weight"] = lw["c_fc2_w"]
        sd[p + "mlp.c_fc2.bias"] = lw["c_fc2_b"]
        sd[p + "mlp.c_proj.weight"] = lw["mlp_proj_w"]
        sd[p + "mlp.c_proj.bias"] = lw["mlp_proj_b"]
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["JAISLMHeadModel"],
        "vocab_size": g["V"], "n_embd": g["H"], "n_layer": g["L"],
        "n_head": g["NH"], "n_inner": g["I"], "n_positions": 256,
        "layer_norm_epsilon": g["EPS"],
        "activation_function": "swiglu",
        "position_embedding_type": "alibi",
        "embeddings_scale": g["EMB"], "width_scale": g["WIDTH"],
        "scale_qk_dot_by_d": True,
        "tie_word_embeddings": True}))
    tokens = [4, 44, 144, 56, 156, 250, 91, 18]
    with torch.no_grad():
        oracle = _jais_oracle(w, tokens).numpy()
    compare(oracle, our_logits(str(tmp_path), tokens), "jais")
