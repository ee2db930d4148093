"""Parity for wave 6 text families: EXAONE-3, Solar, TeleChat2, TeleFLM,
Qwen-1 and Grok-1.

No transformers implementation exists in this image for any of them, so
each is verified by repacking an HF checkpoint of the nearest math-
equivalent family (Llama / Granite) into the family's fused layout and
naming, then comparing logits through our full loader (the
test_hf_parity_batch4.py pattern).  Grok-1 composes knobs no HF family
representable here combines (sandwich norms + MoE + soft caps), so its
oracle is a compact torch implementation of the reference semantics
(vllm models/grok1.py).
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


def _llama(tmp_path, **kw):
    kw = {"vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
          "num_hidden_layers": 2, "num_attention_heads": 4,
          "num_key_value_heads": 2, "head_dim": 16,
          "max_position_embeddings": 256, "rope_theta": 10000.0,
          "tie_word_embeddings": False, "attention_bias": False,
          "mlp_bias": False, **kw}
    cfg = transformers.LlamaConfig(**kw)
    model = save_hf_model(cfg, tmp_path)
    return cfg, model, load_file(str(tmp_path / "model.safetensors"))


def test_exaone3_parity_via_llama(tmp_path):
    cfg, hf_model, t = _llama(tmp_path)
    out = {}
    ren = {"input_layernorm": "ln_1",
           "post_attention_layernorm": "ln_2",
           "self_attn.q_proj": "attn.attention.q_proj",
           "self_attn.k_proj": "attn.attention.k_proj",
           "self_attn.v_proj": "attn.attention.v_proj",
           "self_attn.o_proj": "attn.attention.out_proj",
           "mlp.gate_proj": "mlp.c_fc_0",
           "mlp.up_proj": "mlp.c_fc_1",
           "mlp.down_proj": "mlp.c_proj"}
    for name, w in t.items():
        if m := re.match(r"model\.layers\.(\d+)\.(.+)\.weight", name):
            out[f"transformer.h.{m.group(1)}." +
                ren[m.group(2)] + ".weight"] = w
        elif name == "model.embed_tokens.weight":
            out["transformer.wte.weight"] = w
        elif name == "model.norm.weight":
            out["transformer.ln_f.weight"] = w
        else:
            out[name] = w
    ck = tmp_path / "exaone"
    ck.mkdir()
    save_file(out, str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps({
        "architectures": ["ExaoneForCausalLM"],
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
        "num_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16,
        "layer_norm_epsilon": cfg.rms_norm_eps, "rope_theta": 10000.0,
        "activation_function": "silu",
        "max_position_embeddings": 256, "tie_word_embeddings": False}))
    tokens = [7, 71, 171, 46, 146, 346, 75]
    compare(hf_logits(hf_model, tokens), our_logits(str(ck), tokens),
            "exaone3")


def test_solar_bskcn_parity_via_llama(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    base = {
        "architectures": ["SolarForCausalLM"],
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 4, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16,
        "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
        "bskcn_1": [1], "bskcn_2": [0], "bskcn_3": [3], "bskcn_4": [2]}
    tokens = [8, 81, 181, 47, 147, 347, 76]
    # tv = 0 → skip blending is a no-op → exact llama parity (proves the
    # remap-free load + config plumbing).
    (tmp_path / "config.json").write_text(json.dumps(
        {**base, "bskcn_tv": [0.3, 0.0]}))
    ours0 = our_logits(str(tmp_path), tokens)
    compare(hf_logits(hf_model, tokens), ours0, "solar-tv0")
    # tv > 0 must change the logits (proves the blend hook fires).
    (tmp_path / "config.json").write_text(json.dumps(
        {**base, "bskcn_tv": [0.3, 0.5]}))
    ours5 = our_logits(str(tmp_path), tokens)
    assert float(np.abs(ours5 - ours0).max()) > 1e-3


def test_telechat2_parity_via_llama(tmp_path):
    cfg, hf_model, t = _llama(tmp_path, num_key_value_heads=4)
    Hkv, D = 4, 16
    out = {}
    for name, w in t.items():
        if m := re.match(r"model\.layers\.(\d+)\.(.+)", name):
            i, rest = m.group(1), m.group(2)
            p = f"transformer.h.{i}."
            if rest == "self_attn.q_proj.weight":
                out[p + "self_attention.query.weight"] = w
            elif rest == "self_attn.k_proj.weight":
                k = w.reshape(Hkv, 1, D, -1)
                v = t[f"model.layers.{i}.self_attn.v_proj.weight"].reshape(
                    Hkv, 1, D, -1)
                out[p + "self_attention.key_value.weight"] = torch.cat(
                    [k, v], dim=1).reshape(-1, w.shape[-1])
            elif rest == "self_attn.v_proj.weight":
                continue
            elif rest == "self_attn.o_proj.weight":
                out[p + "self_attention.dense.weight"] = w
            else:
                out[p + rest] = w       # mlp.* and *layernorm keep names
        elif name == "model.embed_tokens.weight":
            out["transformer.word_embeddings.weight"] = w
        elif name == "model.norm.weight":
            out["transformer.ln_f.weight"] = w
        else:
            out[name] = w
    ck = tmp_path / "telechat2"
    ck.mkdir()
    save_file(out, str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps({
        "architectures": ["TeleChat2ForCausalLM"],
        "vocab_size": 512, "hidden_size": 64, "ffn_hidden_size": 128,
        "n_layer": 2, "n_head": 4, "head_dim": 16,
        "layer_norm_epsilon": cfg.rms_norm_eps, "rope_theta": 10000.0,
        "seq_length": 256, "tie_word_embeddings": False}))
    tokens = [9, 91, 191, 48, 148, 348, 77]
    compare(hf_logits(hf_model, tokens), our_logits(str(ck), tokens),
            "telechat2")


def test_teleflm_mup_parity_via_granite(tmp_path):
    # Granite's HF implementation carries exactly TeleFLM's µP hooks
    # (embedding multiplier + logit division) under llama-style names.
    cfg = transformers.GraniteConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        embedding_multiplier=2.0, attention_multiplier=16 ** -0.5,
        residual_multiplier=1.0, logits_scaling=1.5,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    t = load_file(str(tmp_path / "model.safetensors"))
    ck = tmp_path / "teleflm"
    ck.mkdir()
    save_file(dict(t), str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps({
        "architectures": ["TeleFLMForCausalLM"],
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16,
        "rms_norm_eps": cfg.rms_norm_eps, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
        "use_mup": True, "input_mult": 2.0, "output_mult": 2.0,
        "mup_scale_factor": 3.0}))      # 3.0/2.0 = divide by 1.5
    tokens = [10, 101, 201, 49, 149, 349, 78]
    compare(hf_logits(hf_model, tokens), our_logits(str(ck), tokens),
            "teleflm")


def test_qwen1_parity_via_llama(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=True)
    model = transformers.AutoModelForCausalLM.from_config(cfg)
    model.eval()
    # Qwen-1 has no o_proj bias; zero llama's so both sides agree.
    for layer in model.model.layers:
        layer.self_attn.o_proj.bias.data.zero_()
    model.save_pretrained(tmp_path, safe_serialization=True)
    t = load_file(str(tmp_path / "model.safetensors"))
    out = {}
    for name, w in t.items():
        if m := re.match(r"model\.layers\.(\d+)\.(.+)", name):
            i, rest = m.group(1), m.group(2)
            p = f"transformer.h.{i}."
            if m2 := re.match(r"self_attn\.q_proj\.(weight|bias)", rest):
                kind = m2.group(1)
                out[p + "attn.c_attn." + kind] = torch.cat(
                    [w, t[f"model.layers.{i}.self_attn.k_proj.{kind}"],
                     t[f"model.layers.{i}.self_attn.v_proj.{kind}"]], dim=0)
            elif re.match(r"self_attn\.[kv]_proj\.", rest) or \
                    rest == "self_attn.o_proj.bias":
                continue
            elif rest == "self_attn.o_proj.weight":
                out[p + "attn.c_proj.weight"] = w
            elif rest == "input_layernorm.weight":
                out[p + "ln_1.weight"] = w
            elif rest == "post_attention_layernorm.weight":
                out[p + "ln_2.weight"] = w
            elif rest == "mlp.gate_proj.weight":
                out[p + "mlp.w2.weight"] = w
            elif rest == "mlp.up_proj.weight":
                out[p + "mlp.w1.weight"] = w
            elif rest == "mlp.down_proj.weight":
                out[p + "mlp.c_proj.weight"] = w
            else:
                out[p + rest] = w
        elif name == "model.embed_tokens.weight":
            out["transformer.wte.weight"] = w
        elif name == "model.norm.weight":
            out["transformer.ln_f.weight"] = w
        else:
            out[name] = w
    ck = tmp_path / "qwen1"
    ck.mkdir()
    save_file(out, str(ck / "model.safetensors"))
    (ck / "config.json").write_text(json.dumps({
        "architectures": ["QWenLMHeadModel"],
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 256,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "layer_norm_epsilon": cfg.rms_norm_eps,
        "rotary_emb_base": 10000.0, "seq_length": 256,
        "no_bias": True, "tie_word_embeddings": False}))
    tokens = [11, 111, 211, 50, 150, 350, 79]
    compare(hf_logits(model, tokens), our_logits(str(ck), tokens),
            "qwen1")


# ---------------------------------------------------------------------------
# Grok-1: torch mini-oracle of the reference semantics (vllm grok1.py):
# sandwich RMSNorms, tanh soft caps on attention and router logits,
# embedding / output / attn-output multipliers, top-2 softmax MoE.

_G = dict(V=256, H=64, L=2, NH=4, NKV=2, D=16, E=4, K=2, I=32, EPS=1e-5,
          EMB_MULT=3.0, OUT_MULT=0.7, ATTN_MULT=1.3, ACAP=5.0, RCAP=2.0)


def _rms(w, x, eps):
    v = x.float()
    return (v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)) * w


def _rope(x, pos, D):
    half = D // 2
    inv = 1.0 / (10000.0 ** (torch.arange(half).float() / half))
    ang = pos[:, None].float() * inv[None, :]
    cos, sin = torch.cos(ang), torch.sin(ang)
    x1, x2 = x[..., :half], x[..., half:]
    return torch.cat([x1 * cos[:, None] - x2 * sin[:, None],
                      x2 * cos[:, None] + x1 * sin[:, None]], dim=-1)


def _grok_oracle(w, tokens):
    g = _G
    T = len(tokens)
    h = w["emb"][tokens] * g["EMB_MULT"]
    pos = torch.arange(T)
    mask = torch.full((T, T), float("-inf")).triu(1)
    for li in range(g["L"]):
        lw = w[f"l{li}"]
        hn = _rms(lw["pre_attn"], h, g["EPS"])
        q = (hn @ lw["q"].T).view(T, g["NH"], g["D"])
        k = (hn @ lw["k"].T).view(T, g["NKV"], g["D"])
        v = (hn @ lw["v"].T).view(T, g["NKV"], g["D"])
        q, k = _rope(q, pos, g["D"]), _rope(k, pos, g["D"])
        rep = g["NH"] // g["NKV"]
        k = k.repeat_interleave(rep, dim=1)
        v = v.repeat_interleave(rep, dim=1)
        logits = torch.einsum("qhd,khd->hqk", q, k) * g["D"] ** -0.5
        logits = g["ACAP"] * torch.tanh(logits / g["ACAP"]) + mask
        att = torch.softmax(logits, dim=-1)
        ao = torch.einsum("hqk,khd->qhd", att, v).reshape(T, -1)
        ao = (ao @ lw["o"].T) * g["ATTN_MULT"]
        h = h + _rms(lw["post_attn"], ao, g["EPS"])
        hn = _rms(lw["pre_moe"], h, g["EPS"])
        rl = hn @ lw["gate"].T
        rl = g["RCAP"] * torch.tanh(rl / g["RCAP"])
        probs = torch.softmax(rl, dim=-1)
        topw, topi = torch.topk(probs, g["K"], dim=-1)
        topw = topw / topw.sum(-1, keepdim=True)     # renormalize=True
        mo = torch.zeros_like(hn)
        for t in range(T):
            for j in range(g["K"]):
                e = int(topi[t, j])
                ew = w[f"l{li}"][f"e{e}"]
                inter = torch.nn.functional.silu(
                    hn[t] @ ew["lin"].T) * (hn[t] @ ew["lin_v"].T)
                mo[t] += topw[t, j] * (inter @ ew["lin_1"].T)
        h = h + _rms(lw["post_moe"], mo, g["EPS"])
    h = _rms(w["norm"], h, g["EPS"])
    return (h @ w["head"].T) * g["OUT_MULT"]


def test_grok1_parity_vs_oracle(tmp_path):
    g = _G
    torch.manual_seed(7)
    rnd = lambda *s: torch.randn(*s) * 0.05  # noqa: E731
    w = {"emb": rnd(g["V"], g["H"]), "norm": torch.rand(g["H"]) + 0.5,
         "head": rnd(g["V"], g["H"])}
    sd = {"model.embed_tokens.weight": w["emb"],
          "model.norm.scale": w["norm"], "lm_head.weight": w["head"]}
    for li in range(g["L"]):
        lw = {"q": rnd(g["NH"] * g["D"], g["H"]),
              "k": rnd(g["NKV"] * g["D"], g["H"]),
              "v": rnd(g["NKV"] * g["D"], g["H"]),
              "o": rnd(g["H"], g["NH"] * g["D"]),
              "gate": rnd(g["E"], g["H"]),
              "pre_attn": torch.rand(g["H"]) + 0.5,
              "post_attn": torch.rand(g["H"]) + 0.5,
              "pre_moe": torch.rand(g["H"]) + 0.5,
              "post_moe": torch.rand(g["H"]) + 0.5}
        p = f"model.layers.{li}."
        sd[p + "attn.q_proj.weight"] = lw["q"]
        sd[p + "attn.k_proj.weight"] = lw["k"]
        sd[p + "attn.v_proj.weight"] = lw["v"]
        sd[p + "attn.o_proj.weight"] = lw["o"]
        sd[p + "moe_block.gate.weight"] = lw["gate"]
        sd[p + "pre_attn_norm.scale"] = lw["pre_attn"]
        sd[p + "post_attn_norm.scale"] = lw["post_attn"]
        sd[p + "pre_moe_norm.scale"] = lw["pre_moe"]
        sd[p + "post_moe_norm.scale"] = lw["post_moe"]
        for e in range(g["E"]):
            ew = {"lin": rnd(g["I"], g["H"]), "lin_v": rnd(g["I"], g["H"]),
                  "lin_1": rnd(g["H"], g["I"])}
            lw[f"e{e}"] = ew
            ep = p + f"moe_block.experts.{e}."
            sd[ep + "linear.weight"] = ew["lin"]
            sd[ep + "linear_v.weight"] = ew["lin_v"]
            sd[ep + "linear_1.weight"] = ew["lin_1"]
        w[f"l{li}"] = lw
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["Grok1ForCausalLM"],
        "vocab_size": g["V"], "hidden_size": g["H"],
        "intermediate_size": g["I"], "moe_intermediate_size": g["I"],
        "num_hidden_layers": g["L"], "num_attention_heads": g["NH"],
        "num_key_value_heads": g["NKV"], "head_dim": g["D"],
        "num_experts": g["E"], "num_experts_per_tok": g["K"],
        "rms_norm_eps": g["EPS"], "rope_theta": 10000.0,
        "max_position_embeddings": 256,
        "embedding_multiplier_scale": g["EMB_MULT"],
        "output_multiplier_scale": g["OUT_MULT"],
        "attn_output_multiplier": g["ATTN_MULT"],
        "attn_logit_softcapping": g["ACAP"],
        "router_logit_softcapping": g["RCAP"],
        "moe_renormalize": True,
        "tie_word_embeddings": False}))
    tokens = [3, 33, 133, 52, 152, 252, 90, 17]
    with torch.no_grad():
        oracle = _grok_oracle(w, tokens).numpy()
    compare(oracle, our_logits(str(tmp_path), tokens), "grok1")
