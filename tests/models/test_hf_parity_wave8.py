"""Parity for wave 8: Afmoe (torch mini-oracle), Glm4MoeLite (DeepseekV3
oracle through the MLA factory), the Transformers-backend fallback, and
Jais2 config plumbing.
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


# ---------------------------------------------------------------------------
# Afmoe: gated attention + sandwich norms + NoPE-on-full + sigmoid MoE.

_A = dict(V=256, H=64, L=2, NH=4, NKV=2, D=16, E=4, K=2, I=32, IS=48,
          EPS=1e-5, SCALE=1.7, WIN=4)


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


def _mlp(w, x):
    return (torch.nn.functional.silu(x @ w["gate"].T) *
            (x @ w["up"].T)) @ w["down"].T


def _afmoe_oracle(w, tokens):
    g = _A
    T = len(tokens)
    h = w["emb"][tokens]
    pos = torch.arange(T)
    for li in range(g["L"]):
        lw = w[f"l{li}"]
        sliding = li == 0          # layer_types[0] = sliding_attention
        hn = _rms(lw["ln_in"], h, g["EPS"])
        q = (hn @ lw["q"].T).view(T, g["NH"], g["D"])
        k = (hn @ lw["k"].T).view(T, g["NKV"], g["D"])
        v = (hn @ lw["v"].T).view(T, g["NKV"], g["D"])
        gate = torch.sigmoid(hn @ lw["gate"].T)          # [T, NH*D]
        q = _rms(lw["qn"], q, g["EPS"])
        k = _rms(lw["kn"], k, g["EPS"])
        if sliding:
            q = _rope(q, pos, g["D"])
            k = _rope(k, pos, g["D"])
        rep = g["NH"] // g["NKV"]
        k = k.repeat_interleave(rep, dim=1)
        v = v.repeat_interleave(rep, dim=1)
        logits = torch.einsum("qhd,khd->hqk", q, k) * g["D"] ** -0.5
        mask = torch.full((T, T), float("-inf")).triu(1)
        if sliding:
            # kv kept iff q - k < WIN (ragged kernel convention:
            # window counts the current token).
            dist = pos[:, None] - pos[None, :]
            mask = mask + torch.where(dist >= g["WIN"],
                                      torch.tensor(float("-inf")), 0.0)
        att = torch.softmax(logits + mask[None], dim=-1)
        ao = torch.einsum("hqk,khd->qhd", att, v).reshape(T, -1)
        ao = (ao * gate) @ lw["o"].T
        h = h + _rms(lw["ln_post_attn"], ao, g["EPS"])
        hn = _rms(lw["ln_pre_mlp"], h, g["EPS"])
        if li == 0:                # num_dense_layers = 1
            mo = _mlp(lw["dense"], hn)
        else:
            scores = torch.sigmoid(hn @ lw["router"].T)
            sel = torch.topk(scores + lw["ebias"][None], g["K"],
                             dim=-1).indices
            topw = torch.gather(scores, -1, sel)
            topw = topw / topw.sum(-1, keepdim=True)     # route_norm
            mo = torch.zeros_like(hn)
            for t in range(T):
                for j in range(g["K"]):
                    mo[t] += topw[t, j] * _mlp(
                        lw[f"e{int(sel[t, j])}"], hn[t])
            mo = mo * g["SCALE"] + _mlp(lw["shared"], hn)
        h = h + _rms(lw["ln_post_mlp"], mo, g["EPS"])
    h = _rms(w["norm"], h, g["EPS"])
    return h @ w["head"].T


def test_afmoe_parity_vs_oracle(tmp_path):
    g = _A
    torch.manual_seed(13)
    rnd = lambda *s: torch.randn(*s) * 0.05  # noqa: E731
    rw = lambda n: torch.rand(n) + 0.5  # noqa: E731

    def mlp_w(i):
        return {"gate": rnd(i, g["H"]), "up": rnd(i, g["H"]),
                "down": rnd(g["H"], i)}

    w = {"emb": rnd(g["V"], g["H"]), "norm": rw(g["H"]),
         "head": rnd(g["V"], g["H"])}
    sd = {"model.embed_tokens.weight": w["emb"],
          "model.norm.weight": w["norm"], "lm_head.weight": w["head"]}
    for li in range(g["L"]):
        lw = {"q": rnd(g["NH"] * g["D"], g["H"]),
              "k": rnd(g["NKV"] * g["D"], g["H"]),
              "v": rnd(g["NKV"] * g["D"], g["H"]),
              "o": rnd(g["H"], g["NH"] * g["D"]),
              "gate": rnd(g["NH"] * g["D"], g["H"]),
              "qn": rw(g["D"]), "kn": rw(g["D"]),
              "ln_in": rw(g["H"]), "ln_post_attn": rw(g["H"]),
              "ln_pre_mlp": rw(g["H"]), "ln_post_mlp": rw(g["H"])}
        p = f"model.layers.{li}."
        sd[p + "self_attn.q_proj.weight"] = lw["q"]
        sd[p + "self_attn.k_proj.weight"] = lw["k"]
        sd[p + "self_attn.v_proj.weight"] = lw["v"]
        sd[p + "self_attn.o_proj.weight"] = lw["o"]
        sd[p + "self_attn.gate_proj.weight"] = lw["gate"]
        sd[p + "self_attn.q_norm.weight"] = lw["qn"]
        sd[p + "self_attn.k_norm.weight"] = lw["kn"]
        sd[p + "input_layernorm.weight"] = lw["ln_in"]
        sd[p + "post_attention_layernorm.weight"] = lw["ln_post_attn"]
        sd[p + "pre_mlp_layernorm.weight"] = lw["ln_pre_mlp"]
        sd[p + "post_mlp_layernorm.weight"] = lw["ln_post_mlp"]
        if li == 0:
            lw["dense"] = mlp_w(g["IS"])
            for which in ("gate", "up", "down"):
                sd[p + f"mlp.{which}_proj.weight"] = lw["dense"][which]
        else:
            lw["router"] = rnd(g["E"], g["H"])
            lw["ebias"] = torch.randn(g["E"]) * 0.2
            lw["shared"] = mlp_w(g["I"])
            sd[p + "mlp.gate.weight"] = lw["router"]
            sd[p + "mlp.expert_bias"] = lw["ebias"]
            for which in ("gate", "up", "down"):
                sd[p + f"mlp.shared_experts.{which}_proj.weight"] = \
                    lw["shared"][which]
            for e in range(g["E"]):
                lw[f"e{e}"] = mlp_w(g["I"])
                for which in ("gate", "up", "down"):
                    sd[p + f"mlp.experts.{e}.{which}_proj.weight"] = \
                        lw[f"e{e}"][which]
        w[f"l{li}"] = lw
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["AfmoeForCausalLM"],
        "vocab_size": g["V"], "hidden_size": g["H"],
        "intermediate_size": g["IS"], "moe_intermediate_size": g["I"],
        "num_hidden_layers": g["L"], "num_attention_heads": g["NH"],
        "num_key_value_heads": g["NKV"], "head_dim": g["D"],
        "num_experts": g["E"], "num_experts_per_tok": g["K"],
        "num_shared_experts": 1, "num_dense_layers": 1,
        "score_func": "sigmoid", "route_norm": True,
        "route_scale": g["SCALE"],
        "layer_types": ["sliding_attention", "full_attention"],
        "sliding_window": g["WIN"],
        "rms_norm_eps": g["EPS"], "rope_theta": 10000.0,
        "max_position_embeddings": 256,
        "tie_word_embeddings": False}))
    tokens = [6, 66, 166, 57, 157, 255, 92, 19]
    with torch.no_grad():
        oracle = _afmoe_oracle(w, tokens).numpy()
    compare(oracle, our_logits(str(tmp_path), tokens), "afmoe")


def test_glm4_moe_lite_parity_via_deepseekv3(tmp_path):
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
    hf_model = save_hf_model(cfg, tmp_path)
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = ["Glm4MoeLiteForCausalLM"]
    (tmp_path / "config.json").write_text(json.dumps(d))
    tokens = [16, 161, 261, 56, 156, 356, 84]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "glm4-moe-lite")


def test_transformers_fallback_parity(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False)
    hf_model = save_hf_model(cfg, tmp_path)
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = ["TransformersForCausalLM"]
    (tmp_path / "config.json").write_text(json.dumps(d))
    tokens = [17, 171, 271, 58, 158, 358, 85]
    compare(hf_logits(hf_model, tokens), our_logits(str(tmp_path), tokens),
            "transformers-fallback")


def test_transformers_fallback_rejects_unknown_layout(tmp_path):
    save_file({"some.exotic.block.weight": torch.zeros(4, 4)},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["TransformersForCausalLM"],
        "vocab_size": 64, "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 1, "num_attention_heads": 2,
        "num_key_value_heads": 2, "max_position_embeddings": 64}))
    from lvllm_tpu.model_loader.hf_config import load_model_config
    from lvllm_tpu.model_loader.loader import load_model
    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    with pytest.raises(ValueError, match="weight layout"):
        load_model(mc, "safetensors")


def test_jais2_config_plumbing(tmp_path):
    from lvllm_tpu.model_loader.hf_config import load_model_config
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["Jais2ForCausalLM"],
        "vocab_size": 128, "hidden_size": 64, "intermediate_size": 96,
        "num_hidden_layers": 4, "num_attention_heads": 4,
        "num_key_value_heads": 2, "layer_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 256,
        "interleaved_sliding_window": [2048, None],
        "logit_scale": 0.5, "tie_word_embeddings": False}))
    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    assert mc.norm_type == "layernorm" and not mc.mlp_gated
    assert mc.hidden_act == "relu2"
    assert mc.sliding_window == 2048
    assert mc.layer_types == ("sliding_attention", "full_attention",
                              "sliding_attention", "full_attention")
    assert mc.logits_scaling == 2.0
    assert mc.rms_norm_eps == 1e-5
