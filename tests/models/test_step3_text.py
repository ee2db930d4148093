"""Step-3 text parity vs a torch mini-oracle (reference
step3_text.py:139-270: two-stage compressed-query MQA + softmax MoE with
an always-on share expert).
"""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.models.test_hf_parity import compare, our_logits  # noqa: E402

V, H, L, NH, D, SQ = 256, 64, 2, 4, 32, 48
E, K, MI, SI, I = 4, 2, 32, 40, 96
EPS = 1e-5


def _rms(w, x):
    v = x.float()
    return (v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + EPS)) * w


def _rope(x, pos):
    half = D // 2
    inv = 1.0 / (10000.0 ** (torch.arange(half).float() / half))
    ang = pos[:, None].float() * inv[None, :]
    cos, sin = torch.cos(ang), torch.sin(ang)
    x1, x2 = x[..., :half], x[..., half:]
    return torch.cat([x1 * cos[:, None] - x2 * sin[:, None],
                      x2 * cos[:, None] + x1 * sin[:, None]], dim=-1)


def _mlp(w, p, x):
    return (F.silu(x @ w[p + "gate"].T) * (x @ w[p + "up"].T)) @ \
        w[p + "down"].T


def _oracle(w, tokens):
    T = len(tokens)
    h = w["emb"][tokens]
    pos = torch.arange(T)
    mask = torch.full((T, T), float("-inf")).triu(1)
    for li in range(L):
        lw = w[f"l{li}"]
        hn = _rms(lw["ln1"], h)
        qkv = hn @ lw["qkv"].T
        q, k, v = qkv.split([SQ, D, D], dim=-1)
        q = _rms(lw["inter"], q) @ lw["wq"].T
        q = _rope(q.view(T, NH, D), pos)
        k = _rope(k.view(T, 1, D), pos).expand(T, NH, D)
        v = v.view(T, 1, D).expand(T, NH, D)
        s = torch.einsum("qhd,khd->hqk", q, k) / math.sqrt(D) + mask
        o = torch.einsum("hqk,khd->qhd", torch.softmax(s, -1),
                         v).reshape(T, -1)
        h = h + o @ lw["o"].T
        hn = _rms(lw["ln2"], h)
        if li == 0:                     # dense layer (moe starts at 1)
            y = _mlp(lw, "mlp_", hn)
        else:
            logits = hn @ lw["router"].T
            probs = torch.softmax(logits, dim=-1)
            topw, topi = torch.topk(probs, K, dim=-1)
            topw = topw / topw.sum(-1, keepdim=True)   # norm_expert_weight
            y = torch.zeros_like(hn)
            for t in range(T):
                for j in range(K):
                    y[t] += topw[t, j] * _mlp(lw, f"e{int(topi[t, j])}_",
                                              hn[t])
            y = y + _mlp(lw, "share_", hn)
        h = h + y
    return _rms(w["norm"], h) @ w["head"].T


def test_step3_text_parity_vs_oracle(tmp_path):
    from safetensors.torch import save_file
    torch.manual_seed(43)
    rnd = lambda *s: torch.randn(*s) * 0.05  # noqa: E731
    rw = lambda n: torch.rand(n) + 0.5  # noqa: E731
    w = {"emb": rnd(V, H), "norm": rw(H), "head": rnd(V, H)}
    sd = {"model.embed_tokens.weight": w["emb"],
          "model.norm.weight": w["norm"], "lm_head.weight": w["head"]}
    for li in range(L):
        lw = {"ln1": rw(H), "ln2": rw(H), "qkv": rnd(SQ + 2 * D, H),
              "inter": rw(SQ), "wq": rnd(NH * D, SQ),
              "o": rnd(H, NH * D)}
        p = f"model.layers.{li}."
        sd[p + "input_layernorm.weight"] = lw["ln1"]
        sd[p + "post_attention_layernorm.weight"] = lw["ln2"]
        sd[p + "self_attn.qkv_proj.weight"] = lw["qkv"]
        sd[p + "self_attn.inter_norm.weight"] = lw["inter"]
        sd[p + "self_attn.wq.weight"] = lw["wq"]
        sd[p + "self_attn.o_proj.weight"] = lw["o"]
        if li == 0:
            for which, shape in (("gate", (I, H)), ("up", (I, H)),
                                 ("down", (H, I))):
                lw[f"mlp_{which}"] = rnd(*shape)
                sd[p + f"mlp.{which}_proj.weight"] = lw[f"mlp_{which}"]
        else:
            lw["router"] = rnd(E, H)
            sd[p + "moe.gate.weight"] = lw["router"]
            for which, shape in (("gate", (SI, H)), ("up", (SI, H)),
                                 ("down", (H, SI))):
                lw[f"share_{which}"] = rnd(*shape)
                sd[p + f"share_expert.{which}_proj.weight"] = \
                    lw[f"share_{which}"]
            for e in range(E):
                for which, shape in (("gate", (MI, H)), ("up", (MI, H)),
                                     ("down", (H, MI))):
                    lw[f"e{e}_{which}"] = rnd(*shape)
                    sd[p + f"moe.experts.{e}.{which}_proj.weight"] = \
                        lw[f"e{e}_{which}"]
        w[f"l{li}"] = lw
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["Step3TextForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": NH,
        "head_dim": D, "share_q_dim": SQ,
        "moe_num_experts": E, "moe_top_k": K,
        "moe_intermediate_size": MI, "share_expert_dim": SI,
        "norm_expert_weight": True,
        "rms_norm_eps": EPS, "rope_theta": 10000.0,
        "max_position_embedding": 256,
        "tie_word_embeddings": False}))
    tokens = [7, 77, 177, 66, 167, 253, 95, 22]
    with torch.no_grad():
        oracle = _oracle(w, tokens).numpy()
    compare(oracle, our_logits(str(tmp_path), tokens), "step3-text")
