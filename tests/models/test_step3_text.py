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


def test_step3_vl_tower_parity_and_engine(tmp_path):
    """Step3-VL tower vs a torch replica of the reference semantics
    (post-norm blocks, CLS-pad rows, conv downsamplers; reference
    step3_vl.py:237-423, :592-610) + engine MM smoke."""
    import numpy as np
    W, LY, NH, VI, VO = 32, 2, 2, 64, 16
    IMG, PATCH = 28, 14                 # grid 2x2 (pos 5 rows, matched)
    TH = 64
    torch.manual_seed(51)
    rnd = lambda *s: torch.randn(*s) * 0.05  # noqa: E731
    rw = lambda n: torch.rand(n) + 0.5  # noqa: E731
    sd = {}
    w = {"cls": rnd(1, W), "patch_w": rnd(W, 3, PATCH, PATCH),
         "patch_b": rnd(W), "pos": rnd(5, W),
         "d1w": rnd(VO, W, 2, 2), "d1b": rnd(VO),
         "d2w": rnd(2 * VO, VO, 3, 3), "d2b": rnd(2 * VO),
         "pw": rnd(TH, 2 * VO), "pb": rnd(TH), "layers": []}
    sd["vision_model.embeddings.class_embedding"] = w["cls"]
    sd["vision_model.embeddings.patch_embedding.weight"] = w["patch_w"]
    sd["vision_model.embeddings.patch_embedding.bias"] = w["patch_b"]
    sd["vision_model.embeddings.position_embedding.weight"] = w["pos"]
    sd["vit_downsampler.weight"] = w["d1w"]
    sd["vit_downsampler.bias"] = w["d1b"]
    sd["vit_downsampler2.weight"] = w["d2w"]
    sd["vit_downsampler2.bias"] = w["d2b"]
    sd["vit_large_projector.weight"] = w["pw"]
    sd["vit_large_projector.bias"] = w["pb"]
    for li in range(LY):
        lw = {"qkv_w": rnd(3 * W, W), "qkv_b": rnd(3 * W),
              "o_w": rnd(W, W), "o_b": rnd(W),
              "f1w": rnd(VI, W), "f1b": rnd(VI),
              "f2w": rnd(W, VI), "f2b": rnd(W),
              "n1w": rw(W), "n1b": rnd(W), "n2w": rw(W), "n2b": rnd(W)}
        w["layers"].append(lw)
        p = f"vision_model.transformer.layers.{li}."
        sd[p + "self_attn.qkv_proj.weight"] = lw["qkv_w"]
        sd[p + "self_attn.qkv_proj.bias"] = lw["qkv_b"]
        sd[p + "self_attn.out_proj.weight"] = lw["o_w"]
        sd[p + "self_attn.out_proj.bias"] = lw["o_b"]
        sd[p + "mlp.fc1.weight"] = lw["f1w"]
        sd[p + "mlp.fc1.bias"] = lw["f1b"]
        sd[p + "mlp.fc2.weight"] = lw["f2w"]
        sd[p + "mlp.fc2.bias"] = lw["f2b"]
        sd[p + "layer_norm1.weight"] = lw["n1w"]
        sd[p + "layer_norm1.bias"] = lw["n1b"]
        sd[p + "layer_norm2.weight"] = lw["n2w"]
        sd[p + "layer_norm2.bias"] = lw["n2b"]
    # Minimal Step3 text (oracle-verified by the test above).
    SQ, D = 48, 32
    sd["model.embed_tokens.weight"] = rnd(V, TH)
    sd["model.norm.weight"] = rw(TH)
    sd["lm_head.weight"] = rnd(V, TH)
    p = "model.layers.0."
    sd[p + "input_layernorm.weight"] = rw(TH)
    sd[p + "post_attention_layernorm.weight"] = rw(TH)
    sd[p + "self_attn.qkv_proj.weight"] = rnd(SQ + 2 * D, TH)
    sd[p + "self_attn.inter_norm.weight"] = rw(SQ)
    sd[p + "self_attn.wq.weight"] = rnd(NH * D, SQ)
    sd[p + "self_attn.o_proj.weight"] = rnd(TH, NH * D)
    for which, shape in (("gate", (I, TH)), ("up", (I, TH)),
                         ("down", (TH, I))):
        sd[p + f"mlp.{which}_proj.weight"] = rnd(*shape)
    from safetensors.torch import save_file
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["Step3VLForConditionalGeneration"],
        "image_token_id": 200,
        "understand_projector_stride": 1,
        "projector_bias": True,
        "vision_config": {"hidden_size": W, "intermediate_size": VI,
                          "num_hidden_layers": LY,
                          "num_attention_heads": NH,
                          "output_hidden_size": VO,
                          "image_size": IMG, "patch_size": PATCH,
                          "hidden_act": "quick_gelu"},
        "text_config": {"vocab_size": V, "hidden_size": TH,
                        "intermediate_size": I, "num_hidden_layers": 1,
                        "num_attention_heads": NH, "head_dim": D,
                        "share_q_dim": SQ, "moe_num_experts": 0,
                        "rms_norm_eps": EPS, "rope_theta": 10000.0,
                        "max_position_embedding": 256,
                        "tie_word_embeddings": False}}))

    import jax.numpy as jnp
    from lvllm_tpu.model_loader.hf_config import load_model_config
    from lvllm_tpu.model_loader.loader import load_model
    mc = load_model_config(str(tmp_path), max_model_len=64,
                           dtype="float32")
    assert mc.architecture == "Step3VLForConditionalGeneration"
    model, params = load_model(mc, "safetensors")
    rng = np.random.default_rng(16)
    pix = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32)
    ours = np.asarray(model.encode_images(params, jnp.asarray(pix)))

    # torch oracle
    def qg(x):
        return x * torch.sigmoid(1.702 * x)
    with torch.no_grad():
        xt = torch.conv2d(torch.tensor(pix), w["patch_w"],
                          bias=w["patch_b"], stride=PATCH)
        B = 1
        xt = xt.reshape(B, W, -1).permute(0, 2, 1)
        xt = torch.cat([w["cls"].expand(B, 1, W), xt], dim=1)
        xt = xt + w["pos"][None]
        xt = torch.cat([xt[:, :1].expand(B, 3, W), xt], dim=1)
        T = xt.shape[1]
        Hd = W // NH
        for lw in w["layers"]:
            qkv = xt @ lw["qkv_w"].T + lw["qkv_b"]
            q, k, v = qkv.split(W, dim=-1)
            q = q.view(B, T, NH, Hd)
            k = k.view(B, T, NH, Hd)
            v = v.view(B, T, NH, Hd)
            s = torch.einsum("bthd,bshd->bhts", q, k) / (Hd ** 0.5)
            o = torch.einsum("bhts,bshd->bthd",
                             torch.softmax(s, -1), v).reshape(B, T, W)
            o = o @ lw["o_w"].T + lw["o_b"]
            xt = xt + torch.nn.functional.layer_norm(
                o, (W,), lw["n1w"], lw["n1b"], 1e-5)
            m = qg(xt @ lw["f1w"].T + lw["f1b"]) @ lw["f2w"].T + lw["f2b"]
            xt = xt + torch.nn.functional.layer_norm(
                m, (W,), lw["n2w"], lw["n2b"], 1e-5)
        feats = xt[:, 4:]
        HW = 2
        grid = feats.permute(0, 2, 1).view(B, W, HW, HW)
        grid = torch.conv2d(grid, w["d1w"], bias=w["d1b"], stride=1)
        grid = torch.conv2d(grid, w["d2w"], bias=w["d2b"], stride=2,
                            padding=1)
        n_dim = grid.size(1)
        ref = (grid.view(B, n_dim, -1).permute(0, 2, 1) @ w["pw"].T +
               w["pb"]).numpy()
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)
