"""Original Qwen-VL tower + Resampler2 parity vs a torch oracle
mirroring the reference semantics (vllm models/qwen_vl.py:330,
layers/resampler.py:156-283), plus the full-loader logits path on the
Qwen-1 text stack.
"""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.hf_config import load_model_config  # noqa: E402
from lvllm_tpu.model_loader.loader import load_model  # noqa: E402
from lvllm_tpu.models.minicpmv import sincos_2d_pos_embed  # noqa: E402

W, LAYERS, HEADS, MLP = 32, 2, 2, 64
D, NQ = 32, 4               # output_dim, n_queries (grid 2x2)
PATCH, IMG_SIZE = 14, 28    # grid 2x2 = 4 patches
START_ID = 100              # image_pad_id = 102


def _ln(x, w, b):
    return F.layer_norm(x.float(), (x.shape[-1],), w, b, 1e-6)


def _tower_oracle(sd, pix):
    x = torch.conv2d(pix, sd["conv1.weight"], stride=PATCH)
    B = x.shape[0]
    x = x.reshape(B, W, -1).permute(0, 2, 1)       # [B, N, W]
    x = x + sd["positional_embedding"][None]
    x = _ln(x, sd["ln_pre.weight"], sd["ln_pre.bias"])
    Hd = W // HEADS
    for i in range(LAYERS):
        p = f"transformer.resblocks.{i}."
        hn = _ln(x, sd[p + "ln_1.weight"], sd[p + "ln_1.bias"])
        qkv = hn @ sd[p + "attn.in_proj.weight"].T + \
            sd[p + "attn.in_proj.bias"]
        qkv = qkv.reshape(B, -1, HEADS, 3, Hd)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        s = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(Hd)
        o = torch.einsum("bhqk,bkhd->bqhd",
                         torch.softmax(s, dim=-1), v).reshape(B, -1, W)
        x = x + (o @ sd[p + "attn.out_proj.weight"].T +
                 sd[p + "attn.out_proj.bias"])
        hn = _ln(x, sd[p + "ln_2.weight"], sd[p + "ln_2.bias"])
        hn = F.gelu(hn @ sd[p + "mlp.c_fc.weight"].T +
                    sd[p + "mlp.c_fc.bias"])
        x = x + (hn @ sd[p + "mlp.c_proj.weight"].T +
                 sd[p + "mlp.c_proj.bias"])
    # Resampler2, via torch's own MultiheadAttention for independence.
    kv = x @ sd["attn_pool.kv_proj.weight"].T
    kv = _ln(kv, sd["attn_pool.ln_kv.weight"], sd["attn_pool.ln_kv.bias"])
    qn = _ln(sd["attn_pool.query"], sd["attn_pool.ln_q.weight"],
             sd["attn_pool.ln_q.bias"])
    mha = torch.nn.MultiheadAttention(D, max(D // 128, 1))
    with torch.no_grad():
        mha.in_proj_weight.copy_(sd["attn_pool.attn.in_proj_weight"])
        mha.in_proj_bias.copy_(sd["attn_pool.attn.in_proj_bias"])
        mha.out_proj.weight.copy_(sd["attn_pool.attn.out_proj.weight"])
        mha.out_proj.bias.copy_(sd["attn_pool.attn.out_proj.bias"])
    pos = sd["attn_pool.pos_embed"]
    outs = []
    for b in range(B):
        q_in = (qn + pos).unsqueeze(1)                  # [Q, 1, D]
        k_in = (kv[b] + pos).unsqueeze(1)               # [N, 1, D]
        v_in = kv[b].unsqueeze(1)
        o, _ = mha(q_in, k_in, v_in)
        outs.append(o.squeeze(1))
    o = torch.stack(outs)
    o = _ln(o, sd["ln_post.weight"], sd["ln_post.bias"])
    return o @ sd["proj"]


def _build_sd():
    torch.manual_seed(23)
    rnd = lambda *s: torch.randn(*s) * 0.05  # noqa: E731
    rw = lambda n: torch.rand(n) + 0.5  # noqa: E731
    sd = {"conv1.weight": rnd(W, 3, PATCH, PATCH),
          "positional_embedding": rnd(4, W),   # grid 2x2 — no interp
          "ln_pre.weight": rw(W), "ln_pre.bias": rnd(W),
          "ln_post.weight": rw(D), "ln_post.bias": rnd(D),
          "proj": rnd(D, D)}
    for i in range(LAYERS):
        p = f"transformer.resblocks.{i}."
        sd.update({p + "ln_1.weight": rw(W), p + "ln_1.bias": rnd(W),
                   p + "ln_2.weight": rw(W), p + "ln_2.bias": rnd(W),
                   p + "attn.in_proj.weight": rnd(3 * W, W),
                   p + "attn.in_proj.bias": rnd(3 * W),
                   p + "attn.out_proj.weight": rnd(W, W),
                   p + "attn.out_proj.bias": rnd(W),
                   p + "mlp.c_fc.weight": rnd(MLP, W),
                   p + "mlp.c_fc.bias": rnd(MLP),
                   p + "mlp.c_proj.weight": rnd(W, MLP),
                   p + "mlp.c_proj.bias": rnd(W)})
    sd.update({"attn_pool.query": rnd(NQ, D),
               "attn_pool.kv_proj.weight": rnd(D, W),
               "attn_pool.attn.in_proj_weight": rnd(3 * D, D),
               "attn_pool.attn.in_proj_bias": rnd(3 * D),
               "attn_pool.attn.out_proj.weight": rnd(D, D),
               "attn_pool.attn.out_proj.bias": rnd(D),
               "attn_pool.ln_q.weight": rw(D),
               "attn_pool.ln_q.bias": rnd(D),
               "attn_pool.ln_kv.weight": rw(D),
               "attn_pool.ln_kv.bias": rnd(D),
               "attn_pool.pos_embed": torch.tensor(
                   sincos_2d_pos_embed(D, 2, 2).reshape(-1, D),
                   dtype=torch.float32)})
    return sd


def test_qwen_vl_tower_parity_and_engine(tmp_path):
    from safetensors.torch import save_file
    sd = _build_sd()
    full = {"transformer.visual." + k: v.contiguous()
            for k, v in sd.items()}
    # Minimal Qwen-1 text stack (covered by the qwen1 parity test).
    H, VOC = 32, 128
    torch.manual_seed(29)
    rnd = lambda *s: torch.randn(*s) * 0.05  # noqa: E731
    full["transformer.wte.weight"] = rnd(VOC, H).contiguous()
    full["transformer.ln_f.weight"] = (torch.rand(H) + 0.5).contiguous()
    full["lm_head.weight"] = rnd(VOC, H).contiguous()
    for i in range(1):
        p = f"transformer.h.{i}."
        full.update({k: v.contiguous() for k, v in {
            p + "ln_1.weight": torch.rand(H) + 0.5,
            p + "ln_2.weight": torch.rand(H) + 0.5,
            p + "attn.c_attn.weight": rnd(3 * H, H),
            p + "attn.c_attn.bias": rnd(3 * H),
            p + "attn.c_proj.weight": rnd(H, H),
            p + "mlp.w2.weight": rnd(64, H),
            p + "mlp.w1.weight": rnd(64, H),
            p + "mlp.c_proj.weight": rnd(H, 64)}.items()})
    save_file(full, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["QWenLMHeadModel"],
        "vocab_size": VOC, "hidden_size": H, "intermediate_size": 128,
        "num_hidden_layers": 1, "num_attention_heads": 4,
        "layer_norm_epsilon": 1e-6, "rotary_emb_base": 10000.0,
        "seq_length": 256, "tie_word_embeddings": False,
        "visual": {"width": W, "layers": LAYERS, "heads": HEADS,
                   "mlp_ratio": 2.0, "image_size": IMG_SIZE,
                   "patch_size": PATCH, "output_dim": D,
                   "n_queries": NQ, "image_start_id": START_ID}}))
    mc = load_model_config(str(tmp_path), max_model_len=128,
                           dtype="float32")
    assert mc.architecture == "QWenVLForConditionalGeneration"
    assert mc.image_token_id == START_ID + 2
    model, params = load_model(mc, "safetensors")
    rng = np.random.default_rng(9)
    pix = rng.standard_normal((2, 3, IMG_SIZE, IMG_SIZE)).astype(
        np.float32)
    with torch.no_grad():
        ref = _tower_oracle(sd, torch.tensor(pix)).float().numpy()
    ours = np.asarray(model.encode_images(params, jnp.asarray(pix)))
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)
    # Output dim must equal the text hidden (image splice contract);
    # here output_dim == hidden_size by construction.
    assert ours.shape == (2, NQ, H)
