"""MiniMax-M2 parity vs a self-contained numpy oracle.

transformers in this image (4.57.x) has no MiniMaxM2 implementation, so the
golden reference here is a from-scratch numpy forward implementing the
architecture as described by the reference model
(``vllm/model_executor/models/minimax_m2.py``): full-vector q/k RMS-norm
across all heads (MiniMaxText01RMSNormTP.forward_qk), partial neox rotary
(rotary_dim < head_dim), sigmoid router with e_score selection bias and
renormalized top-k, experts sized by the dense intermediate_size.

The checkpoint is saved with real MiniMax tensor names and loaded through
our full loader, exercising the name mapping end to end.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from lvllm_tpu.model_loader.hf_config import load_model_config
from lvllm_tpu.model_loader.loader import load_model

V, H, I, L, HQ, HKV, D, RD, E, K = 512, 64, 96, 2, 4, 2, 16, 8, 8, 2


def _make_checkpoint(tmpdir):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(7)
    t = {}

    def w(name, shape, scale=0.05):
        t[name] = rng.standard_normal(shape).astype(np.float32) * scale

    w("model.embed_tokens.weight", (V, H))
    w("lm_head.weight", (V, H))
    t["model.norm.weight"] = 1.0 + 0.1 * rng.standard_normal(H).astype(
        np.float32)
    for i in range(L):
        p = f"model.layers.{i}."
        for n in ("input_layernorm", "post_attention_layernorm"):
            t[p + n + ".weight"] = 1.0 + 0.1 * rng.standard_normal(
                H).astype(np.float32)
        w(p + "self_attn.q_proj.weight", (HQ * D, H))
        w(p + "self_attn.k_proj.weight", (HKV * D, H))
        w(p + "self_attn.v_proj.weight", (HKV * D, H))
        w(p + "self_attn.o_proj.weight", (H, HQ * D))
        t[p + "self_attn.q_norm.weight"] = 1.0 + 0.1 * rng.standard_normal(
            HQ * D).astype(np.float32)
        t[p + "self_attn.k_norm.weight"] = 1.0 + 0.1 * rng.standard_normal(
            HKV * D).astype(np.float32)
        w(p + "mlp.gate.weight", (E, H))
        t[p + "mlp.e_score_correction_bias"] = 0.2 * rng.standard_normal(
            E).astype(np.float32)
        for e in range(E):
            w(p + f"mlp.experts.{e}.w1.weight", (I, H))   # gate
            w(p + f"mlp.experts.{e}.w3.weight", (I, H))   # up
            w(p + f"mlp.experts.{e}.w2.weight", (H, I))   # down
    save_file(t, str(tmpdir / "model.safetensors"))
    cfg = {
        "architectures": ["MiniMaxM2ForCausalLM"],
        "vocab_size": V, "hidden_size": H, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": HQ,
        "num_key_value_heads": HKV, "head_dim": D, "rotary_dim": RD,
        "num_local_experts": E, "num_experts_per_tok": K,
        "scoring_func": "sigmoid", "use_routing_bias": True,
        "use_qk_norm": True, "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0, "max_position_embeddings": 256,
        "tie_word_embeddings": False, "attention_bias": False,
    }
    (tmpdir / "config.json").write_text(json.dumps(cfg))
    return t


def _rms(x, weight, eps=1e-6):
    var = np.mean(x * x, axis=-1, keepdims=True)
    return x / np.sqrt(var + eps) * weight


def _oracle_logits(t, tokens):
    T = len(tokens)
    x = t["model.embed_tokens.weight"][tokens]
    inv = 10000.0 ** (-np.arange(0, RD, 2, dtype=np.float64) / RD)
    ang = np.arange(T)[:, None] * inv[None, :]
    cos, sin = np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)

    def rope(v):  # [T, Hh, D] neox-style over first RD dims
        x1, x2 = v[..., : RD // 2], v[..., RD // 2: RD]
        o1 = x1 * cos[:, None] - x2 * sin[:, None]
        o2 = x2 * cos[:, None] + x1 * sin[:, None]
        return np.concatenate([o1, o2, v[..., RD:]], axis=-1)

    for i in range(L):
        p = f"model.layers.{i}."
        h = _rms(x, t[p + "input_layernorm.weight"])
        q = h @ t[p + "self_attn.q_proj.weight"].T
        k = h @ t[p + "self_attn.k_proj.weight"].T
        v = h @ t[p + "self_attn.v_proj.weight"].T
        # Full-vector qk-norm: one RMS statistic per token across all heads.
        q = _rms(q, t[p + "self_attn.q_norm.weight"]).reshape(T, HQ, D)
        k = _rms(k, t[p + "self_attn.k_norm.weight"]).reshape(T, HKV, D)
        v = v.reshape(T, HKV, D)
        q, k = rope(q), rope(k)
        rep = HQ // HKV
        kf = np.repeat(k, rep, axis=1)
        vf = np.repeat(v, rep, axis=1)
        logits = np.einsum("thd,shd->hts", q, kf) * D ** -0.5
        mask = np.tril(np.ones((T, T), bool))
        logits = np.where(mask[None], logits, -np.inf)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        attn = np.einsum("hts,shd->thd", w, vf).reshape(T, HQ * D)
        x = x + attn @ t[p + "self_attn.o_proj.weight"].T

        h = _rms(x, t[p + "post_attention_layernorm.weight"])
        rl = h @ t[p + "mlp.gate.weight"].T
        scores = 1.0 / (1.0 + np.exp(-rl))
        select = scores + t[p + "mlp.e_score_correction_bias"]
        ids = np.argsort(-select, axis=-1)[:, :K]
        tw = np.take_along_axis(scores, ids, axis=-1)
        tw = tw / tw.sum(-1, keepdims=True)
        out = np.zeros_like(h)
        for tok in range(T):
            for j in range(K):
                e = ids[tok, j]
                g = h[tok] @ t[p + f"mlp.experts.{e}.w1.weight"].T
                u = h[tok] @ t[p + f"mlp.experts.{e}.w3.weight"].T
                act = g / (1.0 + np.exp(-g)) * u
                out[tok] += tw[tok, j] * (
                    act @ t[p + f"mlp.experts.{e}.w2.weight"].T)
        x = x + out
    x = _rms(x, t["model.norm.weight"])
    return x @ t["lm_head.weight"].T


def test_minimax_m2_parity(tmp_path):
    tensors = _make_checkpoint(tmp_path)
    tokens = [3, 17, 240, 8, 99, 301, 55, 7]

    mc = load_model_config(str(tmp_path), max_model_len=128, dtype="float32")
    assert mc.qk_norm_across_heads
    assert mc.moe_intermediate_size == I
    assert abs(mc.partial_rotary_factor - RD / D) < 1e-9
    assert mc.router_scoring_fn == "sigmoid"
    model, params = load_model(mc, "safetensors")
    # e_score bias must have been picked up from the MoE module.
    assert "e_score_bias" in params["layers"][0]["moe"]

    from tests.models.test_qwen3 import run_tokens
    hidden = run_tokens(model, params, [tokens], block_size=8, num_blocks=64)
    ours = np.asarray(model.compute_logits(params, jnp.asarray(hidden)))

    ref = _oracle_logits(tensors, tokens)

    def lsm(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    np.testing.assert_allclose(lsm(ours), lsm(ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(ours.argmax(-1), ref.argmax(-1))


def test_minimax_m2_chunked_matches_full(tmp_path):
    _make_checkpoint(tmp_path)
    mc = load_model_config(str(tmp_path), max_model_len=128, dtype="float32")
    model, params = load_model(mc, "safetensors")
    from tests.models.test_qwen3 import run_tokens
    tokens = [3, 17, 240, 8, 99, 301, 55, 7, 12, 450, 2, 31]
    full = run_tokens(model, params, [tokens], block_size=8, num_blocks=64)
    chunked = run_tokens(model, params, [tokens[:5], tokens[5:]],
                         block_size=8, num_blocks=64)
    np.testing.assert_allclose(chunked, full, rtol=2e-4, atol=2e-4)
