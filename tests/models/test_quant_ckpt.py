"""AWQ/GPTQ pre-quantized checkpoint loading.

Packs tensors with the exact AutoAWQ / AutoGPTQ bit layouts (see
quant_ckpt.py docstring), then checks the decoder recovers the float
weights, and that a packed checkpoint loads end-to-end to the same logits
as its dequantized-plain twin.
"""

import json
import os

import numpy as np
import pytest

from lvllm_tpu.model_loader.quant_ckpt import (
    AWQ_ORDER, dequant_awq, dequant_gptq, detect_ckpt_quant,
    repack_quantized_stream)

G = 32  # group size for tests


def _quantize_asym(w, group):
    """float [K, N] → (q uint4, z uint4 [K/G, N], s [K/G, N])."""
    K, N = w.shape
    wg = w.reshape(K // group, group, N)
    wmin, wmax = wg.min(1), wg.max(1)
    s = np.maximum((wmax - wmin) / 15.0, 1e-8)
    z = np.clip(np.round(-wmin / s), 0, 15)
    q = np.clip(np.round(wg / s[:, None, :]) +
                z[:, None, :], 0, 15).astype(np.uint8)
    return q.reshape(K, N), z.astype(np.uint8), s.astype(np.float32)


def _pack_cols(q, order):
    """uint4 [A, B] → int32 [A, B/8], bit-field j holds col 8c+order[j]."""
    A, B = q.shape
    out = np.zeros((A, B // 8), np.uint32)
    for j, pos in enumerate(order):
        out |= q[:, pos::8].astype(np.uint32) << (4 * j)
    return out.astype(np.int32)


def pack_awq(w):
    q, z, s = _quantize_asym(w, G)
    return {"qweight": _pack_cols(q, AWQ_ORDER),
            "qzeros": _pack_cols(z, AWQ_ORDER), "scales": s}, \
        (q.astype(np.float32) -
         np.repeat(z.astype(np.float32), G, 0)) * np.repeat(s, G, 0)


def pack_gptq(w, with_g_idx=False):
    seq = (0, 1, 2, 3, 4, 5, 6, 7)
    q, z, s = _quantize_asym(w, G)
    K, N = q.shape
    qw = np.zeros((K // 8, N), np.uint32)
    for j in range(8):
        qw |= q[j::8, :].astype(np.uint32) << (4 * j)
    tensors = {"qweight": qw.astype(np.int32),
               "qzeros": _pack_cols(np.maximum(z, 1) - 1, seq), "scales": s}
    if with_g_idx:
        tensors["g_idx"] = (np.arange(K) // G).astype(np.int32)
    zeff = np.maximum(z, 1)  # qzeros stores z-1; z=0 is unrepresentable
    expect = (q.astype(np.float32) -
              np.repeat(zeff.astype(np.float32), G, 0)) * np.repeat(s, G, 0)
    return tensors, expect


def test_awq_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 16)).astype(np.float32)
    tensors, expect = pack_awq(w)
    got = dequant_awq(tensors["qweight"], tensors["qzeros"],
                      tensors["scales"])
    np.testing.assert_allclose(got, expect, atol=1e-6)
    # And the decode approximates the original weights.
    assert np.abs(got - w).max() < 0.3


def test_gptq_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 16)).astype(np.float32)
    tensors, expect = pack_gptq(w, with_g_idx=True)
    got = dequant_gptq(tensors["qweight"], tensors["qzeros"],
                       tensors["scales"], tensors["g_idx"])
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_gptq_act_order_rejected():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((64, 16)).astype(np.float32)
    tensors, _ = pack_gptq(w)
    bad_g_idx = np.arange(64)[::-1] // G
    with pytest.raises(NotImplementedError):
        dequant_gptq(tensors["qweight"], tensors["qzeros"],
                     tensors["scales"], bad_g_idx)


def test_repack_stream_grouping():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 16)).astype(np.float32)
    tensors, expect = pack_awq(w)
    stream = [("model.layers.0.self_attn.q_proj." + k, v)
              for k, v in tensors.items()]
    stream.insert(1, ("model.embed_tokens.weight", np.zeros((4, 4))))
    out = dict(repack_quantized_stream(stream, "awq"))
    assert set(out) == {"model.layers.0.self_attn.q_proj.weight",
                        "model.embed_tokens.weight"}
    # Emitted in HF Linear layout [N, K].
    np.testing.assert_allclose(
        out["model.layers.0.self_attn.q_proj.weight"], expect.T, atol=1e-6)


def test_repack_stream_incomplete_group():
    with pytest.raises(ValueError, match="incomplete"):
        list(repack_quantized_stream(
            [("x.qweight", np.zeros((8, 2), np.int32))], "awq"))


def test_detect_ckpt_quant():
    assert detect_ckpt_quant({}) is None
    assert detect_ckpt_quant(
        {"quantization_config": {"quant_method": "awq", "bits": 4,
                                 "group_size": 64}}
    ) == {"method": "awq", "bits": 4, "group_size": 64}
    assert detect_ckpt_quant(
        {"quantization_config": {"quant_method": "bitsandbytes"}}) is None
    with pytest.raises(NotImplementedError):
        detect_ckpt_quant(
            {"quantization_config": {"quant_method": "gptq", "bits": 3}})


def test_awq_checkpoint_end_to_end(tmp_path):
    """A packed AWQ checkpoint loads to the same logits as its
    dequantized-plain twin."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from lvllm_tpu.model_loader.hf_config import load_model_config
    from lvllm_tpu.model_loader.loader import load_model
    from lvllm_tpu.models.model_base import AttentionMetadata
    from lvllm_tpu.ops.kv_cache import new_kv_cache

    hf_cfg = {
        "architectures": ["Qwen2ForCausalLM"],
        "vocab_size": 64, "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 1, "num_attention_heads": 2,
        "num_key_value_heads": 2, "head_dim": 16, "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0, "max_position_embeddings": 128,
        "tie_word_embeddings": False, "eos_token_id": 2,
    }
    rng = np.random.default_rng(7)
    D, I, V, HD = 32, 64, 64, 16

    def lin(n, k):
        return (rng.standard_normal((n, k)) * 0.05).astype(np.float32)

    plain = {
        "model.embed_tokens.weight": lin(V, D),
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": lin(V, D),
        "model.layers.0.input_layernorm.weight": np.ones(D, np.float32),
        "model.layers.0.post_attention_layernorm.weight":
            np.ones(D, np.float32),
        "model.layers.0.self_attn.q_proj.bias": np.zeros(2 * HD, np.float32),
        "model.layers.0.self_attn.k_proj.bias": np.zeros(2 * HD, np.float32),
        "model.layers.0.self_attn.v_proj.bias": np.zeros(2 * HD, np.float32),
    }
    packed = dict(plain)
    quant_prefixes = {
        "model.layers.0.self_attn.q_proj": 2 * HD,
        "model.layers.0.self_attn.k_proj": 2 * HD,
        "model.layers.0.self_attn.v_proj": 2 * HD,
        "model.layers.0.self_attn.o_proj": D,
        "model.layers.0.mlp.gate_proj": I,
        "model.layers.0.mlp.up_proj": I,
        "model.layers.0.mlp.down_proj": D,
    }
    for prefix, n_out in quant_prefixes.items():
        k_in = D if "down_proj" not in prefix else I
        w = (rng.standard_normal((k_in, n_out)) * 0.05).astype(np.float32)
        tensors, expect = pack_awq(w)          # [K, N]
        # ascontiguousarray: safetensors writes the raw buffer; a
        # transpose view would save untransposed data.
        plain[prefix + ".weight"] = np.ascontiguousarray(expect.T,
                                                         dtype=np.float32)
        for tname, t in tensors.items():
            packed[prefix + "." + tname] = t

    def write_ckpt(d, tensors, quantized):
        os.makedirs(d)
        cfg = dict(hf_cfg)
        if quantized:
            cfg["quantization_config"] = {
                "quant_method": "awq", "bits": 4, "group_size": G}
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(cfg, f)
        save_file(tensors, os.path.join(d, "model.safetensors"))

    write_ckpt(str(tmp_path / "plain"), plain, False)
    write_ckpt(str(tmp_path / "awq"), packed, True)

    def logits_of(path):
        mc = load_model_config(path, max_model_len=64)
        model, params = load_model(mc)
        kv = [new_kv_cache(4, 16, mc.num_key_value_heads, mc.head_dim,
                           jnp.bfloat16)]
        ids = jnp.arange(8, dtype=jnp.int32) % mc.vocab_size
        md = AttentionMetadata(
            query_start_loc=jnp.asarray([0, 8], jnp.int32),
            seq_lens=jnp.asarray([8], jnp.int32),
            block_table=jnp.asarray([[1, 2]], jnp.int32),
            slot_mapping=(16 + jnp.arange(8)).astype(jnp.int32))
        h, _ = model(params, ids, jnp.arange(8, dtype=jnp.int32), kv, md)
        return np.asarray(model.compute_logits(params, h), np.float32)

    np.testing.assert_allclose(logits_of(str(tmp_path / "plain")),
                               logits_of(str(tmp_path / "awq")),
                               atol=1e-2)
