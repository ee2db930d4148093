"""GGUF and sharded-state loader tests (reference: gguf_loader.py,
sharded_state_loader.py). A tiny GGUF file is WRITTEN here (self-contained
writer mirroring the v3 spec) and loaded through the full pipeline."""

import struct

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lvllm_tpu.model_loader.gguf import (config_from_gguf,
                                         gguf_weight_iterator)
from lvllm_tpu.model_loader.hf_config import load_model_config
from lvllm_tpu.model_loader.loader import load_model
from tests.models.test_qwen3 import run_tokens


# ---- minimal GGUF v3 writer --------------------------------------------------

def _w_str(f, s):
    b = s.encode()
    f.write(struct.pack("<Q", len(b)))
    f.write(b)


def _w_kv(f, key, kind, value):
    _w_str(f, key)
    types = {"u32": 4, "f32": 6, "string": 8, "bool": 7}
    f.write(struct.pack("<I", types[kind]))
    if kind == "u32":
        f.write(struct.pack("<I", value))
    elif kind == "f32":
        f.write(struct.pack("<f", value))
    elif kind == "bool":
        f.write(struct.pack("<?", value))
    else:
        _w_str(f, value)


def _quant_q8_0(a: np.ndarray) -> bytes:
    flat = a.reshape(-1, 32).astype(np.float32)
    d = np.abs(flat).max(axis=1) / 127.0
    q = np.clip(np.round(flat / np.maximum(d, 1e-12)[:, None]),
                -127, 127).astype(np.int8)
    out = bytearray()
    for i in range(flat.shape[0]):
        out += struct.pack("<e", d[i]) + q[i].tobytes()
    return bytes(out)


def write_gguf(path, meta_u32, tensors, quant=None):
    """tensors: {gguf_name: np.ndarray (HF [out, in] layout)}."""
    quant = quant or {}
    with open(path, "wb") as f:
        f.write(struct.pack("<II", 0x46554747, 3))
        f.write(struct.pack("<QQ", len(tensors), len(meta_u32) + 2))
        _w_kv(f, "general.architecture", "string", "llama")
        _w_kv(f, "general.alignment", "u32", 32)
        for k, v in meta_u32.items():
            if isinstance(v, float):
                _w_kv(f, k, "f32", v)
            else:
                _w_kv(f, k, "u32", v)
        blobs = []
        offset = 0
        for name, arr in tensors.items():
            _w_str(f, name)
            dims = list(reversed(arr.shape))    # ggml: innermost first
            f.write(struct.pack("<I", len(dims)))
            f.write(struct.pack(f"<{len(dims)}Q", *dims))
            if name in quant:
                ttype, blob = 8, _quant_q8_0(arr)       # Q8_0
            else:
                ttype, blob = 0, arr.astype("<f4").tobytes()
            f.write(struct.pack("<IQ", ttype, offset))
            blobs.append(blob)
            offset += len(blob)
        pos = f.tell()
        f.write(b"\x00" * ((-pos) % 32))
        for b in blobs:
            f.write(b)


def _tiny_llama(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False)
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg)
    m.eval()
    m.save_pretrained(str(tmp_path / "hf"), safe_serialization=True)
    return m, cfg


def _to_gguf_tensors(hf_model):
    sd = {k: v.float().numpy() for k, v in hf_model.state_dict().items()}
    out = {"token_embd.weight": sd["model.embed_tokens.weight"],
           "output_norm.weight": sd["model.norm.weight"],
           "output.weight": sd["lm_head.weight"]}
    i = 0
    while f"model.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"model.layers.{i}."
        out.update({
            f"blk.{i}.attn_q.weight": sd[p + "self_attn.q_proj.weight"],
            f"blk.{i}.attn_k.weight": sd[p + "self_attn.k_proj.weight"],
            f"blk.{i}.attn_v.weight": sd[p + "self_attn.v_proj.weight"],
            f"blk.{i}.attn_output.weight":
                sd[p + "self_attn.o_proj.weight"],
            f"blk.{i}.ffn_gate.weight": sd[p + "mlp.gate_proj.weight"],
            f"blk.{i}.ffn_up.weight": sd[p + "mlp.up_proj.weight"],
            f"blk.{i}.ffn_down.weight": sd[p + "mlp.down_proj.weight"],
            f"blk.{i}.attn_norm.weight": sd[p + "input_layernorm.weight"],
            f"blk.{i}.ffn_norm.weight":
                sd[p + "post_attention_layernorm.weight"],
        })
        i += 1
    return out


_META = {"llama.embedding_length": 32, "llama.block_count": 2,
         "llama.attention.head_count": 4,
         "llama.attention.head_count_kv": 2,
         "llama.feed_forward_length": 64,
         "llama.context_length": 128, "llama.vocab_size": 64,
         "llama.attention.layer_norm_rms_epsilon": 1e-6,
         "llama.rope.freq_base": 10000.0}


def test_gguf_f32_matches_safetensors(tmp_path):
    hf, _ = _tiny_llama(tmp_path)
    gpath = str(tmp_path / "m.gguf")
    write_gguf(gpath, _META, _to_gguf_tensors(hf))

    mc = config_from_gguf(gpath, dtype="float32", max_model_len=64)
    assert mc.architecture == "LlamaForCausalLM"
    assert not mc.tie_word_embeddings
    model, params = load_model(mc, "gguf")

    mc2 = load_model_config(str(tmp_path / "hf"), max_model_len=64,
                            dtype="float32")
    model2, params2 = load_model(mc2, "safetensors")

    tokens = [3, 9, 27, 12, 44, 7]
    h1 = run_tokens(model, params, [tokens], block_size=8, num_blocks=32)
    h2 = run_tokens(model2, params2, [tokens], block_size=8, num_blocks=32)
    l1 = np.asarray(model.compute_logits(params, jnp.asarray(h1)))
    l2 = np.asarray(model2.compute_logits(params2, jnp.asarray(h2)))
    np.testing.assert_allclose(l1, l2, rtol=2e-4, atol=2e-4)


def test_gguf_q8_0_close_to_f32(tmp_path):
    hf, _ = _tiny_llama(tmp_path)
    tensors = _to_gguf_tensors(hf)
    quant = {n for n in tensors
             if n.endswith(("attn_q.weight", "ffn_up.weight"))}
    gpath = str(tmp_path / "q8.gguf")
    write_gguf(gpath, _META, tensors, quant=quant)
    mc = config_from_gguf(gpath, dtype="float32", max_model_len=64)
    model, params = load_model(mc, "gguf")
    # Dequantized Q8_0 weights land within quantization error.
    ref = hf.state_dict()["model.layers.0.self_attn.q_proj.weight"]
    got = np.asarray(
        params["layers"][0]["self_attn"]["q_proj"]["kernel"]).T
    np.testing.assert_allclose(got, ref.float().numpy(), atol=2e-2)


def test_sharded_state_roundtrip(tmp_path):
    from lvllm_tpu.model_loader.sharded_state import (load_sharded_state,
                                                      save_sharded_state)
    hf, _ = _tiny_llama(tmp_path)
    mc = load_model_config(str(tmp_path / "hf"), max_model_len=64,
                           dtype="bfloat16")
    model, params = load_model(mc, "safetensors")
    save_sharded_state(params, str(tmp_path / "fast"))

    restored = load_sharded_state(str(tmp_path / "fast"))
    import jax
    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(restored)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a).view(np.uint8),
                                      np.asarray(b).view(np.uint8))

    # And it boots through load_model(load_format="sharded_state").
    mc.model = str(tmp_path / "fast")
    model3, params3 = load_model(mc, "sharded_state")
    tokens = [3, 9, 27, 12]
    h1 = run_tokens(model, params, [tokens], block_size=8, num_blocks=32)
    h3 = run_tokens(model3, params3, [tokens], block_size=8, num_blocks=32)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h3))
