"""GGUF checkpoint loader (llama.cpp format).

Counterpart of the reference's gguf loader
(``model_executor/model_loader/gguf_loader.py`` + gguf-quant kernels):
parses the GGUF v3 container, dequantizes the common ggml block formats
host-side (F32/F16/BF16/Q8_0/Q4_0/Q4_1), maps llama.cpp tensor names to
HF names for the unified loader, and can synthesize a ModelConfig from
the GGUF metadata when no config.json accompanies the file.
"""

import struct
from typing import Any, BinaryIO, Dict, Iterator, List, Optional, Tuple

import numpy as np

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)

GGUF_MAGIC = 0x46554747

# ggml value types for metadata.
_VT = {0: "u8", 1: "i8", 2: "u16", 3: "i16", 4: "u32", 5: "i32",
       6: "f32", 7: "bool", 8: "string", 9: "array", 10: "u64",
       11: "i64", 12: "f64"}
_SCALAR_FMT = {"u8": "<B", "i8": "<b", "u16": "<H", "i16": "<h",
               "u32": "<I", "i32": "<i", "f32": "<f", "u64": "<Q",
               "i64": "<q", "f64": "<d", "bool": "<?"}

# ggml tensor dtypes.
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q8_0 = 8
GGML_BF16 = 30


def _read_str(f: BinaryIO) -> str:
    n, = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8")


def _read_value(f: BinaryIO, vtype: int) -> Any:
    kind = _VT[vtype]
    if kind == "string":
        return _read_str(f)
    if kind == "array":
        etype, = struct.unpack("<I", f.read(4))
        n, = struct.unpack("<Q", f.read(8))
        return [_read_value(f, etype) for _ in range(n)]
    fmt = _SCALAR_FMT[kind]
    return struct.unpack(fmt, f.read(struct.calcsize(fmt)))[0]


def _dequant(raw: bytes, ggml_type: int, n_elems: int) -> np.ndarray:
    if ggml_type == GGML_F32:
        return np.frombuffer(raw, "<f4", n_elems).astype(np.float32)
    if ggml_type == GGML_F16:
        return np.frombuffer(raw, "<f2", n_elems).astype(np.float32)
    if ggml_type == GGML_BF16:
        import ml_dtypes
        return np.frombuffer(raw, ml_dtypes.bfloat16,
                             n_elems).astype(np.float32)
    if ggml_type == GGML_Q8_0:
        # Blocks of 32: f16 scale + 32 int8.
        nb = n_elems // 32
        rec = np.frombuffer(raw, dtype=np.dtype(
            [("d", "<f2"), ("q", "i1", 32)]), count=nb)
        return (rec["d"].astype(np.float32)[:, None] *
                rec["q"].astype(np.float32)).reshape(-1)
    if ggml_type == GGML_Q4_0:
        # Blocks of 32: f16 scale + 16 packed nibbles; v = (q - 8) * d.
        nb = n_elems // 32
        rec = np.frombuffer(raw, dtype=np.dtype(
            [("d", "<f2"), ("q", "u1", 16)]), count=nb)
        lo = (rec["q"] & 0x0F).astype(np.float32) - 8.0
        hi = ((rec["q"] >> 4) & 0x0F).astype(np.float32) - 8.0
        q = np.concatenate([lo, hi], axis=1)        # llama.cpp layout
        return (rec["d"].astype(np.float32)[:, None] * q).reshape(-1)
    if ggml_type == GGML_Q4_1:
        # Blocks of 32: f16 d + f16 m + 16 packed nibbles; v = q*d + m.
        nb = n_elems // 32
        rec = np.frombuffer(raw, dtype=np.dtype(
            [("d", "<f2"), ("m", "<f2"), ("q", "u1", 16)]), count=nb)
        lo = (rec["q"] & 0x0F).astype(np.float32)
        hi = ((rec["q"] >> 4) & 0x0F).astype(np.float32)
        q = np.concatenate([lo, hi], axis=1)
        return (rec["d"].astype(np.float32)[:, None] * q +
                rec["m"].astype(np.float32)[:, None]).reshape(-1)
    raise NotImplementedError(f"ggml tensor type {ggml_type} unsupported "
                              "(supported: F32/F16/BF16/Q8_0/Q4_0/Q4_1)")


_TYPE_BLOCK_BYTES = {GGML_F32: (1, 4), GGML_F16: (1, 2), GGML_BF16: (1, 2),
                     GGML_Q8_0: (32, 34), GGML_Q4_0: (32, 18),
                     GGML_Q4_1: (32, 20)}


def read_gguf(path: str) -> Tuple[Dict[str, Any],
                                  List[Tuple[str, List[int], int, int]],
                                  int]:
    """Parse header: returns (metadata, [(name, dims, ggml_type, offset)],
    data_start)."""
    with open(path, "rb") as f:
        magic, version = struct.unpack("<II", f.read(8))
        if magic != GGUF_MAGIC:
            raise ValueError(f"{path}: not a GGUF file")
        if version < 2:
            raise ValueError(f"GGUF v{version} unsupported (need >= 2)")
        n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
        meta: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = _read_str(f)
            vtype, = struct.unpack("<I", f.read(4))
            meta[key] = _read_value(f, vtype)
        infos = []
        for _ in range(n_tensors):
            name = _read_str(f)
            nd, = struct.unpack("<I", f.read(4))
            dims = list(struct.unpack(f"<{nd}Q", f.read(8 * nd)))
            ttype, offset = struct.unpack("<IQ", f.read(12))
            infos.append((name, dims, ttype, offset))
        align = int(meta.get("general.alignment", 32))
        pos = f.tell()
        data_start = (pos + align - 1) // align * align
    return meta, infos, data_start


# llama.cpp → HF tensor names (llama-family; reference: gguf_loader.py).
_NAME_MAP = {
    "token_embd.weight": "model.embed_tokens.weight",
    "output_norm.weight": "model.norm.weight",
    "output.weight": "lm_head.weight",
}
_BLK_MAP = {
    "attn_q": "self_attn.q_proj", "attn_k": "self_attn.k_proj",
    "attn_v": "self_attn.v_proj", "attn_output": "self_attn.o_proj",
    "ffn_gate": "mlp.gate_proj", "ffn_up": "mlp.up_proj",
    "ffn_down": "mlp.down_proj",
    "attn_norm": "input_layernorm",
    "ffn_norm": "post_attention_layernorm",
    "attn_q_norm": "self_attn.q_norm", "attn_k_norm": "self_attn.k_norm",
}


def _map_name(gname: str) -> Optional[str]:
    if gname in _NAME_MAP:
        return _NAME_MAP[gname]
    if gname.startswith("blk."):
        _, idx, rest = gname.split(".", 2)
        leaf, kind = rest.rsplit(".", 1)
        hf = _BLK_MAP.get(leaf)
        if hf is None:
            return None
        return f"model.layers.{idx}.{hf}.{kind}"
    return None


def gguf_weight_iterator(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (hf_name, float32 array) pairs from a GGUF file."""
    meta, infos, data_start = read_gguf(path)
    with open(path, "rb") as f:
        for name, dims, ttype, offset in infos:
            hf_name = _map_name(name)
            if hf_name is None:
                logger.warning("gguf tensor %s has no HF mapping; skipped",
                               name)
                continue
            n = int(np.prod(dims))
            block, bbytes = _TYPE_BLOCK_BYTES.get(ttype, (None, None))
            if block is None:
                raise NotImplementedError(
                    f"{name}: ggml type {ttype} unsupported")
            nbytes = n // block * bbytes
            f.seek(data_start + offset)
            vals = _dequant(f.read(nbytes), ttype, n)
            # ggml dims are innermost-first: numpy shape is reversed.
            arr = vals.reshape(tuple(reversed(dims)))
            yield hf_name, arr


def config_from_gguf(path: str, dtype: str = "bfloat16",
                     max_model_len: Optional[int] = None):
    """Synthesize a ModelConfig from GGUF metadata (llama arch keys)."""
    from lvllm_tpu.config import ModelConfig

    meta, infos, _ = read_gguf(path)
    arch = meta.get("general.architecture", "llama")
    if arch not in ("llama", "qwen2", "mistral"):
        raise NotImplementedError(f"gguf arch {arch} unsupported")

    def k(name, default=None):
        return meta.get(f"{arch}.{name}", default)

    heads = int(k("attention.head_count"))
    kv_heads = int(k("attention.head_count_kv", heads))
    hidden = int(k("embedding_length"))
    vocab = meta.get("llama.vocab_size") or meta.get(
        f"{arch}.vocab_size")
    if vocab is None:
        emb = next(i for i in infos if i[0] == "token_embd.weight")
        vocab = emb[1][1]     # dims innermost-first: [hidden, vocab]
    mc = ModelConfig(
        model=path,
        architecture=("Qwen2ForCausalLM" if arch == "qwen2"
                      else "LlamaForCausalLM"),
        dtype=dtype,
        vocab_size=int(vocab),
        hidden_size=hidden,
        intermediate_size=int(k("feed_forward_length")),
        num_hidden_layers=int(k("block_count")),
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        head_dim=hidden // heads,
        rms_norm_eps=float(k("attention.layer_norm_rms_epsilon", 1e-5)),
        rope_theta=float(k("rope.freq_base", 10000.0)),
        max_position_embeddings=int(k("context_length", 4096)),
        attention_bias=arch == "qwen2",
        qk_norm=False,    # llama/qwen2/mistral (ModelConfig default True)
        tie_word_embeddings=not any(i[0] == "output.weight"
                                    for i in infos),
        eos_token_id=int(meta.get("tokenizer.ggml.eos_token_id", 2)),
        bos_token_id=int(meta.get("tokenizer.ggml.bos_token_id", 1)),
    )
    if max_model_len is not None:
        mc.max_model_len = min(max_model_len, mc.max_position_embeddings)
    return mc
