"""Whisper encoder-decoder (audio transcription / translation).

Counterpart of the reference's ``vllm/model_executor/models/whisper.py``
(WhisperForConditionalGeneration): a log-mel audio encoder run once per
request and a decoder whose layers add cross-attention over the encoder
states. TPU-native serving design: the encoder output's per-layer cross
K/V are projected once at request admit and parked in a persistent
device pool ``[L, 2, P, S, H, D]`` indexed by the request's batch slot;
the jitted decode step reads them through ``AttentionMetadata.cross_kv``
/ ``cross_slots`` — no re-encoding, no host round-trips. HF numerics
reference: transformers ``WhisperForConditionalGeneration``.
"""

import re
from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.model_base import AttentionMetadata
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model


def _ln(x, node, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * node["weight"]
            + node["bias"]).astype(x.dtype)


def whisper_encoder_states(ep, input_features: jax.Array,
                           num_heads: int) -> jax.Array:
    """Shared Whisper-architecture audio encoder (conv1 s1 → gelu →
    conv2 s2 → gelu → +positions → pre-LN blocks), WITHOUT the final
    layer norm — Whisper applies it directly; Qwen2-Audio pools first
    (modeling_qwen2_audio.py:436)."""
    x = input_features.astype(jnp.float32)           # [B, M, T]
    x = jax.lax.conv_general_dilated(
        x, ep["conv1"]["kernel"], window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    x = jax.nn.gelu(x + ep["conv1"]["bias"][None, :, None],
                    approximate=False)
    x = jax.lax.conv_general_dilated(
        x, ep["conv2"]["kernel"], window_strides=(2,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    x = jax.nn.gelu(x + ep["conv2"]["bias"][None, :, None],
                    approximate=False)
    h = jnp.transpose(x, (0, 2, 1))                  # [B, S, D]
    h = h + ep["pos_embed"][None, : h.shape[1]]

    B, S, D = h.shape
    Dh = D // num_heads
    scale = Dh ** -0.5
    for lp in ep["layers"]:
        res = h
        hn = _ln(h, lp["self_attn_layer_norm"])
        q = (hn @ lp["q_proj"]["kernel"] + lp["q_proj"]["bias"]) * scale
        k = hn @ lp["k_proj"]["kernel"]
        v = hn @ lp["v_proj"]["kernel"] + lp["v_proj"]["bias"]
        q = q.reshape(B, S, num_heads, Dh)
        k = k.reshape(B, S, num_heads, Dh)
        v = v.reshape(B, S, num_heads, Dh)
        s = jnp.einsum("bthd,bshd->bhts", q, k)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", p, v).reshape(B, S, D)
        h = res + (o @ lp["out_proj"]["kernel"] + lp["out_proj"]["bias"])
        res = h
        hn = _ln(h, lp["final_layer_norm"])
        hn = jax.nn.gelu(hn @ lp["fc1"]["kernel"] + lp["fc1"]["bias"],
                         approximate=False)
        h = res + (hn @ lp["fc2"]["kernel"] + lp["fc2"]["bias"])
    return h


def route_whisper_encoder_weight(encoder: dict, rest: str, w) -> bool:
    """Route one encoder-relative HF weight (``layers.N...``, ``convN``,
    ``embed_positions``, ``layer_norm``) into the params node shared by
    Whisper and Qwen2-Audio towers."""
    if m := re.match(r"layers\.(\d+)\.(.+)\.(weight|bias)", rest):
        i, name, kind = int(m.group(1)), m.group(2), m.group(3)
        name = name.replace("self_attn.", "")
        lp = encoder["layers"][i]
        if "norm" in name:
            lp.setdefault(name, {})[kind] = jnp.asarray(w, jnp.float32)
        elif kind == "weight" and w.ndim == 2:
            lp.setdefault(name, {})["kernel"] = jnp.asarray(
                np.ascontiguousarray(w.T), jnp.float32)
        else:
            lp.setdefault(name, {})[
                "kernel" if kind == "weight" else "bias"] = \
                jnp.asarray(w, jnp.float32)
    elif rest.startswith("conv"):
        which, kind = rest.split(".")
        encoder.setdefault(which, {})[
            "kernel" if kind == "weight" else "bias"] = \
            jnp.asarray(w, jnp.float32)
    elif rest == "embed_positions.weight":
        encoder["pos_embed"] = jnp.asarray(w, jnp.float32)
    elif rest.startswith("layer_norm."):
        encoder.setdefault("layer_norm", {})[rest.split(".")[-1]] = \
            jnp.asarray(w, jnp.float32)
    else:
        return False
    return True


@register_model("WhisperForConditionalGeneration")
class WhisperModel(Qwen3Model):

    is_encoder_decoder = True
    # Rides the runner's mm admit/resume hooks (audio features in mm_data);
    # the image-splice path itself stays disabled for enc-dec models.
    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        ec = config.vision_config or {}   # generic mm-encoder config slot
        self.num_mel_bins = ec.get("num_mel_bins", 80)
        self.enc_layers = ec.get("encoder_layers", 4)
        self.enc_heads = ec.get("encoder_attention_heads",
                                config.num_attention_heads)
        self.enc_ffn = ec.get("encoder_ffn_dim", config.intermediate_size)
        self.max_source_positions = ec.get("max_source_positions", 1500)

    @property
    def enc_len(self) -> int:
        return self.max_source_positions

    # ---- encoder -------------------------------------------------------------

    def encode_audio(self, params, input_features: jax.Array) -> jax.Array:
        """[B, n_mels, 2*S] log-mel → encoder states [B, S, D] (HF
        WhisperEncoder: conv1 s1 → gelu → conv2 s2 → gelu → +sinusoid
        positions → pre-LN layers → final LN)."""
        ep = params["encoder"]
        h = whisper_encoder_states(ep, input_features, self.enc_heads)
        return _ln(h, ep["layer_norm"])

    def compute_cross_kv(self, params, enc: jax.Array) -> jax.Array:
        """Encoder states [S, D] → per-layer cross K/V [L, 2, S, H, Dh]
        (projected once; the decoder never re-touches the encoder)."""
        c = self.config
        Hh, Dh = c.num_attention_heads, self.head_dim
        outs = []
        for lp in params["layers"]:
            cp = lp["cross_attn"]
            k = (enc @ cp["k_proj"]["kernel"]).reshape(-1, Hh, Dh)
            v = (enc @ cp["v_proj"]["kernel"] +
                 cp["v_proj"]["bias"]).reshape(-1, Hh, Dh)
            outs.append(jnp.stack([k, v]))
        return jnp.stack(outs).astype(self.dtype)    # [L, 2, S, H, Dh]

    # ---- decoder layer ---------------------------------------------------------

    def _cross_attention(self, cp, x, md: AttentionMetadata,
                         layer_idx: int) -> jax.Array:
        c = self.config
        T = x.shape[0]
        Hh, Dh = c.num_attention_heads, self.head_dim
        q = (x @ cp["q_proj"]["kernel"] + cp["q_proj"]["bias"])
        q = q.reshape(T, Hh, Dh).astype(jnp.float32) * (Dh ** -0.5)
        k_pool = md.cross_kv[layer_idx, 0]           # [P, S, H, Dh]
        v_pool = md.cross_kv[layer_idx, 1]
        R = md.seq_lens.shape[0]
        row = jnp.clip(
            jnp.searchsorted(md.query_start_loc, jnp.arange(T),
                             side="right") - 1, 0, R - 1)
        slot = md.cross_slots[row]                   # [T]
        # Per-head gather bounds the [T, S, Dh] transient (full [T, S, H,
        # Dh] would be GBs at prefill widths).
        outs = []
        for h in range(Hh):
            k_t = k_pool[:, :, h][slot].astype(jnp.float32)   # [T, S, Dh]
            logit = jnp.einsum("td,tsd->ts", q[:, h], k_t)
            p = jax.nn.softmax(logit, axis=-1)
            v_t = v_pool[:, :, h][slot].astype(jnp.float32)
            outs.append(jnp.einsum("ts,tsd->td", p, v_t))
        o = jnp.stack(outs, axis=1).reshape(T, Hh * Dh).astype(x.dtype)
        return o @ cp["out_proj"]["kernel"] + cp["out_proj"]["bias"]

    def apply_layer(self, layer_params, x, residual, positions, kv_cache,
                    attn_metadata, layer_idx, lora=None, token_adapter=None):
        lp = layer_params
        hidden = (x.astype(jnp.float32) +
                  residual.astype(jnp.float32)).astype(x.dtype)
        h = self._norm(lp["input_layernorm"], hidden)
        attn_out, kv = self._attention(lp, h, positions, kv_cache,
                                       attn_metadata, lora, token_adapter,
                                       layer_idx=layer_idx)
        hidden = hidden + attn_out
        if attn_metadata.cross_kv is not None:
            h = self._norm(lp["cross_attn_layer_norm"], hidden)
            hidden = hidden + self._cross_attention(
                lp["cross_attn"], h, attn_metadata, layer_idx)
        h = self._norm(lp["post_attention_layernorm"], hidden)
        out = self._ffn(lp, h, layer_idx, lora, token_adapter)
        return out, hidden, kv

    # ---- params -----------------------------------------------------------------

    def init_params(self, rng) -> Dict[str, Any]:
        params = super().init_params(rng)
        c = self.config
        nprng = np.random.default_rng(909 + c.seed)
        D = c.hidden_size

        def dense(shape, scale=0.02):
            return jnp.asarray(nprng.standard_normal(size=shape) * scale,
                               jnp.float32)

        def lnn(n=D):
            return {"weight": jnp.ones((n,), jnp.float32),
                    "bias": jnp.zeros((n,), jnp.float32)}

        for lp in params["layers"]:
            lp["cross_attn_layer_norm"] = lnn()
            lp["cross_attn"] = {
                "q_proj": {"kernel": dense((D, D)),
                           "bias": jnp.zeros((D,), jnp.float32)},
                "k_proj": {"kernel": dense((D, D))},
                "v_proj": {"kernel": dense((D, D)),
                           "bias": jnp.zeros((D,), jnp.float32)},
                "out_proj": {"kernel": dense((D, D)),
                             "bias": jnp.zeros((D,), jnp.float32)},
            }
        enc_layers = []
        for _ in range(self.enc_layers):
            enc_layers.append({
                "self_attn_layer_norm": lnn(), "final_layer_norm": lnn(),
                "q_proj": {"kernel": dense((D, D)),
                           "bias": jnp.zeros((D,), jnp.float32)},
                "k_proj": {"kernel": dense((D, D))},
                "v_proj": {"kernel": dense((D, D)),
                           "bias": jnp.zeros((D,), jnp.float32)},
                "out_proj": {"kernel": dense((D, D)),
                             "bias": jnp.zeros((D,), jnp.float32)},
                "fc1": {"kernel": dense((D, self.enc_ffn)),
                        "bias": jnp.zeros((self.enc_ffn,), jnp.float32)},
                "fc2": {"kernel": dense((self.enc_ffn, D)),
                        "bias": jnp.zeros((D,), jnp.float32)},
            })
        params["encoder"] = {
            "conv1": {"kernel": dense((D, self.num_mel_bins, 3)),
                      "bias": jnp.zeros((D,), jnp.float32)},
            "conv2": {"kernel": dense((D, D, 3)),
                      "bias": jnp.zeros((D,), jnp.float32)},
            "pos_embed": dense((self.max_source_positions, D)),
            "layer_norm": lnn(),
            "layers": enc_layers,
        }
        return params

    # ---- weight loading -----------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        encoder: Dict[str, Any] = {"layers": [
            {} for _ in range(self.enc_layers)]}
        cross: List[Dict[str, Any]] = [
            {} for _ in range(self.config.num_hidden_layers)]
        cross_ln: List[Dict[str, Any]] = [
            {} for _ in range(self.config.num_hidden_layers)]

        def put_linear(node, name, kind, w):
            tgt = node.setdefault(name, {})
            if kind == "weight" and w.ndim == 2:
                tgt["kernel"] = jnp.asarray(np.ascontiguousarray(w.T),
                                            jnp.float32)
            else:
                tgt[kind if "norm" in name else
                    ("kernel" if kind == "weight" else "bias")] = \
                    jnp.asarray(w, jnp.float32)

        def enc_put(rest, w):
            if m := re.match(r"layers\.(\d+)\.(.+)\.(weight|bias)", rest):
                i, name, kind = int(m.group(1)), m.group(2), m.group(3)
                name = name.replace("self_attn.", "")
                lp = encoder["layers"][i]
                if "norm" in name:
                    lp.setdefault(name, {})[kind] = jnp.asarray(
                        w, jnp.float32)
                else:
                    put_linear(lp, name, kind, w)
            elif rest.startswith("conv"):
                which, kind = rest.split(".")
                encoder.setdefault(which, {})[
                    "kernel" if kind == "weight" else "bias"] = \
                    jnp.asarray(w, jnp.float32)
            elif rest == "embed_positions.weight":
                encoder["pos_embed"] = jnp.asarray(w, jnp.float32)
            elif rest.startswith("layer_norm."):
                encoder.setdefault("layer_norm", {})[
                    rest.split(".")[-1]] = jnp.asarray(w, jnp.float32)

        def filter_stream():
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("encoder."):
                    enc_put(name.removeprefix("encoder."), w)
                    continue
                name = name.removeprefix("decoder.")
                if m := re.match(
                        r"layers\.(\d+)\.encoder_attn\.(\w+)\."
                        r"(weight|bias)", name):
                    put_linear(cross[int(m.group(1))], m.group(2),
                               m.group(3), w)
                elif m := re.match(
                        r"layers\.(\d+)\.encoder_attn_layer_norm\."
                        r"(weight|bias)", name):
                    cross_ln[int(m.group(1))][m.group(2)] = jnp.asarray(
                        w, jnp.float32)
                elif m := re.match(r"layers\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    rest = rest.replace("self_attn_layer_norm",
                                        "input_layernorm")
                    rest = rest.replace("final_layer_norm",
                                        "post_attention_layernorm")
                    rest = rest.replace("self_attn.out_proj",
                                        "self_attn.o_proj")
                    rest = rest.replace("fc1.", "mlp.up_proj.")
                    rest = rest.replace("fc2.", "mlp.down_proj.")
                    yield f"layers.{i}.{rest}", w
                elif name == "embed_positions.weight":
                    yield "pos_embed.weight", w
                elif name == "embed_tokens.weight":
                    yield "embed_tokens.weight", w
                elif name.startswith("layer_norm."):
                    yield "norm." + name.split(".")[-1], w
                elif name == "proj_out.weight":
                    yield "lm_head.weight", w
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        params["encoder"] = encoder
        for i, lp in enumerate(params["layers"]):
            lp["cross_attn"] = cross[i]
            lp["cross_attn_layer_norm"] = cross_ln[i]
        return params
