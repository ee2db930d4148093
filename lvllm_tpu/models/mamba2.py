"""Mamba2 family — pure SSM causal LM (Mamba2ForCausalLM) and the mixer
shared with hybrid families (Bamba).

Behavioral reference: ``/root/reference/vllm/model_executor/models/
mamba2.py`` + ``layers/mamba/mamba_mixer2.py``; HF numerics reference:
transformers ``modeling_mamba2`` (torch_forward slow path).

Layer = RMSNorm → mixer → residual (no FFN, no attention). The mixer:
in_proj → [gate | x,B,C | dt]; depthwise causal conv+SiLU over (x,B,C)
with per-request rolling window; SSD recurrence over per-request
[NH, HD, N] state (ops/mamba2.py: ragged scan, or the chunk-parallel SSD
form on single-sequence prefill); gate→SiLU→RMSNorm; out_proj.

State lives in the LinearAttentionSpec slot cache (same hybrid cache-group
design as GDN: conv window + recurrent matrix per request slot).
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import fused_add_rms_norm, rms_norm
from lvllm_tpu.models.model_base import AttentionMetadata, Params
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.ops.attention import _token_request_map
from lvllm_tpu.ops.gdn import (causal_conv1d_decode, causal_conv1d_ragged,
                               causal_conv1d_single)
from lvllm_tpu.ops.mamba2 import (mamba2_chunked, mamba2_decode,
                                  mamba2_scan_ragged)
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def mamba2_mixer(mp: Params, x: jax.Array, state, md: AttentionMetadata,
                 c: ModelConfig, positions: jax.Array):
    """One Mamba2 mixer forward. ``state`` = {"conv", "rec"} slot cache;
    returns (out [T, H], new_state)."""
    T = x.shape[0]
    NH, HD, N, G = (c.mamba_num_heads, c.mamba_head_dim,
                    c.mamba_state_size, c.mamba_n_groups)
    d_inner = NH * HD
    conv_dim = d_inner + 2 * G * N

    proj = x @ mp["in_proj"]["kernel"]
    if "bias" in mp["in_proj"]:
        proj = proj + mp["in_proj"]["bias"]
    gate = proj[:, :d_inner]
    xbc = proj[:, d_inner:d_inner + conv_dim]
    dt = proj[:, d_inner + conv_dim:]

    num_reqs = md.block_table.shape[0]
    req_idx = _token_request_map(md.query_start_loc, T, num_reqs)
    scratch = state["rec"].shape[0] - 1
    token_valid = jnp.arange(T) < md.query_start_loc[num_reqs]
    token_slot = jnp.where(
        token_valid,
        md.row_slots[req_idx] if md.row_slots is not None else req_idx,
        scratch).astype(jnp.int32)
    reset = (positions == 0) & token_valid

    conv_w = mp["conv_weight"].astype(jnp.float32)
    conv_b = mp.get("conv_bias")
    single = md.single_seq_prefill
    if single:
        slot0 = token_slot[0]
        L = md.query_start_loc[1] - md.query_start_loc[0]
        reset0 = reset[0]
        win0 = jnp.where(reset0, 0.0, state["conv"][slot0])
        conv_out, new_win = causal_conv1d_single(xbc, win0, conv_w, L,
                                                 bias=conv_b)
        conv_state = state["conv"].at[slot0].set(new_win)
    elif md.decode_mode:
        conv_out, conv_state = causal_conv1d_decode(
            xbc, state["conv"], conv_w, token_slot, reset, bias=conv_b)
    else:
        conv_out, conv_state = causal_conv1d_ragged(
            xbc, state["conv"], conv_w, token_slot, reset, bias=conv_b)

    xs = conv_out[:, :d_inner].reshape(T, NH, HD)
    B = conv_out[:, d_inner:d_inner + G * N].reshape(T, G, N)
    C = conv_out[:, d_inner + G * N:].reshape(T, G, N)
    B = jnp.repeat(B, NH // G, axis=1)                    # group → heads
    C = jnp.repeat(C, NH // G, axis=1)

    dt = jax.nn.softplus(dt.astype(jnp.float32) + mp["dt_bias"])
    if c.time_step_limit is not None:
        lo, hi = c.time_step_limit
        dt = jnp.clip(dt, lo, None if np.isinf(hi) else hi)
    A = -jnp.exp(mp["a_log"])

    if single:
        # dt=0 on padded tail rows freezes the state (no decay, no update).
        dt = jnp.where(token_valid[:, None], dt, 0.0)
        s0 = jnp.where(reset0, 0.0, state["rec"][slot0])
        y, s_out = mamba2_chunked(xs, B, C, dt, A, mp["d"], s0)
        rec_state = state["rec"].astype(jnp.float32).at[slot0].set(s_out)
    elif md.decode_mode:
        y, rec_state = mamba2_decode(
            xs, B, C, dt, A, mp["d"], state["rec"], token_slot, reset)
    else:
        y, rec_state = mamba2_scan_ragged(
            xs, B, C, dt, A, mp["d"], state["rec"], token_slot, reset)

    # Gated norm: gate → SiLU → multiply → RMSNorm over the flat d_inner
    # (HF MambaRMSNormGated; NOTE the gate applies BEFORE the norm,
    # opposite of the GDN gated norm in qwen3_next). FalconH1
    # (mamba_rms_norm=False) keeps the gate but skips the norm.
    y = y.reshape(T, d_inner)
    y = y * jax.nn.silu(gate.astype(jnp.float32))
    if c.mamba_use_gated_norm:
        gs = c.mamba_norm_group_size
        if gs and gs < d_inner:
            # Zamba2RMSNormGated: rms over groups of gs channels, one
            # flat weight (group_size = intermediate // n_groups).
            yg = y.reshape(T, d_inner // gs, gs)
            var = jnp.mean(jnp.square(yg), axis=-1, keepdims=True)
            yg = yg * jax.lax.rsqrt(var + c.rms_norm_eps)
            y = (yg.reshape(T, d_inner) *
                 mp["norm"]["weight"].astype(jnp.float32))
        else:
            y = rms_norm(y, mp["norm"]["weight"].astype(jnp.float32),
                         c.rms_norm_eps)
    out = y.astype(x.dtype) @ mp["out_proj"]["kernel"]
    if "bias" in mp["out_proj"]:
        out = out + mp["out_proj"]["bias"]
    return out, {"conv": conv_state, "rec": rec_state}


def mamba2_init_mixer_params(c: ModelConfig, dense, dtype) -> Dict[str, Any]:
    NH, HD, N, G = (c.mamba_num_heads, c.mamba_head_dim,
                    c.mamba_state_size, c.mamba_n_groups)
    d_inner = NH * HD
    conv_dim = d_inner + 2 * G * N
    mp: Dict[str, Any] = {
        "in_proj": {"kernel": dense(
            (c.hidden_size, d_inner + conv_dim + NH))},
        "conv_weight": dense((conv_dim, c.mamba_conv_kernel)),
        "dt_bias": jnp.ones((NH,), jnp.float32),
        "a_log": jnp.zeros((NH,), jnp.float32),
        "d": jnp.ones((NH,), jnp.float32),
        "out_proj": {"kernel": dense((d_inner, c.hidden_size))},
    }
    if c.mamba_use_gated_norm:
        mp["norm"] = {"weight": jnp.ones((d_inner,), dtype)}
    if c.mamba_conv_bias:
        mp["conv_bias"] = jnp.zeros((conv_dim,), jnp.float32)
    if c.mamba_proj_bias:
        mp["in_proj"]["bias"] = jnp.zeros(
            (d_inner + conv_dim + NH,), dtype)
        mp["out_proj"]["bias"] = jnp.zeros((c.hidden_size,), dtype)
    return mp


def mamba2_cache_spec(c: ModelConfig):
    from lvllm_tpu.core.kv_cache_spec import LinearAttentionSpec
    d_inner = c.mamba_num_heads * c.mamba_head_dim
    return LinearAttentionSpec(
        conv_dim=d_inner + 2 * c.mamba_n_groups * c.mamba_state_size,
        conv_width=c.mamba_conv_kernel,
        num_v_heads=c.mamba_num_heads,
        k_head_dim=c.mamba_head_dim,
        v_head_dim=c.mamba_state_size)


class BambaModel(Qwen3Model):
    """Bamba (IBM) hybrid: interleaved mamba2 / attention layers, each
    followed by a SwiGLU MLP. Behavioral reference:
    ``/root/reference/vllm/model_executor/models/bamba.py``; HF numerics:
    transformers ``modeling_bamba``."""

    dcp_compatible = False

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        if self.config.layer_type(layer_idx) == "linear_attention":
            return mamba2_cache_spec(self.config)
        return super().kv_cache_spec(layer_idx, kv_dtype)

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        nprng = np.random.default_rng(4242 + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        for i, layer in enumerate(params["layers"]):
            if c.layer_type(i) == "linear_attention":
                del layer["self_attn"]
                layer["mamba"] = mamba2_init_mixer_params(
                    c, dense, self.dtype)
        return params

    def apply_layer(self, layer_params, x, residual, positions, kv_cache,
                    attn_metadata, layer_idx, lora=None, token_adapter=None):
        c = self.config
        if c.layer_type(layer_idx) != "linear_attention":
            return super().apply_layer(
                layer_params, x, residual, positions, kv_cache,
                attn_metadata, layer_idx, lora, token_adapter)
        lp = layer_params
        h, residual = fused_add_rms_norm(
            x, residual, lp["input_layernorm"]["weight"], c.rms_norm_eps)
        out, new_state = mamba2_mixer(lp["mamba"], h, kv_cache,
                                      attn_metadata, c, positions)
        if c.residual_multiplier != 1.0:       # Granite 4.0 hybrid muP
            out = out * c.residual_multiplier
        h, residual = fused_add_rms_norm(
            out, residual, lp["post_attention_layernorm"]["weight"],
            c.rms_norm_eps)
        x = self._ffn(lp, h, layer_idx)
        if c.residual_multiplier != 1.0:
            x = x * c.residual_multiplier
        return x, residual, new_state

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        mamba_parts: Dict[Tuple[int, str], np.ndarray] = {}

        def filter_stream():
            for name, w in weights:
                s = name.removeprefix("model.")
                if s == "final_layernorm.weight":
                    yield "norm.weight", w
                elif m := re.match(r"layers\.(\d+)\.pre_ff_layernorm"
                                   r"\.weight$", s):
                    yield (f"layers.{m.group(1)}."
                           f"post_attention_layernorm.weight"), w
                elif m := re.match(r"layers\.(\d+)\.feed_forward\.(.+)$", s):
                    yield f"layers.{m.group(1)}.mlp.{m.group(2)}", w
                elif m := re.match(r"layers\.(\d+)\.mamba\.(.+)$", s):
                    mamba_parts[(int(m.group(1)), m.group(2))] = \
                        np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        for (i, key), w in mamba_parts.items():
            mp = params["layers"][i]["mamba"]
            if key == "in_proj.weight":
                mp["in_proj"]["kernel"] = jnp.asarray(w.T, self.dtype)
            elif key == "in_proj.bias":
                mp["in_proj"]["bias"] = jnp.asarray(w, self.dtype)
            elif key == "conv1d.weight":
                mp["conv_weight"] = jnp.asarray(w[:, 0, :], self.dtype)
            elif key == "conv1d.bias":
                mp["conv_bias"] = jnp.asarray(w, jnp.float32)
            elif key == "dt_bias":
                mp["dt_bias"] = jnp.asarray(w, jnp.float32)
            elif key == "A_log":
                mp["a_log"] = jnp.asarray(w, jnp.float32)
            elif key == "D":
                mp["d"] = jnp.asarray(w, jnp.float32)
            elif key == "norm.weight":
                mp["norm"]["weight"] = jnp.asarray(w, self.dtype)
            elif key == "out_proj.weight":
                mp["out_proj"]["kernel"] = jnp.asarray(w.T, self.dtype)
            elif key == "out_proj.bias":
                mp["out_proj"]["bias"] = jnp.asarray(w, self.dtype)
            else:
                logger.debug("skipping mamba weight %s", key)
        return params


class Mamba2Model(Qwen3Model):
    """Pure-SSM causal LM: every layer is norm → mamba2 mixer."""

    dcp_compatible = False

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        return mamba2_cache_spec(self.config)

    def init_params(self, rng) -> Params:
        c = self.config
        seed = rng if isinstance(rng, int) else 0
        nprng = np.random.default_rng(seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        params: Params = {
            "embed": {"weight": dense((c.vocab_size, c.hidden_size))},
            "norm": {"weight": jnp.ones((c.hidden_size,), self.dtype)},
            "layers": [],
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = {"kernel": dense(
                (c.hidden_size, c.vocab_size))}
        for _ in range(c.num_hidden_layers):
            params["layers"].append({
                "norm": {"weight": jnp.ones((c.hidden_size,), self.dtype)},
                "mixer": mamba2_init_mixer_params(c, dense, self.dtype),
            })
        return params

    def apply_layer(self, layer_params, x, residual, positions, kv_cache,
                    attn_metadata, layer_idx, lora=None, token_adapter=None):
        c = self.config
        h, residual = fused_add_rms_norm(
            x, residual, layer_params["norm"]["weight"], c.rms_norm_eps)
        out, new_state = mamba2_mixer(layer_params["mixer"], h, kv_cache,
                                      attn_metadata, c, positions)
        return out, residual, new_state

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        c = self.config
        params = self.init_params(0)

        def put(node, key, w, dtype=None, transpose=False):
            w = np.asarray(w)
            if transpose:
                w = w.T
            arr = jnp.asarray(w, dtype or self.dtype)
            assert node[key].shape == arr.shape, \
                (key, node[key].shape, arr.shape)
            node[key] = arr

        for name, w in weights:
            name = name.removeprefix("backbone.")
            if name in ("embeddings.weight", "embedding.weight"):
                put(params["embed"], "weight", w)
            elif name == "norm_f.weight":
                put(params["norm"], "weight", w)
            elif name == "lm_head.weight":
                if not c.tie_word_embeddings:
                    put(params["lm_head"], "kernel", w, transpose=True)
            elif m := re.match(r"layers\.(\d+)\.(.+)", name):
                i, rest = int(m.group(1)), m.group(2)
                layer = params["layers"][i]
                mp = layer["mixer"]
                if rest == "norm.weight":
                    put(layer["norm"], "weight", w)
                elif rest == "mixer.in_proj.weight":
                    put(mp["in_proj"], "kernel", w, transpose=True)
                elif rest == "mixer.in_proj.bias":
                    put(mp["in_proj"], "bias", w)
                elif rest == "mixer.conv1d.weight":   # [conv_dim, 1, K]
                    put(mp, "conv_weight", np.asarray(w)[:, 0, :])
                elif rest == "mixer.conv1d.bias":
                    put(mp, "conv_bias", w, jnp.float32)
                elif rest == "mixer.dt_bias":
                    put(mp, "dt_bias", w, jnp.float32)
                elif rest == "mixer.A_log":
                    put(mp, "a_log", w, jnp.float32)
                elif rest == "mixer.D":
                    put(mp, "d", w, jnp.float32)
                elif rest == "mixer.norm.weight":
                    put(mp["norm"], "weight", w)
                elif rest == "mixer.out_proj.weight":
                    put(mp["out_proj"], "kernel", w, transpose=True)
                elif rest == "mixer.out_proj.bias":
                    put(mp["out_proj"], "bias", w)
                else:
                    logger.debug("skipping weight %s", name)
            else:
                logger.debug("skipping weight %s", name)
        return params
