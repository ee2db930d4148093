"""Mamba1 / Jamba / LFM2 (short_conv) families.

Behavioral references:
- ``/root/reference/vllm/model_executor/models/mamba.py`` +
  ``layers/mamba/mamba_mixer.py`` (mamba1 selective scan; HF numerics:
  transformers ``modeling_mamba.slow_forward``);
- ``models/jamba.py`` (attn/mamba1 interleave with per-layer dense/MoE
  FFN and dt/B/C RMSNorms inside the mixer);
- ``models/lfm2.py`` + ``layers/mamba/short_conv.py`` (gated short
  convolution: out = out_proj(C ⊙ conv(B ⊙ x))).

State lives in the LinearAttentionSpec slot cache like GDN/mamba2: a
conv rolling window plus (for mamba1) the [D, N] recurrent state.
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
from lvllm_tpu.ops.gdn import causal_conv1d_decode, causal_conv1d_ragged
from lvllm_tpu.ops.mamba1 import mamba1_decode, mamba1_scan_ragged
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def mamba1_mixer(mp: Params, x: jax.Array, state, md: AttentionMetadata,
                 c: ModelConfig, positions: jax.Array,
                 dtbc_norms: bool = False,
                 mixer_rms_eps: float = 0.0):
    """One mamba1 mixer forward. ``state`` = {"conv", "rec"} slot cache
    (rec [S+1, D, 1, N]); returns (out [T, H], new_state).
    ``dtbc_norms``: Jamba's RMSNorms over dt / B / C before dt_proj.
    ``mixer_rms_eps``: FalconMamba's WEIGHTLESS RMSNorm over dt / B / C
    (HF modeling_falcon_mamba.rms_forward, eps = config.mixer_rms_eps)."""
    T = x.shape[0]
    D = c.mamba_num_heads              # d_inner (head_dim == 1)
    N = c.mamba_state_size
    R = c.mamba_dt_rank

    proj = x @ mp["in_proj"]["kernel"]
    if "bias" in mp["in_proj"]:
        proj = proj + mp["in_proj"]["bias"]
    xs, gate = proj[:, :D], proj[:, D:]

    num_reqs = md.block_table.shape[0]
    req_idx = _token_request_map(md.query_start_loc, T, num_reqs)
    scratch = state["rec"].shape[0] - 1
    token_valid = jnp.arange(T) < md.query_start_loc[num_reqs]
    token_slot = jnp.where(
        token_valid,
        md.row_slots[req_idx] if md.row_slots is not None else req_idx,
        scratch).astype(jnp.int32)
    reset = (positions == 0) & token_valid

    conv_fn = causal_conv1d_decode if md.decode_mode \
        else causal_conv1d_ragged
    # conv_fn applies SiLU internally (HF mamba: act(conv1d(x))).
    conv_out, conv_state = conv_fn(
        xs, state["conv"], mp["conv_weight"].astype(jnp.float32),
        token_slot, reset, bias=mp.get("conv_bias"))
    xc = conv_out.astype(jnp.float32)

    ssm_in = xc @ mp["x_proj"]["kernel"].astype(jnp.float32)  # [T, R+2N]
    dt_r, B, C = ssm_in[:, :R], ssm_in[:, R:R + N], ssm_in[:, R + N:]
    if dtbc_norms:
        dt_r = rms_norm(dt_r, mp["dt_norm"]["weight"], c.rms_norm_eps)
        B = rms_norm(B, mp["b_norm"]["weight"], c.rms_norm_eps)
        C = rms_norm(C, mp["c_norm"]["weight"], c.rms_norm_eps)
    elif mixer_rms_eps:
        def _wrms(v):
            var = jnp.mean(jnp.square(v), axis=-1, keepdims=True)
            return v * jax.lax.rsqrt(var + mixer_rms_eps)
        dt_r, B, C = _wrms(dt_r), _wrms(B), _wrms(C)
    dt = dt_r.astype(jnp.float32) @ \
        mp["dt_proj"]["kernel"].astype(jnp.float32)
    dt = jax.nn.softplus(dt + mp["dt_proj"]["bias"].astype(jnp.float32))

    A = -jnp.exp(mp["a_log"].astype(jnp.float32))              # [D, N]
    rec = state["rec"]
    scan_fn = mamba1_decode if md.decode_mode else mamba1_scan_ragged
    y, rec_out = scan_fn(
        xc, B.astype(jnp.float32), C.astype(jnp.float32), dt, A,
        mp["d"].astype(jnp.float32), rec[:, :, 0, :], token_slot, reset)
    rec_state = rec_out[:, :, None, :]

    y = y * jax.nn.silu(gate.astype(jnp.float32))
    out = y.astype(x.dtype) @ mp["out_proj"]["kernel"]
    if "bias" in mp["out_proj"]:
        out = out + mp["out_proj"]["bias"]
    return out, {"conv": conv_state, "rec": rec_state}


def mamba1_init_mixer_params(c: ModelConfig, dense, dtype,
                             dtbc_norms: bool = False) -> Dict[str, Any]:
    D, N, R = c.mamba_num_heads, c.mamba_state_size, c.mamba_dt_rank
    mp: Dict[str, Any] = {
        "in_proj": {"kernel": dense((c.hidden_size, 2 * D))},
        "conv_weight": dense((D, c.mamba_conv_kernel)),
        "x_proj": {"kernel": dense((D, R + 2 * N))},
        "dt_proj": {"kernel": dense((R, D)),
                    "bias": jnp.ones((D,), jnp.float32)},
        "a_log": jnp.zeros((D, N), jnp.float32),
        "d": jnp.ones((D,), jnp.float32),
        "out_proj": {"kernel": dense((D, c.hidden_size))},
    }
    if c.mamba_conv_bias:
        mp["conv_bias"] = jnp.zeros((D,), jnp.float32)
    if c.mamba_proj_bias:
        mp["in_proj"]["bias"] = jnp.zeros((2 * D,), dtype)
        mp["out_proj"]["bias"] = jnp.zeros((c.hidden_size,), dtype)
    if dtbc_norms:
        mp["dt_norm"] = {"weight": jnp.ones((R,), dtype)}
        mp["b_norm"] = {"weight": jnp.ones((N,), dtype)}
        mp["c_norm"] = {"weight": jnp.ones((N,), dtype)}
    return mp


def mamba1_cache_spec(c: ModelConfig):
    from lvllm_tpu.core.kv_cache_spec import LinearAttentionSpec
    return LinearAttentionSpec(
        conv_dim=c.mamba_num_heads,           # d_inner channels
        conv_width=c.mamba_conv_kernel,
        num_v_heads=c.mamba_num_heads,
        k_head_dim=1,
        v_head_dim=c.mamba_state_size)


def short_conv_mixer(mp: Params, x: jax.Array, state,
                     md: AttentionMetadata, c: ModelConfig,
                     positions: jax.Array):
    """LFM2 gated short convolution (reference: short_conv.py:130-180):
    B, C, x = in_proj(h); out = out_proj(C ⊙ conv(B ⊙ x))."""
    T, H = x.shape
    proj = x @ mp["in_proj"]["kernel"]
    if "bias" in mp["in_proj"]:
        proj = proj + mp["in_proj"]["bias"]
    B, C, xs = proj[:, :H], proj[:, H:2 * H], proj[:, 2 * H:]

    num_reqs = md.block_table.shape[0]
    req_idx = _token_request_map(md.query_start_loc, T, num_reqs)
    scratch = state["conv"].shape[0] - 1
    token_valid = jnp.arange(T) < md.query_start_loc[num_reqs]
    token_slot = jnp.where(
        token_valid,
        md.row_slots[req_idx] if md.row_slots is not None else req_idx,
        scratch).astype(jnp.int32)
    reset = (positions == 0) & token_valid

    Bx = B * xs
    conv_fn = causal_conv1d_decode if md.decode_mode \
        else causal_conv1d_ragged
    # LFM2's short conv has NO activation on the conv output
    # (HF Lfm2ShortConv.slow_forward: out = C * conv(B * x)).
    conv_out, conv_state = conv_fn(
        Bx, state["conv"], mp["conv_weight"].astype(jnp.float32),
        token_slot, reset, bias=mp.get("conv_bias"), activation=False)
    y = C * conv_out.astype(C.dtype)
    out = y @ mp["out_proj"]["kernel"]
    if "bias" in mp["out_proj"]:
        out = out + mp["out_proj"]["bias"]
    return out, {"conv": conv_state, "rec": state["rec"]}


def short_conv_init_params(c: ModelConfig, dense, dtype) -> Dict[str, Any]:
    H = c.hidden_size
    return {
        "in_proj": {"kernel": dense((H, 3 * H))},
        "conv_weight": dense((H, c.mamba_conv_kernel)),
        "out_proj": {"kernel": dense((H, H))},
    }


def short_conv_cache_spec(c: ModelConfig):
    from lvllm_tpu.core.kv_cache_spec import LinearAttentionSpec
    return LinearAttentionSpec(
        conv_dim=c.hidden_size, conv_width=c.mamba_conv_kernel,
        num_v_heads=1, k_head_dim=1, v_head_dim=1)


class MambaModel(Qwen3Model):
    """Pure mamba1 causal LM (MambaForCausalLM): every layer is
    norm → mixer → residual."""

    dcp_compatible = False

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        return mamba1_cache_spec(self.config)

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
                "mixer": mamba1_init_mixer_params(c, dense, self.dtype),
            })
        return params

    mixer_rms_eps = 0.0   # FalconMamba: weightless dt/B/C RMSNorm

    def apply_layer(self, layer_params, x, residual, positions, kv_cache,
                    attn_metadata, layer_idx, lora=None, token_adapter=None):
        c = self.config
        h, residual = fused_add_rms_norm(
            x, residual, layer_params["norm"]["weight"], c.rms_norm_eps)
        out, new_state = mamba1_mixer(layer_params["mixer"], h, kv_cache,
                                      attn_metadata, c, positions,
                                      mixer_rms_eps=self.mixer_rms_eps)
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
                elif rest == "mixer.conv1d.weight":
                    put(mp, "conv_weight", np.asarray(w)[:, 0, :])
                elif rest == "mixer.conv1d.bias":
                    put(mp, "conv_bias", w, jnp.float32)
                elif rest == "mixer.x_proj.weight":
                    put(mp["x_proj"], "kernel", w, transpose=True)
                elif rest == "mixer.dt_proj.weight":
                    put(mp["dt_proj"], "kernel", w, transpose=True)
                elif rest == "mixer.dt_proj.bias":
                    put(mp["dt_proj"], "bias", w, jnp.float32)
                elif rest == "mixer.A_log":
                    put(mp, "a_log", w, jnp.float32)
                elif rest == "mixer.D":
                    put(mp, "d", w, jnp.float32)
                elif rest == "mixer.out_proj.weight":
                    put(mp["out_proj"], "kernel", w, transpose=True)
                else:
                    logger.debug("skipping weight %s", name)
            else:
                logger.debug("skipping weight %s", name)
        return params


class FalconMambaModel(MambaModel):
    """FalconMamba (HF modeling_falcon_mamba): mamba1 with a WEIGHTLESS
    RMSNorm over dt/B/C after x_proj (eps = config.mixer_rms_eps —
    1e-6 in every published FalconMamba config)."""

    mixer_rms_eps = 1e-6


class JambaModel(Qwen3Model):
    """Jamba (AI21) hybrid: attention / mamba1 layers interleaved, each
    followed by a dense or MoE FFN; the mixer carries dt/B/C RMSNorms
    (reference: models/jamba.py; HF numerics: modeling_jamba)."""

    dcp_compatible = False

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        if self.config.layer_type(layer_idx) == "linear_attention":
            return mamba1_cache_spec(self.config)
        return super().kv_cache_spec(layer_idx, kv_dtype)

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        nprng = np.random.default_rng(777 + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        for i, layer in enumerate(params["layers"]):
            if c.layer_type(i) == "linear_attention":
                del layer["self_attn"]
                layer["mamba"] = mamba1_init_mixer_params(
                    c, dense, self.dtype, dtbc_norms=True)
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
        out, new_state = mamba1_mixer(lp["mamba"], h, kv_cache,
                                      attn_metadata, c, positions,
                                      dtbc_norms=True)
        h, residual = fused_add_rms_norm(
            out, residual, lp["post_attention_layernorm"]["weight"],
            c.rms_norm_eps)
        x = self._ffn(lp, h, layer_idx)
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
                elif m := re.match(r"layers\.(\d+)\.feed_forward\.(.+)$",
                                   s):
                    rest = m.group(2)
                    # Jamba MoE: experts.N.{gate,up,down}_proj; the router
                    # maps onto the canonical mlp.gate name.
                    if rest == "router.weight":
                        rest = "gate.weight"
                    yield f"layers.{m.group(1)}.mlp.{rest}", w
                elif m := re.match(r"layers\.(\d+)\.mamba\.(.+)$", s):
                    mamba_parts[(int(m.group(1)), m.group(2))] = \
                        np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        for (i, key), w in mamba_parts.items():
            mp = params["layers"][i].get("mamba")
            if mp is None:
                continue
            if key == "in_proj.weight":
                mp["in_proj"]["kernel"] = jnp.asarray(w.T, self.dtype)
            elif key == "conv1d.weight":
                mp["conv_weight"] = jnp.asarray(w[:, 0, :], self.dtype)
            elif key == "conv1d.bias":
                mp["conv_bias"] = jnp.asarray(w, jnp.float32)
            elif key == "x_proj.weight":
                mp["x_proj"]["kernel"] = jnp.asarray(w.T, self.dtype)
            elif key == "dt_proj.weight":
                mp["dt_proj"]["kernel"] = jnp.asarray(w.T, self.dtype)
            elif key == "dt_proj.bias":
                mp["dt_proj"]["bias"] = jnp.asarray(w, jnp.float32)
            elif key == "A_log":
                mp["a_log"] = jnp.asarray(w, jnp.float32)
            elif key == "D":
                mp["d"] = jnp.asarray(w, jnp.float32)
            elif key == "dt_layernorm.weight":
                mp["dt_norm"]["weight"] = jnp.asarray(w, self.dtype)
            elif key == "b_layernorm.weight":
                mp["b_norm"]["weight"] = jnp.asarray(w, self.dtype)
            elif key == "c_layernorm.weight":
                mp["c_norm"]["weight"] = jnp.asarray(w, self.dtype)
            elif key == "out_proj.weight":
                mp["out_proj"]["kernel"] = jnp.asarray(w.T, self.dtype)
            else:
                logger.debug("skipping jamba mamba weight %s", key)
        return params


class Lfm2Model(Qwen3Model):
    """LFM2 hybrid: gated short-conv layers interleaved with attention
    (reference: models/lfm2.py + layers/mamba/short_conv.py)."""

    dcp_compatible = False

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        if self.config.layer_type(layer_idx) == "short_conv":
            return short_conv_cache_spec(self.config)
        return super().kv_cache_spec(layer_idx, kv_dtype)

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        nprng = np.random.default_rng(555 + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        for i, layer in enumerate(params["layers"]):
            if c.layer_type(i) == "short_conv":
                del layer["self_attn"]
                layer["conv"] = short_conv_init_params(c, dense, self.dtype)
        return params

    def apply_layer(self, layer_params, x, residual, positions, kv_cache,
                    attn_metadata, layer_idx, lora=None, token_adapter=None):
        c = self.config
        if c.layer_type(layer_idx) != "short_conv":
            return super().apply_layer(
                layer_params, x, residual, positions, kv_cache,
                attn_metadata, layer_idx, lora, token_adapter)
        lp = layer_params
        h, residual = fused_add_rms_norm(
            x, residual, lp["input_layernorm"]["weight"], c.rms_norm_eps)
        out, new_state = short_conv_mixer(lp["conv"], h, kv_cache,
                                          attn_metadata, c, positions)
        h, residual = fused_add_rms_norm(
            out, residual, lp["post_attention_layernorm"]["weight"],
            c.rms_norm_eps)
        x = self._ffn(lp, h, layer_idx)
        return x, residual, new_state

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        conv_parts: Dict[Tuple[int, str], np.ndarray] = {}

        def filter_stream():
            for name, w in weights:
                s = name.removeprefix("model.")
                if s == "embedding_norm.weight":
                    yield "norm.weight", w
                elif m := re.match(r"layers\.(\d+)\.operator_norm"
                                   r"\.weight$", s):
                    yield (f"layers.{m.group(1)}.input_layernorm.weight",
                           w)
                elif m := re.match(r"layers\.(\d+)\.ffn_norm\.weight$", s):
                    yield (f"layers.{m.group(1)}."
                           f"post_attention_layernorm.weight"), w
                elif m := re.match(r"layers\.(\d+)\.feed_forward\.gate"
                                   r"\.weight$", s):
                    # Lfm2Moe router (reference lfm2_moe.py:488-510).
                    yield f"layers.{m.group(1)}.mlp.gate.weight", w
                elif m := re.match(r"layers\.(\d+)\.feed_forward"
                                   r"\.expert_bias$", s):
                    yield (f"layers.{m.group(1)}.mlp."
                           f"e_score_correction_bias"), w
                elif m := re.match(r"layers\.(\d+)\.feed_forward\."
                                   r"experts\.(\d+)\.w([123])\.weight$",
                                   s):
                    which = {"1": "gate", "3": "up",
                             "2": "down"}[m.group(3)]
                    yield (f"layers.{m.group(1)}.mlp.experts."
                           f"{m.group(2)}.{which}_proj.weight"), w
                elif m := re.match(r"layers\.(\d+)\.feed_forward\.w1"
                                   r"\.weight$", s):
                    conv_parts[(int(m.group(1)), "ffn_w1")] = np.asarray(w)
                elif m := re.match(r"layers\.(\d+)\.feed_forward\.w3"
                                   r"\.weight$", s):
                    conv_parts[(int(m.group(1)), "ffn_w3")] = np.asarray(w)
                elif m := re.match(r"layers\.(\d+)\.feed_forward\.w2"
                                   r"\.weight$", s):
                    yield f"layers.{m.group(1)}.mlp.down_proj.weight", w
                elif m := re.match(r"layers\.(\d+)\.conv\.(.+)$", s):
                    conv_parts[(int(m.group(1)), m.group(2))] = \
                        np.asarray(w)
                else:
                    # LFM2 attention spellings → canonical names.
                    s2 = s.replace("self_attn.out_proj",
                                   "self_attn.o_proj")
                    s2 = s2.replace("self_attn.q_layernorm",
                                    "self_attn.q_norm")
                    s2 = s2.replace("self_attn.k_layernorm",
                                    "self_attn.k_norm")
                    yield (s2 if s2 != s else name), w

        params = super().load_weights(filter_stream())
        for (i, key), w in conv_parts.items():
            layer = params["layers"][i]
            if key == "ffn_w1":        # gate half of fused gate_up
                k = layer["mlp"]["gate_up"]["kernel"]
                I = k.shape[1] // 2
                layer["mlp"]["gate_up"]["kernel"] = \
                    k.at[:, :I].set(jnp.asarray(w.T, self.dtype))
            elif key == "ffn_w3":      # up half
                k = layer["mlp"]["gate_up"]["kernel"]
                I = k.shape[1] // 2
                layer["mlp"]["gate_up"]["kernel"] = \
                    k.at[:, I:].set(jnp.asarray(w.T, self.dtype))
            elif "conv" not in layer:
                continue
            elif key == "in_proj.weight":
                layer["conv"]["in_proj"]["kernel"] = \
                    jnp.asarray(w.T, self.dtype)
            elif key == "conv.weight":
                layer["conv"]["conv_weight"] = \
                    jnp.asarray(np.asarray(w)[:, 0, :], self.dtype)
            elif key == "conv.bias":
                layer["conv"]["conv_bias"] = jnp.asarray(w, jnp.float32)
            elif key == "out_proj.weight":
                layer["conv"]["out_proj"]["kernel"] = \
                    jnp.asarray(w.T, self.dtype)
            else:
                logger.debug("skipping lfm2 weight %s", key)
        return params
