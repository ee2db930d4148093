"""FalconH1: parallel attention + Mamba2 in EVERY layer.

Behavioral reference: ``vllm/model_executor/models/falcon_h1.py``
(FalconH1ForCausalLM); HF numerics: ``modeling_falcon_h1.py`` — each
decoder layer runs self-attention AND a Mamba2 mixer on the same normed
input, sums them into the residual, then a SwiGLU MLP; muP multipliers
scale almost every projection.

TPU-native shape: every muP multiplier is a load-time WEIGHT FOLD
(key/attention-in fold into k/qkv, attention-out into o_proj, the
ssm mup vector + ssm-in into in_proj, ssm-out into out_proj, mlp
gate/down into their projections; lm_head_multiplier becomes
logits_scaling and embedding_multiplier stays a config field) — the
runtime layer is then a plain attention + mamba2_mixer + MLP, and the
per-layer cache is one dict {pages, conv, rec} so the donated-leaf step
shape is unchanged.
"""

import re
from dataclasses import dataclass
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.core.kv_cache_spec import KVCacheSpec
from lvllm_tpu.layers.common import fused_add_rms_norm
from lvllm_tpu.models.mamba2 import (mamba2_init_mixer_params,
                                     mamba2_mixer)
from lvllm_tpu.models.model_base import Params
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


@dataclass(frozen=True)
class AttentionPlusMambaSpec(KVCacheSpec):
    """Per-layer cache = paged K/V pages AND mamba recurrent state
    (FalconH1's FalconHybridMambaAttentionDynamicCache analog)."""

    num_kv_heads: int
    head_dim: int
    kv_dtype: Any
    conv_dim: int
    conv_width: int
    num_v_heads: int
    k_head_dim: int
    v_head_dim: int

    def bytes_per_block(self, block_size: int) -> int:
        if self.kv_dtype == "int4":
            # Packed nibbles + per-(token, head) f32 scales
            # (Int4KVSpec layout, ops/kv_cache_int4.py).
            return 2 * block_size * self.num_kv_heads * (
                self.head_dim // 2 + 4)
        return (2 * block_size * self.num_kv_heads * self.head_dim *
                jnp.dtype(self.kv_dtype).itemsize)

    def fixed_bytes(self, max_reqs: int) -> int:
        slots = max_reqs + 1
        conv = slots * self.conv_dim * (self.conv_width - 1) * 4
        rec = slots * self.num_v_heads * self.k_head_dim * \
            self.v_head_dim * 4
        return conv + rec

    def make(self, num_blocks: int, block_size: int, max_reqs: int):
        from lvllm_tpu.ops.kv_cache import new_kv_cache
        if self.kv_dtype == "int4":
            from lvllm_tpu.ops.kv_cache_int4 import new_kv_cache_int4
            pages = new_kv_cache_int4(num_blocks, block_size,
                                      self.num_kv_heads, self.head_dim)
        else:
            pages = new_kv_cache(num_blocks, block_size,
                                 self.num_kv_heads, self.head_dim,
                                 self.kv_dtype)
        return {
            "pages": pages,
            "conv": jnp.zeros((max_reqs + 1, self.conv_dim,
                               self.conv_width - 1), jnp.float32),
            "rec": jnp.zeros((max_reqs + 1, self.num_v_heads,
                              self.k_head_dim, self.v_head_dim),
                             jnp.float32),
        }

    @property
    def type_key(self) -> str:
        tag = "int4." if self.kv_dtype == "int4" else ""
        return (f"attn+mamba.{tag}{self.num_kv_heads}x{self.head_dim}."
                f"{self.conv_dim}")


@register_model("FalconH1ForCausalLM")
class FalconH1Model(Qwen3Model):

    dcp_compatible = False

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        c = self.config
        d_inner = c.mamba_num_heads * c.mamba_head_dim
        # int4 pages use the unpadded head_dim (the int4 read path packs
        # nibbles along D; lane padding happens in the kernel).
        hd = c.head_dim if kv_dtype == "int4" else c.kv_cache_dim
        return AttentionPlusMambaSpec(
            num_kv_heads=c.num_key_value_heads,
            head_dim=hd, kv_dtype=kv_dtype,
            conv_dim=d_inner + 2 * c.mamba_n_groups * c.mamba_state_size,
            conv_width=c.mamba_conv_kernel,
            num_v_heads=c.mamba_num_heads,
            k_head_dim=c.mamba_head_dim,
            v_head_dim=c.mamba_state_size)

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        nprng = np.random.default_rng(616 + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        for layer in params["layers"]:
            layer["mamba"] = mamba2_init_mixer_params(c, dense, self.dtype)
        return params

    def apply_layer(self, layer_params, x, residual, positions, kv_cache,
                    attn_metadata, layer_idx, lora=None, token_adapter=None):
        c = self.config
        lp = layer_params
        h, residual = fused_add_rms_norm(
            x, residual, lp["input_layernorm"]["weight"], c.rms_norm_eps)
        attn_out, pages = self._attention(
            lp, h, positions, kv_cache["pages"], attn_metadata, lora,
            token_adapter, layer_idx=layer_idx)
        mamba_out, new_state = mamba2_mixer(
            lp["mamba"], h, kv_cache, attn_metadata, c, positions)
        out = attn_out + mamba_out
        h, residual = fused_add_rms_norm(
            out, residual, lp["post_attention_layernorm"]["weight"],
            c.rms_norm_eps)
        x = self._ffn(lp, h, layer_idx, lora, token_adapter)
        return x, residual, {"pages": pages, "conv": new_state["conv"],
                             "rec": new_state["rec"]}

    # ---- weights ------------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        c = self.config
        mup = dict(c.mup_multipliers or {})
        d_ssm = c.mamba_num_heads * c.mamba_head_dim
        gts = c.mamba_n_groups * c.mamba_state_size
        zxbcdt = mup.get("ssm_multipliers") or [1.0] * 5
        mup_vec = np.ones(2 * d_ssm + 2 * gts + c.mamba_num_heads,
                          np.float32)
        mup_vec[:d_ssm] *= zxbcdt[0]
        mup_vec[d_ssm:2 * d_ssm] *= zxbcdt[1]
        mup_vec[2 * d_ssm:2 * d_ssm + gts] *= zxbcdt[2]
        mup_vec[2 * d_ssm + gts:2 * d_ssm + 2 * gts] *= zxbcdt[3]
        mup_vec[2 * d_ssm + 2 * gts:] *= zxbcdt[4]

        mamba_parts: Dict[Tuple[int, str], np.ndarray] = {}

        def fold(name: str, w: np.ndarray):
            """muP multiplier folds (HF applies them at runtime; weights
            are in HF [out, in] orientation here)."""
            w = np.asarray(w, np.float32)
            ai = mup.get("attention_in_multiplier", 1.0)
            if name.endswith("self_attn.q_proj.weight"):
                return w * ai
            if name.endswith("self_attn.k_proj.weight"):
                return w * ai * mup.get("key_multiplier", 1.0)
            if name.endswith("self_attn.v_proj.weight"):
                return w * ai
            if name.endswith("self_attn.o_proj.weight"):
                return w * mup.get("attention_out_multiplier", 1.0)
            if name.endswith("mamba.in_proj.weight"):
                return (w * mup.get("ssm_in_multiplier", 1.0)
                        * mup_vec[:, None])
            if name.endswith("mamba.out_proj.weight"):
                return w * mup.get("ssm_out_multiplier", 1.0)
            gm, dm = mup.get("mlp_multipliers") or (1.0, 1.0)
            if name.endswith("feed_forward.gate_proj.weight"):
                return w * gm
            if name.endswith("feed_forward.down_proj.weight"):
                return w * dm
            return w

        def filter_stream():
            for name, w in weights:
                s = name.removeprefix("model.")
                w = fold(s, w)
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
                mp["norm"] = {"weight": jnp.asarray(w, self.dtype)}
            elif key == "out_proj.weight":
                mp["out_proj"]["kernel"] = jnp.asarray(w.T, self.dtype)
            elif key == "out_proj.bias":
                mp["out_proj"]["bias"] = jnp.asarray(w, self.dtype)
            else:
                logger.debug("skipping mamba weight %s", key)
        return params
