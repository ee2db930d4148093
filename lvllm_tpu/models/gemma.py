"""Gemma family (Gemma 1 / 2 / 3 text models).

Behavioral reference: ``/root/reference/vllm/model_executor/models/
gemma.py / gemma2.py / gemma3.py``; HF numerics reference: transformers
``modeling_gemma2`` / ``modeling_gemma3``.

Family traits handled here:
- zero-centered RMSNorm (y = x̂·(1+w)) — the +1 is folded into every norm
  weight at load so the shared ``rms_norm`` applies;
- √H-scaled embeddings, tied LM head, GeGLU MLP (config-driven in the base);
- Gemma2/3 "sandwich" layers: pre/post norms around BOTH the attention and
  the FFN block (four norms per layer);
- Gemma2 tanh soft caps on attention and final logits (config-driven);
- Gemma3 per-head q/k RMSNorm and dual rope: sliding_attention layers use
  ``rope_local_base_freq`` with no scaling, full_attention layers use the
  scaled global rope.
"""

import re
from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import rms_norm
from lvllm_tpu.models.model_base import AttentionMetadata, Params
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.ops.rope import compute_cos_sin_cache
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)

_FOUR_NORM_KEYS = ("pre_feedforward_layernorm", "post_feedforward_layernorm")


class GemmaModel(Qwen3Model):

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        # Gemma1 keeps the llama two-norm layer; Gemma2/3 sandwich both
        # blocks with pre+post norms.
        self.four_norms = c.architecture != "GemmaForCausalLM"
        if c.rope_local_base_freq:
            rot_dim = int(self.head_dim * c.partial_rotary_factor)
            self.cos_sin_local = compute_cos_sin_cache(
                rot_dim, c.max_position_embeddings, c.rope_local_base_freq,
                None, dtype=jnp.float32)
        else:
            self.cos_sin_local = None

    def rope_cache(self, layer_idx: int) -> jax.Array:
        if (self.cos_sin_local is not None and
                self.config.layer_type(layer_idx) == "sliding_attention"):
            return self.cos_sin_local
        return self.cos_sin

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        if self.four_norms:
            H = self.config.hidden_size
            for layer in params["layers"]:
                for key in _FOUR_NORM_KEYS:
                    layer[key] = {"weight": jnp.ones((H,), self.dtype)}
        return params

    # ---- forward -----------------------------------------------------------

    def apply_layer(self, layer_params, x, residual, positions, kv_cache,
                    attn_metadata, layer_idx, lora=None, token_adapter=None):
        if not self.four_norms:
            return super().apply_layer(
                layer_params, x, residual, positions, kv_cache,
                attn_metadata, layer_idx, lora, token_adapter)
        c = self.config
        lp = layer_params
        x = self._sp_shard(x)
        residual = self._sp_shard(residual)
        # Sandwich layer (HF Gemma2DecoderLayer.forward): the carried `x`
        # is the previous block's post-normed delta; complete its add.
        residual = (x.astype(jnp.float32) +
                    residual.astype(jnp.float32)).astype(x.dtype)
        h = rms_norm(residual, lp["input_layernorm"]["weight"],
                     c.rms_norm_eps)
        attn_out, kv = self._attention(lp, h, positions, kv_cache,
                                       attn_metadata, lora, token_adapter,
                                       layer_idx=layer_idx)
        attn_out = rms_norm(attn_out, lp["post_attention_layernorm"]["weight"],
                            c.rms_norm_eps)
        residual = (residual.astype(jnp.float32) +
                    attn_out.astype(jnp.float32)).astype(x.dtype)
        h = rms_norm(residual, lp["pre_feedforward_layernorm"]["weight"],
                     c.rms_norm_eps)
        ffn = self._ffn(lp, h, layer_idx)
        ffn = rms_norm(ffn, lp["post_feedforward_layernorm"]["weight"],
                       c.rms_norm_eps)
        return ffn, residual, kv

    # ---- weights -----------------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        extra: Dict[Tuple[int, str], np.ndarray] = {}

        def filter_stream():
            for name, w in weights:
                stripped = name.removeprefix("model.")
                # Gemma RMSNorm is zero-centered: fold the +1 (all norms,
                # including Gemma3 per-head q/k norms and the final norm).
                if re.search(r"(^|\.)(\w*layernorm|norm|q_norm|k_norm)"
                             r"\.weight$", stripped):
                    w = np.asarray(w) + 1.0
                m = re.match(r"layers\.(\d+)\.(pre_feedforward_layernorm|"
                             r"post_feedforward_layernorm)\.weight$",
                             stripped)
                if m:
                    extra[(int(m.group(1)), m.group(2))] = w
                    continue
                yield name, w

        params = super().load_weights(filter_stream())
        for (i, key), w in extra.items():
            params["layers"][i][key] = {"weight": jnp.asarray(w, self.dtype)}
        return params
