"""MiniMax-Text-01 / MiniMax-M1: lightning-attention hybrid MoE.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
minimax_text_01.py`` + ``layers/mamba/linear_attn.py``
(MiniMaxText01LinearAttention); HF numerics reference:
``transformers.models.minimax.modeling_minimax`` (MiniMaxForCausalLM).

Per ``layer_types``: linear_attention layers run lightning attention —
SiLU(qkv_proj(x)) split into heads, per-head ALiBi decay scaled by layer
position, recurrent S = λS + kᵀv state (ops/lightning.py), output
RMS-normed over the inner dim and gated by σ(output_gate(x)) before
out_proj. full_attention layers are standard GQA+RoPE. FFN is
Mixtral-layout MoE (block_sparse_moe.{gate,experts.N.w1/w2/w3}); the
optional residual scaling factors (layernorm_*_alpha/beta) and postnorm
of the original MiniMax-Text-01 checkpoints apply per layer.
"""

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import rms_norm
from lvllm_tpu.models.model_base import Params
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.ops.attention import _token_request_map
from lvllm_tpu.ops.lightning import (layer_slope, lightning_decode,
                                     lightning_ragged)


@register_model("MiniMaxText01ForCausalLM")
@register_model("MiniMaxM1ForCausalLM")
@register_model("MiniMaxForCausalLM")
class MiniMaxText01Model(Qwen3Model):

    dcp_compatible = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        L = c.num_hidden_layers
        self.slopes = [
            jnp.asarray(layer_slope(c.num_attention_heads, i, L))
            for i in range(L)]
        f = c.minimax_residual_factors or (1.0,) * 6
        (self.full_alpha, self.full_beta, self.lin_alpha, self.lin_beta,
         self.mlp_alpha, self.mlp_beta) = f
        self.postnorm = bool(c.minimax_postnorm)

    # ---- cache layout ------------------------------------------------------

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        c = self.config
        if c.layer_type(layer_idx) == "linear_attention":
            from lvllm_tpu.core.kv_cache_spec import LinearAttentionSpec
            D = self.head_dim
            return LinearAttentionSpec(
                conv_dim=0, conv_width=1,   # lightning has no conv state
                num_v_heads=c.num_attention_heads, k_head_dim=D,
                v_head_dim=D)
        return super().kv_cache_spec(layer_idx, kv_dtype)

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        nprng = np.random.default_rng(777 + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        inner = c.num_attention_heads * self.head_dim
        for i, layer in enumerate(params["layers"]):
            if c.layer_type(i) == "linear_attention":
                layer["self_attn"] = {
                    "qkv_proj": {"kernel": dense((c.hidden_size,
                                                  3 * inner))},
                    "output_gate": {"kernel": dense((c.hidden_size,
                                                     inner))},
                    "out_proj": {"kernel": dense((inner, c.hidden_size))},
                    "norm": {"weight": jnp.ones((inner,), self.dtype)},
                }
        return params

    # ---- layers ------------------------------------------------------------

    def _attention(self, lp, x, positions, kv_cache, md, lora=None,
                   token_adapter=None, layer_idx: int = 0):
        if "qkv_proj" in lp["self_attn"] and \
                "output_gate" in lp["self_attn"]:
            return self._lightning_attention(lp, x, positions, kv_cache,
                                             md, layer_idx)
        return super()._attention(lp, x, positions, kv_cache, md,
                                  lora=lora, token_adapter=token_adapter,
                                  layer_idx=layer_idx)

    def _lightning_attention(self, lp, x, positions, state, md,
                             layer_idx):
        c = self.config
        T = x.shape[0]
        H, D = c.num_attention_heads, self.head_dim
        attn = lp["self_attn"]

        num_reqs = md.block_table.shape[0]
        req_idx = _token_request_map(md.query_start_loc, T, num_reqs)
        scratch = state["rec"].shape[0] - 1
        token_valid = jnp.arange(T) < md.query_start_loc[num_reqs]
        token_slot = jnp.where(
            token_valid,
            md.row_slots[req_idx] if md.row_slots is not None else req_idx,
            scratch).astype(jnp.int32)
        reset = (positions == 0) & token_valid

        qkv = jax.nn.silu(
            (x @ attn["qkv_proj"]["kernel"]).astype(jnp.float32))
        qkv = qkv.reshape(T, H, 3 * D)
        q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]

        fn = lightning_decode if md.decode_mode else lightning_ragged
        core, rec_state = fn(q, k, v, self.slopes[layer_idx],
                             state["rec"], token_slot, reset)

        # RMSNorm over the FLAT inner dim, then sigmoid output gate, then
        # out_proj. eps is the hardcoded 1e-6 of HF's
        # MiniMaxRMSNorm(dim) default — NOT config.rms_norm_eps (the vLLM
        # reference's 1e-5 diverges from checkpoint numerics here).
        flat = core.reshape(T, H * D)
        normed = rms_norm(flat.astype(self.dtype),
                          attn["norm"]["weight"], 1e-6)
        gate = jax.nn.sigmoid(
            (x @ attn["output_gate"]["kernel"]).astype(jnp.float32))
        out = (normed.astype(jnp.float32) * gate).astype(x.dtype)
        return out @ attn["out_proj"]["kernel"], \
            {"conv": state["conv"], "rec": rec_state}

    def apply_layer(self, layer_params, x, residual, positions, kv_cache,
                    attn_metadata, layer_idx, lora=None,
                    token_adapter=None):
        c = self.config
        lp = layer_params
        linear = c.layer_type(layer_idx) == "linear_attention"
        a_attn = self.lin_alpha if linear else self.full_alpha
        b_attn = self.lin_beta if linear else self.full_beta
        if (a_attn, b_attn, self.mlp_alpha, self.mlp_beta) == \
                (1.0, 1.0, 1.0, 1.0) and not self.postnorm:
            return super().apply_layer(lp, x, residual, positions,
                                       kv_cache, attn_metadata, layer_idx,
                                       lora, token_adapter)
        # MiniMax-Text-01 residual scaling / postnorm
        # (minimax_text_01.py:437-480): carried `x` is the previous
        # block's delta — complete the add, then scale residual by alpha
        # and the sublayer output by beta.
        hidden = (x.astype(jnp.float32)
                  + residual.astype(jnp.float32)).astype(x.dtype)
        ln_out = rms_norm(hidden, lp["input_layernorm"]["weight"],
                          c.rms_norm_eps)
        res = ln_out if self.postnorm else hidden
        attn_out, kv = self._attention(lp, ln_out, positions, kv_cache,
                                       attn_metadata, lora, token_adapter,
                                       layer_idx=layer_idx)
        hidden2 = (res.astype(jnp.float32) * a_attn
                   + attn_out.astype(jnp.float32) * b_attn).astype(x.dtype)
        ln2 = rms_norm(hidden2, lp["post_attention_layernorm"]["weight"],
                       c.rms_norm_eps)
        res2 = ln2 if self.postnorm else hidden2
        ffn = self._ffn(lp, ln2, layer_idx)
        return (ffn.astype(jnp.float32) * self.mlp_beta).astype(x.dtype), \
            (res2.astype(jnp.float32) * self.mlp_alpha).astype(x.dtype), kv

    # ---- weight loading ----------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        """Lightning layers load via the qkv/gate/out names; everything
        else (full attention, Mixtral-layout block_sparse_moe, norms)
        rides the unified loader."""
        lightning: dict = {}

        def filter_stream():
            for name, w in weights:
                stripped = name.removeprefix("model.")
                parts = stripped.split(".")
                if (len(parts) >= 4 and parts[0] == "layers"
                        and parts[2] == "self_attn"
                        and parts[3] in ("qkv_proj", "output_gate",
                                         "out_proj", "norm")):
                    li = int(parts[1])
                    leaf = parts[3]
                    if leaf == "norm":
                        lightning.setdefault(li, {})["norm"] = {
                            "weight": jnp.asarray(w, self.dtype)}
                    else:
                        lightning.setdefault(li, {})[leaf] = {
                            "kernel": jnp.asarray(
                                np.ascontiguousarray(w.T), self.dtype)}
                else:
                    yield name, w

        params = super().load_weights(filter_stream())
        for li, leaves in lightning.items():
            params["layers"][li]["self_attn"] = leaves
        return params
