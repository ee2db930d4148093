"""Qwen3 / Qwen3-MoE model family (also serves Qwen2-style dense models).

Behavioral reference: ``/root/reference/vllm/model_executor/models/qwen3_moe.py``
(Qwen3MoeForCausalLM: attention with per-head q/k RMSNorm, SwiGLU MLP,
sparse MoE FFN every ``decoder_sparse_step`` layers) — re-implemented
functionally for JAX: a flat params pytree, explicit KV caches, one
ragged-attention op per layer.

Parameter tree layout (per layer ``layers[i]``):
  input_layernorm.weight [H]
  self_attn.{q_proj,k_proj,v_proj}.kernel [H, heads*D] (transposed from HF)
  self_attn.{q_norm,k_norm}.weight [D]
  self_attn.o_proj.kernel [Hq*D, H]
  post_attention_layernorm.weight [H]
  dense layers: mlp.gate_up.kernel [H, 2I], mlp.down.kernel [I, H]
  moe layers:   moe.router [H, E], moe.w1 [E, H, 2I], moe.w2 [E, I, H]
"""

import re
from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import (fused_add_rms_norm, layer_norm,
                                     rms_norm, silu_and_mul)
from lvllm_tpu.ops.quant import dense_matmul
from lvllm_tpu.layers.moe import (MoEParams, QuantMoEParams, fused_moe,
                                  fused_moe_quant)
from lvllm_tpu.models.model_base import AttentionMetadata, KVCaches, Params
from lvllm_tpu.ops.attention import ragged_paged_attention
from lvllm_tpu.ops.kv_cache import write_kv
from lvllm_tpu.ops.rope import apply_rope, compute_cos_sin_cache
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class Qwen3Model:
    """Dense + MoE Qwen3-family causal LM."""

    # Standard paged attention supports the context-sharded (DCP) KV path;
    # subclasses with bespoke caches (MLA latent, hybrid GDN) opt out.
    dcp_compatible = True
    # EP dispatch backend + DBO micro-batching (set by the engine from
    # ParallelConfig.moe_backend / moe_ubatches).
    moe_backend = "naive"
    moe_ubatches = 1
    # Explicit sequence-parallel activation sharding (set by the engine
    # from ParallelConfig.enable_sequence_parallel).
    sequence_parallel = False
    # PCP world size (set by the engine from
    # ParallelConfig.prefill_context_parallel_size); >1 enables the
    # context-sharded long-prefill path when md.pcp_prefill is set.
    pcp = 1

    def __init__(self, config: ModelConfig):
        self.config = config
        # Set by the engine when running on a multi-device mesh; enables the
        # shard_map EP path in MoE layers (parallel/expert_parallel.py).
        self.mesh = None
        self.dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        c = config
        self.head_dim = c.head_dim
        if c.attention_multiplier is not None:
            self.scale = c.attention_multiplier  # Granite: scale directly
        elif c.query_pre_attn_scalar:
            self.scale = c.query_pre_attn_scalar ** -0.5
        else:
            self.scale = self.head_dim ** -0.5
        # Static rope table, closed over by the jitted step (constant-folded
        # into the executable; not a trainable param). rot_dim < head_dim
        # for partial-rotary models (GLM: partial_rotary_factor=0.5).
        rot_dim = int(self.head_dim * c.partial_rotary_factor)
        self.cos_sin = compute_cos_sin_cache(
            rot_dim, c.max_position_embeddings, c.rope_theta,
            c.rope_scaling, dtype=jnp.float32)
        # ALiBi families (Bloom/MPT/Baichuan-13B) replace rope with
        # per-head logit slopes (ops/attention.alibi_slopes).
        if c.alibi:
            from lvllm_tpu.ops.attention import alibi_slopes
            self.alibi_slopes = alibi_slopes(c.num_attention_heads)
        else:
            self.alibi_slopes = None

    # ---- cache layout ------------------------------------------------------

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        """Declarative per-layer cache spec (reference: KVCacheSpec
        classes, v1/kv_cache_interface.py); hybrid models override per
        layer type. Allocation and memory sizing derive from these."""
        from lvllm_tpu.core.kv_cache_spec import (FullAttentionSpec,
                                                  Int4KVSpec,
                                                  MLAAttentionSpec,
                                                  SlidingWindowSpec)
        c = self.config
        if c.attention_type == "mla":
            return MLAAttentionSpec(1, c.kv_cache_dim, kv_dtype)
        if kv_dtype == "int4":
            # 4-bit KV (reference turboquant_4bit); unpadded head_dim —
            # the int4 read path is jnp (ops/kv_cache_int4.py).
            assert c.sliding_window is None and not c.attention_sinks \
                and not c.alibi, "int4 KV v1: standard full attention"
            return Int4KVSpec(c.num_key_value_heads, c.head_dim)
        window = c.window_for_layer(layer_idx)
        if window:
            return SlidingWindowSpec(c.kv_cache_heads, c.kv_cache_dim,
                                     kv_dtype, sliding_window=window)
        return FullAttentionSpec(c.kv_cache_heads, c.kv_cache_dim, kv_dtype)

    def kv_cache_specs(self, kv_dtype):
        return [self.kv_cache_spec(i, kv_dtype)
                for i in range(self.config.num_hidden_layers)]

    def make_layer_cache(self, layer_idx: int, num_blocks: int,
                         block_size: int, dtype, max_reqs: int):
        return self.kv_cache_spec(layer_idx, dtype).make(
            num_blocks, block_size, max_reqs)

    # ---- norms --------------------------------------------------------------

    def _norm(self, node: Params, x: jax.Array) -> jax.Array:
        """Apply this model's norm flavor (rmsnorm / layernorm /
        layernorm1p) from a param node holding weight (+ optional bias)."""
        nt = self.config.norm_type
        if nt == "rmsnorm":
            return rms_norm(x, node["weight"], self.config.rms_norm_eps)
        return layer_norm(x, node["weight"], node.get("bias"),
                          self.config.rms_norm_eps,
                          plus_one=nt == "layernorm1p")

    def _add_norm(self, node: Params, x: jax.Array, residual: jax.Array
                  ) -> Tuple[jax.Array, jax.Array]:
        """residual += x (f32); return (norm(residual), residual)."""
        if self.config.norm_type == "rmsnorm":
            return fused_add_rms_norm(x, residual, node["weight"],
                                      self.config.rms_norm_eps)
        new_residual = (x.astype(jnp.float32) +
                        residual.astype(jnp.float32)).astype(x.dtype)
        return self._norm(node, new_residual), new_residual

    def _norm_node(self, nprng, biased: bool) -> Dict[str, Any]:
        node = {"weight": jnp.ones((self.config.hidden_size,), self.dtype)}
        if biased:
            node["bias"] = jnp.zeros((self.config.hidden_size,), self.dtype)
        return node

    # ---- init -------------------------------------------------------------

    def init_params(self, rng) -> Params:
        c = self.config
        D = self.head_dim
        # Host-side numpy init: dummy weights are only for tests/benches and
        # eager per-tensor device RNG ops would compile one executable per
        # shape (minutes over a remote-compile tunnel). No device ops here —
        # even a single eager randint stalls startup on a remote backend, so
        # `rng` may be a plain int seed (preferred) or a jax PRNG key.
        if isinstance(rng, int):
            seed = rng
        else:
            seed = int(np.asarray(jax.random.key_data(rng)).ravel()[-1])
        nprng = np.random.default_rng(seed)

        def dense(shape, scale=0.02):
            arr = nprng.standard_normal(size=shape, dtype=np.float32) * scale
            return jnp.asarray(arr, self.dtype)

        norm_bias = c.norm_type in ("layernorm", "layernorm1p")
        params: Params = {
            "embed": {"weight": dense((c.vocab_size, c.hidden_size))},
            "norm": self._norm_node(nprng, norm_bias),
            "layers": [],
        }
        if c.learned_pos_embeddings:
            params["pos_embed"] = {"weight": dense(
                (c.max_position_embeddings, c.hidden_size))}
        if c.embedding_norm:
            # Bloom word_embeddings_layernorm.
            params["embed_norm"] = self._norm_node(nprng, norm_bias)
        if not c.tie_word_embeddings:
            params["lm_head"] = {
                "kernel": dense((c.hidden_size, c.vocab_size))}
            if c.lm_head_bias:
                params["lm_head"]["bias"] = jnp.zeros(
                    (c.vocab_size,), self.dtype)
        for i in range(c.num_hidden_layers):
            if c.norm_after:
                # OLMo2: norms on sublayer outputs, no pre-norms.
                norms = {
                    "post_attention_layernorm": self._norm_node(
                        nprng, norm_bias),
                    "post_feedforward_layernorm": self._norm_node(
                        nprng, norm_bias),
                }
            elif c.parallel_residual == "single":
                norms = {
                    "input_layernorm": self._norm_node(nprng, norm_bias),
                }
            else:
                norms = {
                    "input_layernorm": self._norm_node(nprng, norm_bias),
                    "post_attention_layernorm": self._norm_node(
                        nprng, norm_bias),
                }
                if c.sandwich_output_norms:
                    norms["post_self_attn_layernorm"] = self._norm_node(
                        nprng, norm_bias)
                    norms["post_mlp_layernorm"] = self._norm_node(
                        nprng, norm_bias)
            layer: Dict[str, Any] = {
                **norms,
                "self_attn": {
                    "q_proj": {"kernel": dense(
                        (c.hidden_size, c.num_attention_heads * D))},
                    "k_proj": {"kernel": dense(
                        (c.hidden_size, c.num_key_value_heads * D))},
                    "v_proj": {"kernel": dense(
                        (c.hidden_size, c.num_key_value_heads * D))},
                    "o_proj": {"kernel": dense(
                        (c.num_attention_heads * D, c.hidden_size))},
                },
            }
            if c.attn_gate_proj:
                # Afmoe separate gate projection (qwen3-next packs its
                # gate inside q_proj and overrides attention entirely).
                layer["self_attn"]["gate_proj"] = {"kernel": dense(
                    (c.hidden_size, c.num_attention_heads * D))}
            if c.attention_bias:
                for pname, width in (("q_proj", c.num_attention_heads * D),
                                     ("k_proj", c.num_key_value_heads * D),
                                     ("v_proj", c.num_key_value_heads * D)):
                    layer["self_attn"][pname]["bias"] = jnp.zeros(
                        (width,), self.dtype)
            if c.o_proj_bias:
                layer["self_attn"]["o_proj"]["bias"] = jnp.zeros(
                    (c.hidden_size,), self.dtype)
            if c.qk_norm:
                if c.qk_norm_across_heads:
                    # MiniMax-M2: one norm over the full flattened q / k.
                    qw, kw = ((c.num_attention_heads * D,),
                              (c.num_key_value_heads * D,))
                elif c.qk_norm_per_head:
                    # Cohere: separate weights per head.
                    qw, kw = ((c.num_attention_heads, D),
                              (c.num_key_value_heads, D))
                else:
                    qw = kw = (D,)
                for nname, shape in (("q_norm", qw), ("k_norm", kw)):
                    node = {"weight": jnp.ones(shape, self.dtype)}
                    if c.qk_norm_bias:
                        node["bias"] = jnp.zeros(shape, self.dtype)
                    layer["self_attn"][nname] = node
            if c.attention_sinks:
                layer["self_attn"]["sinks"] = jnp.asarray(
                    nprng.standard_normal(c.num_attention_heads,
                                          dtype=np.float32) * 0.02)
            if c.is_moe_layer(i):
                layer["moe"] = {
                    "router": dense((c.hidden_size, c.num_experts)),
                    "w1": dense((c.num_experts, c.hidden_size,
                                 2 * c.moe_intermediate_size)),
                    "w2": dense((c.num_experts, c.moe_intermediate_size,
                                 c.hidden_size)),
                }
                if c.moe_bias:
                    layer["moe"]["router_bias"] = jnp.zeros(
                        (c.num_experts,), self.dtype)
                    layer["moe"]["w1_bias"] = jnp.zeros(
                        (c.num_experts, 2 * c.moe_intermediate_size),
                        self.dtype)
                    layer["moe"]["w2_bias"] = jnp.zeros(
                        (c.num_experts, c.hidden_size), self.dtype)
                if c.num_shared_experts:
                    si = (c.shared_expert_intermediate_size or
                          c.moe_intermediate_size * c.num_shared_experts)
                    layer["moe"]["shared_w1"] = dense((c.hidden_size, 2 * si))
                    layer["moe"]["shared_w2"] = dense((si, c.hidden_size))
            elif c.mlp_gated:
                layer["mlp"] = {
                    "gate_up": {"kernel": dense(
                        (c.hidden_size, 2 * c.intermediate_size))},
                    "down": {"kernel": dense(
                        (c.intermediate_size, c.hidden_size))},
                }
            else:
                layer["mlp"] = {
                    "up": {"kernel": dense(
                        (c.hidden_size, c.intermediate_size))},
                    "down": {"kernel": dense(
                        (c.intermediate_size, c.hidden_size))},
                }
                if c.hidden_act == "xielu":
                    # Apertus learnable xIELU (HF XIELUActivation):
                    # softplus-parameterized per-layer alphas.
                    import math as _math
                    init = _math.log(_math.expm1(0.8))
                    init_n = _math.log(_math.expm1(0.8 - 0.5))
                    layer["mlp"]["alpha_p"] = jnp.full((1,), init,
                                                       jnp.float32)
                    layer["mlp"]["alpha_n"] = jnp.full((1,), init_n,
                                                       jnp.float32)
            if "mlp" in layer and c.mlp_bias:
                for pname in layer["mlp"]:
                    out_w = layer["mlp"][pname]["kernel"].shape[-1]
                    layer["mlp"][pname]["bias"] = jnp.zeros(
                        (out_w,), self.dtype)
            params["layers"].append(layer)
        return params

    # ---- forward ----------------------------------------------------------

    def _attention(self, lp: Params, x: jax.Array, positions: jax.Array,
                   kv_cache: jax.Array, md: AttentionMetadata,
                   lora=None, token_adapter=None, layer_idx: int = 0
                   ) -> Tuple[jax.Array, jax.Array]:
        c = self.config
        D = self.head_dim
        T = x.shape[0]
        attn = lp["self_attn"]
        window = c.window_for_layer(layer_idx)
        sinks = attn.get("sinks") if c.attention_sinks else None
        soft_cap = c.attn_logit_softcap

        def proj(p, heads, target):
            y = dense_matmul(x, p)
            if "bias" in p:
                y = y + p["bias"]
            lkey = f"{layer_idx}.{target}"
            if lora is not None and lkey in lora:
                from lvllm_tpu.lora.layers import apply_lora
                y = apply_lora(x, y, lora[lkey], token_adapter)
            return y.reshape(T, heads, D)

        q = proj(attn["q_proj"], c.num_attention_heads, "q_proj")
        k = proj(attn["k_proj"], c.num_key_value_heads, "k_proj")
        v = proj(attn["v_proj"], c.num_key_value_heads, "v_proj")
        if c.clip_qkv is not None:    # DBRX clamps the fused qkv output
            q = jnp.clip(q, -c.clip_qkv, c.clip_qkv)
            k = jnp.clip(k, -c.clip_qkv, c.clip_qkv)
            v = jnp.clip(v, -c.clip_qkv, c.clip_qkv)
        out_gate = None
        if c.attn_gate_proj and "gate_proj" in attn:
            # Afmoe-style gated attention output: σ(x @ gate_proj)
            # multiplies the attention output before o_proj
            # (reference afmoe.py:283).
            out_gate = jax.nn.sigmoid(
                dense_matmul(x, attn["gate_proj"]).astype(jnp.float32))

        def qk_norm(q, k):
            if c.qk_norm_across_heads:
                # MiniMax-M2 (MiniMaxText01RMSNormTP.forward_qk): the RMS
                # statistic spans all heads of the token's q (resp. k).
                q = rms_norm(q.reshape(T, -1), attn["q_norm"]["weight"],
                             c.rms_norm_eps).reshape(
                                 T, c.num_attention_heads, D)
                k = rms_norm(k.reshape(T, -1), attn["k_norm"]["weight"],
                             c.rms_norm_eps).reshape(
                                 T, c.num_key_value_heads, D)
            elif (c.qk_norm_type == "layernorm" or c.qk_norm_bias
                  or c.qk_norm_per_head):
                # Cohere (CohereLayerNorm over head_dim, per-head weights)
                # / Persimmon (q/k_layernorm with bias): mean-centered.
                def ln(x, node):
                    xf = x.astype(jnp.float32)
                    if c.qk_norm_type == "layernorm":
                        xf = xf - xf.mean(-1, keepdims=True)
                    y = xf * jax.lax.rsqrt(
                        jnp.square(xf).mean(-1, keepdims=True)
                        + c.rms_norm_eps)
                    y = y * node["weight"].astype(jnp.float32)
                    if "bias" in node:
                        y = y + node["bias"].astype(jnp.float32)
                    return y.astype(x.dtype)
                q = ln(q, attn["q_norm"])
                k = ln(k, attn["k_norm"])
            else:
                q = rms_norm(q, attn["q_norm"]["weight"], c.rms_norm_eps)
                k = rms_norm(k, attn["k_norm"]["weight"], c.rms_norm_eps)
            return q, k

        if c.qk_norm and not c.qk_norm_after_rope and \
                c.qk_norm_type != "l2":
            q, k = qk_norm(q, k)
        if c.attn_temperature_tuning and \
                self.rope_cache(layer_idx) is None:
            # Llama4 NoPE-layer temperature tuning
            # (Llama4TextAttention:339).
            pos_t = positions[0] if positions.ndim > 1 else positions
            scales = (jnp.log1p(jnp.floor(
                (pos_t.astype(jnp.float32) + 1.0) / c.attn_floor_scale))
                * c.attn_scale + 1.0)
            q = (q * scales[:, None, None]).astype(q.dtype)
        cos_sin = self.rope_cache(layer_idx)
        if cos_sin is not None:
            if c.mrope_section and c.mrope_interleaved:
                # Qwen3-VL: frequency-interleaved stream layout.
                from lvllm_tpu.ops.rope import (
                    apply_mrope_interleaved_streams)
                q, k = apply_mrope_interleaved_streams(
                    q, k, positions, cos_sin, c.mrope_section)
            elif c.mrope_section and c.rope_interleaved:
                # GLM-4V: M-RoPE sections + interleaved partial rotation.
                from lvllm_tpu.ops.rope import apply_mrope_interleaved
                q, k = apply_mrope_interleaved(q, k, positions, cos_sin,
                                               c.mrope_section)
            elif c.mrope_section:
                # Qwen2-VL M-RoPE: positions is [3, T] (t/h/w streams).
                from lvllm_tpu.ops.rope import apply_mrope
                q, k = apply_mrope(q, k, positions, cos_sin,
                                   c.mrope_section)
            elif c.rope_interleaved:
                from lvllm_tpu.ops.rope import apply_rope_interleaved
                q, k = apply_rope_interleaved(q, k, positions, cos_sin)
            else:
                q, k = apply_rope(q, k, positions, cos_sin)
        if c.qk_norm and c.qk_norm_type == "l2" and \
                self.rope_cache(layer_idx) is not None:
            # Llama4: weightless L2 qk-norm AFTER rope, rope layers only
            # (Llama4TextAttention:309,333).
            q = (q * jax.lax.rsqrt(
                jnp.square(q.astype(jnp.float32)).mean(
                    -1, keepdims=True) + 1e-6)).astype(q.dtype)
            k = (k * jax.lax.rsqrt(
                jnp.square(k.astype(jnp.float32)).mean(
                    -1, keepdims=True) + 1e-6)).astype(k.dtype)
        if c.qk_norm and c.qk_norm_after_rope:    # Hunyuan ordering
            q, k = qk_norm(q, k)
        if md.pcp_prefill and self.pcp > 1:
            # PCP: this step is one long-prefill chunk, queries sharded
            # over the mesh "context" axis (runner gates eligibility —
            # no SWA/sinks/softcap/ALiBi models take this path).
            from lvllm_tpu.parallel.prefill_cp import pcp_chunked_prefill
            n_valid = md.query_start_loc[1]
            start = md.seq_lens[0] - n_valid
            out, kv_cache = pcp_chunked_prefill(
                q, k, v, kv_cache, md.block_table[0], positions,
                md.slot_mapping, n_valid, start, self.mesh, self.scale)
            attn_flat = out.reshape(T, c.num_attention_heads * D)
            out = dense_matmul(attn_flat, attn["o_proj"])
            if "bias" in attn["o_proj"]:
                out = out + attn["o_proj"]["bias"]
            return out, kv_cache
        if md.dcp_slot_mapping is not None:
            from lvllm_tpu.ops.context_parallel import dcp_write_and_attend
            out, kv_cache = dcp_write_and_attend(
                q, k, v, kv_cache, md.block_table, positions,
                md.query_start_loc, md.dcp_slot_mapping, self.mesh,
                self.scale, sliding_window=window,
                logits_soft_cap=soft_cap, sinks=sinks,
                alibi_slopes=self.alibi_slopes)
            attn_flat = out.reshape(T, c.num_attention_heads * D)
            out = dense_matmul(attn_flat, attn["o_proj"])
            if "bias" in attn["o_proj"]:
                out = out + attn["o_proj"]["bias"]
            if lora is not None and f"{layer_idx}.o_proj" in lora:
                from lvllm_tpu.lora.layers import apply_lora
                out = apply_lora(attn_flat, out,
                                 lora[f"{layer_idx}.o_proj"],
                                 token_adapter)
            return out, kv_cache
        if isinstance(kv_cache, dict) and "packed" in kv_cache:
            # INT4 KV (Int4KVSpec two-leaf dict layout). Pallas
            # in-DMA-dequant read on TPU, jnp oracle elsewhere
            # (ops/kv_cache_int4.py, ops/pallas/int4_attention.py).
            from lvllm_tpu.ops.kv_cache_int4 import (
                ragged_paged_attention_int4, write_kv_int4)
            kv_cache = write_kv_int4(kv_cache, k, v, md.slot_mapping)
            out = ragged_paged_attention_int4(
                q, kv_cache, md.block_table, md.query_start_loc,
                md.seq_lens, scale=self.scale, sliding_window=window,
                logits_soft_cap=soft_cap)
            attn_flat = out.reshape(T, c.num_attention_heads * D)
            out = dense_matmul(attn_flat, attn["o_proj"])
            if "bias" in attn["o_proj"]:
                out = out + attn["o_proj"]["bias"]
            if lora is not None and f"{layer_idx}.o_proj" in lora:
                from lvllm_tpu.lora.layers import apply_lora
                out = apply_lora(attn_flat, out,
                                 lora[f"{layer_idx}.o_proj"],
                                 token_adapter)
            return out, kv_cache
        kv_cache = write_kv(kv_cache, k, v, md.slot_mapping)
        if md.cascade_prefix_blocks is not None and sinks is None \
                and soft_cap is None and self.alibi_slopes is None:
            # Shared-prefix cascade: dense non-causal attention over the
            # common prefix pages + ragged attention over unique suffixes,
            # merged by LSE (ops/cascade.py; reference
            # gpu_model_runner.py:2356-2489).
            from lvllm_tpu.ops.cascade import cascade_attention
            BS = kv_cache.shape[2]
            pages = kv_cache[:, md.cascade_prefix_blocks]
            P_ = pages.shape[1] * BS
            Hkv = kv_cache.shape[3]
            Dp = kv_cache.shape[-1]     # lane-padded (config.kv_cache_dim)
            pk = pages[0].reshape(P_, Hkv, Dp)
            pv = pages[1].reshape(P_, Hkv, Dp)
            out = cascade_attention(
                q, pk, pv, kv_cache, md.cascade_suffix_block_table,
                md.query_start_loc, md.cascade_suffix_seq_lens, self.scale,
                prefix_len=md.cascade_prefix_len)
        else:
            out = ragged_paged_attention(
                q, kv_cache, md.block_table, md.query_start_loc,
                md.seq_lens, scale=self.scale,
                sliding_window=window, logits_soft_cap=soft_cap,
                sinks=sinks, alibi_slopes=self.alibi_slopes,
                prefix_lens=md.prefix_lens)
        attn_flat = out.reshape(T, c.num_attention_heads * D)
        if out_gate is not None:
            attn_flat = (attn_flat.astype(jnp.float32) *
                         out_gate).astype(attn_flat.dtype)
        out = dense_matmul(attn_flat, attn["o_proj"])
        if "bias" in attn["o_proj"]:
            out = out + attn["o_proj"]["bias"]
        if lora is not None and f"{layer_idx}.o_proj" in lora:
            from lvllm_tpu.lora.layers import apply_lora
            out = apply_lora(attn_flat, out, lora[f"{layer_idx}.o_proj"],
                             token_adapter)
        return out, kv_cache

    def _sp_shard(self, x: jax.Array) -> jax.Array:
        """Sequence-parallel activation constraint (SURVEY §2.3 SP; the
        reference's sequence_parallelism compilation pass): shard the token
        dim of the norm/residual region over the model axis so XLA derives
        reduce-scatter + all-gather instead of a full all-reduce at the
        row-parallel boundaries."""
        if not self.sequence_parallel or self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        from lvllm_tpu.parallel.mesh import AXIS_MODEL
        if self.mesh.shape.get(AXIS_MODEL, 1) <= 1:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(AXIS_MODEL, None)))

    def _use_ep(self) -> bool:
        from lvllm_tpu.parallel.mesh import AXIS_DATA, AXIS_EXPERT
        if self.mesh is None or self.mesh.shape.get(AXIS_EXPERT, 1) <= 1:
            return False
        # EP spans DP: experts are partitioned over the joint
        # (data, expert) group (reference DP+EP, fused_moe/layer.py:84).
        group = (self.mesh.shape[AXIS_EXPERT] *
                 self.mesh.shape.get(AXIS_DATA, 1))
        return self.config.num_experts % group == 0

    def _dp_shard(self, x: jax.Array) -> jax.Array:
        """Data-parallel activation constraint: shard the token dim over
        the "data" axis so the dense per-token compute (norms, FFN/MoE
        GEMM inputs, logits) partitions across DP shards — the SPMD form
        of the reference's per-rank DP batches. Idle shards see only
        padding rows (the reference's dummy batches, dp_utils.py)."""
        if self.mesh is None or self.mesh.shape.get("data", 1) <= 1:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P("data", None)))

    def _ffn(self, lp: Params, x: jax.Array, layer_idx: int,
             lora=None, token_adapter=None) -> jax.Array:
        c = self.config
        if "moe" in lp:
            moe = lp["moe"]
            if "w1_q" in moe:
                # Per-layer method: hybrid FP8+INT4 maps resolve here
                # (ModelConfig.quant_method_for_layer; reference
                # MoeComputeStrategy). The tensor dtype is the fallback
                # witness for pre-quantized layers.
                lm = c.quant_method_for_layer(layer_idx)
                if lm is None or lm == "keep":
                    lm = ("fp8" if str(moe["w1_q"].dtype).startswith(
                        "float8") else c.quantization or "int8")
                qp = QuantMoEParams(
                    router=moe["router"],
                    w1_q=moe["w1_q"], w1_scales=moe["w1_scales"],
                    w2_q=moe["w2_q"], w2_scales=moe["w2_scales"],
                    method=lm, group_size=128,
                    router_bias=moe.get("router_bias"),
                    shared_w1=moe.get("shared_w1"),
                    shared_w2=moe.get("shared_w2"),
                    shared_gate=moe.get("shared_gate"))
                if self._use_ep():
                    from lvllm_tpu.parallel.mesh import AXIS_EXPERT
                    ep = self.mesh.shape[AXIS_EXPERT]
                    if (self.moe_backend == "alltoall"
                            and self.mesh.shape.get("data", 1) == 1
                            and x.shape[0] %
                            (ep * max(self.moe_ubatches, 1)) == 0):
                        from lvllm_tpu.parallel.ep_alltoall import (
                            fused_moe_ep_a2a)
                        return fused_moe_ep_a2a(
                            x, qp, self.mesh, c.num_experts_per_tok,
                            c.norm_topk_prob, c.router_scoring_fn,
                            ubatch=self.moe_ubatches)
                    from lvllm_tpu.parallel.expert_parallel import (
                        fused_moe_ep_quant)
                    return fused_moe_ep_quant(
                        x, qp, self.mesh, c.num_experts_per_tok,
                        c.norm_topk_prob, c.router_scoring_fn)
                return fused_moe_quant(
                    x, qp, c.num_experts_per_tok, c.norm_topk_prob,
                    c.router_scoring_fn, e_score_bias=moe.get("e_score_bias"),
                    scaling_factor=c.routed_scaling_factor,
                    n_group=c.n_group, topk_group=c.topk_group,
                    weight_on_input=c.moe_apply_weight_on_input,
                    logit_softcap=c.router_logit_softcap)
            mp = MoEParams(
                router=moe["router"], w1=moe["w1"], w2=moe["w2"],
                router_bias=moe.get("router_bias"),
                shared_w1=moe.get("shared_w1"), shared_w2=moe.get("shared_w2"),
                shared_gate=moe.get("shared_gate"),
                w1_bias=moe.get("w1_bias"), w2_bias=moe.get("w2_bias"))
            if self._use_ep():
                from lvllm_tpu.parallel.mesh import AXIS_EXPERT
                ep = self.mesh.shape[AXIS_EXPERT]
                if (self.moe_backend == "alltoall"
                        and self.mesh.shape.get("data", 1) == 1
                        and x.shape[0] % (ep * max(self.moe_ubatches, 1))
                        == 0):
                    from lvllm_tpu.parallel.ep_alltoall import (
                        fused_moe_ep_a2a)
                    return fused_moe_ep_a2a(
                        x, mp, self.mesh, c.num_experts_per_tok,
                        c.norm_topk_prob, c.router_scoring_fn,
                        ubatch=self.moe_ubatches)
                from lvllm_tpu.parallel.expert_parallel import fused_moe_ep
                return fused_moe_ep(x, mp, self.mesh, c.num_experts_per_tok,
                                    c.norm_topk_prob, c.router_scoring_fn)
            return fused_moe(
                x, mp, c.num_experts_per_tok, c.norm_topk_prob,
                c.router_scoring_fn, e_score_bias=moe.get("e_score_bias"),
                scaling_factor=c.routed_scaling_factor,
                n_group=c.n_group, topk_group=c.topk_group,
                activation=c.hidden_act,
                weight_on_input=c.moe_apply_weight_on_input,
                logit_softcap=c.router_logit_softcap)
        mlp = lp["mlp"]
        if "up" in mlp and c.hidden_act == "xielu":
            # Apertus xIELU (HF XIELUActivation._xielu_python): learnable
            # alpha_p/alpha_n per layer, beta=0.5, eps=-1e-6.
            h = dense_matmul(x, mlp["up"]).astype(jnp.float32)
            ap = jax.nn.softplus(mlp["alpha_p"].astype(jnp.float32))
            an = 0.5 + jax.nn.softplus(mlp["alpha_n"].astype(jnp.float32))
            y = jnp.where(
                h > 0,
                ap * h * h + 0.5 * h,
                (jnp.expm1(jnp.minimum(h, -1e-6)) - h) * an + 0.5 * h)
            return dense_matmul(y.astype(x.dtype), mlp["down"])
        if "up" in mlp:
            # Non-gated MLP (GPT-2 c_fc/c_proj, Starcoder2, Nemotron relu²).
            from lvllm_tpu.layers.common import ACTIVATIONS_SINGLE
            act = ACTIVATIONS_SINGLE[c.hidden_act]
            h = dense_matmul(x, mlp["up"])
            if "bias" in mlp["up"]:
                h = h + mlp["up"]["bias"]
            y = dense_matmul(act(h), mlp["down"])
            if "bias" in mlp["down"]:
                y = y + mlp["down"]["bias"]
            return y
        from lvllm_tpu.layers.common import ACTIVATIONS
        act = ACTIVATIONS[c.hidden_act]
        h = dense_matmul(x, mlp["gate_up"])
        if "bias" in mlp["gate_up"]:
            h = h + mlp["gate_up"]["bias"]
        if lora is not None and f"{layer_idx}.gate_up" in lora:
            from lvllm_tpu.lora.layers import apply_lora
            h = apply_lora(x, h, lora[f"{layer_idx}.gate_up"],
                           token_adapter)
        a = act(h)
        y = dense_matmul(a, mlp["down"])
        if "bias" in mlp["down"]:
            y = y + mlp["down"]["bias"]
        if lora is not None and f"{layer_idx}.down" in lora:
            from lvllm_tpu.lora.layers import apply_lora
            y = apply_lora(a, y, lora[f"{layer_idx}.down"], token_adapter)
        return y

    def rope_cache(self, layer_idx: int):
        """Per-layer rope table hook (Gemma3 uses a separate local-rope
        base on sliding_attention layers; None = NoPE layer, SmolLM3)."""
        nrl = self.config.no_rope_layers
        if nrl is not None and not nrl[layer_idx]:
            return None
        return self.cos_sin

    def embed_tokens(self, params: Params, input_ids: jax.Array,
                     positions: jax.Array = None) -> jax.Array:
        x = params["embed"]["weight"][input_ids].astype(self.dtype)
        if "pos_embed" in params and positions is not None:
            # GPT-2 wpe learned absolute positions.
            x = x + params["pos_embed"]["weight"][positions].astype(
                self.dtype)
        if "embed_norm" in params:
            x = self._norm(params["embed_norm"], x)
        if self.config.scale_embedding:
            # Gemma scales embeddings by √H, rounded to the model dtype
            # (HF uses a tensor normalizer in the embed dtype).
            normalizer = jnp.asarray(
                self.config.hidden_size ** 0.5, self.dtype)
            x = x * normalizer
        if self.config.embedding_multiplier != 1.0:
            x = x * self.config.embedding_multiplier
        return x

    def apply_layer(
        self,
        layer_params: Params,
        x: jax.Array,
        residual: jax.Array,
        positions: jax.Array,
        kv_cache: jax.Array,
        attn_metadata: AttentionMetadata,
        layer_idx: int,
        lora=None,
        token_adapter=None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """One decoder layer: returns (ffn_out, residual, new_kv_cache).
        Used both by the fused __call__ and by the staged/streamed runner
        (offload/expert_store.py), where each layer is dispatched separately
        so host→HBM expert streaming can overlap compute."""
        c = self.config
        lp = layer_params
        if self.sequence_parallel:
            x = self._sp_shard(x)
            residual = self._sp_shard(residual)
        else:
            x = self._dp_shard(x)
            residual = self._dp_shard(residual)
        if c.parallel_residual:
            # x = x + attn(norm(x)) + mlp(norm'(x)) (GPT-NeoX / Phi /
            # Falcon parallel blocks).
            hidden = (x.astype(jnp.float32) +
                      residual.astype(jnp.float32)).astype(x.dtype)
            h_attn = self._norm(lp["input_layernorm"], hidden)
            h_mlp = (h_attn if c.parallel_residual == "single"
                     else self._norm(lp["post_attention_layernorm"],
                                     hidden))
            attn_out, kv = self._attention(
                lp, h_attn, positions, kv_cache, attn_metadata, lora,
                token_adapter, layer_idx=layer_idx)
            ffn_out = self._ffn(lp, h_mlp, layer_idx, lora, token_adapter)
            out = (attn_out.astype(jnp.float32) +
                   ffn_out.astype(jnp.float32)).astype(x.dtype)
            return out, hidden, kv
        if c.norm_after:
            # OLMo2 ordering: attend the raw hidden state, norm the
            # sublayer output, then residual-add.
            hidden = (x.astype(jnp.float32) +
                      residual.astype(jnp.float32)).astype(x.dtype)
            attn_out, kv = self._attention(
                lp, hidden, positions, kv_cache, attn_metadata, lora,
                token_adapter, layer_idx=layer_idx)
            attn_out = self._norm(lp["post_attention_layernorm"], attn_out)
            hidden = (hidden.astype(jnp.float32) +
                      attn_out.astype(jnp.float32)).astype(x.dtype)
            ffn_out = self._ffn(lp, hidden, layer_idx, lora, token_adapter)
            ffn_out = self._norm(lp["post_feedforward_layernorm"], ffn_out)
            return ffn_out, hidden, kv
        h, residual = self._add_norm(lp["input_layernorm"], x, residual)
        attn_out, kv = self._attention(lp, h, positions, kv_cache,
                                       attn_metadata, lora, token_adapter,
                                       layer_idx=layer_idx)
        if c.sandwich_output_norms:            # GLM-4 dense
            attn_out = self._norm(lp["post_self_attn_layernorm"], attn_out)
        if c.residual_multiplier != 1.0:       # Granite muP
            attn_out = attn_out * c.residual_multiplier
        h, residual = self._add_norm(
            lp["post_attention_layernorm"], attn_out, residual)
        x = self._ffn(lp, h, layer_idx, lora, token_adapter)
        if c.sandwich_output_norms:
            x = self._norm(lp["post_mlp_layernorm"], x)
        if c.residual_multiplier != 1.0:
            x = x * c.residual_multiplier
        return x, residual, kv

    def finalize_hidden(self, params: Params, x: jax.Array,
                        residual: jax.Array) -> jax.Array:
        hidden, _ = self._add_norm(params["norm"], x, residual)
        return hidden

    def __call__(
        self,
        params: Params,
        input_ids: jax.Array,
        positions: jax.Array,
        kv_caches: KVCaches,
        attn_metadata: AttentionMetadata,
        lora=None,
        token_adapter=None,
        mm_embeds=None,
        mm_mask=None,
        mm_deepstack=None,
        aux_hidden_layers: Tuple[int, ...] = (),
    ) -> Tuple[jax.Array, KVCaches]:
        """``aux_hidden_layers`` (static): also return the residual-stream
        hidden after those layer indices, concatenated [T, len*H] — the
        EAGLE-3 multi-level feature tap (reference: eagle3 aux_hidden_state
        collection in the target forward)."""
        x = self.embed_tokens(params, input_ids, positions)
        if lora is not None and "embed_tokens" in lora and \
                token_adapter is not None:
            from lvllm_tpu.lora.layers import apply_lora_embedding
            x = apply_lora_embedding(input_ids, x, lora["embed_tokens"],
                                     token_adapter)
        if mm_embeds is not None:
            # Multimodal splice (reference: merge_multimodal_embeddings):
            # rows flagged by mm_mask take precomputed image features.
            mm = mm_embeds.astype(x.dtype)
            if "pos_embed" in params and positions is not None:
                # Learned-position decoders (BLIP-2's OPT) add wpe AFTER
                # the splice in HF — keep the positional signal on the
                # replaced rows.
                mm = mm + params["pos_embed"]["weight"][positions].astype(
                    self.dtype)
            x = jnp.where(mm_mask[:, None], mm, x)
        residual = jnp.zeros_like(x)
        new_caches: List[jax.Array] = []
        aux: List[jax.Array] = []
        c = self.config
        bskcn = c.bskcn_1 or c.bskcn_2 or c.bskcn_3 or c.bskcn_4
        sv1 = sv2 = None
        for i, lp in enumerate(params["layers"]):
            if bskcn:
                # Solar backbone skip connections (reference
                # solar.py:317-335): snapshot/blend BOTH streams so the
                # blend acts on the true hidden state x + residual.
                tv = c.bskcn_tv
                if c.bskcn_1 and i in c.bskcn_1:
                    sv1 = (x, residual)
                if c.bskcn_2 and i in c.bskcn_2:
                    sv2 = (x, residual)
                if c.bskcn_3 and i in c.bskcn_3 and sv1 is not None:
                    x = sv1[0] * tv + x * (1.0 - tv)
                    residual = sv1[1] * tv + residual * (1.0 - tv)
                if c.bskcn_4 and i in c.bskcn_4 and sv2 is not None:
                    x = sv2[0] * tv + x * (1.0 - tv)
                    residual = sv2[1] * tv + residual * (1.0 - tv)
            x, residual, kv = self.apply_layer(
                lp, x, residual, positions, kv_caches[i], attn_metadata, i,
                lora, token_adapter)
            if mm_deepstack is not None and i < mm_deepstack.shape[0]:
                # Deepstack (Qwen3-VL): per-level vision features added to
                # the residual stream after the first L layers (reference:
                # qwen3_vl.py:1532 deepstack_input_embeds; zeros at
                # non-image rows).
                x = x + mm_deepstack[i].astype(x.dtype)
            new_caches.append(kv)
            if i in aux_hidden_layers:
                aux.append(x + residual)
        hidden = self.finalize_hidden(params, x, residual)
        if aux_hidden_layers:
            return hidden, new_caches, jnp.concatenate(aux, axis=-1)
        return hidden, new_caches

    def compute_logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        if self.config.tie_word_embeddings:
            logits = (hidden @ params["embed"]["weight"].T
                      ).astype(jnp.float32)
        else:
            logits = dense_matmul(hidden,
                                  params["lm_head"]).astype(jnp.float32)
        if not self.config.tie_word_embeddings and \
                "bias" in params.get("lm_head", {}):
            logits = logits + params["lm_head"]["bias"].astype(jnp.float32)
        if self.config.logits_scaling != 1.0:  # Granite divides
            logits = logits / self.config.logits_scaling
        cap = self.config.final_logit_softcap
        if cap:
            logits = cap * jnp.tanh(logits / cap)
        return logits

    # ---- weight loading ---------------------------------------------------

    def _adapt_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                       ) -> Iterable[Tuple[str, np.ndarray]]:
        """Per-family checkpoint-name normalization into the canonical
        llama-style naming the main mapping understands. GPT-2 is the big
        one: Conv1D tensors are stored [in, out] (transposed vs nn.Linear)
        and qkv is fused in c_attn (reference: models/gpt2.py load_weights
        Conv1D handling)."""
        arch = self.config.architecture
        # Classifier variants load their backbone with the base family's
        # name mapping (the head itself is handled by the subclass).
        arch = {"GPT2ForSequenceClassification": "GPT2LMHeadModel",
                # BLIP-2 text stack is OPT; the vision/Q-Former tensors
                # were already consumed by the subclass's filter.
                "Blip2ForConditionalGeneration": "OPTForCausalLM"}.get(
            arch, arch)
        if arch == "VaultGemmaForCausalLM":
            # VaultGemma (HF modeling_vaultgemma): standard two-pre-norm
            # layer — pre_feedforward_layernorm takes our
            # post_attention_layernorm slot — with Gemma's zero-centered
            # RMSNorm weights ((1 + w); fold the +1 at load).
            for name, w in weights:
                name = name.replace("pre_feedforward_layernorm",
                                    "post_attention_layernorm")
                if name.endswith("layernorm.weight") or \
                        name.endswith("norm.weight"):
                    w = np.asarray(w, np.float32) + 1.0
                yield name, w
            return
        if arch == "GPT2LMHeadModel":
            H = self.config.hidden_size
            for name, w in weights:
                name = name.removeprefix("transformer.")
                if name == "wte.weight":
                    yield "embed_tokens.weight", w
                elif name == "wpe.weight":
                    yield "pos_embed.weight", w
                elif name.startswith("ln_f."):
                    yield "norm." + name.split(".")[-1], w
                elif m := re.match(r"h\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if m2 := re.match(r"ln_([12])\.(weight|bias)", rest):
                        slot = ("input_layernorm" if m2.group(1) == "1"
                                else "post_attention_layernorm")
                        yield p + f"{slot}.{m2.group(2)}", w
                    elif rest == "attn.c_attn.weight":
                        q, k, v = np.split(np.ascontiguousarray(w.T), 3)
                        yield p + "self_attn.q_proj.weight", q
                        yield p + "self_attn.k_proj.weight", k
                        yield p + "self_attn.v_proj.weight", v
                    elif rest == "attn.c_attn.bias":
                        q, k, v = np.split(w, 3)
                        yield p + "self_attn.q_proj.bias", q
                        yield p + "self_attn.k_proj.bias", k
                        yield p + "self_attn.v_proj.bias", v
                    elif rest == "attn.c_proj.weight":
                        yield p + "self_attn.o_proj.weight", \
                            np.ascontiguousarray(w.T)
                    elif rest == "attn.c_proj.bias":
                        yield p + "self_attn.o_proj.bias", w
                    elif rest == "mlp.c_fc.weight":
                        yield p + "mlp.up_proj.weight", \
                            np.ascontiguousarray(w.T)
                    elif rest == "mlp.c_fc.bias":
                        yield p + "mlp.up_proj.bias", w
                    elif rest == "mlp.c_proj.weight":
                        yield p + "mlp.down_proj.weight", \
                            np.ascontiguousarray(w.T)
                    elif rest == "mlp.c_proj.bias":
                        yield p + "mlp.down_proj.bias", w
                    else:
                        yield name, w
                else:
                    yield name, w
        elif arch in ("InternLM2ForCausalLM", "InternLM2ForRewardModel",
                      "InternLM2VEForCausalLM"):
            # InternLM2 fuses qkv grouped by kv-head (wqkv rows =
            # [kv, q_per_group+2, D]) and renames everything
            # (reference: models/internlm2.py).
            c = self.config
            Hq, Hkv, D = (c.num_attention_heads, c.num_key_value_heads,
                          c.head_dim)
            for name, w in weights:
                name = name.removeprefix("model.")
                if name == "tok_embeddings.weight":
                    yield "embed_tokens.weight", w
                elif name == "output.weight":
                    yield "lm_head.weight", w
                elif ".feed_forward_ve." in name:
                    # InternLM2-VE visual-expert FFN: only active on
                    # image rows inside InternVL-mono; unused for text
                    # serving (reference internlm2_ve.py).
                    continue
                elif m := re.match(r"layers\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if m2 := re.match(r"attention\.wqkv\.(weight|bias)",
                                      rest):
                        kind = m2.group(1)
                        tail = w.shape[1:] if kind == "weight" else ()
                        g = w.reshape(Hkv, Hq // Hkv + 2, D, *tail)
                        yield (p + "self_attn.q_proj." + kind,
                               g[:, :-2].reshape(Hq * D, *tail))
                        yield (p + "self_attn.k_proj." + kind,
                               g[:, -2].reshape(Hkv * D, *tail))
                        yield (p + "self_attn.v_proj." + kind,
                               g[:, -1].reshape(Hkv * D, *tail))
                    elif m2 := re.match(r"attention\.wo\.(weight|bias)",
                                        rest):
                        yield p + "self_attn.o_proj." + m2.group(1), w
                    elif m2 := re.match(r"feed_forward\.w([123])\.weight",
                                        rest):
                        which = {"1": "gate", "3": "up",
                                 "2": "down"}[m2.group(1)]
                        yield p + f"mlp.{which}_proj.weight", w
                    elif rest == "attention_norm.weight":
                        yield p + "input_layernorm.weight", w
                    elif rest == "ffn_norm.weight":
                        yield p + "post_attention_layernorm.weight", w
                    else:
                        yield name, w
                else:
                    yield name, w
        elif arch in ("BaichuanForCausalLM", "BaiChuanForCausalLM"):
            # Baichuan W_pack = plain [q|k|v] concat; Baichuan2 NormHead
            # row-normalizes the LM head at load (reference:
            # models/baichuan.py NormHead handling).
            c = self.config
            qw = c.num_attention_heads * c.head_dim
            for name, w in weights:
                if name == "lm_head.weight" and c.vocab_size == 125696:
                    norms = np.linalg.norm(w, axis=-1, keepdims=True)
                    yield name, w / np.maximum(norms, 1e-12)
                elif m := re.match(
                        r"model\.layers\.(\d+)\.self_attn\.W_pack\.weight",
                        name):
                    p = f"model.layers.{m.group(1)}.self_attn."
                    yield p + "q_proj.weight", w[:qw]
                    yield p + "k_proj.weight", w[qw:2 * qw]
                    yield p + "v_proj.weight", w[2 * qw:]
                else:
                    yield name, w
        elif arch == "OPTForCausalLM":
            # OPT (HF OPTDecoder): learned positions with offset 2 (rows
            # sliced off here so wpe[pos] is direct), per-layer
            # self_attn_layer_norm / final_layer_norm naming, fc1/fc2 MLP.
            for name, w in weights:
                name = name.removeprefix("model.").removeprefix("decoder.")
                if name == "embed_positions.weight":
                    yield "pos_embed.weight", w[2:]
                elif m := re.match(r"layers\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    rest = rest.replace("self_attn_layer_norm.",
                                        "input_layernorm.")
                    rest = rest.replace("final_layer_norm.",
                                        "post_attention_layernorm.")
                    rest = rest.replace("self_attn.out_proj.",
                                        "self_attn.o_proj.")
                    rest = rest.replace("fc1.", "mlp.up_proj.")
                    rest = rest.replace("fc2.", "mlp.down_proj.")
                    yield p + rest, w
                elif name.startswith("final_layer_norm."):
                    yield "norm." + name.split(".")[-1], w
                else:
                    yield name, w
        elif arch == "GPTJForCausalLM":
            # GPT-J (HF GPTJBlock): one shared ln_1 (parallel residual),
            # separate q/k/v/out projections, fc_in/fc_out MLP, biased
            # untied lm_head.
            for name, w in weights:
                name = name.removeprefix("transformer.")
                if name == "wte.weight":
                    yield "embed_tokens.weight", w
                elif name.startswith("ln_f."):
                    yield "norm." + name.split(".")[-1], w
                elif m := re.match(r"h\.(\d+)\.(.+)", name):
                    rest = m.group(2)
                    rest = rest.replace("ln_1.", "input_layernorm.")
                    if rest.startswith("attn."):
                        rest = "self_attn." + rest[len("attn."):]
                    rest = rest.replace("self_attn.out_proj.",
                                        "self_attn.o_proj.")
                    rest = rest.replace("mlp.fc_in.", "mlp.up_proj.")
                    rest = rest.replace("mlp.fc_out.", "mlp.down_proj.")
                    yield f"layers.{m.group(1)}." + rest, w
                else:
                    yield name, w
        elif arch in ("PersimmonForCausalLM", "FuyuForCausalLM"):
            # Persimmon (HF PersimmonAttention): fused per-head qkv
            # [Hh, 3, D], biased q/k layernorms, dense_h_to_4h MLP.
            c = self.config
            Hh, D = c.num_attention_heads, c.head_dim
            for name, w in weights:
                name = name.removeprefix("model.")
                if name.startswith("final_layernorm."):
                    yield "norm." + name.split(".")[-1], w
                elif m := re.match(r"layers\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if m2 := re.match(
                            r"self_attn\.query_key_value\.(weight|bias)",
                            rest):
                        kind = m2.group(1)
                        parts = (w.reshape(Hh, 3, D, -1)
                                 if kind == "weight"
                                 else w.reshape(Hh, 3, D))
                        for j, which in enumerate(("q", "k", "v")):
                            part = (parts[:, j].reshape(Hh * D, -1)
                                    if kind == "weight"
                                    else parts[:, j].reshape(Hh * D))
                            yield (p + f"self_attn.{which}_proj.{kind}",
                                   part)
                    else:
                        rest = rest.replace("self_attn.dense.",
                                            "self_attn.o_proj.")
                        rest = rest.replace("mlp.dense_h_to_4h.",
                                            "mlp.up_proj.")
                        rest = rest.replace("mlp.dense_4h_to_h.",
                                            "mlp.down_proj.")
                        yield p + rest, w
                else:
                    yield name, w
        elif arch == "Llama4ForCausalLM":
            # Llama4: feed_forward.* naming, stacked expert params
            # gate_up_proj [E, H, 2I] ([gate | up] halves, in-features
            # first) and down_proj [E, I, H]; shared_expert + router
            # (modeling_llama4.Llama4TextExperts:46).
            c = self.config
            E = c.num_experts
            I = c.moe_intermediate_size
            for name, w in weights:
                if m := re.match(
                        r"model\.layers\.(\d+)\.feed_forward\.(.+)",
                        name):
                    p_ = f"model.layers.{m.group(1)}.mlp."
                    rest = m.group(2)
                    if rest == "router.weight":
                        yield p_ + "gate.weight", w
                    elif rest == "experts.gate_up_proj":
                        wa = np.asarray(w)
                        for e in range(E):
                            yield (p_ + f"experts.{e}.gate_proj.weight",
                                   wa[e, :, :I].T)
                            yield (p_ + f"experts.{e}.up_proj.weight",
                                   wa[e, :, I:].T)
                    elif rest == "experts.down_proj":
                        wa = np.asarray(w)
                        for e in range(E):
                            yield (p_ + f"experts.{e}.down_proj.weight",
                                   wa[e].T)
                    elif rest.startswith("shared_expert."):
                        yield (p_ + rest.replace("shared_expert.",
                                                 "shared_experts."), w)
                    else:
                        yield p_ + rest, w
                else:
                    yield name, w
        elif arch in ("GraniteMoeForCausalLM",
                      "GraniteMoeSharedForCausalLM",
                      "GraniteMoeHybridForCausalLM"):
            # GraniteMoE stacks experts: input_linear [E, 2I, H] (gate‖up
            # halves of the output dim), output_linear [E, H, I]; router
            # at block_sparse_moe.router.layer.
            c = self.config
            E, I = c.num_experts, c.moe_intermediate_size
            Is = self.config.shared_expert_intermediate_size or 0
            for name, w in weights:
                if m := re.match(
                        r"model\.layers\.(\d+)\.shared_mlp\.(.+)", name):
                    # GraniteMoeShared always-on MLP: input_linear rows =
                    # [gate(Is) | up(Is)], output_linear = down.
                    p = f"model.layers.{m.group(1)}.mlp."
                    rest = m.group(2)
                    if rest == "input_linear.weight":
                        yield p + "shared_experts.gate_proj.weight", w[:Is]
                        yield p + "shared_experts.up_proj.weight", w[Is:]
                    elif rest == "output_linear.weight":
                        yield p + "shared_experts.down_proj.weight", w
                    else:
                        yield name, w
                elif m := re.match(
                        r"model\.layers\.(\d+)\.block_sparse_moe\.(.+)",
                        name):
                    p = f"model.layers.{m.group(1)}.mlp."
                    rest = m.group(2)
                    if rest == "router.layer.weight":
                        yield p + "gate.weight", w
                    elif rest == "input_linear.weight":
                        for e in range(E):
                            yield (p + f"experts.{e}.gate_proj.weight",
                                   w[e, :I])
                            yield (p + f"experts.{e}.up_proj.weight",
                                   w[e, I:])
                    elif rest == "output_linear.weight":
                        for e in range(E):
                            yield p + f"experts.{e}.down_proj.weight", w[e]
                    else:
                        yield name, w
                else:
                    yield name, w
        elif arch == "GPTNeoXForCausalLM":
            # NeoX fuses qkv per head: rows [h*3D:(h+1)*3D] hold q|k|v for
            # head h (HF GPTNeoXAttention hidden_shape view).
            c = self.config
            Hh, D = c.num_attention_heads, c.head_dim
            for name, w in weights:
                name = name.removeprefix("gpt_neox.")
                if name == "embed_in.weight":
                    yield "embed_tokens.weight", w
                elif name.startswith("final_layer_norm."):
                    yield "norm." + name.split(".")[-1], w
                elif name.startswith("embed_out."):
                    yield "lm_head." + name.split(".")[-1], w
                elif m := re.match(r"layers\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if m2 := re.match(
                            r"attention\.query_key_value\.(weight|bias)",
                            rest):
                        kind = m2.group(1)
                        parts = w.reshape(Hh, 3, D, -1) if kind == "weight" \
                            else w.reshape(Hh, 3, D)
                        for j, which in enumerate(("q", "k", "v")):
                            part = parts[:, j].reshape(
                                Hh * D, -1) if kind == "weight" \
                                else parts[:, j].reshape(Hh * D)
                            yield (p + f"self_attn.{which}_proj.{kind}",
                                   part)
                    elif m2 := re.match(r"attention\.dense\.(weight|bias)",
                                        rest):
                        yield p + "self_attn.o_proj." + m2.group(1), w
                    elif m2 := re.match(
                            r"mlp\.dense_h_to_4h\.(weight|bias)", rest):
                        yield p + "mlp.up_proj." + m2.group(1), w
                    elif m2 := re.match(
                            r"mlp\.dense_4h_to_h\.(weight|bias)", rest):
                        yield p + "mlp.down_proj." + m2.group(1), w
                    else:
                        yield name, w
                else:
                    yield name, w
        elif arch == "PhiForCausalLM":
            for name, w in weights:
                name = name.replace("self_attn.dense.", "self_attn.o_proj.")
                name = name.replace("mlp.fc1.", "mlp.up_proj.")
                name = name.replace("mlp.fc2.", "mlp.down_proj.")
                name = name.replace("final_layernorm.", "norm.")
                yield name, w
        elif arch in ("FalconForCausalLM", "RWForCausalLM"):
            # Falcon fused qkv layouts (HF FalconAttention._split_heads):
            # new_decoder_architecture → [kv_groups, q_per_group+2, D];
            # multi_query → [Hq+2, D]; else per-head [Hq, 3, D].
            c = self.config
            Hq, Hkv, D = (c.num_attention_heads, c.num_key_value_heads,
                          c.head_dim)
            for name, w in weights:
                name = name.removeprefix("transformer.")
                if name == "word_embeddings.weight":
                    yield "embed_tokens.weight", w
                elif name.startswith("ln_f."):
                    yield "norm." + name.split(".")[-1], w
                elif m := re.match(r"h\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if m2 := re.match(
                            r"self_attention\.query_key_value"
                            r"\.(weight|bias)", rest):
                        kind = m2.group(1)
                        tail = w.shape[1:] if kind == "weight" else ()
                        if Hkv > 1 and Hq != Hkv:   # new arch, grouped
                            g = w.reshape(Hkv, Hq // Hkv + 2, D, *tail)
                            q = g[:, :-2].reshape(Hq * D, *tail)
                            k = g[:, -2].reshape(Hkv * D, *tail)
                            v = g[:, -1].reshape(Hkv * D, *tail)
                        elif Hkv == 1:              # multi-query (7B)
                            g = w.reshape(Hq + 2, D, *tail)
                            q = g[:-2].reshape(Hq * D, *tail)
                            k = g[-2].reshape(D, *tail)
                            v = g[-1].reshape(D, *tail)
                        else:                        # per-head interleave
                            g = w.reshape(Hq, 3, D, *tail)
                            q = g[:, 0].reshape(Hq * D, *tail)
                            k = g[:, 1].reshape(Hq * D, *tail)
                            v = g[:, 2].reshape(Hq * D, *tail)
                        yield p + "self_attn.q_proj." + kind, q
                        yield p + "self_attn.k_proj." + kind, k
                        yield p + "self_attn.v_proj." + kind, v
                    elif m2 := re.match(
                            r"self_attention\.dense\.(weight|bias)", rest):
                        yield p + "self_attn.o_proj." + m2.group(1), w
                    elif m2 := re.match(
                            r"mlp\.dense_h_to_4h\.(weight|bias)", rest):
                        yield p + "mlp.up_proj." + m2.group(1), w
                    elif m2 := re.match(
                            r"mlp\.dense_4h_to_h\.(weight|bias)", rest):
                        yield p + "mlp.down_proj." + m2.group(1), w
                    elif m2 := re.match(r"ln_attn\.(weight|bias)", rest):
                        yield p + "input_layernorm." + m2.group(1), w
                    elif m2 := re.match(r"ln_mlp\.(weight|bias)", rest):
                        yield (p + "post_attention_layernorm." +
                               m2.group(1), w)
                    else:
                        yield name, w
                else:
                    yield name, w
        elif arch == "GPTBigCodeForCausalLM":
            # Starcoder-1/Santacoder: GPT-2 layout but nn.Linear (no Conv1D
            # transpose) and MQA: c_attn rows = [Hq*D | D | D].
            c = self.config
            qw = c.num_attention_heads * c.head_dim
            kvw = c.num_key_value_heads * c.head_dim
            for name, w in weights:
                name = name.removeprefix("transformer.")
                if name == "wte.weight":
                    yield "embed_tokens.weight", w
                elif name == "wpe.weight":
                    yield "pos_embed.weight", w
                elif name.startswith("ln_f."):
                    yield "norm." + name.split(".")[-1], w
                elif m := re.match(r"h\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if m2 := re.match(r"ln_([12])\.(weight|bias)", rest):
                        slot = ("input_layernorm" if m2.group(1) == "1"
                                else "post_attention_layernorm")
                        yield p + f"{slot}.{m2.group(2)}", w
                    elif m2 := re.match(r"attn\.c_attn\.(weight|bias)",
                                        rest):
                        kind = m2.group(1)
                        yield p + "self_attn.q_proj." + kind, w[:qw]
                        yield p + "self_attn.k_proj." + kind, \
                            w[qw:qw + kvw]
                        yield p + "self_attn.v_proj." + kind, w[qw + kvw:]
                    elif m2 := re.match(r"attn\.c_proj\.(weight|bias)",
                                        rest):
                        yield p + "self_attn.o_proj." + m2.group(1), w
                    elif m2 := re.match(r"mlp\.c_fc\.(weight|bias)", rest):
                        yield p + "mlp.up_proj." + m2.group(1), w
                    elif m2 := re.match(r"mlp\.c_proj\.(weight|bias)",
                                        rest):
                        yield p + "mlp.down_proj." + m2.group(1), w
                    else:
                        yield name, w
                else:
                    yield name, w
        elif arch == "DbrxForCausalLM":
            # DBRX (reference: models/dbrx.py): fused Wqkv, expert weights
            # stacked [E*I, H] as raw Parameters w1 (gate) / v1 (up) / w2
            # (down, consumed untransposed: intermediate @ w2).
            c = self.config
            D = c.head_dim
            qw = c.num_attention_heads * D
            kvw = c.num_key_value_heads * D
            E, I = c.num_experts, c.moe_intermediate_size
            for name, w in weights:
                name = name.removeprefix("transformer.")
                if name == "wte.weight":
                    yield "embed_tokens.weight", w
                elif name == "norm_f.weight":
                    yield "norm.weight", w
                elif m := re.match(r"blocks\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if rest == "norm_attn_norm.norm_1.weight":
                        yield p + "input_layernorm.weight", w
                    elif rest == "norm_attn_norm.norm_2.weight":
                        yield p + "post_attention_layernorm.weight", w
                    elif rest == "norm_attn_norm.attn.Wqkv.weight":
                        yield p + "self_attn.q_proj.weight", w[:qw]
                        yield p + "self_attn.k_proj.weight", w[qw:qw + kvw]
                        yield p + "self_attn.v_proj.weight", w[qw + kvw:]
                    elif rest == "norm_attn_norm.attn.out_proj.weight":
                        yield p + "self_attn.o_proj.weight", w
                    elif rest == "ffn.router.layer.weight":
                        yield p + "mlp.gate.weight", w
                    elif m2 := re.match(r"ffn\.experts\.mlp\.(w1|v1|w2)",
                                        rest):
                        which = {"w1": "gate_proj", "v1": "up_proj",
                                 "w2": "down_proj"}[m2.group(1)]
                        we = w.reshape(E, I, -1)
                        for e in range(E):
                            part = we[e]
                            if which == "down_proj":
                                # stored [I, H] row-major = our [in, out];
                                # emit HF orientation for the main loop.
                                part = np.ascontiguousarray(part.T)
                            yield (p + f"mlp.experts.{e}.{which}.weight",
                                   part)
                    else:
                        yield name, w
                else:
                    yield name, w
        elif arch == "Starcoder2ForCausalLM":
            # mlp.c_fc/c_proj are plain Linears (not Conv1D) — rename only.
            for name, w in weights:
                name = name.replace("mlp.c_fc.", "mlp.up_proj.")
                name = name.replace("mlp.c_proj.", "mlp.down_proj.")
                yield name, w
        elif arch == "BloomForCausalLM":
            # Bloom (HF BloomAttention._split_heads): fused qkv interleaved
            # per head [Hh, 3, D]; embedding layernorm; ALiBi positions.
            c = self.config
            Hh, D = c.num_attention_heads, c.head_dim
            for name, w in weights:
                name = name.removeprefix("transformer.")
                if name == "word_embeddings.weight":
                    yield "embed_tokens.weight", w
                elif name.startswith("word_embeddings_layernorm."):
                    yield "embed_norm." + name.split(".")[-1], w
                elif name.startswith("ln_f."):
                    yield "norm." + name.split(".")[-1], w
                elif m := re.match(r"h\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if m2 := re.match(
                            r"self_attention\.query_key_value"
                            r"\.(weight|bias)", rest):
                        kind = m2.group(1)
                        parts = (w.reshape(Hh, 3, D, -1)
                                 if kind == "weight"
                                 else w.reshape(Hh, 3, D))
                        for j, which in enumerate(("q", "k", "v")):
                            part = (parts[:, j].reshape(Hh * D, -1)
                                    if kind == "weight"
                                    else parts[:, j].reshape(Hh * D))
                            yield (p + f"self_attn.{which}_proj.{kind}",
                                   part)
                    elif m2 := re.match(
                            r"self_attention\.dense\.(weight|bias)", rest):
                        yield p + "self_attn.o_proj." + m2.group(1), w
                    elif m2 := re.match(
                            r"mlp\.dense_h_to_4h\.(weight|bias)", rest):
                        yield p + "mlp.up_proj." + m2.group(1), w
                    elif m2 := re.match(
                            r"mlp\.dense_4h_to_h\.(weight|bias)", rest):
                        yield p + "mlp.down_proj." + m2.group(1), w
                    else:
                        yield p + rest, w
                else:
                    yield name, w
        elif arch in ("MptForCausalLM", "MPTForCausalLM"):
            # MPT (HF MptAttention): plain-concat Wqkv [q|k|v], norm_1/2,
            # ffn.up_proj/down_proj, tied wte head, ALiBi.
            c = self.config
            qw = c.num_attention_heads * c.head_dim
            kvw = c.num_key_value_heads * c.head_dim
            for name, w in weights:
                name = name.removeprefix("transformer.")
                if name == "wte.weight":
                    yield "embed_tokens.weight", w
                elif name.startswith("norm_f."):
                    yield "norm." + name.split(".")[-1], w
                elif m := re.match(r"blocks\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if m2 := re.match(r"norm_([12])\.(weight|bias)", rest):
                        slot = ("input_layernorm" if m2.group(1) == "1"
                                else "post_attention_layernorm")
                        yield p + f"{slot}.{m2.group(2)}", w
                    elif m2 := re.match(r"attn\.Wqkv\.(weight|bias)", rest):
                        kind = m2.group(1)
                        yield p + "self_attn.q_proj." + kind, w[:qw]
                        yield p + "self_attn.k_proj." + kind, \
                            w[qw:qw + kvw]
                        yield p + "self_attn.v_proj." + kind, w[qw + kvw:]
                    elif m2 := re.match(r"attn\.out_proj\.(weight|bias)",
                                        rest):
                        yield p + "self_attn.o_proj." + m2.group(1), w
                    elif m2 := re.match(r"ffn\.(up|down)_proj\.(weight|bias)",
                                        rest):
                        yield p + f"mlp.{m2.group(1)}_proj.{m2.group(2)}", w
                    else:
                        yield p + rest, w
                else:
                    yield name, w
        elif arch == "ExaoneForCausalLM":
            # EXAONE-3 (reference: models/exaone.py stacked_params_mapping
            # :377-386): transformer.h.N.{ln_1,ln_2}, attn.attention.*,
            # mlp.c_fc_0 (gate) / c_fc_1 (up) / c_proj (down).
            for name, w in weights:
                if "rotary" in name:
                    continue
                name = name.removeprefix("transformer.")
                if name == "wte.weight":
                    yield "embed_tokens.weight", w
                elif name.startswith("ln_f."):
                    yield "norm." + name.split(".")[-1], w
                elif m := re.match(r"h\.(\d+)\.(.+)", name):
                    rest = m.group(2)
                    rest = rest.replace("ln_1.", "input_layernorm.")
                    rest = rest.replace("ln_2.",
                                        "post_attention_layernorm.")
                    rest = rest.replace("attn.attention.", "self_attn.")
                    rest = rest.replace("self_attn.out_proj.",
                                        "self_attn.o_proj.")
                    rest = rest.replace("mlp.c_fc_0.", "mlp.gate_proj.")
                    rest = rest.replace("mlp.c_fc_1.", "mlp.up_proj.")
                    rest = rest.replace("mlp.c_proj.", "mlp.down_proj.")
                    yield f"layers.{m.group(1)}." + rest, w
                else:
                    yield name, w
        elif arch in ("TeleChat2ForCausalLM", "TeleChatForCausalLM"):
            # TeleChat2 (reference: models/telechat2.py:69-127): separate
            # query + per-head-interleaved key_value fused proj [Hkv, k|v],
            # dense (o_proj, biased) and biased down_proj; qkv and
            # gate/up carry no bias.
            c = self.config
            Hkv, D = c.num_key_value_heads, c.head_dim
            for name, w in weights:
                name = name.removeprefix("transformer.")
                if name.startswith("word_embeddings."):
                    yield "embed_tokens." + name.split(".")[-1], w
                elif name.startswith("ln_f."):
                    yield "norm." + name.split(".")[-1], w
                elif m := re.match(r"h\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if m2 := re.match(
                            r"self_attention\.key_value\.(weight|bias)",
                            rest):
                        kind = m2.group(1)
                        tail = w.shape[1:] if kind == "weight" else ()
                        g = w.reshape(Hkv, 2, D, *tail)
                        yield (p + "self_attn.k_proj." + kind,
                               g[:, 0].reshape(Hkv * D, *tail))
                        yield (p + "self_attn.v_proj." + kind,
                               g[:, 1].reshape(Hkv * D, *tail))
                    elif m2 := re.match(
                            r"self_attention\.query\.(weight|bias)", rest):
                        yield p + "self_attn.q_proj." + m2.group(1), w
                    elif m2 := re.match(
                            r"self_attention\.dense\.(weight|bias)", rest):
                        yield p + "self_attn.o_proj." + m2.group(1), w
                    else:
                        yield p + rest, w
                else:
                    yield name, w
        elif arch == "QWenLMHeadModel":
            # Qwen-1 (reference: models/qwen.py:307-310): fused biased
            # c_attn [q|k|v], mlp gate=w2 / up=w1 / down=c_proj, RMSNorm
            # ln_1/ln_2; all Linears (no Conv1D transpose).
            c = self.config
            qw = c.num_attention_heads * c.head_dim
            for name, w in weights:
                if "rotary" in name:
                    continue
                name = name.removeprefix("transformer.")
                if name == "wte.weight":
                    yield "embed_tokens.weight", w
                elif name.startswith("ln_f."):
                    yield "norm." + name.split(".")[-1], w
                elif m := re.match(r"h\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if m2 := re.match(r"attn\.c_attn\.(weight|bias)", rest):
                        kind = m2.group(1)
                        yield p + "self_attn.q_proj." + kind, w[:qw]
                        yield p + "self_attn.k_proj." + kind, w[qw:2 * qw]
                        yield p + "self_attn.v_proj." + kind, w[2 * qw:]
                    elif m2 := re.match(r"attn\.c_proj\.(weight|bias)",
                                        rest):
                        yield p + "self_attn.o_proj." + m2.group(1), w
                    elif m2 := re.match(r"ln_([12])\.(weight|bias)", rest):
                        slot = ("input_layernorm" if m2.group(1) == "1"
                                else "post_attention_layernorm")
                        yield p + f"{slot}.{m2.group(2)}", w
                    elif rest == "mlp.w2.weight":
                        yield p + "mlp.gate_proj.weight", w
                    elif rest == "mlp.w1.weight":
                        yield p + "mlp.up_proj.weight", w
                    elif rest == "mlp.c_proj.weight":
                        yield p + "mlp.down_proj.weight", w
                    else:
                        yield p + rest, w
                else:
                    yield name, w
        elif arch in ("AfmoeForCausalLM", "PanguEmbeddedForCausalLM",
                      "PanguUltraMoEForCausalLM",
                      "PanguProMoEV2ForCausalLM") and (
                          arch == "AfmoeForCausalLM" or
                          self.config.sandwich_output_norms):
            # Afmoe / openPangu sandwich layouts (reference afmoe.py:
            # 300-340, openpangu.py:935-1001): four norms per layer —
            # post_attention_layernorm is the POST-attention output norm
            # (our post_self_attn slot) and pre_mlp_layernorm is the
            # pre-FFN norm (our post_attention slot); Afmoe's expert bias
            # lives directly on the MoE module.
            for name, w in weights:
                name = name.replace(".post_attention_layernorm.",
                                    ".__post_attn__.")
                name = name.replace(".pre_mlp_layernorm.",
                                    ".post_attention_layernorm.")
                name = name.replace(".__post_attn__.",
                                    ".post_self_attn_layernorm.")
                name = name.replace("mlp.expert_bias",
                                    "mlp.e_score_correction_bias")
                yield name, w
        elif arch == "HyperCLOVAXForCausalLM":
            # HyperCLOVAX (reference: models/hyperclovax.py:254-292):
            # llama names + dual post-norms post_norm1/post_norm2.
            for name, w in weights:
                name = name.replace("post_norm1.",
                                    "post_self_attn_layernorm.")
                name = name.replace("post_norm2.", "post_mlp_layernorm.")
                yield name, w
        elif arch in ("BailingMoeForCausalLM", "BailingMoeV2ForCausalLM",
                      "SarvamMoEForCausalLM"):
            # Ling / BailingMoe (reference: models/bailing_moe.py):
            # word_embeddings, attention.query_key_value plain [q|k|v]
            # concat, attention.dense, query/key_layernorm qk-norms,
            # gate.expert_bias selection bias.
            c = self.config
            qw = c.num_attention_heads * c.head_dim
            kvw = c.num_key_value_heads * c.head_dim
            for name, w in weights:
                name = name.replace("model.word_embeddings.",
                                    "model.embed_tokens.")
                if m := re.match(r"model\.layers\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"model.layers.{i}."
                    if m2 := re.match(
                            r"attention\.query_key_value\.(weight|bias)",
                            rest):
                        kind = m2.group(1)
                        yield p + "self_attn.q_proj." + kind, w[:qw]
                        yield p + "self_attn.k_proj." + kind, \
                            w[qw:qw + kvw]
                        yield p + "self_attn.v_proj." + kind, w[qw + kvw:]
                    else:
                        rest = rest.replace("attention.dense.",
                                            "self_attn.o_proj.")
                        rest = rest.replace("attention.query_layernorm.",
                                            "self_attn.q_norm.")
                        rest = rest.replace("attention.key_layernorm.",
                                            "self_attn.k_norm.")
                        rest = rest.replace("mlp.gate.expert_bias",
                                            "mlp.gate."
                                            "e_score_correction_bias")
                        yield p + rest, w
                else:
                    yield name, w
        elif arch == "JAISLMHeadModel":
            # JAIS (reference: models/jais.py:330-338): GPT-2 Conv1D
            # layout (transposed weights) with fused MHA c_attn; swiglu
            # MLP uses c_fc2 as the silu (gate) side and c_fc as up.
            c = self.config
            qw = c.num_attention_heads * c.head_dim
            for name, w in weights:
                name = name.removeprefix("transformer.")
                if name == "wte.weight":
                    yield "embed_tokens.weight", w
                elif name == "wpe.weight":
                    yield "pos_embed.weight", w
                elif name.startswith("ln_f."):
                    yield "norm." + name.split(".")[-1], w
                elif name.startswith("relative_pe."):
                    continue    # ALiBi slope table is recomputed
                elif m := re.match(r"h\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"layers.{i}."
                    if m2 := re.match(r"ln_([12])\.(weight|bias)", rest):
                        slot = ("input_layernorm" if m2.group(1) == "1"
                                else "post_attention_layernorm")
                        yield p + f"{slot}.{m2.group(2)}", w
                    elif m2 := re.match(r"attn\.c_attn\.(weight|bias)",
                                        rest):
                        kind = m2.group(1)
                        wt = (np.ascontiguousarray(w.T)
                              if kind == "weight" else w)
                        yield p + "self_attn.q_proj." + kind, wt[:qw]
                        yield p + "self_attn.k_proj." + kind, \
                            wt[qw:2 * qw]
                        yield p + "self_attn.v_proj." + kind, wt[2 * qw:]
                    elif m2 := re.match(r"attn\.c_proj\.(weight|bias)",
                                        rest):
                        kind = m2.group(1)
                        yield (p + "self_attn.o_proj." + kind,
                               np.ascontiguousarray(w.T)
                               if kind == "weight" else w)
                    elif m2 := re.match(
                            r"mlp\.(c_fc|c_fc2|c_proj)\.(weight|bias)",
                            rest):
                        which, kind = m2.group(1), m2.group(2)
                        slot = {"c_proj": "down_proj",
                                "c_fc2": "gate_proj",
                                "c_fc": "up_proj"}[which]
                        yield (p + f"mlp.{slot}.{kind}",
                               np.ascontiguousarray(w.T)
                               if kind == "weight" else w)
                    else:
                        yield p + rest, w
                else:
                    yield name, w
        elif arch in ("Grok1ForCausalLM", "Grok1ModelForCausalLM"):
            # Grok-1 (reference: models/grok1.py:646-657): decoder names
            # attn/moe_block, norms pre/post_attn_norm + pre/post_moe_norm
            # (sandwich), experts linear (gate) / linear_v (up) /
            # linear_1 (down), RMSNorm weights stored as ".scale". The
            # attn_output_multiplier is folded into o_proj here (exact —
            # o_proj has no bias; reference applies it to the o_proj
            # output, grok1.py:330).
            c = self.config
            mult = c.attn_output_multiplier
            for name, w in weights:
                name = name.replace("norm.scale", "norm.weight")
                if m := re.match(r"model\.layers\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"model.layers.{i}."
                    rest = rest.replace("pre_attn_norm.",
                                        "input_layernorm.")
                    rest = rest.replace("post_attn_norm.",
                                        "post_self_attn_layernorm.")
                    rest = rest.replace("pre_moe_norm.",
                                        "post_attention_layernorm.")
                    rest = rest.replace("post_moe_norm.",
                                        "post_mlp_layernorm.")
                    rest = rest.replace("attn.", "self_attn.")
                    if rest == "self_attn.o_proj.weight" and mult != 1.0:
                        w = np.asarray(w, np.float32) * mult
                    rest = rest.replace("moe_block.gate.",
                                        "mlp.gate.")
                    if m2 := re.match(
                            r"moe_block\.experts\.(\d+)\.(linear|linear_v"
                            r"|linear_1)\.weight", rest):
                        which = {"linear": "gate_proj",
                                 "linear_v": "up_proj",
                                 "linear_1": "down_proj"}[m2.group(2)]
                        rest = (f"mlp.experts.{m2.group(1)}."
                                f"{which}.weight")
                    yield p + rest, w
                else:
                    yield name, w
        else:
            yield from weights

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]) -> Params:
        """Map HF checkpoint names → params tree (reference:
        qwen3_moe.py load_weights stacked_params_mapping)."""
        c = self.config
        weights = self._adapt_weights(weights)
        params = self.init_params(0)
        # Accumulators for per-expert tensors → stacked [E, ...] arrays.
        expert_parts: Dict[Tuple[int, str, int], np.ndarray] = {}

        def put(path: List[str], value: np.ndarray, transpose=False):
            node = params
            for p in path[:-1]:
                node = node[p] if not p.isdigit() else node[int(p)]
            arr = jnp.asarray(value.T if transpose else value, self.dtype)
            leaf = path[-1]
            assert node[leaf].shape == arr.shape, \
                f"{'.'.join(path)}: {node[leaf].shape} vs {arr.shape}"
            node[leaf] = arr

        gate_parts: Dict[Tuple[int, str], np.ndarray] = {}
        shared_parts: Dict[Tuple[int, str], np.ndarray] = {}

        def try_fuse_shared(i):
            g = shared_parts.get((i, "gate"))
            u = shared_parts.get((i, "up"))
            d = shared_parts.get((i, "down"))
            moe = params["layers"][i].setdefault("moe", {})
            if g is not None and u is not None:
                moe["shared_w1"] = jnp.asarray(
                    np.concatenate([g, u], axis=0).T, self.dtype)
            if d is not None:
                moe["shared_w2"] = jnp.asarray(d.T, self.dtype)

        for name, w in weights:
            name = name.removeprefix("model.")
            if name == "embed_tokens.weight":
                put(["embed", "weight"], w)
            elif name in ("norm.weight", "norm.bias"):
                put(["norm", name.split(".")[-1]], w)
            elif name == "pos_embed.weight":
                put(["pos_embed", "weight"], w)
            elif name in ("embed_norm.weight", "embed_norm.bias"):
                put(["embed_norm", name.split(".")[-1]], w)
            elif name == "lm_head.weight":
                if not c.tie_word_embeddings:
                    put(["lm_head", "kernel"], w, transpose=True)
            elif name == "lm_head.bias":
                if not c.tie_word_embeddings and c.lm_head_bias:
                    put(["lm_head", "bias"], w)
            elif m := re.match(r"layers\.(\d+)\.(.+)", name):
                i, rest = int(m.group(1)), m.group(2)
                layer = params["layers"][i]
                if re.match(
                        r"(input_layernorm|post_attention_layernorm|"
                        r"post_feedforward_layernorm|"
                        r"post_self_attn_layernorm|post_mlp_layernorm)"
                        r"\.(weight|bias)$",
                        rest):
                    put(["layers", str(i)] + rest.split("."), w)
                elif rest == "mlp.gate_up_proj.weight":
                    # HF fused gate‖up rows (Glm4MLP): matches our
                    # gate_up kernel layout directly.
                    put(["layers", str(i), "mlp", "gate_up", "kernel"],
                        w, transpose=True)
                elif m2 := re.match(
                        r"self_attn\.(q|k|v|o|gate)_proj\.weight", rest):
                    put(["layers", str(i), "self_attn",
                         f"{m2.group(1)}_proj", "kernel"], w, transpose=True)
                elif m2 := re.match(
                        r"self_attn\.(q|k|v|o)_proj\.bias", rest):
                    put(["layers", str(i), "self_attn",
                         f"{m2.group(1)}_proj", "bias"], w)
                elif m2 := re.match(
                        r"self_attn\.(?:(q|k)_norm|"
                        r"(query|key|q|k)_layernorm)\.(weight|bias)", rest):
                    # Hunyuan: query_layernorm/key_layernorm; Persimmon:
                    # q/k_layernorm with biases.
                    which = (m2.group(1) or m2.group(2))[0]
                    put(["layers", str(i), "self_attn",
                         f"{which}_norm", m2.group(3)], w)
                elif m2 := re.match(
                        r"mlp\.(gate|up|down)_proj\.bias", rest):
                    # Gated-MLP biases (ERNIE use_bias): gate‖up fuse.
                    which = m2.group(1)
                    if which == "down" or not c.mlp_gated:
                        put(["layers", str(i), "mlp",
                             "down" if which == "down" else which,
                             "bias"], w)
                    else:
                        gate_parts[(i, which + "_bias")] = w
                        g = gate_parts.get((i, "gate_bias"))
                        u = gate_parts.get((i, "up_bias"))
                        if g is not None and u is not None:
                            put(["layers", str(i), "mlp", "gate_up",
                                 "bias"], np.concatenate([g, u], axis=0))
                elif m2 := re.match(r"mlp\.act_fn\.(alpha_p|alpha_n)",
                                    rest):
                    node = params["layers"][i]["mlp"]
                    node[m2.group(1)] = jnp.asarray(
                        np.asarray(w).reshape(1), jnp.float32)
                elif not c.mlp_gated and (m2 := re.match(
                        r"mlp\.(up|down)_proj\.(weight|bias)", rest)):
                    # Non-gated MLP (GPT-2/Starcoder2/Nemotron): up and
                    # down load directly, no gate fusion.
                    which, kind = m2.group(1), m2.group(2)
                    put(["layers", str(i), "mlp", which,
                         "kernel" if kind == "weight" else "bias"], w,
                        transpose=kind == "weight")
                elif m2 := re.match(
                        r"mlp\.(gate|up|down)_proj\.weight", rest):
                    which = m2.group(1)
                    if which == "down":
                        put(["layers", str(i), "mlp", "down", "kernel"], w,
                            transpose=True)
                    else:
                        gate_parts[(i, which)] = w
                        g, u = gate_parts.get((i, "gate")), \
                            gate_parts.get((i, "up"))
                        if g is not None and u is not None:
                            put(["layers", str(i), "mlp", "gate_up",
                                 "kernel"],
                                np.concatenate([g, u], axis=0),
                                transpose=True)
                elif re.match(
                        r"(mlp|block_sparse_moe)\.gate(\.wg)?\.weight",
                        rest):  # Hunyuan router lives at mlp.gate.wg
                    put(["layers", str(i), "moe", "router"], w,
                        transpose=True)
                elif re.match(
                        r"mlp(\.gate|\.moe_statics)?"
                        r"\.e_score_correction_bias", rest):
                    # DeepSeek/GLM keep the bias on the gate; MiniMax-M2 on
                    # the MoE module; ERNIE 4.5 under moe_statics [1, E].
                    layer.setdefault("moe", {})["e_score_bias"] = \
                        jnp.asarray(w.reshape(-1), jnp.float32)
                elif m2 := re.match(
                        r"mlp\.experts\.(\d+)\.(gate|up|down)_proj\.weight",
                        rest):
                    e, which = int(m2.group(1)), m2.group(2)
                    expert_parts[(i, which, e)] = w
                elif m2 := re.match(
                        r"(?:block_sparse_moe|mlp)\.experts\.(\d+)"
                        r"\.w([123])\.weight",
                        rest):
                    # Mixtral / MiniMax-M2: w1=gate, w3=up, w2=down.
                    e, wn = int(m2.group(1)), m2.group(2)
                    which = {"1": "gate", "3": "up", "2": "down"}[wn]
                    expert_parts[(i, which, e)] = w
                elif m2 := re.match(
                        r"mlp\.(?:shared_experts?|shared_mlp)"
                        r"\.(gate|up|down)_proj\.weight",
                        rest):
                    # GLM (shared_experts) / Qwen2-MoE (shared_expert) /
                    # Hunyuan (shared_mlp).
                    shared_parts[(i, m2.group(1))] = w
                    try_fuse_shared(i)
                else:
                    logger.debug("skipping weight %s", name)
            else:
                logger.debug("skipping weight %s", name)

        # Stack per-expert weights.
        for i, layer in enumerate(params["layers"]):
            if "moe" not in layer:
                continue
            E = c.num_experts
            gates = [expert_parts.get((i, "gate", e)) for e in range(E)]
            if gates[0] is None:
                continue  # dummy-init experts kept
            ups = [expert_parts[(i, "up", e)] for e in range(E)]
            downs = [expert_parts[(i, "down", e)] for e in range(E)]
            w1 = np.stack([np.concatenate([g, u], axis=0).T
                           for g, u in zip(gates, ups)])   # [E, H, 2I]
            w2 = np.stack([d.T for d in downs])            # [E, I, H]
            layer["moe"]["w1"] = jnp.asarray(w1, self.dtype)
            layer["moe"]["w2"] = jnp.asarray(w2, self.dtype)
        return params
