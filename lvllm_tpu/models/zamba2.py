"""Zamba2 — mamba2 backbone with SHARED transformer blocks.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
zamba2.py``; HF numerics reference: transformers ``modeling_zamba2``.

Every layer is a mamba2 block (norm → mixer → residual). At the hybrid
layer positions (``layers_block_type == "hybrid"``) one of
``num_mem_blocks`` SHARED transformer blocks (cycled round-robin over
the hybrid positions) runs first on ``concat(hidden, embeddings)``
([T, 2H]) — attention + MLP with NO internal residuals — and its output
goes through a per-layer linear before being ADDED to the mamba input.
Because the block weights are tied across uses, each use gets LoRA-style
adapters on q/k/v (optional) and gate_up (always) for expressivity
(papers 2405.16712 fig. 2, 2411.15242).

The shared attention reads [T, 2H], scales by (head_dim/2)^-1/2, and
optionally applies rope (``use_mem_rope``); each hybrid layer has its
own paged KV cache next to its mamba state (PairSpec dict leaf).
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import rms_norm, silu_and_mul
from lvllm_tpu.models.mamba2 import (mamba2_cache_spec,
                                     mamba2_init_mixer_params, mamba2_mixer)
from lvllm_tpu.models.model_base import AttentionMetadata, Params
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.ops.attention import ragged_paged_attention
from lvllm_tpu.ops.kv_cache import write_kv
from lvllm_tpu.ops.rope import apply_rope, compute_cos_sin_cache
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


@register_model("Zamba2ForCausalLM")
class Zamba2Model(Qwen3Model):

    dcp_compatible = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        self.scale = (c.head_dim / 2) ** -0.5   # Zamba2Attention.scaling
        self.hybrid_ids = [i for i, t in enumerate(c.layer_types or ())
                           if t == "hybrid"]
        self.block_of_hybrid = {
            li: g % max(c.num_mem_blocks, 1)
            for g, li in enumerate(self.hybrid_ids)}
        self.hybrid_pos = {li: g for g, li in enumerate(self.hybrid_ids)}
        if c.use_mem_rope:
            self.cos_sin = compute_cos_sin_cache(
                c.head_dim, c.max_position_embeddings, c.rope_theta,
                c.rope_scaling, dtype=jnp.float32)

    # ---- cache layout ------------------------------------------------------

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        from lvllm_tpu.core.kv_cache_spec import FullAttentionSpec, PairSpec
        c = self.config
        mamba = mamba2_cache_spec(c)
        if c.layer_type(layer_idx) != "hybrid":
            return mamba
        kv = FullAttentionSpec(c.kv_cache_heads, c.kv_cache_dim, kv_dtype)
        return PairSpec(keys=("kv", "mamba"), specs=(kv, mamba))

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Params:
        c = self.config
        seed = rng if isinstance(rng, int) else 0
        nprng = np.random.default_rng(555 + seed + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        H2 = 2 * c.hidden_size
        D = c.head_dim
        params: Params = {
            "embed": {"weight": dense((c.vocab_size, c.hidden_size))},
            "norm": {"weight": jnp.ones((c.hidden_size,), self.dtype)},
            "shared_blocks": [],
            "layers": [],
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = {"kernel": dense(
                (c.hidden_size, c.vocab_size))}
        for _ in range(max(c.num_mem_blocks, 1)):
            params["shared_blocks"].append({
                "input_ln": {"weight": jnp.ones((H2,), self.dtype)},
                "pre_ff_ln": {"weight": jnp.ones(
                    (c.hidden_size,), self.dtype)},
                "q_proj": {"kernel": dense(
                    (H2, c.num_attention_heads * D))},
                "k_proj": {"kernel": dense(
                    (H2, c.num_key_value_heads * D))},
                "v_proj": {"kernel": dense(
                    (H2, c.num_key_value_heads * D))},
                "o_proj": {"kernel": dense(
                    (c.num_attention_heads * D, c.hidden_size))},
                "gate_up": {"kernel": dense(
                    (c.hidden_size, 2 * c.intermediate_size))},
                "down": {"kernel": dense(
                    (c.intermediate_size, c.hidden_size))},
            })
        r = max(getattr(c, "adapter_rank", 8), 1)
        for i in range(c.num_hidden_layers):
            layer: Dict[str, Any] = {
                "input_ln": {"weight": jnp.ones(
                    (c.hidden_size,), self.dtype)},
                "mamba": mamba2_init_mixer_params(c, dense, self.dtype),
            }
            if c.layer_type(i) == "hybrid":
                layer["linear"] = {"kernel": dense(
                    (c.hidden_size, c.hidden_size))}
                layer["gate_up_adapter"] = {
                    "a": dense((c.hidden_size, r)),
                    "b": dense((r, 2 * c.intermediate_size))}
                if c.use_shared_attention_adapter:
                    for nm, width in (("q", c.num_attention_heads * D),
                                      ("k", c.num_key_value_heads * D),
                                      ("v", c.num_key_value_heads * D)):
                        # HF adapters output attention_hidden_size (2H);
                        # widths equal qkv widths in practice.
                        layer[f"{nm}_adapter"] = {
                            "a": dense((H2, r)), "b": dense((r, H2))}
            params["layers"].append(layer)
        return params

    # ---- forward -----------------------------------------------------------

    def _shared_block(self, bp: Params, lp: Params, cat: jax.Array,
                      positions, kv_cache, md: AttentionMetadata):
        c = self.config
        D = c.head_dim
        T = cat.shape[0]
        h = rms_norm(cat, bp["input_ln"]["weight"], c.rms_norm_eps)

        def proj(name):
            y = h @ bp[f"{name}_proj"]["kernel"]
            ad = lp.get(f"{name}_adapter")
            if ad is not None:
                y = y + (h @ ad["a"]) @ ad["b"]
            return y

        q = proj("q").reshape(T, c.num_attention_heads, D)
        k = proj("k").reshape(T, c.num_key_value_heads, D)
        v = proj("v").reshape(T, c.num_key_value_heads, D)
        if c.use_mem_rope:
            q, k = apply_rope(q, k, positions, self.cos_sin)
        kv_cache = write_kv(kv_cache, k, v, md.slot_mapping)
        out = ragged_paged_attention(
            q, kv_cache, md.block_table, md.query_start_loc, md.seq_lens,
            scale=self.scale)
        attn = out.reshape(T, c.num_attention_heads * D) \
            @ bp["o_proj"]["kernel"]
        # NO internal residuals: ff(norm(attn)).
        ff_in = rms_norm(attn, bp["pre_ff_ln"]["weight"], c.rms_norm_eps)
        gu = ff_in @ bp["gate_up"]["kernel"]
        ad = lp["gate_up_adapter"]
        gu = gu + (ff_in @ ad["a"]) @ ad["b"]
        t_out = silu_and_mul(gu) @ bp["down"]["kernel"]
        return t_out @ lp["linear"]["kernel"], kv_cache

    def __call__(self, params: Params, input_ids, positions, kv_caches,
                 attn_metadata, lora=None, token_adapter=None,
                 mm_embeds=None, mm_mask=None, mm_deepstack=None,
                 aux_hidden_layers: Tuple[int, ...] = ()):
        c = self.config
        md = attn_metadata
        x0 = self.embed_tokens(params, input_ids, positions)
        h = x0
        new_caches = []
        for i, lp in enumerate(params["layers"]):
            kv = kv_caches[i]
            if c.layer_type(i) == "hybrid":
                bp = params["shared_blocks"][self.block_of_hybrid[i]]
                cat = jnp.concatenate([h, x0], axis=-1)
                t_out, kv_pages = self._shared_block(
                    bp, lp, cat, positions, kv["kv"], md)
                h = h + t_out.astype(h.dtype)
                state = kv["mamba"]
            else:
                kv_pages = None
                state = kv
            normed = rms_norm(h, lp["input_ln"]["weight"], c.rms_norm_eps)
            m_out, new_state = mamba2_mixer(lp["mamba"], normed, state,
                                            md, c, positions)
            h = h + m_out.astype(h.dtype)
            if kv_pages is not None:
                new_caches.append({"kv": kv_pages, "mamba": new_state})
            else:
                new_caches.append(new_state)
        hidden = rms_norm(h, params["norm"]["weight"], c.rms_norm_eps)
        return hidden, new_caches

    # ---- weight loading ----------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        c = self.config
        params = self.init_params(0)

        def put(node, key, w, transpose=True, dtype=None):
            w = np.asarray(w)
            if transpose:
                w = w.T
            arr = jnp.asarray(w, dtype or self.dtype)
            assert node[key].shape == arr.shape, \
                (key, node[key].shape, arr.shape)
            node[key] = arr

        def put_mamba(mp, key, w):
            if key == "in_proj.weight":
                put(mp["in_proj"], "kernel", w)
            elif key == "conv1d.weight":
                put(mp, "conv_weight", np.asarray(w)[:, 0, :],
                    transpose=False)
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
                put(mp["out_proj"], "kernel", w)
            else:
                logger.debug("skipping mamba weight %s", key)

        for name, w in weights:
            n = name.removeprefix("model.")
            if n == "embed_tokens.weight":
                put(params["embed"], "weight", w, transpose=False)
            elif n == "final_layernorm.weight":
                params["norm"]["weight"] = jnp.asarray(w, self.dtype)
            elif name == "lm_head.weight" and not c.tie_word_embeddings:
                put(params["lm_head"], "kernel", w)
            elif m := re.match(r"layers\.(\d+)\.(.+)", n):
                i, rest = int(m.group(1)), m.group(2)
                layer = params["layers"][i]
                if m2 := re.match(r"mamba\.(.+)", rest):
                    put_mamba(layer["mamba"], m2.group(1), w)
                elif m2 := re.match(r"mamba_decoder\.mamba\.(.+)", rest):
                    put_mamba(layer["mamba"], m2.group(1), w)
                elif rest == "input_layernorm.weight":
                    layer["input_ln"]["weight"] = jnp.asarray(w, self.dtype)
                elif rest == "mamba_decoder.input_layernorm.weight":
                    layer["input_ln"]["weight"] = jnp.asarray(w, self.dtype)
                elif rest == "linear.weight":
                    put(layer["linear"], "kernel", w)
                elif m2 := re.match(r"shared_transformer\.(.+)", rest):
                    bp = params["shared_blocks"][self.block_of_hybrid[i]]
                    key = m2.group(1)
                    if m3 := re.match(
                            r"self_attn\.linear_([qkv])_adapter_list\."
                            r"(\d+)\.([01])\.weight", key):
                        g = int(m3.group(2))
                        tgt = params["layers"][self.hybrid_ids[g]]
                        ad = tgt[f"{m3.group(1)}_adapter"]
                        put(ad, "a" if m3.group(3) == "0" else "b", w)
                    elif m3 := re.match(
                            r"feed_forward\.gate_up_proj_adapter_list\."
                            r"(\d+)\.([01])\.weight", key):
                        g = int(m3.group(1))
                        tgt = params["layers"][self.hybrid_ids[g]]
                        ad = tgt["gate_up_adapter"]
                        put(ad, "a" if m3.group(2) == "0" else "b", w)
                    elif key == "self_attn.q_proj.weight":
                        put(bp["q_proj"], "kernel", w)
                    elif key == "self_attn.k_proj.weight":
                        put(bp["k_proj"], "kernel", w)
                    elif key == "self_attn.v_proj.weight":
                        put(bp["v_proj"], "kernel", w)
                    elif key == "self_attn.o_proj.weight":
                        put(bp["o_proj"], "kernel", w)
                    elif key == "feed_forward.gate_up_proj.weight":
                        put(bp["gate_up"], "kernel", w)
                    elif key == "feed_forward.down_proj.weight":
                        put(bp["down"], "kernel", w)
                    elif key == "input_layernorm.weight":
                        bp["input_ln"]["weight"] = jnp.asarray(
                            w, self.dtype)
                    elif key == "pre_ff_layernorm.weight":
                        bp["pre_ff_ln"]["weight"] = jnp.asarray(
                            w, self.dtype)
                    else:
                        logger.debug("skipping weight %s", name)
                else:
                    logger.debug("skipping weight %s", name)
            else:
                logger.debug("skipping weight %s", name)
        return params
