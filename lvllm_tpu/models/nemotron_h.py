"""NemotronH — single-mixer hybrid layers (Mamba2 / attention / MLP / MoE).

Behavioral reference: ``/root/reference/vllm/model_executor/models/
nemotron_h.py`` (+ MTP head ``nemotron_h_mtp.py``; config
``transformers_utils/configs/nemotron_h.py``). No HF transformers class
exists in this image, so tests are structural (engine runs, layer-mix
coverage) rather than logit parity.

Each layer is norm → ONE mixer, chosen by ``hybrid_override_pattern``:
  "M" mamba2 mixer · "*" NoPE attention · "-" ReLU² MLP (non-gated) ·
  "E" MoE (sigmoid grouped top-k, e-score bias, ReLU² non-gated experts,
  optional shared experts, routed scaling).
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import (ACTIVATIONS_SINGLE, fused_add_rms_norm,
                                     rms_norm)
from lvllm_tpu.layers.moe import (permute_for_experts, route_tokens)
from lvllm_tpu.models.mamba2 import (mamba2_cache_spec,
                                     mamba2_init_mixer_params, mamba2_mixer)
from lvllm_tpu.models.model_base import AttentionMetadata, Params
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.ops.attention import ragged_paged_attention
from lvllm_tpu.ops.kv_cache import write_kv
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)

_relu2 = ACTIVATIONS_SINGLE["relu2"]


@register_model("NemotronHForCausalLM")
class NemotronHModel(Qwen3Model):

    dcp_compatible = False

    # ---- cache layout ------------------------------------------------------

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        from lvllm_tpu.core.kv_cache_spec import (FullAttentionSpec,
                                                  NullSpec)
        c = self.config
        t = c.layer_type(layer_idx)
        if t == "linear_attention":
            return mamba2_cache_spec(c)
        if t == "full_attention":
            return FullAttentionSpec(c.kv_cache_heads, c.kv_cache_dim,
                                    kv_dtype)
        return NullSpec()

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Params:
        c = self.config
        D = c.head_dim
        seed = rng if isinstance(rng, int) else 0
        nprng = np.random.default_rng(888 + seed + c.seed)

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
        for i in range(c.num_hidden_layers):
            t = c.layer_type(i)
            layer: Dict[str, Any] = {
                "norm": {"weight": jnp.ones((c.hidden_size,), self.dtype)},
            }
            if t == "linear_attention":
                layer["mamba"] = mamba2_init_mixer_params(
                    c, dense, self.dtype)
            elif t == "full_attention":
                layer["attn"] = {
                    "q_proj": {"kernel": dense(
                        (c.hidden_size, c.num_attention_heads * D))},
                    "k_proj": {"kernel": dense(
                        (c.hidden_size, c.num_key_value_heads * D))},
                    "v_proj": {"kernel": dense(
                        (c.hidden_size, c.num_key_value_heads * D))},
                    "o_proj": {"kernel": dense(
                        (c.num_attention_heads * D, c.hidden_size))},
                }
            elif t == "moe":
                E = c.num_experts
                I = c.moe_intermediate_size
                layer["moe"] = {
                    "router": dense((c.hidden_size, E)),
                    "e_score_bias": jnp.zeros((E,), jnp.float32),
                    "w1": dense((E, c.hidden_size, I)),   # non-gated up
                    "w2": dense((E, I, c.hidden_size)),
                }
                if c.num_shared_experts:
                    Is = (c.shared_expert_intermediate_size
                          or I) * c.num_shared_experts
                    layer["moe"]["shared_up"] = {"kernel": dense(
                        (c.hidden_size, Is))}
                    layer["moe"]["shared_down"] = {"kernel": dense(
                        (Is, c.hidden_size))}
            else:  # "mlp"
                layer["mlp"] = {
                    "up": {"kernel": dense(
                        (c.hidden_size, c.intermediate_size))},
                    "down": {"kernel": dense(
                        (c.intermediate_size, c.hidden_size))},
                }
            params["layers"].append(layer)
        return params

    # ---- layers ------------------------------------------------------------

    def _nope_attention(self, ap: Params, x: jax.Array, kv_cache,
                        md: AttentionMetadata):
        c = self.config
        D = c.head_dim
        T = x.shape[0]
        q = (x @ ap["q_proj"]["kernel"]).reshape(
            T, c.num_attention_heads, D)
        k = (x @ ap["k_proj"]["kernel"]).reshape(
            T, c.num_key_value_heads, D)
        v = (x @ ap["v_proj"]["kernel"]).reshape(
            T, c.num_key_value_heads, D)
        kv_cache = write_kv(kv_cache, k, v, md.slot_mapping)
        out = ragged_paged_attention(
            q, kv_cache, md.block_table, md.query_start_loc, md.seq_lens,
            scale=D ** -0.5)
        return (out.reshape(T, c.num_attention_heads * D)
                @ ap["o_proj"]["kernel"]), kv_cache

    def _nemotron_moe(self, mp: Params, x: jax.Array) -> jax.Array:
        c = self.config
        T, Hd = x.shape
        E = c.num_experts
        K = c.num_experts_per_tok
        w, ids = route_tokens(
            x, mp["router"], K, norm_topk_prob=c.norm_topk_prob,
            scoring_fn="sigmoid", e_score_bias=mp["e_score_bias"],
            scaling_factor=c.routed_scaling_factor,
            n_group=c.n_group, topk_group=c.topk_group)
        order, group_sizes = permute_for_experts(ids, E)
        x_sorted = x[order // K]
        h = jax.lax.ragged_dot(x_sorted, mp["w1"], group_sizes,
                               preferred_element_type=jnp.float32)
        h = _relu2(h.astype(x.dtype))
        y_sorted = jax.lax.ragged_dot(h, mp["w2"], group_sizes,
                                      preferred_element_type=jnp.float32
                                      ).astype(x.dtype)
        y_flat = jnp.zeros((T * K, Hd), y_sorted.dtype).at[order].set(
            y_sorted)
        y = jnp.einsum("tkh,tk->th", y_flat.reshape(T, K, Hd),
                       w.astype(y_sorted.dtype))
        if "shared_up" in mp:
            y = y + _relu2(x @ mp["shared_up"]["kernel"]) \
                @ mp["shared_down"]["kernel"]
        return y.astype(x.dtype)

    def apply_layer(self, layer_params, x, residual, positions, kv_cache,
                    attn_metadata, layer_idx, lora=None, token_adapter=None):
        c = self.config
        lp = layer_params
        h, res = fused_add_rms_norm(x, residual, lp["norm"]["weight"],
                                    c.rms_norm_eps)
        t = c.layer_type(layer_idx)
        if t == "linear_attention":
            out, new_kv = mamba2_mixer(lp["mamba"], h, kv_cache,
                                       attn_metadata, c, positions)
        elif t == "full_attention":
            out, new_kv = self._nope_attention(lp["attn"], h, kv_cache,
                                               attn_metadata)
        elif t == "moe":
            out, new_kv = self._nemotron_moe(lp["moe"], h), kv_cache
        else:
            out = _relu2(h @ lp["mlp"]["up"]["kernel"]) \
                @ lp["mlp"]["down"]["kernel"]
            new_kv = kv_cache
        return out.astype(x.dtype), res, new_kv

    # ---- weight loading ----------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        c = self.config
        params = self.init_params(0)
        experts: Dict[Tuple[int, int, str], np.ndarray] = {}

        def put(node, key, w, transpose=True, dtype=None):
            w = np.asarray(w)
            if transpose:
                w = w.T
            arr = jnp.asarray(w, dtype or self.dtype)
            assert node[key].shape == arr.shape, \
                (key, node[key].shape, arr.shape)
            node[key] = arr

        for name, w in weights:
            n = name.removeprefix("backbone.").removeprefix("model.")
            if n in ("embeddings.weight", "embed_tokens.weight"):
                put(params["embed"], "weight", w, transpose=False)
            elif n in ("norm_f.weight", "norm.weight"):
                params["norm"]["weight"] = jnp.asarray(w, self.dtype)
            elif name == "lm_head.weight" and not c.tie_word_embeddings:
                put(params["lm_head"], "kernel", w)
            elif m := re.match(r"layers\.(\d+)\.(.+)", n):
                i, rest = int(m.group(1)), m.group(2)
                layer = params["layers"][i]
                t = c.layer_type(i)
                if rest == "norm.weight":
                    layer["norm"]["weight"] = jnp.asarray(w, self.dtype)
                elif t == "linear_attention" and (
                        m2 := re.match(r"mixer\.(.+)", rest)):
                    key = m2.group(1)
                    mp = layer["mamba"]
                    if key == "in_proj.weight":
                        put(mp["in_proj"], "kernel", w)
                    elif key == "conv1d.weight":
                        put(mp, "conv_weight", np.asarray(w)[:, 0, :],
                            transpose=False)
                    elif key == "conv1d.bias":
                        mp["conv_bias"] = jnp.asarray(w, jnp.float32)
                    elif key == "dt_bias":
                        mp["dt_bias"] = jnp.asarray(w, jnp.float32)
                    elif key in ("A_log", "A"):
                        a = np.asarray(w, np.float64)
                        if key == "A":  # stored as -exp(A_log)
                            a = np.log(-a) if (a < 0).all() else np.log(a)
                        mp["a_log"] = jnp.asarray(a, jnp.float32)
                    elif key == "D":
                        mp["d"] = jnp.asarray(w, jnp.float32)
                    elif key == "norm.weight":
                        mp["norm"]["weight"] = jnp.asarray(w, self.dtype)
                    elif key == "out_proj.weight":
                        put(mp["out_proj"], "kernel", w)
                elif t == "full_attention" and (
                        m2 := re.match(r"mixer\.([qkvo])_proj\.weight",
                                       rest)):
                    put(layer["attn"][f"{m2.group(1)}_proj"], "kernel", w)
                elif t == "moe" and (m2 := re.match(
                        r"mixer\.experts\.(\d+)\.(up|down)_proj\.weight",
                        rest)):
                    experts[(i, int(m2.group(1)), m2.group(2))] = \
                        np.asarray(w)
                elif t == "moe" and rest in ("mixer.gate.weight",):
                    put(layer["moe"], "router", w)
                elif t == "moe" and rest == \
                        "mixer.gate.e_score_correction_bias":
                    layer["moe"]["e_score_bias"] = jnp.asarray(
                        w, jnp.float32)
                elif t == "moe" and (m2 := re.match(
                        r"mixer\.shared_experts\.(up|down)_proj\.weight",
                        rest)):
                    put(layer["moe"][f"shared_{m2.group(1)}"], "kernel", w)
                elif t == "mlp" and (m2 := re.match(
                        r"mixer\.(up|down)_proj\.weight", rest)):
                    put(layer["mlp"][m2.group(1)], "kernel", w)
                else:
                    logger.debug("skipping weight %s", name)
            else:
                logger.debug("skipping weight %s", name)

        by_layer: Dict[int, set] = {}
        for (i, e, _k) in experts:
            by_layer.setdefault(i, set()).add(e)
        for i, es in by_layer.items():
            moe = params["layers"][i]["moe"]
            moe["w1"] = jnp.asarray(np.stack(
                [experts[(i, e, "up")].T for e in sorted(es)]), self.dtype)
            moe["w2"] = jnp.asarray(np.stack(
                [experts[(i, e, "down")].T for e in sorted(es)]),
                self.dtype)
        return params
