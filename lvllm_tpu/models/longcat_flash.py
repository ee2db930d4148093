"""LongcatFlash — dual-sublayer MLA layers with a shortcut zero-expert MoE.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
longcat_flash.py`` (+ its MTP head ``longcat_flash_mtp.py``); HF numerics
reference: transformers ``modeling_longcat_flash``.

Each logical layer holds TWO MLA attention sublayers and TWO dense MLPs,
plus ONE MoE whose input is the first sublayer's post-attention norm and
whose output joins the residual stream after the SECOND sublayer
(the "shortcut" — MoE compute overlaps the second sublayer's latency in
the reference's pipeline). The MoE appends ``zero_expert_num``
zero-compute identity experts to the routed set: a token routed to a
zero expert contributes ``weight * x``.

MLA reuses the DeepSeek absorbed-latent path (``models/deepseek.py``)
with the Longcat LoRA output scalings (``mla_scale_q_lora`` /
``mla_scale_kv_lora``); each logical layer carries a dict of two latent
caches (core/kv_cache_spec.PairSpec).
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.layers.common import fused_add_rms_norm, silu_and_mul
from lvllm_tpu.layers.moe import (grouped_expert_ffn, permute_for_experts,
                                  route_tokens)
from lvllm_tpu.models.deepseek import DeepseekModel
from lvllm_tpu.models.model_base import AttentionMetadata, Params
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


@register_model("LongcatFlashForCausalLM")
class LongcatFlashModel(DeepseekModel):

    dcp_compatible = False  # dict-paired latent caches

    # ---- cache layout ------------------------------------------------------

    def kv_cache_spec(self, layer_idx: int, kv_dtype):
        from lvllm_tpu.core.kv_cache_spec import MLAAttentionSpec, PairSpec
        c = self.config
        one = MLAAttentionSpec(1, c.kv_cache_dim, kv_dtype)
        return PairSpec(keys=("a", "b"), specs=(one, one))

    # ---- params ------------------------------------------------------------

    def init_params(self, rng) -> Params:
        c = self.config
        H = c.num_attention_heads
        dn, dr, dv = c.qk_nope_head_dim, c.qk_rope_head_dim, c.v_head_dim
        Dc = c.kv_lora_rank
        seed = rng if isinstance(rng, int) else 0
        nprng = np.random.default_rng(99 + seed + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        def norm():
            return {"weight": jnp.ones((c.hidden_size,), self.dtype)}

        def mla_attn() -> Dict[str, Any]:
            attn: Dict[str, Any] = {
                "kv_a_proj": {"kernel": dense((c.hidden_size, Dc + dr))},
                "kv_a_norm": {"weight": jnp.ones((Dc,), self.dtype)},
                "w_uk": dense((H, dn, Dc)),
                "w_uv": dense((H, dv, Dc)),
                "o_proj": {"kernel": dense((H * dv, c.hidden_size))},
            }
            if c.q_lora_rank:
                attn["q_a_proj"] = {"kernel": dense(
                    (c.hidden_size, c.q_lora_rank))}
                attn["q_a_norm"] = {"weight": jnp.ones(
                    (c.q_lora_rank,), self.dtype)}
                attn["q_b_proj"] = {"kernel": dense(
                    (c.q_lora_rank, H * (dn + dr)))}
            else:
                attn["q_proj"] = {"kernel": dense(
                    (c.hidden_size, H * (dn + dr)))}
            return attn

        def mlp():
            return {
                "gate_up": {"kernel": dense(
                    (c.hidden_size, 2 * c.intermediate_size))},
                "down": {"kernel": dense(
                    (c.intermediate_size, c.hidden_size))},
            }

        E, Z = c.num_experts, c.zero_expert_num
        params: Params = {
            "embed": {"weight": dense((c.vocab_size, c.hidden_size))},
            "norm": norm(),
            "layers": [],
        }
        if not c.tie_word_embeddings:
            params["lm_head"] = {"kernel": dense(
                (c.hidden_size, c.vocab_size))}
        for _ in range(c.num_hidden_layers):
            params["layers"].append({
                "input_ln0": norm(), "post_ln0": norm(),
                "input_ln1": norm(), "post_ln1": norm(),
                "attn0": mla_attn(), "attn1": mla_attn(),
                "mlp0": mlp(), "mlp1": mlp(),
                "moe": {
                    "router": dense((c.hidden_size, E + Z)),
                    "e_score_bias": jnp.zeros((E + Z,), jnp.float32),
                    "w1": dense((E, c.hidden_size,
                                 2 * c.moe_intermediate_size)),
                    "w2": dense((E, c.moe_intermediate_size,
                                 c.hidden_size)),
                },
            })
        return params

    # ---- layers ------------------------------------------------------------

    def _mlp(self, mp: Params, x: jax.Array) -> jax.Array:
        return (silu_and_mul(x @ mp["gate_up"]["kernel"])
                @ mp["down"]["kernel"]).astype(x.dtype)

    def _shortcut_moe(self, mp: Params, x: jax.Array) -> jax.Array:
        """Zero-expert MoE (reference LongcatFlashMoE): softmax scores,
        top-k over bias-corrected scores, weights from unbiased scores
        scaled by routed_scaling_factor; identity experts contribute
        ``weight * x``."""
        c = self.config
        T, Hd = x.shape
        E = c.num_experts
        K = c.num_experts_per_tok
        w, ids = route_tokens(
            x, mp["router"], K, norm_topk_prob=False,
            scoring_fn="softmax", e_score_bias=mp["e_score_bias"],
            scaling_factor=c.routed_scaling_factor)
        real = ids < E
        w_real = jnp.where(real, w, 0.0)
        ids_c = jnp.where(real, ids, 0)
        order, group_sizes = permute_for_experts(ids_c, E)
        x_sorted = x[order // K]
        y_sorted = grouped_expert_ffn(x_sorted, group_sizes,
                                      mp["w1"], mp["w2"])
        y_flat = jnp.zeros((T * K, Hd), y_sorted.dtype).at[order].set(
            y_sorted)
        y = jnp.einsum("tkh,tk->th", y_flat.reshape(T, K, Hd),
                       w_real.astype(y_sorted.dtype))
        zero_w = jnp.sum(jnp.where(real, 0.0, w), axis=-1)
        y = y + x.astype(y.dtype) * zero_w[:, None].astype(y.dtype)
        return y.astype(x.dtype)

    def apply_layer(self, layer_params, x, residual, positions, kv_cache,
                    attn_metadata, layer_idx, lora=None, token_adapter=None):
        c = self.config
        lp = layer_params
        eps = c.rms_norm_eps
        # Sublayer 0: attention.
        h, res = fused_add_rms_norm(x, residual,
                                    lp["input_ln0"]["weight"], eps)
        attn0, kv_a = self._attention({"self_attn": lp["attn0"]},
                                      h, positions, kv_cache["a"],
                                      attn_metadata, layer_idx=layer_idx)
        h, res = fused_add_rms_norm(attn0, res,
                                    lp["post_ln0"]["weight"], eps)
        # Shortcut MoE from the SAME normed activation as mlp0.
        shortcut = self._shortcut_moe(lp["moe"], h)
        mlp0 = self._mlp(lp["mlp0"], h)
        # Sublayer 1: attention.
        h, res = fused_add_rms_norm(mlp0, res,
                                    lp["input_ln1"]["weight"], eps)
        attn1, kv_b = self._attention({"self_attn": lp["attn1"]},
                                      h, positions, kv_cache["b"],
                                      attn_metadata, layer_idx=layer_idx)
        h, res = fused_add_rms_norm(attn1, res,
                                    lp["post_ln1"]["weight"], eps)
        out = self._mlp(lp["mlp1"], h) + shortcut
        return out, res, {"a": kv_a, "b": kv_b}

    # ---- weight loading ----------------------------------------------------

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        c = self.config
        H = c.num_attention_heads
        dn, dv = c.qk_nope_head_dim, c.v_head_dim
        params = self.init_params(0)

        def put(node, key, w, transpose=True):
            w = np.asarray(w)
            if transpose:
                w = w.T
            arr = jnp.asarray(w, self.dtype)
            assert node[key].shape == arr.shape, \
                (key, node[key].shape, arr.shape)
            node[key] = arr

        gate_up: Dict[Tuple[int, str, str], np.ndarray] = {}
        experts: Dict[Tuple[int, int, str], np.ndarray] = {}

        for name, w in weights:
            n = name.removeprefix("model.")
            if n == "embed_tokens.weight":
                put(params["embed"], "weight", w, transpose=False)
            elif n == "norm.weight":
                params["norm"]["weight"] = jnp.asarray(w, self.dtype)
            elif name == "lm_head.weight" and not c.tie_word_embeddings:
                put(params["lm_head"], "kernel", w)
            elif m := re.match(r"layers\.(\d+)\.(.+)", n):
                i, rest = int(m.group(1)), m.group(2)
                layer = params["layers"][i]
                if m2 := re.match(r"input_layernorm\.([01])\.weight", rest):
                    layer[f"input_ln{m2.group(1)}"]["weight"] = \
                        jnp.asarray(w, self.dtype)
                elif m2 := re.match(
                        r"post_attention_layernorm\.([01])\.weight", rest):
                    layer[f"post_ln{m2.group(1)}"]["weight"] = \
                        jnp.asarray(w, self.dtype)
                elif m2 := re.match(r"self_attn\.([01])\.(.+)", rest):
                    attn = layer[f"attn{m2.group(1)}"]
                    key = m2.group(2)
                    if key == "q_a_proj.weight":
                        put(attn["q_a_proj"], "kernel", w)
                    elif key == "q_a_layernorm.weight":
                        attn["q_a_norm"]["weight"] = jnp.asarray(
                            w, self.dtype)
                    elif key == "q_b_proj.weight":
                        put(attn["q_b_proj"], "kernel", w)
                    elif key == "q_proj.weight":
                        put(attn["q_proj"], "kernel", w)
                    elif key == "kv_a_proj_with_mqa.weight":
                        put(attn["kv_a_proj"], "kernel", w)
                    elif key == "kv_a_layernorm.weight":
                        attn["kv_a_norm"]["weight"] = jnp.asarray(
                            w, self.dtype)
                    elif key == "kv_b_proj.weight":
                        wb = np.asarray(w).reshape(H, dn + dv, -1)
                        attn["w_uk"] = jnp.asarray(wb[:, :dn, :],
                                                   self.dtype)
                        attn["w_uv"] = jnp.asarray(wb[:, dn:, :],
                                                   self.dtype)
                    elif key == "o_proj.weight":
                        put(attn["o_proj"], "kernel", w)
                elif m2 := re.match(r"mlps\.([01])\.(gate|up|down)_proj"
                                    r"\.weight", rest):
                    gate_up[(i, m2.group(1), m2.group(2))] = np.asarray(w)
                elif m2 := re.match(r"mlp\.experts\.(\d+)\."
                                    r"(gate|up|down)_proj\.weight", rest):
                    experts[(i, int(m2.group(1)), m2.group(2))] = \
                        np.asarray(w)
                elif rest == "mlp.router.classifier.weight":
                    put(layer["moe"], "router", w)
                elif rest == "mlp.router.e_score_correction_bias":
                    layer["moe"]["e_score_bias"] = jnp.asarray(
                        w, jnp.float32)
                else:
                    logger.debug("skipping weight %s", name)
            else:
                logger.debug("skipping weight %s", name)

        for (i, j, _), _w in list(gate_up.items()):
            if (i, j, "gate") in gate_up and (i, j, "up") in gate_up:
                mp = params["layers"][i][f"mlp{j}"]
                mp["gate_up"]["kernel"] = jnp.asarray(np.concatenate(
                    [gate_up[(i, j, "gate")].T, gate_up[(i, j, "up")].T],
                    axis=1), self.dtype)
                mp["down"]["kernel"] = jnp.asarray(
                    gate_up[(i, j, "down")].T, self.dtype)
        by_layer: Dict[int, set] = {}
        for (i, e, _k) in experts:
            by_layer.setdefault(i, set()).add(e)
        for i, es in by_layer.items():
            moe = params["layers"][i]["moe"]
            w1 = np.stack([np.concatenate(
                [experts[(i, e, "gate")].T, experts[(i, e, "up")].T],
                axis=1) for e in sorted(es)])
            w2 = np.stack([experts[(i, e, "down")].T for e in sorted(es)])
            moe["w1"] = jnp.asarray(w1, self.dtype)
            moe["w2"] = jnp.asarray(w2, self.dtype)
        return params
