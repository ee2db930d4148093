"""Step-3 text decoder: two-stage compressed query MQA + MoE.

Reference: vllm ``models/step3_text.py`` — fused qkv of
[share_q_dim | head_dim | head_dim] rows (MQA, num_kv_heads = 1,
head_dim 256), q through a share_q_dim RMS ``inter_norm`` then ``wq``
expansion (:139-220); MoE layers (moe_layers_enum, default all but
layer 0) carry a softmax router (renormalize = norm_expert_weight) plus
an always-on ``share_expert`` MLP (:245-270).
"""

import re
from typing import Any, Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.qwen3 import Qwen3Model, rms_norm
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.ops.rope import apply_rope

Params = Dict[str, Any]


@register_model("Step3TextForCausalLM")
class Step3TextModel(Qwen3Model):

    dcp_compatible = False

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        sq = c.share_q_dim or c.head_dim
        D = self.head_dim
        nprng = np.random.default_rng(791 + c.seed)

        def dense(shape, scale=0.02):
            return jnp.asarray(
                nprng.standard_normal(size=shape, dtype=np.float32) * scale,
                self.dtype)

        for layer in params["layers"]:
            layer["self_attn"] = {
                "q_proj": {"kernel": dense((c.hidden_size, sq))},
                "k_proj": {"kernel": dense((c.hidden_size, D))},
                "v_proj": {"kernel": dense((c.hidden_size, D))},
                "wq": {"kernel": dense((sq,
                                        c.num_attention_heads * D))},
                "inter_norm": jnp.ones((sq,), self.dtype),
                "o_proj": {"kernel": dense(
                    (c.num_attention_heads * D, c.hidden_size))},
            }
        return params

    def _attention(self, lp, x, positions, kv_cache, md, lora=None,
                   token_adapter=None, layer_idx: int = 0):
        from lvllm_tpu.ops.attention import ragged_paged_attention
        from lvllm_tpu.ops.kv_cache import write_kv

        c = self.config
        D = self.head_dim
        T = x.shape[0]
        attn = lp["self_attn"]
        q = x @ attn["q_proj"]["kernel"]
        q = rms_norm(q, attn["inter_norm"], c.rms_norm_eps)
        q = (q @ attn["wq"]["kernel"]).reshape(
            T, c.num_attention_heads, D)
        k = (x @ attn["k_proj"]["kernel"]).reshape(T, 1, D)
        v = (x @ attn["v_proj"]["kernel"]).reshape(T, 1, D)
        q, k = apply_rope(q, k, positions, self.rope_cache(layer_idx))
        kv_cache = write_kv(kv_cache, k, v, md.slot_mapping)
        out = ragged_paged_attention(
            q, kv_cache, md.block_table, md.query_start_loc, md.seq_lens,
            scale=self.scale)
        return (out.reshape(T, -1) @ attn["o_proj"]["kernel"],
                kv_cache)

    def _adapt_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        c = self.config
        sq = c.share_q_dim or c.head_dim
        D = c.head_dim

        def gen():
            for name, w in weights:
                if m := re.match(r"model\.layers\.(\d+)\.(.+)", name):
                    i, rest = m.group(1), m.group(2)
                    p = f"model.layers.{i}."
                    if rest == "self_attn.qkv_proj.weight":
                        yield p + "self_attn.q_proj.weight", w[:sq]
                        yield p + "self_attn.k_proj.weight", w[sq:sq + D]
                        yield p + "self_attn.v_proj.weight", w[sq + D:]
                    elif rest == "self_attn.inter_norm.weight":
                        yield p + "self_attn.__inter_norm__", w
                    elif rest == "self_attn.wq.weight":
                        yield p + "self_attn.__wq__", w
                    elif rest.startswith("moe.gate."):
                        yield p + "mlp.gate." + \
                            rest.removeprefix("moe.gate."), w
                    elif rest.startswith("moe.experts."):
                        yield p + "mlp.experts." + \
                            rest.removeprefix("moe.experts."), w
                    elif rest.startswith("share_expert."):
                        yield p + "mlp.shared_experts." + \
                            rest.removeprefix("share_expert."), w
                    else:
                        yield name, w
                else:
                    yield name, w

        return gen()

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        tagged: Dict[Tuple[int, str], np.ndarray] = {}

        def filter_stream():
            for name, w in self._adapt_weights(weights):
                m = re.match(
                    r"model\.layers\.(\d+)\.self_attn\.__(.+)__", name)
                if m:
                    tagged[(int(m.group(1)), m.group(2))] = np.asarray(w)
                else:
                    yield name, w

        # The base loader re-runs _adapt_weights; our generator is
        # idempotent on already-adapted names.
        params = super().load_weights(filter_stream())
        for i, layer in enumerate(params["layers"]):
            attn = layer["self_attn"]
            if (i, "inter_norm") in tagged:
                attn["inter_norm"] = jnp.asarray(
                    tagged[(i, "inter_norm")], self.dtype)
            if (i, "wq") in tagged:
                attn["wq"] = {"kernel": jnp.asarray(
                    np.ascontiguousarray(tagged[(i, "wq")].T),
                    self.dtype)}
        return params
