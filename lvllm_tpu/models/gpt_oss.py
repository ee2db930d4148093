"""gpt-oss (OpenAI open-weight MoE) family.

Behavioral reference: ``/root/reference/vllm/model_executor/models/gpt_oss.py``
(attention sinks, alternating sliding window, clamped-SwiGLU experts with
biases, softmax-after-top-k router); HF numerics reference: transformers
``modeling_gpt_oss`` (GptOssExperts / GptOssTopKRouter /
eager_attention_forward). Config-driven behavior lives in the unified
Qwen3Model (attention_sinks, window_for_layer, hidden_act="swiglu_oai",
scoring_fn="softmax_topk", moe_bias); this subclass adds the checkpoint
layout: fused+interleaved expert tensors and per-projection biases.

Parameter additions vs Qwen3Model:
  self_attn.sinks [Hq] f32
  self_attn.o_proj.bias [H]
  moe.router_bias [E], moe.w1_bias [E, 2I], moe.w2_bias [E, H]
"""

import re
from typing import Iterable, Tuple

import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.model_base import Params
from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def _deinterleave(gu: np.ndarray) -> np.ndarray:
    """HF gpt-oss fuses gate/up interleaved along the last dim
    (gate = [..., ::2], up = [..., 1::2]); our convention is the
    concatenated [gate | up] halves consumed by swiglu_oai_and_mul."""
    return np.concatenate([gu[..., ::2], gu[..., 1::2]], axis=-1)


class GptOssModel(Qwen3Model):

    # Sinks join the DCP LSE merge as a virtual shard and sliding windows
    # mask over global key positions (ops/context_parallel.py).
    dcp_compatible = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        c = self.config
        for layer in params["layers"]:
            layer["self_attn"]["o_proj"]["bias"] = jnp.zeros(
                (c.hidden_size,), self.dtype)
        return params

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        c = self.config
        params = self.init_params(0)

        def put_arr(node, key, value, dtype=None):
            arr = jnp.asarray(value, dtype or self.dtype)
            assert node[key].shape == arr.shape, \
                f"{key}: {node[key].shape} vs {arr.shape}"
            node[key] = arr

        for name, w in weights:
            name = name.removeprefix("model.")
            if name == "embed_tokens.weight":
                put_arr(params["embed"], "weight", w)
            elif name == "norm.weight":
                put_arr(params["norm"], "weight", w)
            elif name == "lm_head.weight":
                if not c.tie_word_embeddings:
                    put_arr(params["lm_head"], "kernel", np.asarray(w).T)
            elif m := re.match(r"layers\.(\d+)\.(.+)", name):
                i, rest = int(m.group(1)), m.group(2)
                layer = params["layers"][i]
                if rest in ("input_layernorm.weight",
                            "post_attention_layernorm.weight"):
                    head, leaf = rest.split(".")
                    put_arr(layer[head], leaf, w)
                elif m2 := re.match(r"self_attn\.([qkvo])_proj\.weight",
                                    rest):
                    put_arr(layer["self_attn"][f"{m2.group(1)}_proj"],
                            "kernel", np.asarray(w).T)
                elif m2 := re.match(r"self_attn\.([qkvo])_proj\.bias", rest):
                    put_arr(layer["self_attn"][f"{m2.group(1)}_proj"],
                            "bias", w)
                elif rest == "self_attn.sinks":
                    put_arr(layer["self_attn"], "sinks", w, jnp.float32)
                elif rest == "mlp.router.weight":       # [E, H]
                    put_arr(layer["moe"], "router", np.asarray(w).T)
                elif rest == "mlp.router.bias":
                    put_arr(layer["moe"], "router_bias", w)
                elif rest == "mlp.experts.gate_up_proj":      # [E, H, 2I]
                    put_arr(layer["moe"], "w1", _deinterleave(np.asarray(w)))
                elif rest == "mlp.experts.gate_up_proj_bias":  # [E, 2I]
                    put_arr(layer["moe"], "w1_bias",
                            _deinterleave(np.asarray(w)))
                elif rest == "mlp.experts.down_proj":          # [E, I, H]
                    put_arr(layer["moe"], "w2", w)
                elif rest == "mlp.experts.down_proj_bias":     # [E, H]
                    put_arr(layer["moe"], "w2_bias", w)
                else:
                    logger.debug("skipping weight %s", name)
            else:
                logger.debug("skipping weight %s", name)
        return params
