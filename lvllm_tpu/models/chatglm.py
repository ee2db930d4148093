"""ChatGLM / ChatGLM2/3 & GLM-4 (chatglm-format checkpoints).

Behavioral reference: ``/root/reference/vllm/model_executor/models/
chatglm.py`` (+ config ``transformers_utils/configs/chatglm.py``).
Architecturally this is the GLM dense recipe the unified Qwen3Model
already serves (partial-rotary 0.5, interleaved rope, SwiGLU, qkv bias):
only the checkpoint layout differs — ``transformer.encoder.layers.N.
self_attention.query_key_value`` fused QKV, ``dense`` for o_proj,
``dense_h_to_4h`` fused gate|up, ``transformer.output_layer`` lm head.
This subclass translates the stream into the unified names.
"""

import re
from typing import Iterable, Tuple

import numpy as np

from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


@register_model("ChatGLMModel")
@register_model("ChatGLMForCausalLM")
@register_model("ChatGLMForConditionalGeneration")
class ChatGLMModel(Qwen3Model):

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        c = self.config
        D = c.head_dim
        nq = c.num_attention_heads * D
        nkv = c.num_key_value_heads * D

        def translate():
            for name, w in weights:
                n = name.removeprefix("transformer.")
                if n in ("embedding.word_embeddings.weight",
                         "word_embeddings.weight"):
                    yield "model.embed_tokens.weight", w
                elif n == "encoder.final_layernorm.weight":
                    yield "model.norm.weight", w
                elif n == "output_layer.weight":
                    yield "lm_head.weight", w
                elif n == "rotary_pos_emb.inv_freq":
                    continue
                elif m := re.match(r"encoder\.layers\.(\d+)\.(.+)", n):
                    i, rest = m.group(1), m.group(2)
                    p = f"model.layers.{i}"
                    w = np.asarray(w)
                    if rest == "self_attention.query_key_value.weight":
                        yield f"{p}.self_attn.q_proj.weight", w[:nq]
                        yield f"{p}.self_attn.k_proj.weight", \
                            w[nq:nq + nkv]
                        yield f"{p}.self_attn.v_proj.weight", w[nq + nkv:]
                    elif rest == "self_attention.query_key_value.bias":
                        yield f"{p}.self_attn.q_proj.bias", w[:nq]
                        yield f"{p}.self_attn.k_proj.bias", w[nq:nq + nkv]
                        yield f"{p}.self_attn.v_proj.bias", w[nq + nkv:]
                    elif rest == "self_attention.dense.weight":
                        yield f"{p}.self_attn.o_proj.weight", w
                    elif rest == "mlp.dense_h_to_4h.weight":
                        half = w.shape[0] // 2
                        yield f"{p}.mlp.gate_proj.weight", w[:half]
                        yield f"{p}.mlp.up_proj.weight", w[half:]
                    elif rest == "mlp.dense_4h_to_h.weight":
                        yield f"{p}.mlp.down_proj.weight", w
                    elif rest in ("input_layernorm.weight",
                                  "post_attention_layernorm.weight"):
                        yield f"{p}.{rest}", w
                    else:
                        logger.debug("skipping weight %s", name)
                else:
                    yield name, w

        return super().load_weights(translate())
