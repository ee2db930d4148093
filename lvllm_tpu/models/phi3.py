"""Phi-3 family (Phi3ForCausalLM / Phi3.5 / Phi-4 text configs).

Behavioral reference: ``/root/reference/vllm/model_executor/models/phi3.py``
(llama-structured decoder with fused qkv_proj / gate_up_proj checkpoints and
LongRoPE scaling); HF numerics reference: transformers ``modeling_phi3``.

Architecture-wise this is the unified Qwen3Model (no qk-norm, no bias,
SwiGLU); only the checkpoint layout differs — HF stores one fused
``qkv_proj`` and one fused ``gate_up_proj`` per layer, split here on load.
LongRoPE (short/long per-frequency factors) lives in ops/rope.py.
"""

import re
from typing import Iterable, Tuple

import numpy as np

from lvllm_tpu.models.model_base import Params
from lvllm_tpu.models.qwen3 import Qwen3Model


class Phi3Model(Qwen3Model):

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]
                     ) -> Params:
        c = self.config
        D = c.head_dim
        nq = c.num_attention_heads * D
        nkv = c.num_key_value_heads * D

        def split_stream():
            for name, w in weights:
                stripped = name.removeprefix("model.")
                if m := re.match(r"layers\.(\d+)\.self_attn\.qkv_proj"
                                 r"\.weight$", stripped):
                    i = m.group(1)
                    w = np.asarray(w)
                    yield f"layers.{i}.self_attn.q_proj.weight", w[:nq]
                    yield f"layers.{i}.self_attn.k_proj.weight", \
                        w[nq:nq + nkv]
                    yield f"layers.{i}.self_attn.v_proj.weight", \
                        w[nq + nkv:]
                elif m := re.match(r"layers\.(\d+)\.mlp\.gate_up_proj"
                                   r"\.weight$", stripped):
                    i = m.group(1)
                    w = np.asarray(w)
                    half = w.shape[0] // 2
                    yield f"layers.{i}.mlp.gate_proj.weight", w[:half]
                    yield f"layers.{i}.mlp.up_proj.weight", w[half:]
                else:
                    yield name, w

        return super().load_weights(split_stream())
