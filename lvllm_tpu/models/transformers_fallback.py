"""Transformers-backend fallback architectures.

Counterpart of the reference's transformers backend
(``models/transformers/`` + registry ``_TRANSFORMERS_BACKEND_MODELS``):
a catch-all that serves checkpoints whose architecture has no dedicated
implementation. The reference reuses the HF module code with its own
attention injected; the TPU-native equivalent maps the checkpoint onto
the unified functional model, which covers the llama/qwen-family layout
the overwhelming majority of remote-code forks use (standard config keys
+ ``model.layers.N.self_attn.{q,k,v,o}_proj`` / ``mlp.{gate,up,down}_proj``
or qwen-MoE expert naming).

A checkpoint with a different weight layout fails loudly at load instead
of silently producing garbage.
"""

from typing import Dict, Any

from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model
from lvllm_tpu.models.reward import _ScoreHeadMixin

Params = Dict[str, Any]


class TransformersFallbackModel(Qwen3Model):
    """Generic decoder fallback (reference: transformers backend,
    registry.py _TRANSFORMERS_BACKEND_MODELS)."""

    _EXPECTED = ("self_attn.q_proj.weight", "attn.c_attn.weight")

    def load_weights(self, weights) -> Params:
        seen = {"ok": False}

        def watch():
            for name, w in weights:
                if any(key in name for key in self._EXPECTED):
                    seen["ok"] = True
                yield name, w

        params = super().load_weights(watch())
        if not seen["ok"]:
            raise ValueError(
                f"{self.config.architecture}: checkpoint does not follow "
                "a llama/qwen-family weight layout (no "
                "self_attn.q_proj.* tensors found). The transformers-"
                "fallback path only supports standard decoder layouts; "
                "add a dedicated remap for this family instead.")
        return params


class TransformersFallbackClassifier(_ScoreHeadMixin,
                                     TransformersFallbackModel):
    pass


for _arch in ("TransformersForCausalLM", "TransformersMoEForCausalLM",
              "TransformersEmbeddingModel",
              "TransformersMoEEmbeddingModel"):
    register_model(_arch)(TransformersFallbackModel)
for _arch in ("TransformersForSequenceClassification",
              "TransformersMoEForSequenceClassification"):
    register_model(_arch)(TransformersFallbackClassifier)
