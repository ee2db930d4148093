"""Vision late-interaction retrievers: ColPali and ColQwen3.

Reference: vllm models/colpali.py (PaliGemma backbone + custom text
projection), models/colqwen3.py:120-197 (Qwen3-VL backbone + projection,
L2-normalized per-token embeddings). HF numerics reference:
transformers ``ColPaliForRetrieval`` (vlm.* prefix +
``embedding_proj_layer``; the original colpali-engine spelling is
``custom_text_proj``).
"""

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from lvllm_tpu.models.paligemma import PaliGemmaModel
from lvllm_tpu.models.qwen3_vl import Qwen3VLModel
from lvllm_tpu.models.registry import register_model

Params = Dict[str, Any]

_PROJ_NAMES = ("custom_text_proj.weight", "embedding_proj_layer.weight")
_PROJ_BIAS = ("custom_text_proj.bias", "embedding_proj_layer.bias")


class _ColVLMixin:
    token_level_embed = True

    def init_params(self, rng) -> Params:
        params = super().init_params(rng)
        dim = self.config.colbert_dim or 128
        params["colbert"] = {
            "kernel": jnp.zeros((self.config.hidden_size, dim),
                                self.dtype),
            "bias": jnp.zeros((dim,), self.dtype)}
        return params

    def token_project(self, params, hidden):
        node = params["colbert"]
        return hidden @ node["kernel"] + node.get("bias", 0.0)

    def load_weights(self, weights) -> Params:
        proj: Dict[str, np.ndarray] = {}

        def strip():
            for name, w in weights:
                name = name.removeprefix("vlm.")
                if name.endswith(_PROJ_NAMES):
                    proj["kernel"] = np.asarray(w)
                elif name.endswith(_PROJ_BIAS):
                    proj["bias"] = np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(strip())
        if "kernel" in proj:
            node = {"kernel": jnp.asarray(
                np.ascontiguousarray(proj["kernel"].T), self.dtype)}
            if "bias" in proj:
                node["bias"] = jnp.asarray(proj["bias"], self.dtype)
            params["colbert"] = node
        return params


@register_model("ColPaliForRetrieval")
class ColPaliRetrievalModel(_ColVLMixin, PaliGemmaModel):
    # Retrieval documents are a single prefix-LM span (PaliGemma treats
    # image + prompt bidirectionally; there is no completion here).
    bidirectional = True


@register_model("ColQwen3")
@register_model("OpsColQwen3Model")
@register_model("Qwen3VLNemotronEmbedModel")
class ColQwen3RetrievalModel(_ColVLMixin, Qwen3VLModel):
    pass
