"""Emu3 (BAAI): VQ-token multimodal — the processor maps images/video to
discrete vocab ids; the model side is the llama-structured text stack.

Behavioral reference: ``/root/reference/vllm/model_executor/models/
emu3.py`` (registry maps Emu3ForConditionalGeneration onto the text
model) / HF ``modeling_emu3.py`` (Emu3TextModel). The conditional-
generation checkpoint nests text weights under ``model.text_model.`` and
carries ``model.vqmodel.*`` (the VQ tokenizer — processor-side here).
"""

from typing import Iterable, Tuple

import numpy as np

from lvllm_tpu.models.qwen3 import Qwen3Model
from lvllm_tpu.models.registry import register_model


@register_model("Emu3ForConditionalGeneration")
@register_model("Emu3ForCausalLM")
class Emu3Model(Qwen3Model):

    def load_weights(self, weights: Iterable[Tuple[str, np.ndarray]]):
        def filter_stream():
            for name, w in weights:
                if "vqmodel." in name:
                    continue
                # Checkpoint layout: text_model.lm_head.* +
                # text_model.model.layers.* (save_pretrained re-nests the
                # text stack under its own prefix).
                name = name.removeprefix("model.")
                name = name.removeprefix("text_model.")
                yield name, w

        return super().load_weights(filter_stream())
