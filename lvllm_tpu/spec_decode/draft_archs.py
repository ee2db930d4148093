"""Speculator checkpoint architectures → proposer heads.

Counterpart of the reference's ``_SPECULATIVE_DECODING_MODELS``
(``models/registry.py:570+``): EAGLE/EAGLE-3/Medusa/MTP checkpoints ship
their own architecture names. In this stack such a checkpoint is not
served standalone — its weights load into the matching draft PROPOSER
(spec_decode/eagle.py, medusa.py, mtp.py). Registering the arch names
lets ``SpeculativeConfig(draft_model=...)`` auto-detect the method from
the checkpoint's config.json, exactly like the reference's draft-worker
model construction.
"""

from typing import Dict

from lvllm_tpu.models.registry import register_model

# architecture -> proposer method selected by EngineCore.
DRAFT_ARCH_METHOD: Dict[str, str] = {
    "EagleLlamaForCausalLM": "eagle",
    "EagleLlama4ForCausalLM": "eagle",
    "EagleMiniCPMForCausalLM": "eagle",
    "EagleMistralLarge3ForCausalLM": "eagle",
    "Eagle3LlamaForCausalLM": "eagle3",
    "LlamaForCausalLMEagle3": "eagle3",
    "Eagle3MiniMaxM2ForCausalLM": "eagle3",
    "Eagle3Qwen2_5vlForCausalLM": "eagle3",
    "Eagle3Qwen3vlForCausalLM": "eagle3",
    "Eagle3DeepseekV2ForCausalLM": "eagle3",
    "Eagle3DeepseekV3ForCausalLM": "eagle3",
    "MedusaModel": "medusa",
    "DeepSeekMTPModel": "mtp",
    "EagleDeepSeekMTPModel": "mtp",
    "ErnieMTPModel": "mtp",
    "MiMoMTPModel": "mtp",
    "Glm4MoeMTPModel": "mtp",
    "LongCatFlashMTPModel": "mtp",
    "Qwen3NextMTP": "mtp",
    # Per-family MTP heads (reference registry.py:590-606) — all follow
    # the same one-layer MTP checkpoint layout the mtp proposer consumes
    # (embed + eh_proj + enorm/hnorm + decoder layer + head).
    "DeepSeekV4MTPModel": "mtp",
    "ExaoneMoeMTP": "mtp",
    "Exaone4_5_MTP": "mtp",
    "NemotronHMTPModel": "mtp",
    "Glm4MoeLiteMTPModel": "mtp",
    "GlmOcrMTPModel": "mtp",
    "OpenPanguMTPModel": "mtp",
    "Step3p5MTP": "mtp",
    "Qwen3_5MTP": "mtp",
    "Qwen3_5MoeMTP": "mtp",
    "HYV3MTPModel": "mtp",
}


class DraftHeadModel:
    """A speculator checkpoint built via the registry: carries the config
    and resolves to its proposer method. Not a servable target model —
    EngineCore consumes it through SpeculativeConfig.draft_model."""

    is_draft_model = True

    def __init__(self, config):
        self.config = config
        self.method = DRAFT_ARCH_METHOD[config.architecture]

    def __call__(self, *a, **k):
        raise TypeError(
            f"{self.config.architecture} is a speculative-decoding draft "
            f"head (method={self.method!r}); pass its checkpoint as "
            f"SpeculativeConfig.draft_model instead of serving it")


for _arch in DRAFT_ARCH_METHOD:
    register_model(_arch)(DraftHeadModel)
