"""Model registry: architecture name → implementation.

Counterpart of the reference's ``vllm/model_executor/models/registry.py``
(_TEXT_GENERATION_MODELS). New families register here as they land.
"""

from typing import Callable, Dict

from lvllm_tpu.config import ModelConfig

_REGISTRY: Dict[str, Callable] = {}


def register_model(architecture: str):
    def deco(cls):
        _REGISTRY[architecture] = cls
        return cls
    return deco


def get_model_class(architecture: str):
    if architecture not in _REGISTRY:
        raise ValueError(
            f"Unsupported architecture {architecture!r}. "
            f"Supported: {sorted(_REGISTRY)}")
    return _REGISTRY[architecture]


def build_model(config: ModelConfig):
    return get_model_class(config.architecture)(config)


def _register_builtin() -> None:
    from lvllm_tpu.models.qwen3 import Qwen3Model
    # Dense Qwen2/Qwen3 and Qwen3-MoE share one implementation; the config
    # (num_experts, decoder_sparse_step) selects dense vs sparse FFN.
    # One unified implementation covers the llama-family dense models and
    # the gate/up/down MoE families; per-family behavior is config-driven
    # (qk_norm, attention_bias, partial rotary, router scoring, shared
    # experts) — see model_loader/hf_config.py fixups.
    for arch in ("Qwen3ForCausalLM", "Qwen2ForCausalLM",
                 "Qwen3MoeForCausalLM", "Qwen2MoeForCausalLM",
                 "LlamaForCausalLM", "MistralForCausalLM",
                 "MixtralForCausalLM", "Glm4MoeForCausalLM",
                 "Glm4ForCausalLM",
                 # llama-structured with config-driven deltas:
                 # SmolLM3 = NoPE layers, Granite = muP multipliers.
                 "SmolLM3ForCausalLM", "GraniteForCausalLM",
                 # MiniMax-M2: full-vector qk-norm + partial rotary +
                 # sigmoid router, all config-driven (hf_config.py fixups).
                 "MiniMaxM2ForCausalLM",
                 # LayerNorm / non-gated-MLP families (norm_type,
                 # mlp_gated, learned_pos_embeddings config knobs):
                 "GPT2LMHeadModel", "Starcoder2ForCausalLM",
                 "StableLmForCausalLM", "NemotronForCausalLM",
                 # OLMo family: post-norm ordering (norm_after) and
                 # across-heads qk-norm.
                 "Olmo2ForCausalLM", "Olmo3ForCausalLM",
                 "OlmoeForCausalLM",
                 # MoE breadth: ERNIE 4.5 (dense+MoE, moe_statics bias),
                 # Hunyuan V1 (qk-norm after rope, shared MLP), DBRX
                 # (fused Wqkv + clip_qkv + stacked experts), Dots1
                 # (DeepSeek-V3-style routing + qk-norm), Seed-OSS.
                 "Ernie4_5ForCausalLM", "Ernie4_5_MoeForCausalLM",
                 "HunYuanDenseV1ForCausalLM", "HunYuanMoEV1ForCausalLM",
                 "DbrxForCausalLM", "Dots1ForCausalLM",
                 "SeedOssForCausalLM",
                 # Parallel-residual families (parallel_residual knob):
                 # GPT-NeoX/Pythia (dual norms), Phi-1/2 (single norm,
                 # biased lm_head), Falcon (fused MQA qkv layouts),
                 # GPTBigCode/Starcoder-1 (MQA + learned positions).
                 "GPTNeoXForCausalLM", "PhiForCausalLM",
                 "FalconForCausalLM", "RWForCausalLM",
                 "GPTBigCodeForCausalLM",
                 # InternLM2 (fused wqkv), Baichuan (W_pack + NormHead),
                 # GraniteMoE (stacked experts, topk-softmax router),
                 # EXAONE-4 (post-norm + hybrid-NoPE sliding pattern).
                 "InternLM2ForCausalLM", "BaichuanForCausalLM",
                 "BaiChuanForCausalLM", "GraniteMoeForCausalLM",
                 "Exaone4ForCausalLM",
                 # ALiBi families (Bloom fused-qkv + embedding layernorm,
                 # MPT Wqkv; Baichuan-13B covered by the Baichuan entry).
                 "BloomForCausalLM", "MptForCausalLM", "MPTForCausalLM",
                 # OPT (learned pos offset-2, relu MLP), GPT-J (parallel
                 # residual + partial interleaved rope), Cohere/Cohere2
                 # (parallel block, interleaved rope, scaled logits,
                 # per-head qk layernorm), Persimmon (fused qkv + biased
                 # qk layernorm), OLMo-v1 (non-parametric LayerNorm),
                 # Orion (LayerNorm llama), Arcee (ReLU² MLP),
                 # GraniteMoeShared, InternLM-v1 (biased attention), and
                 # llama-clone aliases (Aquila, Xverse, LLaMA).
                 "OPTForCausalLM", "GPTJForCausalLM",
                 "CohereForCausalLM", "Cohere2ForCausalLM",
                 "PersimmonForCausalLM", "OlmoForCausalLM",
                 "OrionForCausalLM", "ArceeForCausalLM",
                 "GraniteMoeSharedForCausalLM", "InternLMForCausalLM",
                 "LLaMAForCausalLM", "AquilaForCausalLM", "AquilaModel",
                 "XverseForCausalLM",
                 # EXAONE-3 (GPT-NeoX-style names), Solar (bskcn skip
                 # blending), TeleChat2 (query + interleaved key_value),
                 # TeleFLM (µP multipliers), Qwen-1 (fused biased c_attn),
                 # Grok-1 (sandwich norms + soft caps + µP multipliers) —
                 # all config/remap-driven on the unified model.
                 "ExaoneForCausalLM", "SolarForCausalLM",
                 "TeleChat2ForCausalLM", "TeleChatForCausalLM",
                 "TeleFLMForCausalLM", "QWenLMHeadModel",
                 "Grok1ForCausalLM", "Grok1ModelForCausalLM",
                 # Llama-clone alias (reference registry.py:145).
                 "IQuestCoderForCausalLM",
                 # HyperCLOVAX (Granite-style multipliers + optional dual
                 # post-norms), Ling/BailingMoe (fused qkv + grouped
                 # sigmoid routing + shared experts), EXAONE-MoE
                 # (DeepSeek-V3-style routing under llama attention),
                 # JAIS (GPT-2 layout + ALiBi + swiglu + µP scales).
                 "HyperCLOVAXForCausalLM", "BailingMoeForCausalLM",
                 "BailingMoeV2ForCausalLM", "ExaoneMoEForCausalLM",
                 "JAISLMHeadModel",
                 # Jais-2 (relu² MLP + LayerNorm + interleaved sliding),
                 # Afmoe (gated attention + sandwich norms + MoE).
                 "Jais2ForCausalLM", "AfmoeForCausalLM",
                 # InternLM2-VE: visual-expert FFN only fires on image
                 # rows inside InternVL-mono; text serving is plain
                 # InternLM2 (reference internlm2_ve.py).
                 "InternLM2VEForCausalLM"):
        _REGISTRY[arch] = Qwen3Model

    # GLM-4-MoE-Lite: DeepseekV2 attention under GLM-4-MoE routing
    # (reference glm4_moe_lite.py:94-141) — MLA iff the config carries
    # kv_lora_rank, plain GQA otherwise.
    def _mla_or_gqa(config):
        from lvllm_tpu.models.deepseek import DeepseekModel
        if config.attention_type == "mla":
            return DeepseekModel(config)
        return Qwen3Model(config)
    _REGISTRY["Glm4MoeLiteForCausalLM"] = _mla_or_gqa
    # openPangu family (reference openpangu.py:1359-1367): MLA iff the
    # config carries the latent-attention dims.
    for arch in ("PanguEmbeddedForCausalLM", "PanguUltraMoEForCausalLM",
                 "PanguProMoEV2ForCausalLM"):
        _REGISTRY[arch] = _mla_or_gqa
    # Sarvam (reference sarvam.py:671,771): MLA variant is deepseek-like;
    # the MoE variant is a BailingMoe layout.
    _REGISTRY["SarvamMLAForCausalLM"] = _mla_or_gqa
    _REGISTRY["SarvamMoEForCausalLM"] = Qwen3Model

    # Transformers-backend fallback archs (registered via decorator).
    from lvllm_tpu.models import transformers_fallback  # noqa: F401

    # MiniCPM 1/2 are llama-structured with muP multipliers (hf_config
    # fixups); MiniCPM3 swaps in MLA attention (DeepseekModel below).
    for arch in ("MiniCPMForCausalLM",
                 "GlmForCausalLM", "VaultGemmaForCausalLM",
                 "FlexOlmoForCausalLM", "PhimoeForCausalLM",
                 "ApertusForCausalLM",
                 # Spelling / structural aliases (reference registry.py
                 # maps these onto the same module files).
                 "PhiMoEForCausalLM", "TeleChat3ForCausalLM",
                 "Ministral3ForCausalLM",
                 # Chameleon: llama + per-head biased qk-layernorm; VQ
                 # image tokens come from the processor.
                 "ChameleonForConditionalGeneration",
                 # Llama4 text: NoPE interleave + L2 qk-norm + top-1
                 # sigmoid input-weighted MoE, all config-driven; the
                 # vision checkpoint flattens to the text stack.
                 "Llama4ForCausalLM",
                 "Llama4ForConditionalGeneration"):
        _REGISTRY[arch] = Qwen3Model

    from lvllm_tpu.models.qwen3_next import Qwen3NextModel
    _REGISTRY["Qwen3NextForCausalLM"] = Qwen3NextModel

    from lvllm_tpu.models.llava import LlavaModel
    for arch in ("LlavaForConditionalGeneration",
                 "LlavaNextForConditionalGeneration",
                 # Mantis is plain LLaVA with a different chat recipe
                 # (reference registry.py: ("llava", "Mantis...")).
                 "MantisForConditionalGeneration",
                 # Mistral-format Pixtral: pixtral tower + mistral text,
                 # HF or mistral-native naming (reference pixtral.py:294).
                 "PixtralForConditionalGeneration"):
        _REGISTRY[arch] = LlavaModel
    import lvllm_tpu.models.llava_onevision  # noqa: F401
    import lvllm_tpu.models.mistral3  # noqa: F401
    import lvllm_tpu.models.qwen2_audio  # noqa: F401
    import lvllm_tpu.models.voxtral  # noqa: F401
    import lvllm_tpu.models.ultravox  # noqa: F401
    import lvllm_tpu.models.emu3  # noqa: F401
    import lvllm_tpu.spec_decode.draft_archs  # noqa: F401
    from lvllm_tpu.models.minicpmv import MiniCPMVModel
    _REGISTRY["MiniCPMO"] = MiniCPMVModel
    import lvllm_tpu.models.kimi_vl  # noqa: F401
    import lvllm_tpu.models.eagle2_5_vl  # noqa: F401
    import lvllm_tpu.models.qwen_vl  # noqa: F401
    import lvllm_tpu.models.molmo  # noqa: F401
    import lvllm_tpu.models.llava_next_video  # noqa: F401
    import lvllm_tpu.models.aria  # noqa: F401
    import lvllm_tpu.models.ovis2  # noqa: F401
    import lvllm_tpu.models.blip2  # noqa: F401
    import lvllm_tpu.models.phi4mm  # noqa: F401
    import lvllm_tpu.models.gemma3n  # noqa: F401
    import lvllm_tpu.models.clip_embed  # noqa: F401
    import lvllm_tpu.models.tarsier  # noqa: F401
    import lvllm_tpu.models.granite_speech  # noqa: F401
    import lvllm_tpu.models.qwen2_5_omni  # noqa: F401
    from lvllm_tpu.models.qwen2_vl import Qwen2VLModel
    for arch in ("Qwen2VLForConditionalGeneration",
                 "Qwen2_5_VLForConditionalGeneration",
                 # Qwen2.5-VL subclass with name remaps only
                 # (reference opencua.py:204).
                 "OpenCUAForConditionalGeneration"):
        _REGISTRY[arch] = Qwen2VLModel
    from lvllm_tpu.models.qwen3_vl import Qwen3VLModel
    for arch in ("Qwen3VLForConditionalGeneration",
                 "Qwen3VLMoeForConditionalGeneration"):
        _REGISTRY[arch] = Qwen3VLModel
    # Vision late-interaction retrievers (ColPali / ColQwen3).
    import lvllm_tpu.models.colbert_vl  # noqa: F401

    from lvllm_tpu.models.gpt_oss import GptOssModel
    _REGISTRY["GptOssForCausalLM"] = GptOssModel

    from lvllm_tpu.models.phi3 import Phi3Model
    _REGISTRY["Phi3ForCausalLM"] = Phi3Model
    import lvllm_tpu.models.phi3v  # noqa: F401

    from lvllm_tpu.models.mamba2 import BambaModel, Mamba2Model
    _REGISTRY["Mamba2ForCausalLM"] = Mamba2Model
    _REGISTRY["BambaForCausalLM"] = BambaModel
    # Granite 4.0 hybrid: Bamba layer mix + GraniteMoE FFN/shared MLP +
    # Granite multipliers, all config-driven.
    _REGISTRY["GraniteMoeHybridForCausalLM"] = BambaModel

    from lvllm_tpu.models.gemma import GemmaModel
    for arch in ("GemmaForCausalLM", "Gemma2ForCausalLM",
                 "Gemma3ForCausalLM"):
        _REGISTRY[arch] = GemmaModel

    from lvllm_tpu.models import longcat_flash  # noqa: F401
    from lvllm_tpu.models import step3_text  # noqa: F401
    from lvllm_tpu.models import step3_vl  # noqa: F401
    from lvllm_tpu.models import zamba2  # noqa: F401
    from lvllm_tpu.models import nemotron_h  # noqa: F401
    from lvllm_tpu.models import chatglm  # noqa: F401
    from lvllm_tpu.models import kimi_linear  # noqa: F401
    from lvllm_tpu.models import minimax_text01  # noqa: F401
    from lvllm_tpu.models import minimax_vl01  # noqa: F401

    from lvllm_tpu.models.deepseek import DeepseekModel
    for arch in ("DeepseekV2ForCausalLM", "DeepseekV3ForCausalLM",
                 "DeepseekForCausalLM", "MiniCPM3ForCausalLM",
                 # Checkpoint-compatible V3 variants the reference maps
                 # onto deepseek_v2.py (registry.py:98,122); the DSA
                 # sparse-attention index runs dense here.
                 "DeepseekV32ForCausalLM", "GlmMoeDsaForCausalLM",
                 # DeepseekV3 math under mistral-format weight names
                 # (reference: models/mistral_large_3.py).
                 "MistralLarge3ForCausalLM"):
        _REGISTRY[arch] = DeepseekModel

    from lvllm_tpu.models.mamba1 import (JambaModel, Lfm2Model,
                                         MambaModel)
    _REGISTRY["MambaForCausalLM"] = MambaModel
    from lvllm_tpu.models.mamba1 import FalconMambaModel
    _REGISTRY["FalconMambaForCausalLM"] = FalconMambaModel
    _REGISTRY["JambaForCausalLM"] = JambaModel
    _REGISTRY["Lfm2ForCausalLM"] = Lfm2Model
    # Lfm2Moe: same conv/attention hybrid, MoE FFN past the first
    # num_dense_layers (reference lfm2_moe.py).
    _REGISTRY["Lfm2MoeForCausalLM"] = Lfm2Model

    # Encoder-only embedding families (registered via decorator on import).
    from lvllm_tpu.models import bert  # noqa: F401
    from lvllm_tpu.models import modernbert  # noqa: F401
    # SPLADE / ColBERT / bidirectional-decoder retrieval models.
    from lvllm_tpu.models import retrieval  # noqa: F401
    # Reward-model heads over causal decoders.
    from lvllm_tpu.models import reward  # noqa: F401

    # Embedding conversions of causal decoders (reference registry
    # _EMBEDDING_MODELS: the decoder serves /v1/embeddings with last-token
    # or mean pooling; same forward, no LM head required) plus llama-clone
    # aliases the reference maps straight onto llama/qwen2
    # (InternLM3/Cwm → llama, MiMo → qwen2 + ignored MTP layers,
    # StableLMEpoch → stablelm).
    for arch in ("LlamaModel", "MistralModel", "Qwen2Model", "GritLM",
                 "InternLM3ForCausalLM", "CwmForCausalLM",
                 "MiMoForCausalLM", "StableLMEpochForCausalLM"):
        _REGISTRY[arch] = Qwen3Model
    for arch in ("Gemma2Model", "Gemma3TextModel"):
        from lvllm_tpu.models.gemma import GemmaModel as _GM
        _REGISTRY[arch] = _GM

    # Multimodal families registered via decorator on import.
    from lvllm_tpu.models import gemma3_mm  # noqa: F401
    from lvllm_tpu.models import paligemma  # noqa: F401
    from lvllm_tpu.models import aya_vision  # noqa: F401
    from lvllm_tpu.models import cohere2_vision  # noqa: F401
    from lvllm_tpu.models import glm4v  # noqa: F401
    from lvllm_tpu.models import internvl  # noqa: F401
    from lvllm_tpu.models import idefics3  # noqa: F401
    from lvllm_tpu.models import fuyu  # noqa: F401
    from lvllm_tpu.models import falcon_h1  # noqa: F401

    # Audio encoder-decoder (Whisper).
    from lvllm_tpu.models import whisper  # noqa: F401


_register_builtin()
