"""HF config.json → ModelConfig glue.

Counterpart of the reference's ``vllm/transformers_utils/config.py`` family:
reads a checkpoint directory's config.json and maps the fields onto our
ModelConfig, with per-architecture fixups.
"""

import json
import os
from typing import Optional

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def load_model_config(model_path: str,
                      max_model_len: Optional[int] = None,
                      dtype: str = "bfloat16") -> ModelConfig:
    cfg_path = os.path.join(model_path, "config.json")
    with open(cfg_path) as f:
        hf = json.load(f)

    # Composite multimodal configs may carry architectures only in
    # text_config (e.g. Qwen2-VL saved by newer transformers).
    arch = (hf.get("architectures") or
            (hf.get("text_config") or {}).get("architectures") or
            ["Qwen3ForCausalLM"])[0]
    # Spelling / structural aliases (reference registry.py maps these onto
    # the same module files): normalize before family fixups.
    arch = {"PhiMoEForCausalLM": "PhimoeForCausalLM",
            "TeleChat3ForCausalLM": "LlamaForCausalLM",
            "Ministral3ForCausalLM": "MistralForCausalLM",
            "MantisForConditionalGeneration":
                "LlavaForConditionalGeneration"}.get(arch, arch)
    # Sequence-classifier variants of causal backbones: run the family
    # fixups under the base arch; the classifier arch is restored for the
    # registry (reference: as_seq_cls_model adapters).
    _clf_base = {"GPT2ForSequenceClassification": "GPT2LMHeadModel",
                 "JambaForSequenceClassification": "JambaForCausalLM"}
    _clf_arch = None
    if arch in _clf_base:
        _clf_arch, arch = arch, _clf_base[arch]
    if arch == "LongcatFlashForCausalLM":
        # Dual-sublayer layers: HF num_layers counts LOGICAL layers (each
        # holding 2 MLA sublayers); num_hidden_layers in the checkpoint
        # is the sublayer count — our model is logical-layer indexed.
        hf = dict(hf)
        hf["num_hidden_layers"] = hf.get("num_layers",
                                         hf.get("num_hidden_layers"))
        hf["intermediate_size"] = hf.get("ffn_hidden_size",
                                         hf.get("intermediate_size"))
        hf["moe_intermediate_size"] = hf.get("expert_ffn_hidden_size")
        hf["num_experts"] = hf.get("n_routed_experts", 0)
        hf["num_experts_per_tok"] = hf.get("moe_topk", 2)

    if arch == "DbrxForCausalLM":
        # DBRX nests attention/ffn settings (reference: models/dbrx.py).
        attn = hf.get("attn_config") or {}
        ffn = hf.get("ffn_config") or {}
        hf = {**hf,
              "hidden_size": hf["d_model"],
              "num_hidden_layers": hf["n_layers"],
              "num_attention_heads": hf["n_heads"],
              "num_key_value_heads": attn.get("kv_n_heads",
                                              hf["n_heads"]),
              "max_position_embeddings": hf.get("max_seq_len", 32768),
              "rope_theta": attn.get("rope_theta", 10000.0),
              "clip_qkv": attn.get("clip_qkv"),
              "num_experts": ffn.get("moe_num_experts", 0),
              "num_experts_per_tok": ffn.get("moe_top_k", 4),
              "moe_intermediate_size": ffn.get("ffn_hidden_size"),
              "tie_word_embeddings": hf.get("tie_word_embeddings", False)}
    if arch in ("GPT2LMHeadModel", "GPTBigCodeForCausalLM"):
        # GPT-2 / GPTBigCode configs use the legacy n_* keys; GPTBigCode
        # additionally runs MQA (multi_query → 1 kv head).
        hf = {**hf,
              "hidden_size": hf["n_embd"],
              "num_hidden_layers": hf["n_layer"],
              "num_attention_heads": hf["n_head"],
              "num_key_value_heads": (1 if hf.get("multi_query", False)
                                      else hf["n_head"]),
              "intermediate_size": hf.get("n_inner") or 4 * hf["n_embd"],
              "max_position_embeddings": hf.get("n_positions", 1024),
              "tie_word_embeddings": hf.get("tie_word_embeddings", True)}
    if arch in ("BertModel", "BertForMaskedLM", "RobertaModel",
                "RobertaForMaskedLM", "XLMRobertaModel", "CamembertModel",
                "NewModel", "GteModel", "GteNewModel",
                "ErnieModel", "ErnieForSequenceClassification",
                "ErnieForTokenClassification",
                "GteNewForSequenceClassification",
                "BertForSequenceClassification",
                "BertForTokenClassification",
                "RobertaForSequenceClassification",
                "XLMRobertaForSequenceClassification",
                "CamembertForSequenceClassification",
                "BertSpladeSparseEmbeddingModel", "HF_ColBERT",
                "ColBERTJinaRobertaModel", "BgeM3EmbeddingModel"):
        # Encoder-only embedding families (reference: models/bert.py,
        # roberta.py, bert_with_rope.py). RoBERTa position ids start at
        # padding_idx + 1; GTE "NewModel" replaces absolute positions
        # with rope and uses a gated MLP.
        roberta = arch in ("RobertaModel", "RobertaForMaskedLM",
                           "XLMRobertaModel", "CamembertModel",
                           "RobertaForSequenceClassification",
                           "XLMRobertaForSequenceClassification",
                           "CamembertForSequenceClassification",
                           "ColBERTJinaRobertaModel",
                           "BgeM3EmbeddingModel")
        gte = arch in ("NewModel", "GteModel", "GteNewModel",
                       "GteNewForSequenceClassification")
        hf = {**hf,
              "num_key_value_heads": hf["num_attention_heads"],
              "rms_norm_eps": hf.get("layer_norm_eps", 1e-12),
              "type_vocab_size": 0 if gte else hf.get("type_vocab_size", 2),
              "position_offset": (hf.get("pad_token_id", 1) + 1
                                  if roberta else 0),
              "encoder_rope": gte,
              "mlp_gated": gte,
              "tie_word_embeddings": False}
        if roberta:
            # The HF table is max_position_embeddings + offset rows.
            hf["max_position_embeddings"] = (
                hf["max_position_embeddings"] - hf["position_offset"])
    if arch == "NomicBertModel":
        # nomic-bert-2048 (reference bert_with_rope.py:535): GPT-2-style
        # n_* keys, rotary positions, swiglu or gelu MLP.
        hf = {**hf,
              "hidden_size": hf["n_embd"],
              "num_hidden_layers": hf["n_layer"],
              "num_attention_heads": hf["n_head"],
              "num_key_value_heads": hf["n_head"],
              "intermediate_size": hf.get("n_inner") or 4 * hf["n_embd"],
              "max_position_embeddings": hf.get("n_positions", 2048),
              "rms_norm_eps": hf.get("layer_norm_epsilon", 1e-12),
              "rope_theta": hf.get("rotary_emb_base", 1000.0),
              "encoder_rope": True,
              "position_offset": 0,
              "type_vocab_size": hf.get("type_vocab_size", 0),
              "mlp_gated": hf.get("activation_function",
                                  "swiglu") == "swiglu",
              "tie_word_embeddings": False}
        if hf.get("rotary_emb_fraction", 1.0) != 1.0:
            raise ValueError("NomicBert partial rotary "
                             "(rotary_emb_fraction != 1) is unsupported")
    if arch in ("ModernBertModel", "ModernBertForSequenceClassification",
                "ModernBertForTokenClassification",
                "ColBERTModernBertModel"):
        # ModernBERT encoder (models/modernbert.py): RoPE positions,
        # alternating global/local attention, GeGLU MLP, bias-free norms.
        hf = {**hf,
              "num_key_value_heads": hf["num_attention_heads"],
              "rms_norm_eps": hf.get("norm_eps", 1e-5),
              "encoder_rope": True,  # marks the encoder family for
                                     # type_vocab_size plumbing (none)
              "type_vocab_size": 0,
              "tie_word_embeddings": False}
    if arch == "BloomForCausalLM":
        # Bloom configs use n_layer/n_head; no intermediate_size (4×H),
        # no max positions (ALiBi).
        hf = {**hf,
              "num_hidden_layers": hf["n_layer"],
              "num_attention_heads": hf["n_head"],
              "num_key_value_heads": hf["n_head"],
              "intermediate_size": 4 * hf["hidden_size"],
              "rms_norm_eps": hf.get("layer_norm_epsilon", 1e-5),
              "max_position_embeddings": hf.get("seq_length", 8192),
              "tie_word_embeddings": hf.get("tie_word_embeddings", True)}
    if arch in ("MptForCausalLM", "MPTForCausalLM"):
        attn = hf.get("attn_config") or {}
        hf = {**hf,
              "hidden_size": hf["d_model"],
              "num_hidden_layers": hf["n_layers"],
              "num_attention_heads": hf["n_heads"],
              "num_key_value_heads": attn.get("kv_n_heads", hf["n_heads"]),
              "intermediate_size": int(
                  hf.get("expansion_ratio", 4) * hf["d_model"]),
              "clip_qkv": attn.get("clip_qkv"),
              "max_position_embeddings": hf.get("max_seq_len", 2048),
              "rms_norm_eps": hf.get("layer_norm_epsilon", 1e-5),
              "tie_word_embeddings": hf.get("tie_word_embeddings", True)}
        if not attn.get("alibi", True):
            raise ValueError("MPT without ALiBi (rope) is not supported")
    if arch == "GPTJForCausalLM":
        hf = {**hf,
              "hidden_size": hf["n_embd"],
              "num_hidden_layers": hf["n_layer"],
              "num_attention_heads": hf["n_head"],
              "num_key_value_heads": hf["n_head"],
              "intermediate_size": hf.get("n_inner") or 4 * hf["n_embd"],
              "rms_norm_eps": hf.get("layer_norm_epsilon", 1e-5),
              "max_position_embeddings": hf.get("n_positions", 2048),
              "tie_word_embeddings": hf.get("tie_word_embeddings", False)}
    if arch == "OPTForCausalLM":
        if hf.get("word_embed_proj_dim", hf["hidden_size"]) != \
                hf["hidden_size"]:
            raise ValueError("OPT word_embed_proj_dim != hidden_size "
                             "(projected-embedding variants) unsupported")
        if not hf.get("do_layer_norm_before", True):
            raise ValueError("OPT post-layernorm (350m) unsupported")
        hf = {**hf,
              "num_key_value_heads": hf["num_attention_heads"],
              "intermediate_size": hf.get("ffn_dim",
                                          4 * hf["hidden_size"]),
              "rms_norm_eps": 1e-5,
              "tie_word_embeddings": hf.get("tie_word_embeddings", True)}
    if arch in ("FalconForCausalLM", "RWForCausalLM"):
        if hf.get("alibi"):
            raise ValueError("Falcon alibi variants are not supported")
        hf = {**hf,
              "num_key_value_heads": (
                  hf.get("num_kv_heads") or hf["num_attention_heads"]
                  if hf.get("new_decoder_architecture")
                  else 1 if hf.get("multi_query", True)
                  else hf["num_attention_heads"]),
              "intermediate_size": (hf.get("ffn_hidden_size") or
                                    4 * hf["hidden_size"]),
              "tie_word_embeddings": hf.get("tie_word_embeddings", True)}
    if arch in ("LlamaBidirectionalModel",
                "LlamaBidirectionalForSequenceClassification",
                "VoyageQwen3BidirectionalEmbedModel"):
        # Bidirectional decoder embedders (reference models/config.py
        # LlamaBidirectionalConfig: is_causal=False, pooling key).
        hf = {**hf, "classifier_pooling": {"avg": "mean", "mean": "mean",
                                           "cls": "cls", "last": "last"}[
                                               hf.get("pooling", "avg")]}
    if arch in ("HF_ColBERT", "ColBERTJinaRobertaModel",
                "ColBERTModernBertModel"):
        # ColBERT projection width (reference colbert.py:115-124).
        hf = {**hf, "colbert_dim": (hf.get("colbert_dim") or
                                    hf.get("dim") or
                                    hf.get("projection_dim"))}
    if arch == "ExaoneForCausalLM":
        # EXAONE-3 (reference: models/exaone.py): llama math under
        # GPT-NeoX-style naming; config counts layers as num_layers.
        hf = {**hf,
              "num_hidden_layers": hf.get("num_layers",
                                          hf.get("num_hidden_layers")),
              "tie_word_embeddings": hf.get("tie_word_embeddings", False)}
    if arch in ("TeleChat2ForCausalLM", "TeleChatForCausalLM"):
        # TeleChat2 (reference: models/telechat2.py:42-66): llama math,
        # n_layer/n_head keys, biases only on o_proj and down_proj.
        heads = hf.get("n_head", hf.get("num_attention_heads"))
        hf = {**hf,
              "num_hidden_layers": hf.get("n_layer",
                                          hf.get("num_hidden_layers")),
              "num_attention_heads": heads,
              "num_key_value_heads": hf.get("num_key_value_heads", heads),
              "intermediate_size": (hf.get("ffn_hidden_size") or
                                    hf.get("intermediate_size")),
              "max_position_embeddings": (hf.get("seq_length") or
                                          hf.get("max_position_embeddings",
                                                 8192)),
              "tie_word_embeddings": hf.get("tie_word_embeddings", False)}
    if arch == "TeleFLMForCausalLM" and hf.get("use_mup"):
        # TeleFLM µP (reference: models/teleflm.py): embedding × input_mult,
        # logits × output_mult / mup_scale_factor (logits_scaling divides).
        hf = {**hf,
              "embedding_multiplier": hf.get("input_mult", 1.0),
              "logits_scaling": (hf.get("mup_scale_factor", 1.0) /
                                 hf.get("output_mult", 1.0))}
    if arch in ("QWenLMHeadModel", "QwenVLForConditionalGeneration",
                "QWenVLForConditionalGeneration"):
        # Qwen-1 (reference: models/qwen.py): MHA with biased fused c_attn
        # only; HF intermediate_size counts gate+up halves together.
        # Qwen-VL carries the tower under config["visual"]
        # (reference qwen_vl.py:330; image rows use image_pad_id); the
        # MM fields are materialized after the vision_cfg init below.
        if hf.get("visual") or hf.get("vision_config"):
            arch = "QWenVLForConditionalGeneration"
        hf = {**hf,
              "num_key_value_heads": hf["num_attention_heads"],
              "intermediate_size": hf["intermediate_size"] // 2,
              "rope_theta": hf.get("rotary_emb_base", 10000.0),
              "max_position_embeddings": hf.get("seq_length", 8192),
              "rms_norm_eps": hf.get("layer_norm_epsilon", 1e-6),
              "attention_bias": True,
              "tie_word_embeddings": hf.get("tie_word_embeddings", False)}
    if arch == "JAISLMHeadModel":
        # JAIS (reference: models/jais.py): GPT-2 layout (Conv1D weights,
        # LayerNorm, biases) with ALiBi or learned positions, swiglu/relu
        # MLP, and µP scales on embeddings / logits / qk dot.
        hd = hf["n_embd"] // hf["n_head"]
        emb_scale = (hf.get("embeddings_scale") or
                     hf.get("mup_embeddings_scale") or 1.0)
        out_scale = (hf.get("width_scale") or
                     (hf.get("mup_output_alpha", 1.0) *
                      hf.get("mup_width_scale", 1.0)))
        qk_by_d = hf.get("scale_qk_dot_by_d",
                         hf.get("mup_scale_qk_dot_by_d", False))
        hf = {**hf,
              "hidden_size": hf["n_embd"],
              "num_hidden_layers": hf["n_layer"],
              "num_attention_heads": hf["n_head"],
              "num_key_value_heads": hf["n_head"],
              "intermediate_size": hf.get("n_inner") or 4 * hf["n_embd"],
              "rms_norm_eps": hf.get("layer_norm_epsilon", 1e-5),
              "max_position_embeddings": hf.get("n_positions", 2048),
              "embedding_multiplier": emb_scale,
              "logits_scaling": 1.0 / out_scale,
              "tie_word_embeddings": hf.get("tie_word_embeddings", True)}
        if qk_by_d:
            hf["attention_multiplier"] = 1.0 / hd
    if arch in ("BailingMoeForCausalLM", "BailingMoeV2ForCausalLM",
                # SarvamMoE = BailingMoe with normalized expert-bias
                # names (reference sarvam.py:771).
                "SarvamMoEForCausalLM"):
        # Ling / BailingMoe (reference: models/bailing_moe.py): fused
        # query_key_value (+bias per use_qkv_bias|use_bias), optional
        # qk-norm (RMS or LayerNorm per use_rmsnorm), partial rotary via
        # rotary_dim, sigmoid-or-softmax scoring with optional grouped
        # top-k and expert bias, shared experts, first-k dense layers.
        hd = (hf.get("head_dim") or
              hf["hidden_size"] // hf["num_attention_heads"])
        hf = {**hf,
              "scoring_func": hf.get("score_function", "softmax"),
              "n_shared_experts": hf.get("num_shared_experts",
                                         hf.get("n_shared_experts", 0)),
              "shared_expert_intermediate_size": hf.get(
                  "moe_shared_expert_intermediate_size"),
              "use_qkv_bias": (hf.get("use_qkv_bias", False) or
                               hf.get("use_bias", False)),
              "qk_norm_type": ("rmsnorm" if hf.get("use_rmsnorm", True)
                               else "layernorm")}
        if hf.get("rotary_dim"):
            hf["partial_rotary_factor"] = hf["rotary_dim"] / hd
    if arch == "ExaoneMoEForCausalLM":
        # EXAONE-MoE (reference: models/exaone_moe.py): llama-style
        # attention + DeepSeek-V3-style sigmoid routing with expert bias
        # (mlp.e_score_correction_bias) and shared experts.
        hf = {**hf,
              "scoring_func": "sigmoid",
              "n_shared_experts": hf.get("num_shared_experts",
                                         hf.get("n_shared_experts", 0))}
    if arch == "Jais2ForCausalLM":
        # Jais-2 (reference: models/jais2.py): llama attention + relu²
        # non-gated MLP + LayerNorm norms + logit_scale multiplier +
        # interleaved sliding windows ([win, None] alternating pattern).
        isw = hf.get("interleaved_sliding_window")
        if isw is not None:
            pat = isw if isinstance(isw, list) else [isw]
            wins = {w for w in pat if w}
            if len(wins) > 1:
                raise ValueError(
                    "Jais2 with multiple distinct sliding windows is "
                    f"not supported: {sorted(wins)}")
            L = hf["num_hidden_layers"]
            hf = {**hf,
                  "sliding_window": (next(iter(wins)) if wins else None),
                  "layer_types": [
                      "sliding_attention" if pat[i % len(pat)]
                      else "full_attention" for i in range(L)]}
        if hf.get("logit_scale"):
            hf = {**hf, "logits_scaling": 1.0 / hf["logit_scale"]}
    if arch in ("PanguEmbeddedForCausalLM", "PanguUltraMoEForCausalLM",
                "PanguProMoEV2ForCausalLM"):
        # openPangu (reference: models/openpangu.py): llama/MLA attention
        # per config (kv_lora_rank presence), optional Afmoe-style
        # sandwich norms, sigmoid routing with expert bias on the MoE
        # variants; o_proj bias follows attention_bias|bias while qkv
        # bias can be overridden by qkv_bias (:844-849).
        ab = hf.get("attention_bias", hf.get("bias", False))
        hf = {**hf,
              "attention_bias": hf.get("qkv_bias", ab),
              "_o_proj_bias": ab,
              "n_shared_experts": hf.get("num_shared_experts",
                                         hf.get("n_shared_experts", 0))}
        if (hf.get("num_experts") or hf.get("n_routed_experts")):
            hf["scoring_func"] = hf.get("scoring_func", "sigmoid")
    if arch == "SarvamMLAForCausalLM":
        # Sarvam MLA (reference: models/sarvam.py): DeepSeek-style MLA +
        # sigmoid grouped routing, MoE from layer first_k_dense_replace
        # (default 1) at stride moe_layer_freq.
        L = hf["num_hidden_layers"]
        fk = hf.get("first_k_dense_replace", 1)
        freq = hf.get("moe_layer_freq", 1)
        hf = {**hf,
              "scoring_func": hf.get("score_function", "sigmoid"),
              "n_shared_experts": hf.get("num_shared_experts",
                                         hf.get("n_shared_experts", 1)),
              "shared_expert_intermediate_size": hf.get(
                  "moe_shared_expert_intermediate_size"),
              "mlp_only_layers": [
                  i for i in range(L)
                  if not (i >= fk and (i - fk) % freq == 0)]}
    if arch == "AfmoeForCausalLM":
        # Afmoe (reference: models/afmoe.py): gated attention output,
        # qk-norm, NoPE on full-attention layers (rope only on sliding),
        # four norms per layer, sigmoid/softmax MoE with expert bias and
        # route_scale; first num_dense_layers are dense.
        hf = {**hf,
              "scoring_func": hf.get("score_func", "softmax"),
              "norm_topk_prob": (bool(hf.get("route_norm", True))
                                 if hf.get("score_func") == "sigmoid"
                                 else False),
              "routed_scaling_factor": hf.get("route_scale", 1.0),
              "n_shared_experts": hf.get("num_shared_experts", 0),
              "use_qk_norm": True,
              "first_k_dense_replace": hf.get("num_dense_layers", 0)}
    if arch in ("Grok1ForCausalLM", "Grok1ModelForCausalLM"):
        # Grok-1 (reference: models/grok1.py:75-78 defaults): sandwich
        # norms, tanh soft caps on attention + router logits, µP-style
        # multipliers; top-2 of 8 experts without renormalization.
        cap = max(hf.get("attn_logit_softcapping", 30.0) or 0.0, 0.0)
        rcap = max(hf.get("router_logit_softcapping", 30.0) or 0.0, 0.0)
        hf = {**hf,
              "num_experts": (hf.get("num_experts") or
                              hf.get("num_local_experts", 8)),
              "num_experts_per_tok": hf.get("num_experts_per_tok", 2),
              "moe_intermediate_size": (hf.get("moe_intermediate_size") or
                                        hf.get("intermediate_size")),
              "embedding_multiplier": hf.get("embedding_multiplier_scale",
                                             78.38367176906169),
              "logits_scaling": 1.0 / hf.get("output_multiplier_scale",
                                             0.5773502691896257),
              "attn_output_multiplier": hf.get("attn_output_multiplier",
                                               0.08838834764831845),
              "attn_logit_softcapping": cap or None,
              "router_logit_softcap": rcap or None,
              "norm_topk_prob": bool(hf.get(
                  "moe_router_renormalize",
                  hf.get("moe_renormalize", False))),
              "max_position_embeddings": hf.get("max_position_embeddings",
                                                8192),
              "tie_word_embeddings": hf.get("tie_word_embeddings", True)}
    vision_cfg = None
    image_token_id = None
    mrope_section = None
    video_token_id = None
    vision_start_token_id = None
    if arch == "QWenVLForConditionalGeneration":
        vis = dict(hf.get("visual") or hf.get("vision_config") or {})
        vision_cfg = vis
        image_token_id = vis.get("image_start_id", 151857) + 2
    if arch == "Phi3VForCausalLM":
        # Phi-3-Vision (reference phi3v.py): Phi-3 text keys at top level
        # + img_processor dict; the serving placeholder id is 32044
        # (reference _IMAGE_TOKEN_ID).
        vision_cfg = dict(hf.get("img_processor") or {})
        image_token_id = hf.get("image_token_id", 32044)
    if arch in ("Qwen2VLForConditionalGeneration",
                "Qwen2_5_VLForConditionalGeneration",
                "Qwen2VLForCausalLM",
                # Tarsier2: a Qwen2-VL whose config.json is llava-shaped
                # but qwen2vl-fielded (reference: configs/tarsier2.py);
                # weights prefix the tower "vision_tower." instead of
                # "visual.".
                "Tarsier2ForConditionalGeneration",
                # OpenCUA subclasses Qwen2.5-VL with only name remaps
                # (reference opencua.py:204).
                "OpenCUAForConditionalGeneration"):
        # Qwen2-VL family: vision tower + M-RoPE sections. Newer
        # transformers nests the text fields under text_config; older
        # checkpoints keep them at top level — support both.
        vision_cfg = dict(hf.get("vision_config") or {})
        image_token_id = hf.get("image_token_id", 151655)
        video_token_id = hf.get("video_token_id", 151656)
        vision_start_token_id = hf.get("vision_start_token_id", 151652)
        text = dict(hf.get("text_config") or {})
        outer_arch = arch
        hf = {**hf, **text}
        arch = outer_arch
        rs = hf.get("rope_scaling") or {}
        if rs.get("mrope_section"):
            mrope_section = tuple(int(s) for s in rs["mrope_section"])
        # mrope reuses the default rope tables; drop the scaling dict so
        # the generic rope path doesn't see type="mrope"/"default".
        hf = {**hf, "rope_scaling": None}
    if arch in ("Qwen2_5OmniThinkerForConditionalGeneration",
                "Qwen2_5OmniForConditionalGeneration",
                "Qwen2_5OmniModel"):
        # Qwen2.5-Omni thinker (models/qwen2_5_omni.py): serving runs
        # the thinker only; talker/token2wav configs are ignored. The
        # audio tower + TMRoPE token ids ride vision_cfg.
        think = dict(hf.get("thinker_config") or hf)
        vision_cfg = dict(think.get("vision_config") or {})
        vision_cfg["audio"] = dict(think.get("audio_config") or {})
        vision_cfg["audio_token_id"] = think.get(
            "audio_token_index", think.get("audio_token_id", 151646))
        vision_cfg["audio_start_token_id"] = think.get(
            "audio_start_token_id", 151647)
        vision_cfg["position_id_per_seconds"] = think.get(
            "position_id_per_seconds", 25)
        image_token_id = think.get("image_token_index",
                                   think.get("image_token_id", 151655))
        video_token_id = think.get("video_token_index",
                                   think.get("video_token_id", 151656))
        text = dict(think.get("text_config") or {})
        vision_start_token_id = think.get(
            "vision_start_token_id",
            text.get("vision_start_token_id", 151652))
        hf = {**hf, **text}
        rs = hf.get("rope_scaling") or {}
        if rs.get("mrope_section"):
            mrope_section = tuple(int(s) for s in rs["mrope_section"])
        hf = {**hf, "rope_scaling": None,
              "attention_bias": hf.get("attention_bias", True)}
    if arch in ("Qwen3VLForConditionalGeneration",
                "Qwen3VLMoeForConditionalGeneration"):
        # Qwen3-VL: Qwen3(MoE) text layer + deepstack ViT + interleaved
        # M-RoPE (reference: qwen3_vl.py registry.py:535-538; HF
        # modeling_qwen3_vl apply_interleaved_mrope:299).
        vision_cfg = dict(hf.get("vision_config") or {})
        image_token_id = hf.get("image_token_id", 151655)
        video_token_id = hf.get("video_token_id", 151656)
        vision_start_token_id = hf.get("vision_start_token_id", 151652)
        text = dict(hf.get("text_config") or {})
        hf = {**hf, **text}
        rs = hf.get("rope_scaling") or {}
        hd = hf.get("head_dim") or (hf["hidden_size"]
                                    // hf["num_attention_heads"])
        mrope_section = tuple(
            int(s) for s in rs.get("mrope_section") or ())
        if not mrope_section:
            # HF default when checkpoints omit the dict ([24, 20, 20] at
            # head_dim 128); scale to the actual head_dim.
            base = (24, 20, 20)
            scale = (hd // 2) / sum(base)
            mrope_section = (int(base[0] * scale),
                             int(base[1] * scale), int(base[2] * scale))
            mrope_section = (hd // 2 - mrope_section[1] - mrope_section[2],
                             mrope_section[1], mrope_section[2])
        hf = {**hf, "rope_scaling": None, "mrope_interleaved": True}
    if arch in ("LlavaForConditionalGeneration",
                "LlavaNextForConditionalGeneration",
                "LlavaNextVideoForConditionalGeneration",
                "LlavaOnevisionForConditionalGeneration",
                # Tarsier: llava layout + per-row newline / per-image
                # "new" split tokens (reference: models/tarsier.py).
                "TarsierForConditionalGeneration",
                # Mistral-format Pixtral (reference: models/pixtral.py
                # PixtralForConditionalGeneration): llava-shaped config
                # (pixtral tower + mistral text), both HF and
                # mistral-native weight namings.
                "PixtralForConditionalGeneration"):
        # Nested multimodal config: flatten text_config into the main
        # fields, keep the vision tower dict (reference:
        # transformers_utils/config.py nested-config handling).
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg.setdefault("vision_feature_layer",
                              hf.get("vision_feature_layer", -2))
        for k in ("image_newline_idx", "image_new_idx"):
            if hf.get(k) is not None:
                vision_cfg.setdefault(k, hf[k])
        for k in ("spatial_pool_stride", "spatial_pool_mode"):
            if hf.get(k) is not None:
                vision_cfg.setdefault(k, hf[k])
        image_token_id = hf.get("image_token_index", hf.get("image_token_id"))
        text = dict(hf.get("text_config") or {})
        # Derive the decoder family from model_type when the nested
        # config carries no architectures (programmatic HF configs):
        # LLaVA ships Llama/Mistral/Vicuna; OneVision ships Qwen2.
        _mt_arch = {"qwen2": "Qwen2ForCausalLM",
                    "mistral": "MistralForCausalLM",
                    "llama": "LlamaForCausalLM"}
        text["architectures"] = text.get("architectures") or \
            [_mt_arch.get(text.get("model_type"), "LlamaForCausalLM")]
        if text.get("model_type") == "qwen2":
            # HF Qwen2 hardcodes qkv bias; the outer arch won't hit the
            # Qwen2 entry in the attention_bias default table below.
            text.setdefault("attention_bias", True)
        outer_arch = arch
        hf = {**hf, **text}
        arch = outer_arch
    override_arch = None
    if arch == "Step3VLForConditionalGeneration":
        # Step3-VL (reference step3_vl.py:490): Step3 vision tower +
        # conv downsamplers over the Step-3 text decoder; flatten
        # text_config and run the Step3Text fixups below.
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg["understand_projector_stride"] = hf.get(
            "understand_projector_stride", 2)
        image_token_id = hf.get("image_token_id", 128001)
        hf = {**hf, **dict(hf.get("text_config") or {})}
        override_arch, arch = arch, "Step3TextForCausalLM"
    if arch == "Step3TextForCausalLM":
        # Step-3 text (reference step3_text.py): MQA head_dim 256 with a
        # compressed two-stage query; MoE on moe_layers_enum (default all
        # but layer 0) with softmax routing + an always-on share expert.
        L = hf["num_hidden_layers"]
        enum = hf.get("moe_layers_enum")
        moe_idx = (set(int(i) for i in str(enum).strip().split(","))
                   if enum else set(range(1, L)))
        hf = {**hf,
              "num_key_value_heads": 1,
              "num_experts": hf.get("moe_num_experts", 0),
              "num_experts_per_tok": hf.get("moe_top_k", 2),
              "norm_topk_prob": bool(hf.get("norm_expert_weight", False)),
              "n_shared_experts": 1 if hf.get("share_expert_dim") else 0,
              "shared_expert_intermediate_size": hf.get("share_expert_dim"),
              "mlp_only_layers": [i for i in range(L) if i not in moe_idx],
              "max_position_embeddings": hf.get("max_position_embedding",
                                                hf.get(
                                                    "max_position_embeddings",
                                                    8192)),
              "tie_word_embeddings": hf.get("tie_word_embeddings", False)}
    if arch == "MiniMaxVL01ForConditionalGeneration":
        # MiniMax-VL-01 (reference minimax_vl_01.py:181): llava-shaped
        # composite over the lightning-attention text model — flatten
        # text_config and run the MiniMaxText01 fixups.
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg["vision_feature_layer"] = hf.get("vision_feature_layer",
                                                    -2)
        image_token_id = hf.get("image_token_index",
                                hf.get("image_token_id"))
        text = dict(hf.get("text_config") or {})
        hf = {**hf, **text}
        override_arch, arch = arch, (text.get("architectures") or
                                     ["MiniMaxText01ForCausalLM"])[0]
    _retrieval_arch = None
    if arch == "ColPaliForRetrieval":
        # ColPali (reference colpali.py; HF ColPaliConfig): PaliGemma
        # under vlm_config + a custom_text_proj of width embedding_dim.
        _retrieval_arch = arch
        hf = {**hf, **dict(hf.get("vlm_config") or {}),
              "colbert_dim": hf.get("embedding_dim", 128)}
        arch = "PaliGemmaForConditionalGeneration"
    if arch in ("ColQwen3", "OpsColQwen3Model",
                "Qwen3VLNemotronEmbedModel"):
        # ColQwen3 (reference colqwen3.py:179-197): Qwen3-VL backbone +
        # custom_text_proj; embed dim keys in priority order.
        _retrieval_arch = arch
        hf = {**hf, "colbert_dim": (hf.get("embed_dim") or
                                    hf.get("embedding_dim") or
                                    hf.get("dim") or
                                    hf.get("projection_dim") or
                                    hf.get("colbert_dim") or 128)}
        arch = "Qwen3VLForConditionalGeneration"
    if arch == "PaliGemmaForConditionalGeneration":
        # PaliGemma: SigLIP + linear projector + Gemma/Gemma2 decoder with
        # prefix-LM attention (models/paligemma.py). Flatten text_config;
        # the family switch keys on the text arch.
        vision_cfg = dict(hf.get("vision_config") or {})
        image_token_id = hf.get("image_token_index",
                                hf.get("image_token_id", 257152))
        text = dict(hf.get("text_config") or {})
        text_arch = (text.get("architectures") or [
            {"gemma": "GemmaForCausalLM",
             "gemma2": "Gemma2ForCausalLM"}.get(
                text.get("model_type", "gemma"), "GemmaForCausalLM")])[0]
        hf = {**hf, **text}
        override_arch, arch = arch, text_arch
    if arch == "Llama4ForConditionalGeneration":
        # Vision checkpoint: serve the text stack (vision tower TBD);
        # flatten text_config, keep Llama4ForCausalLM semantics.
        hf = {**hf, **dict(hf.get("text_config") or {})}
        arch = "Llama4ForCausalLM"
    if arch == "Llama4ForCausalLM":
        # Llama4 text (models/registry: llama4.py): interleaved NoPE +
        # temperature tuning, weightless L2 qk-norm on rope layers,
        # top-1 sigmoid routing with the weight on the expert INPUT,
        # dense interleave layers sized intermediate_size_mlp.
        L = hf["num_hidden_layers"]
        step = hf.get("interleave_moe_layer_step", 1)
        moe_layers = hf.get("moe_layers") or [
            i for i in range(L) if (i + 1) % step == 0]
        hf = {**hf,
              "num_experts": hf.get("num_local_experts", 16),
              "num_experts_per_tok": hf.get("num_experts_per_tok", 1),
              "moe_intermediate_size": hf.get("intermediate_size", 8192),
              "n_shared_experts": 1,
              "shared_expert_intermediate_size": hf.get(
                  "intermediate_size", 8192),
              "intermediate_size": hf.get("intermediate_size_mlp",
                                          hf.get("intermediate_size")),
              "mlp_only_layers": [i for i in range(L)
                                  if i not in set(moe_layers)],
              "no_rope_layers": hf.get("no_rope_layers") or [
                  int((i + 1) % 4 != 0) for i in range(L)],
              "use_qk_norm": hf.get("use_qk_norm", True),
              "qk_norm_type": "l2",
              "rope_interleaved": True,   # complex-pair rope (:206)
              "norm_topk_prob": False,
              "attn_temperature_tuning": hf.get("attn_temperature_tuning",
                                                True),
              "moe_apply_weight_on_input": True}
        scoring_llama4 = True
    else:
        scoring_llama4 = False
    if arch == "AriaForConditionalGeneration":
        # Aria (models/aria.py): Idefics3-style tower + learned-query
        # cross-attn projector + grouped-expert MoE Llama text.
        vision_cfg = dict(hf.get("vision_config") or {})
        if hf.get("projector_patch_to_query_dict"):
            vision_cfg["projector_patch_to_query_dict"] = \
                hf["projector_patch_to_query_dict"]
        image_token_id = hf.get("image_token_index",
                                hf.get("image_token_id", 9))
        text = dict(hf.get("text_config") or {})
        n_sh = text.get("moe_num_shared_experts", 0)
        inter = text.get("intermediate_size", 4096)
        text = {**text,
                "num_experts": text.get("moe_num_experts", 8),
                "num_experts_per_tok": text.get("moe_topk", 2),
                "moe_intermediate_size": inter,
                "n_shared_experts": n_sh,
                "shared_expert_intermediate_size": n_sh * inter,
                "architectures": ["LlamaForCausalLM"]}
        hf = {**hf, **text}
    if arch == "GraniteSpeechForConditionalGeneration":
        # GraniteSpeech (models/granite_speech.py): conformer encoder +
        # BLIP-2 Q-Former window projector; audio placeholder rides the
        # image_token_id slot.
        vision_cfg = {
            "encoder": dict(hf.get("encoder_config") or {}),
            "projector": dict(hf.get("projector_config") or {}),
            "downsample_rate": hf.get("downsample_rate", 5),
            "window_size": hf.get("window_size", 15)}
        image_token_id = hf.get("audio_token_index",
                                hf.get("audio_token_id", 49155))
        text = dict(hf.get("text_config") or {})
        text["architectures"] = text.get("architectures") or \
            ["GraniteForCausalLM"]
        hf = {**hf, **text}
    if arch in ("CLIPModel", "SiglipModel"):
        # Dual-encoder embedding models (models/clip_embed.py): text
        # fields flatten from text_config; the vision tower + projection
        # dim ride vision_cfg.
        text = dict(hf.get("text_config") or {})
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg["projection_dim"] = hf.get(
            "projection_dim", text.get("projection_dim", 512))
        hf = {**hf, **text,
              "num_key_value_heads": text.get("num_attention_heads", 8),
              "rms_norm_eps": text.get("layer_norm_eps", 1e-5),
              "tie_word_embeddings": False}
    if arch in ("Gemma3nForCausalLM", "Gemma3nForConditionalGeneration"):
        # Gemma 3n (models/gemma3n.py): MatFormer text stack — AltUp,
        # Laurel, per-layer embeddings, KV sharing, per-layer FFN
        # widths/sparsity ride a dedicated knob group; intermediate_size
        # is a LIST in the HF config (first entry feeds the generic
        # field).
        if arch == "Gemma3nForConditionalGeneration":
            # USM audio tower + modality embedders ride vision_cfg; the
            # vision tower itself is timm MobileNetV5 (audio + hard
            # vision tokens supported, image soft tokens gated).
            vision_cfg = {
                "audio": dict(hf.get("audio_config") or {}),
                "vision_embedder": dict(hf.get("vision_config") or {}),
                "audio_token_id": hf.get("audio_token_id", 262273),
                "audio_soft_tokens_per_image": hf.get(
                    "audio_soft_tokens_per_image", 188)}
            image_token_id = hf.get("image_token_id", 262145)
        if hf.get("text_config"):
            hf = {**hf, **dict(hf["text_config"])}
        inter = hf.get("intermediate_size", 4 * hf["hidden_size"])
        inter_list = (list(inter) if isinstance(inter, (list, tuple))
                      else [inter] * hf["num_hidden_layers"])
        hf = {**hf,
              "intermediate_size": inter_list[0],
              "use_qk_norm": True,
              "_gemma3n": {
                  "altup_num_inputs": hf.get("altup_num_inputs", 4),
                  "altup_active_idx": hf.get("altup_active_idx", 0),
                  "altup_correct_scale": hf.get("altup_correct_scale",
                                                True),
                  "laurel_rank": hf.get("laurel_rank", 64),
                  "hidden_size_per_layer_input": hf.get(
                      "hidden_size_per_layer_input", 256),
                  "vocab_size_per_layer_input": hf.get(
                      "vocab_size_per_layer_input", hf["vocab_size"]),
                  "num_kv_shared_layers": hf.get(
                      "num_kv_shared_layers", 0),
                  "activation_sparsity_pattern": list(
                      hf.get("activation_sparsity_pattern") or []),
                  "intermediate_size_per_layer": inter_list,
              }}
    if arch == "Phi4MultimodalForCausalLM":
        # Phi-4-multimodal (models/phi4mm.py): text fields live at the
        # TOP level (Phi-3 structure); the navit vision tower + conformer
        # audio encoder configs nest under vision_config/audio_config
        # (audio rides inside vision_cfg for the model).
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg["audio"] = dict(hf.get("audio_config") or {})
        image_token_id = vision_cfg.get("image_token_id", 200010)
    if arch == "Blip2ForConditionalGeneration":
        # BLIP-2 (models/blip2.py): EVA ViT + Q-Former (learned queries,
        # interleaved cross-attention) + language_projection + OPT text.
        # The Q-Former config rides inside vision_config for the model.
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg["qformer"] = dict(hf.get("qformer_config") or {})
        vision_cfg["num_query_tokens"] = hf.get("num_query_tokens", 32)
        image_token_id = hf.get("image_token_index",
                                hf.get("image_token_id", 50265))
        text = dict(hf.get("text_config") or {})
        text_arch = (text.get("architectures") or ["OPTForCausalLM"])[0]
        hf = {**hf, **text}
        if text_arch == "OPTForCausalLM":
            # The top-level OPT field fixup already ran (as a no-op,
            # arch was still Blip2) — apply its mappings here.
            hf = {**hf,
                  "num_key_value_heads": hf["num_attention_heads"],
                  "intermediate_size": hf.get("ffn_dim",
                                              4 * hf["hidden_size"]),
                  "rms_norm_eps": 1e-5,
                  "tie_word_embeddings": hf.get("tie_word_embeddings",
                                                True)}
        override_arch, arch = arch, text_arch
    if arch in ("Ovis2ForConditionalGeneration", "Ovis", "Ovis2"):
        # Ovis2 (models/ovis2.py): AIMv2 tower + probabilistic visual
        # tokenizer + visual embedding table; text fields from
        # text_config (Qwen2 family with qkv bias).
        vision_cfg = dict(hf.get("vision_config") or {})
        image_token_id = hf.get("image_token_id",
                                hf.get("image_token_index"))
        text = dict(hf.get("text_config") or {})
        text["architectures"] = text.get("architectures") or \
            ["Qwen2ForCausalLM"]
        if text.get("model_type", "qwen2") == "qwen2":
            text.setdefault("attention_bias", True)
        hf = {**hf, **text}
    if arch == "MolmoForCausalLM":
        # Molmo (models/molmo.py; trust-remote family): OLMo-style text
        # knobs. HF intermediate_size counts BOTH swiglu halves
        # (LanguageModelMLP halves it); vocab = embedding_size +
        # additional_vocab_size (wte.embedding ++ wte.new_embedding).
        vision_cfg = dict(hf.get("vision_config") or {})
        image_token_id = hf.get("image_token_id")
        emb = hf.get("embedding_size") or hf.get("vocab_size", 152064)
        hf = {**hf,
              "intermediate_size": hf.get("intermediate_size", 22016) // 2,
              "vocab_size": emb + hf.get("additional_vocab_size", 0),
              "attention_bias": hf.get("qkv_bias", False),
              "rms_norm_eps": hf.get("layer_norm_eps",
                                     hf.get("rms_norm_eps", 1e-6)),
              "use_qk_norm": bool(hf.get("attention_layer_norm", False)),
              "qk_norm_across_heads": bool(
                  hf.get("attention_layer_norm", False)),
              "norm_after": bool(hf.get("norm_after", False)),
              "tie_word_embeddings": hf.get("weight_tying",
                                            hf.get("tie_word_embeddings",
                                                   False))}
    if arch == "KimiVLForConditionalGeneration":
        # Kimi-VL (models/kimi_vl.py): MoonViT tower + DeepSeek MLA text.
        # Family fixups run under the nested text arch; the outer name is
        # restored for the registry.
        vision_cfg = dict(hf.get("vision_config") or {})
        image_token_id = hf.get("media_placeholder_token_id", 163605)
        text = dict(hf.get("text_config") or {})
        text_arch = (text.get("architectures") or [
            "DeepseekV3ForCausalLM"])[0]
        hf = {**hf, **text}
        override_arch, arch = arch, text_arch
    if arch in ("MiniCPMV", "MiniCPMO"):
        # MiniCPM-V (models/minicpmv.py): SigLIP tower + perceiver
        # resampler; text fields live at the TOP level (Qwen2 for
        # version >= 2.6, Llama-3 for 2.5). MiniCPM-O adds audio; its
        # image path is the same model here.
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg.setdefault("query_num", hf.get("query_num", 64))
        for k in ("image_size", "patch_size"):
            if hf.get(k):
                vision_cfg.setdefault(k, hf[k])
        image_token_id = hf.get("image_token_id",
                                hf.get("im_token_id"))
        ver = float(hf.get("version", 2.6) or 2.6)
        if ver >= 2.6:
            hf = {**hf, "attention_bias": hf.get("attention_bias", True)}
    if arch == "Emu3ForConditionalGeneration":
        # Emu3 (models/emu3.py): images/video are VQ-tokenized by the
        # PROCESSOR into discrete vocab ids; the model itself is the
        # llama-structured text stack (Emu3TextConfig).
        text = dict(hf.get("text_config") or {})
        hf = {**hf, **text}
    if arch == "UltravoxModel":
        # Ultravox (models/ultravox.py): Whisper tower + frame-stacking
        # SwiGLU projector; stack_factor and ln placement live on the
        # OUTER config.
        vision_cfg = dict(hf.get("audio_config") or {})
        vision_cfg["stack_factor"] = hf.get("stack_factor", 8)
        vision_cfg["projector_ln_mid"] = hf.get("projector_ln_mid", True)
        image_token_id = hf.get("audio_token_index",
                                hf.get("audio_token_id", 32000))
        text = dict(hf.get("text_config") or {})
        text["architectures"] = text.get("architectures") or \
            ["LlamaForCausalLM"]
        hf = {**hf, **text}
    if arch == "VoxtralForConditionalGeneration":
        # Voxtral (models/voxtral.py): Whisper tower + frame-stacking
        # GELU projector + Llama/Mistral decoder.
        vision_cfg = dict(hf.get("audio_config") or {})
        image_token_id = hf.get("audio_token_id", 24)
        text = dict(hf.get("text_config") or {})
        text["architectures"] = text.get("architectures") or \
            ["LlamaForCausalLM"]
        hf = {**hf, **text}
    if arch == "Qwen2AudioForConditionalGeneration":
        # Qwen2-Audio (models/qwen2_audio.py): Whisper tower + avg-pool +
        # linear projector; the audio placeholder rides the generic
        # image_token_id slot (one placeholder id per request).
        vision_cfg = dict(hf.get("audio_config") or {})
        image_token_id = hf.get("audio_token_index",
                                hf.get("audio_token_id", 151646))
        text = dict(hf.get("text_config") or {})
        text["architectures"] = text.get("architectures") or \
            ["Qwen2ForCausalLM"]
        text.setdefault("attention_bias", True)
        hf = {**hf, **text}
    if arch in ("Mistral3ForConditionalGeneration",
                # LightOnOCR = Mistral3 math under renamed prefixes
                # (reference lightonocr.py:134).
                "LightOnOCRForConditionalGeneration"):
        # Mistral Small 3.1 VLM (models/mistral3.py): Pixtral tower +
        # patch merger; spatial_merge_size lives on the OUTER config.
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg["model_type"] = "pixtral"
        vision_cfg["spatial_merge_size"] = hf.get("spatial_merge_size", 2)
        image_token_id = hf.get("image_token_index",
                                hf.get("image_token_id", 10))
        text = dict(hf.get("text_config") or {})
        text["architectures"] = text.get("architectures") or \
            ["MistralForCausalLM"]
        hf = {**hf, **text}
    if arch == "Cohere2VisionForConditionalGeneration":
        # Command A Vision (models/cohere2_vision.py): SigLIP2 +
        # pixel-shuffle SwiGLU projector (no adapter LN) + Cohere2.
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg["downsample_factor"] = hf.get("downsample_factor", 2)
        if hf.get("alignment_intermediate_size"):
            vision_cfg["alignment_intermediate_size"] = \
                hf["alignment_intermediate_size"]
        image_token_id = hf.get("image_token_id",
                                hf.get("image_token_index", 255036))
        text = dict(hf.get("text_config") or {})
        hf = {**hf, **text, "logit_scale": hf.get("logit_scale")}
        override_arch, arch = arch, (text.get("architectures") or
                                     ["Cohere2ForCausalLM"])[0]
    if arch == "AyaVisionForConditionalGeneration":
        # Aya Vision (models/aya_vision.py): SigLIP + pixel-shuffle SwiGLU
        # projector + Cohere/Cohere2 decoder. Projector knobs live on the
        # OUTER config — stash them into vision_config.
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg["downsample_factor"] = hf.get("downsample_factor", 2)
        vision_cfg["adapter_layer_norm_eps"] = hf.get(
            "adapter_layer_norm_eps", 1e-6)
        if hf.get("alignment_intermediate_size"):
            vision_cfg["alignment_intermediate_size"] = \
                hf["alignment_intermediate_size"]
        image_token_id = hf.get("image_token_index",
                                hf.get("image_token_id", 255036))
        text = dict(hf.get("text_config") or {})
        text_arch = (text.get("architectures") or [
            {"cohere": "CohereForCausalLM",
             "cohere2": "Cohere2ForCausalLM"}.get(
                text.get("model_type", "cohere2"),
                "Cohere2ForCausalLM")])[0]
        hf = {**hf, **text}
        # HF's AyaVisionForConditionalGeneration computes lm_head WITHOUT
        # Cohere's logit_scale (modeling_aya_vision — the vLLM reference
        # disagrees and applies it); match HF, the checkpoint authority.
        hf["logit_scale"] = None
        override_arch, arch = arch, text_arch
    if arch == "Gemma3ForConditionalGeneration":
        # Gemma3 MM: flatten text_config (Gemma3TextConfig); the vision
        # dict keeps SigLIP geometry + mm_tokens_per_image for the
        # projector's avg-pool (reference: gemma3_mm.py).
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg["mm_tokens_per_image"] = hf.get("mm_tokens_per_image",
                                                   256)
        image_token_id = hf.get("image_token_id",
                                hf.get("image_token_index", 262144))
        hf = {**hf, **dict(hf.get("text_config") or {})}
        # Family switches key on the text arch; restore the MM name after
        # ModelConfig assembly.
        override_arch, arch = arch, "Gemma3ForCausalLM"
    if arch == "WhisperForConditionalGeneration":
        # Whisper: decoder fields map onto the unified decoder knobs;
        # encoder geometry rides in the generic mm-encoder (vision_config)
        # slot (reference: models/whisper.py).
        vision_cfg = {
            "num_mel_bins": hf.get("num_mel_bins", 80),
            "encoder_layers": hf.get("encoder_layers", 4),
            "encoder_attention_heads": hf.get("encoder_attention_heads",
                                              hf.get("decoder_attention_"
                                                     "heads", 4)),
            "encoder_ffn_dim": hf.get("encoder_ffn_dim",
                                      hf.get("decoder_ffn_dim", 1536)),
            "max_source_positions": hf.get("max_source_positions", 1500),
            "decoder_start_token_id": hf.get("decoder_start_token_id",
                                             50258),
        }
        hf = {**hf,
              "hidden_size": hf["d_model"],
              "num_hidden_layers": hf["decoder_layers"],
              "num_attention_heads": hf["decoder_attention_heads"],
              "num_key_value_heads": hf["decoder_attention_heads"],
              "intermediate_size": hf["decoder_ffn_dim"],
              "max_position_embeddings": hf.get("max_target_positions",
                                                448),
              "hidden_act": "gelu_exact",
              "tie_word_embeddings": hf.get("tie_word_embeddings", True),
              "attention_bias": True}
    if arch == "Glm4vForConditionalGeneration":
        # GLM-4.1V: GLM-4 dense text layer (sandwich norms, fused gate_up,
        # qkv bias, interleaved rotary) + M-RoPE sections; EVA-style tower
        # config rides in vision_config (reference: glm4_1v.py).
        vision_cfg = dict(hf.get("vision_config") or {})
        image_token_id = hf.get("image_token_id", 151343)
        video_token_id = hf.get("video_token_id", 151344)
        vision_start_token_id = hf.get("image_start_token_id", 151339)
        text = dict(hf.get("text_config") or {})
        hf = {**hf, **text}
        rs = hf.get("rope_scaling") or {}
        if rs.get("mrope_section"):
            mrope_section = tuple(int(s) for s in rs["mrope_section"])
            # The rotary prefix must span exactly 2*sum(sections) features
            # (HF splits cos into sections*2 then interleaves); derive the
            # partial factor when config.json omits it.
            hd = hf.get("head_dim") or (hf["hidden_size"]
                                        // hf["num_attention_heads"])
            hf = {**hf, "partial_rotary_factor":
                  hf.get("partial_rotary_factor") or
                  2 * sum(mrope_section) / hd}
        hf = {**hf, "rope_scaling": None,
              "attention_bias": True}         # HF hardcodes qkv bias
        override_arch, arch = arch, "Glm4ForCausalLM"
    if arch == "Glm4vMoeForConditionalGeneration":
        # GLM-4.5V: same EVA tower; text is the Glm4Moe layer (sigmoid
        # router + shared experts, NO sandwich norms) with standard
        # (non-interleaved) partial M-RoPE (HF modeling_glm4v_moe).
        vision_cfg = dict(hf.get("vision_config") or {})
        image_token_id = hf.get("image_token_id", 151363)
        video_token_id = hf.get("video_token_id", 151364)
        vision_start_token_id = hf.get("image_start_token_id", 151339)
        text = dict(hf.get("text_config") or {})
        hf = {**hf, **text}
        rs = hf.get("rope_scaling") or {}
        if rs.get("mrope_section"):
            mrope_section = tuple(int(s) for s in rs["mrope_section"])
            hd = hf.get("head_dim") or (hf["hidden_size"]
                                        // hf["num_attention_heads"])
            hf = {**hf, "partial_rotary_factor":
                  hf.get("partial_rotary_factor") or
                  2 * sum(mrope_section) / hd}
        hf = {**hf, "rope_scaling": None}
        override_arch, arch = arch, "Glm4MoeForCausalLM"
    if arch == "FalconH1ForCausalLM":
        # FalconH1: attention + mamba2 in parallel per layer; muP
        # multipliers fold into weights at load (models/falcon_h1.py).
        hf = {**hf,
              "layer_types": ["linear_attention"] * hf["num_hidden_layers"],
              "mamba_use_gated_norm": hf.get("mamba_rms_norm", False),
              "mup_multipliers": {
                  k: hf.get(k) for k in (
                      "attention_in_multiplier",
                      "attention_out_multiplier", "key_multiplier",
                      "ssm_in_multiplier", "ssm_out_multiplier",
                      "ssm_multipliers", "mlp_multipliers")
                  if hf.get(k) is not None},
              "logits_scaling": 1.0 / hf.get("lm_head_multiplier", 1.0),
              "tie_word_embeddings": hf.get("tie_word_embeddings", False)}
    if arch == "FuyuForCausalLM":
        # Fuyu: no vision tower — a Linear patch embed feeds the
        # Persimmon decoder (reference models/fuyu.py). Flatten the
        # persimmon text_config and run the Persimmon fixups.
        vision_cfg = {"patch_size": hf.get("patch_size", 30),
                      "num_channels": hf.get("num_channels", 3)}
        image_token_id = hf.get("image_token_id", 71011)
        text = dict(hf.get("text_config") or {})
        hf = {**hf, **text}
        override_arch, arch = arch, "PersimmonForCausalLM"
    if arch in ("Idefics3ForConditionalGeneration",
                "SmolVLMForConditionalGeneration"):
        # Idefics3/SmolVLM: SigLIP-style tower + pixel-shuffle connector;
        # text is Llama (reference: idefics3.py / smolvlm.py).
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg["scale_factor"] = hf.get("scale_factor", 2)
        image_token_id = hf.get("image_token_id")
        text = dict(hf.get("text_config") or {})
        outer_arch = arch
        hf = {**hf, **text}
        arch = outer_arch
    if arch in ("InternVLForConditionalGeneration", "InternVLChatModel",
                "NVLM_D", "H2OVLChatModel", "SkyworkR1VChatModel",
                "InternS1ForConditionalGeneration",
                "InternS1ProForConditionalGeneration",
                # Eagle 2.5-VL rides the same flattening (SigLIP tower +
                # the InternVL shuffle; reference eagle2_5_vl.py:96).
                "Eagle2_5_VLForConditionalGeneration"):
        # InternVL family: flatten text_config (HF format) or llm_config
        # (original trust-remote format; also NVLM/H2OVL/SkyworkR1V,
        # reference nvlm_d.py / h2ovl.py / skyworkr1v.py); carry
        # downsample_ratio into the vision dict for pixel shuffle.
        # NVLM's mlp1 widens to llm_intermediate without biases
        # (nvlm_d.py:158-173).
        vision_cfg = dict(hf.get("vision_config") or {})
        vision_cfg["downsample_ratio"] = hf.get("downsample_ratio", 0.5)
        image_token_id = hf.get("image_token_id",
                                hf.get("image_token_index"))
        text = dict(hf.get("text_config") or hf.get("llm_config") or {})
        text_arch = (text.get("architectures") or ["Qwen2ForCausalLM"])[0]
        if arch == "NVLM_D":
            vision_cfg["projector_mid"] = text.get("intermediate_size")
        hf = {**hf, **text}
        override_arch, arch = arch, text_arch
    num_experts = _first(hf.get("num_experts") or hf.get("n_routed_experts")
                         or hf.get("num_local_experts")
                         or hf.get("moe_num_experts") or 0)
    if arch == "HunYuanDenseV1ForCausalLM":
        num_experts = 0

    # Layer-type schedule. Mamba-family configs carry it as
    # layers_block_type ("mamba"/"attention") or imply all-mamba
    # (Mamba2ForCausalLM); normalize onto our vocabulary.
    layer_types = hf.get("layer_types")
    if layer_types and arch == "GraniteMoeHybridForCausalLM":
        # GraniteMoeHybrid spells them "mamba"/"attention".
        layer_types = ["linear_attention" if t == "mamba" else
                       "full_attention" for t in layer_types]
    if not layer_types and hf.get("layers_block_type"):
        layer_types = ["linear_attention" if t == "mamba" else
                       "full_attention" for t in hf["layers_block_type"]]
    if not layer_types and hf.get("attn_layer_indices"):
        # Bamba-style: mamba everywhere except the listed indices.
        attn_idx = set(hf["attn_layer_indices"])
        layer_types = ["full_attention" if i in attn_idx else
                       "linear_attention"
                       for i in range(hf["num_hidden_layers"])]
    if arch in ("MiniMaxText01ForCausalLM", "MiniMaxM1ForCausalLM",
                "MiniMaxForCausalLM"):
        # Lightning-attention hybrid (models/minimax_text01.py). The HF
        # "minimax" config carries layer_types directly; the original
        # MiniMax-Text-01 config uses attn_type_list (0=linear, 1=full).
        if not layer_types and hf.get("attn_type_list"):
            layer_types = ["linear_attention" if t == 0 else
                           "full_attention"
                           for t in hf["attn_type_list"]]
        hd = hf.get("head_dim") or (hf["hidden_size"]
                                    // hf["num_attention_heads"])
        hf = {**hf,
              "minimax_residual_factors": (
                  hf.get("layernorm_full_attention_alpha",
                         hf.get("full_attn_alpha_factor", 1.0)),
                  hf.get("layernorm_full_attention_beta",
                         hf.get("full_attn_beta_factor", 1.0)),
                  hf.get("layernorm_linear_attention_alpha",
                         hf.get("linear_attn_alpha_factor", 1.0)),
                  hf.get("layernorm_linear_attention_beta",
                         hf.get("linear_attn_beta_factor", 1.0)),
                  hf.get("layernorm_mlp_alpha",
                         hf.get("mlp_alpha_factor", 1.0)),
                  hf.get("layernorm_mlp_beta",
                         hf.get("mlp_beta_factor", 1.0))),
              # HF modeling_minimax hardcodes the postnorm structure
              # (residual = layernorm OUTPUT on both sublayers).
              "minimax_postnorm": hf.get("postnorm", True)}
        if hf.get("rotary_dim"):
            hf = {**hf, "partial_rotary_factor": hf["rotary_dim"] / hd}
    if arch == "KimiLinearForCausalLM":
        # KDA hybrid (reference transformers_utils/configs/kimi_linear.py):
        # linear_attn_config names the KDA layers (1-BASED); others MLA.
        lac = hf.get("linear_attn_config") or {}
        kda = set(lac.get("kda_layers") or ())
        L = hf["num_hidden_layers"]
        layer_types = ["linear_attention" if (i + 1) in kda
                       else "full_attention" for i in range(L)]
        hf = {**hf,
              "linear_num_key_heads": lac.get("num_heads", 4),
              "linear_num_value_heads": lac.get("num_heads", 4),
              "linear_key_head_dim": lac.get("head_dim", 64),
              "linear_value_head_dim": lac.get("head_dim", 64),
              "linear_conv_kernel_dim": lac.get("short_conv_kernel_size",
                                                4),
              "num_experts_per_tok": hf.get("num_experts_per_token",
                                            hf.get("num_experts_per_tok",
                                                   2)),
              "num_experts": hf.get("num_experts") or 0,
              "norm_topk_prob": hf.get("moe_renormalize", True),
              "scoring_func": hf.get("moe_router_activation_func",
                                     "sigmoid"),
              "tie_word_embeddings": hf.get("tie_word_embeddings", False)}

    if arch in ("ChatGLMModel", "ChatGLMForCausalLM",
                "ChatGLMForConditionalGeneration"):
        # chatglm-format config keys (reference
        # transformers_utils/configs/chatglm.py): partial-rotary 0.5 with
        # interleaved pairing (original_rope=True), fused qkv bias.
        hf = {**hf,
              "num_hidden_layers": hf.get("num_layers",
                                          hf.get("num_hidden_layers")),
              "intermediate_size": hf.get("ffn_hidden_size"),
              "vocab_size": hf.get("padded_vocab_size",
                                   hf.get("vocab_size")),
              "num_key_value_heads": (
                  hf.get("multi_query_group_num")
                  if hf.get("multi_query_attention")
                  else hf["num_attention_heads"]),
              "rms_norm_eps": hf.get("layernorm_epsilon", 1e-5),
              "rope_theta": 10000.0 * hf.get("rope_ratio", 1.0),
              "partial_rotary_factor": 0.5,
              "rope_interleaved": hf.get("original_rope", True),
              "attention_bias": hf.get("add_qkv_bias",
                                       hf.get("add_bias_linear", False)),
              "max_position_embeddings": hf.get("seq_length", 8192),
              "tie_word_embeddings": hf.get("tie_word_embeddings", False)}

    if arch in ("MiniCPMForCausalLM", "MiniCPM3ForCausalLM"):
        # MiniCPM muP (reference models/minicpm.py:384-393,604): embeds
        # scaled by scale_emb, each sublayer output by
        # scale_depth/sqrt(L), logits divided by hidden/dim_model_base.
        import math
        L = hf["num_hidden_layers"]
        hf = {**hf,
              "embedding_multiplier": hf.get("scale_emb", 1.0),
              "residual_multiplier": hf.get("scale_depth", 1.0)
              / math.sqrt(L),
              "logits_scaling": hf["hidden_size"]
              / hf.get("dim_model_base", hf["hidden_size"]),
              "tie_word_embeddings": hf.get("tie_word_embeddings", True)}

    if arch == "NemotronHForCausalLM":
        # Single-mixer hybrid layers from hybrid_override_pattern
        # (reference transformers_utils/configs/nemotron_h.py):
        # M=mamba2, *=NoPE attention, -=ReLU^2 MLP, E=MoE.
        pat = hf.get("hybrid_override_pattern") or "M"
        type_of = {"M": "linear_attention", "*": "full_attention",
                   "-": "mlp", "E": "moe"}
        layer_types = [type_of.get(ch, "mlp") for ch in pat]
        inter = hf.get("intermediate_size")
        if isinstance(inter, list):
            inter = inter[0]
        hf = {**hf,
              "num_hidden_layers": len(pat),
              "intermediate_size": inter,
              "head_dim": hf.get("attention_head_dim") or
              hf.get("head_dim"),
              "rms_norm_eps": hf.get("layer_norm_epsilon", 1e-5),
              "mamba_n_heads": hf.get("mamba_num_heads"),
              "mamba_d_head": hf.get("mamba_head_dim", 64),
              "mamba_d_state": hf.get("ssm_state_size", 128),
              "mamba_n_groups": hf.get("n_groups",
                                       hf.get("mamba_n_groups", 1)),
              "mamba_d_conv": hf.get("conv_kernel", 4),
              "mamba_conv_bias": hf.get("use_conv_bias", True),
              "mamba_proj_bias": hf.get("use_bias", False),
              "num_experts": hf.get("n_routed_experts",
                                    hf.get("num_experts", 0)) or 0,
              "num_experts_per_tok": hf.get("num_experts_per_tok", 2),
              "n_shared_experts": None,
              "num_shared_experts": hf.get("n_shared_experts", 0) or 0,
              "shared_expert_intermediate_size": hf.get(
                  "moe_shared_expert_intermediate_size"),
              "max_position_embeddings": hf.get("max_position_embeddings",
                                                8192),
              "tie_word_embeddings": hf.get("tie_word_embeddings", False)}

    if arch == "Zamba2ForCausalLM":
        # Shared-block hybrid (HF modeling_zamba2): mamba2 backbone with
        # num_mem_blocks shared transformer blocks at the "hybrid"
        # positions; attention reads concat(hidden, embed) = 2H and its
        # head_dim defaults to 2H / heads.
        layer_types = ["hybrid" if t == "hybrid" else "linear_attention"
                       for t in (hf.get("layers_block_type") or [])]
        d_inner = int(hf.get("mamba_expand", 2) * hf["hidden_size"])
        hf = {**hf,
              "head_dim": hf.get("attention_head_dim") or
              2 * hf["hidden_size"] // hf["num_attention_heads"],
              "mamba_n_heads": hf.get("n_mamba_heads"),
              "mamba_d_head": hf.get("mamba_headdim", 64),
              "mamba_n_groups": hf.get("mamba_ngroups", 1),
              "mamba_conv_bias": True,          # Conv1d(bias=True) fixed
              "mamba_proj_bias": hf.get("add_bias_linear", False),
              "mamba_norm_group_size": d_inner //
              hf.get("mamba_ngroups", 1),
              "max_position_embeddings": hf.get("max_position_embeddings",
                                                4096),
              "tie_word_embeddings": hf.get("tie_word_embeddings", True)}

    if not layer_types and arch in ("Mamba2ForCausalLM",
                                    "MambaForCausalLM",
                                    "FalconMambaForCausalLM"):
        layer_types = ["linear_attention"] * hf["num_hidden_layers"]
    if arch in ("MambaForCausalLM", "FalconMambaForCausalLM"):
        # Mamba1 (HF modeling_mamba): d_inner carried as
        # intermediate_size; channels become "heads" of head_dim 1.
        hf = {**hf,
              "mamba_n_heads": hf.get("intermediate_size",
                                      2 * hf["hidden_size"]),
              "mamba_d_head": 1,
              "mamba_dt_rank": hf.get("time_step_rank"),
              "num_attention_heads": 1,
              "intermediate_size": hf.get("intermediate_size"),
              "tie_word_embeddings": hf.get("tie_word_embeddings", True),
              "max_position_embeddings": hf.get("max_position_embeddings",
                                                32768)}
    if arch == "JambaForCausalLM":
        # Jamba (HF modeling_jamba): attention every attn_layer_period
        # starting at attn_layer_offset; MoE every expert_layer_period
        # starting at expert_layer_offset (others dense).
        L = hf["num_hidden_layers"]
        ap, ao = hf.get("attn_layer_period", 8), hf.get("attn_layer_offset",
                                                        4)
        ep_, eo = (hf.get("expert_layer_period", 2),
                   hf.get("expert_layer_offset", 1))
        layer_types = ["full_attention" if (i % ap) == ao
                       else "linear_attention" for i in range(L)]
        n_exp = hf.get("num_experts", 0)
        hf = {**hf,
              "mamba_n_heads": hf.get("mamba_expand", 2)
              * hf["hidden_size"],
              "mamba_d_head": 1,
              "mamba_d_state": hf.get("mamba_d_state", 16),
              "mamba_d_conv": hf.get("mamba_d_conv", 4),
              "mamba_dt_rank": hf.get("mamba_dt_rank"),
              "mamba_conv_bias": hf.get("mamba_conv_bias", True),
              "mamba_proj_bias": hf.get("mamba_proj_bias", False),
              "num_experts": 0 if n_exp <= 1 else n_exp,
              "num_experts_per_tok": hf.get("num_experts_per_tok", 2),
              "decoder_sparse_step": 1,
              "mlp_only_layers": tuple(
                  i for i in range(L) if (i % ep_) != eo)
              if n_exp > 1 else (),
              "max_position_embeddings": hf.get("max_position_embeddings",
                                                262144),
              # Jamba attention is NoPE and its router does NOT
              # renormalize the top-k weights (models/jamba.py:96).
              "no_rope_layers": [0] * L,
              "norm_topk_prob": False,
              "qk_layernorm": False}
    if arch == "Lfm2MoeForCausalLM":
        # Lfm2Moe (reference lfm2_moe.py): sigmoid routing + expert bias;
        # the first num_dense_layers keep the dense w1/w3/w2 MLP.
        hf = {**hf,
              "scoring_func": "sigmoid",
              "first_k_dense_replace": hf.get("num_dense_layers", 0)}
    if arch in ("Lfm2ForCausalLM", "Lfm2MoeForCausalLM"):
        # LFM2 (HF modeling_lfm2): "conv" layers are gated short convs;
        # conv_L_cache is the kernel width.
        layer_types = ["short_conv" if t == "conv" else t
                       for t in (hf.get("layer_types") or [])] or             ["short_conv"] * hf["num_hidden_layers"]
        hf = {**hf,
              "mamba_d_conv": hf.get("conv_L_cache", 3),
              "mamba_conv_bias": hf.get("conv_bias", False),
              "use_qk_norm": True,   # per-head q/k RMSNorm before rope
              "norm_eps": hf.get("norm_eps", 1e-5)}
    keep_layer_types = bool(layer_types) and (
        "linear_attention" in layer_types or
        "short_conv" in layer_types or
        "hybrid" in layer_types or
        "mlp" in layer_types or "moe" in layer_types or
        "sliding_attention" in layer_types)

    # Per-family fixups (reference: transformers_utils config patches).
    mlp_only = list(hf.get("mlp_only_layers", ()) or ())
    first_k_dense = hf.get("first_k_dense_replace", 0) or 0
    if first_k_dense:
        mlp_only.extend(range(first_k_dense))
    scoring_fn = "softmax"
    if hf.get("scoring_func") == "sigmoid" or arch.startswith("Glm4Moe") \
            or arch.startswith("DeepseekV3"):
        scoring_fn = "sigmoid"
    if arch == "GptOssForCausalLM":
        # gpt-oss routes by top-k on raw logits then softmax over the k.
        scoring_fn = "softmax_topk"
    # MiniMax-M2 (reference: models/minimax_m2.py MiniMaxM2MoE): experts use
    # the dense intermediate_size, rotary covers rotary_dim of head_dim, and
    # q/k RMS-norm spans all heads jointly.
    moe_inter = _first(hf.get("moe_intermediate_size"))
    partial_rotary = hf.get("partial_rotary_factor", 1.0)
    if arch == "MiniMaxM2ForCausalLM":
        moe_inter = moe_inter or hf.get("intermediate_size")
        if hf.get("rotary_dim") and hf.get("head_dim"):
            partial_rotary = hf["rotary_dim"] / hf["head_dim"]
    if arch == "HunYuanMoEV1ForCausalLM":
        # Hunyuan experts and the always-on shared MLP both use the dense
        # intermediate_size (HF HunYuanMoEV1MLP).
        moe_inter = moe_inter or hf.get("intermediate_size")
    if arch == "GPTNeoXForCausalLM" and hf.get("rotary_pct"):
        partial_rotary = hf["rotary_pct"]
    if arch == "GraniteMoeHybridForCausalLM" and \
            hf.get("position_embedding_type") != "rope":
        # Granite 4.0 hybrid attention layers are NoPE
        # (modeling_granitemoehybrid applies rotary only for "rope").
        hf = {**hf, "no_rope_layers": [0] * hf["num_hidden_layers"]}
    if arch == "AriaForConditionalGeneration":
        # Aria routes top-k then softmax (AriaTextMoELayer:380).
        scoring_fn = "softmax_topk"
    if scoring_llama4:
        scoring_fn = "sigmoid_topk"
    if arch in ("GraniteMoeForCausalLM", "GraniteMoeSharedForCausalLM",
                "GraniteMoeHybridForCausalLM"):
        # GraniteMoE routes by topk-then-softmax (GraniteMoeTopKGating),
        # experts sized by the dense intermediate_size; the Shared and
        # Hybrid variants add an always-on MLP (shared_intermediate_size).
        scoring_fn = "softmax_topk"
        moe_inter = moe_inter or hf.get("intermediate_size")
    if arch == "GPTJForCausalLM" and hf.get("rotary_dim"):
        partial_rotary = hf["rotary_dim"] / (hf["hidden_size"] //
                                             hf["num_attention_heads"])
    if arch == "PersimmonForCausalLM":
        partial_rotary = hf.get("partial_rotary_factor", 0.5)
    if arch in ("Glm4ForCausalLM", "GlmForCausalLM"):
        # HF Glm4Config/GlmConfig defaults (may be omitted from
        # config.json). Glm (glm-4-0414) is Glm4 minus sandwich norms.
        partial_rotary = hf.get("partial_rotary_factor", 0.5)
    # ALiBi families: Bloom, MPT, Baichuan-13B (the 13B checkpoints are
    # distinguished from rope-based 7B by hidden size, as the reference's
    # models/baichuan.py does by position_embedding).
    use_alibi = (arch in ("BloomForCausalLM", "MptForCausalLM",
                          "MPTForCausalLM") or
                 (arch in ("BaichuanForCausalLM", "BaiChuanForCausalLM")
                  and hf.get("hidden_size") == 5120) or
                 (arch == "JAISLMHeadModel" and
                  hf.get("position_embedding_type", "alibi") == "alibi"))
    if arch == "Dots1ForCausalLM":
        scoring_fn = "sigmoid"
    if arch == "PhimoeForCausalLM":
        # PhiMoE routes by sparsemixer (modeling_phimoe.sparsemixer; eval
        # path = two rounds of eps-masked top-1 softmax).
        scoring_fn = "sparsemixer"
    # ERNIE 4.5 MoE layer schedule: MoE iff (i+1) % interval == 0 and
    # start <= i <= end (HF Ernie4_5_MoeDecoderLayer).
    if arch == "Ernie4_5_MoeForCausalLM":
        interval = hf.get("moe_layer_interval", 1)
        start = hf.get("moe_layer_start_index", 0)
        end = hf.get("moe_layer_end_index", -1)
        if end < 0:
            end = hf["num_hidden_layers"] + end
        mlp_only.extend(
            i for i in range(hf["num_hidden_layers"])
            if not ((i + 1) % interval == 0 and start <= i <= end))
    # Families off the RMSNorm+SwiGLU mainline (reference models/:
    # gpt2.py, starcoder2.py, stablelm.py, nemotron.py, olmo2.py, olmoe.py).
    norm_type = "rmsnorm"
    mlp_gated = True
    hidden_act_override = None
    learned_pos = False
    parallel_residual = None
    lm_head_bias = False
    if arch in ("GPT2LMHeadModel", "GPTBigCodeForCausalLM"):
        norm_type, mlp_gated, learned_pos = "layernorm", False, True
        hidden_act_override = "gelu_only"
    elif arch == "WhisperForConditionalGeneration":
        norm_type, mlp_gated, learned_pos = "layernorm", False, True
        hidden_act_override = "gelu_exact"
    elif arch == "GPTNeoXForCausalLM":
        norm_type, mlp_gated = "layernorm", False
        hidden_act_override = "gelu_only"
        if hf.get("use_parallel_residual", True):
            parallel_residual = "dual"   # x + attn(ln1 x) + mlp(ln2 x)
    elif arch == "PhiForCausalLM":
        norm_type, mlp_gated = "layernorm", False
        hidden_act_override = "gelu_only"
        parallel_residual = "single"     # one shared input_layernorm
        lm_head_bias = True
    elif arch == "PhimoeForCausalLM":
        # PhiMoE norms are LayerNorm (w+b), lm head optionally biased.
        norm_type = "layernorm"
        lm_head_bias = bool(hf.get("lm_head_bias", False))
    elif arch == "ApertusForCausalLM":
        # Apertus: non-gated MLP with the learnable xIELU activation
        # (per-layer alpha_p/alpha_n; HF activations.XIELUActivation).
        mlp_gated = False
        hidden_act_override = "xielu"
    elif arch in ("FalconForCausalLM", "RWForCausalLM"):
        norm_type, mlp_gated = "layernorm", False
        hidden_act_override = "gelu_only"
        if hf.get("parallel_attn", True):
            dual = (hf.get("num_ln_in_parallel_attn") == 2 or
                    (hf.get("num_ln_in_parallel_attn") is None and
                     hf.get("new_decoder_architecture")))
            parallel_residual = "dual" if dual else "single"
    elif arch == "Starcoder2ForCausalLM":
        norm_type, mlp_gated = "layernorm", False
        hidden_act_override = "gelu_only"
    elif arch in ("StableLmForCausalLM", "StableLMEpochForCausalLM"):
        # StableLMEpoch (older alias; norm_eps field, use_qkv_bias) maps
        # onto the same stablelm structure (reference registry:
        # StableLMEpochForCausalLM → stablelm).
        norm_type = "layernorm"
        if "rms_norm_eps" not in hf and "norm_eps" in hf:
            hf = {**hf, "rms_norm_eps": hf["norm_eps"]}
    elif arch == "JAISLMHeadModel":
        norm_type = "layernorm"
        if hf.get("activation_function", "swiglu") == "swiglu":
            hidden_act_override = "silu"   # gate=c_fc2, up=c_fc
        else:
            mlp_gated = False
            hidden_act_override = "relu"
        learned_pos = (hf.get("position_embedding_type",
                              "alibi") == "learned")
    elif arch == "Jais2ForCausalLM":
        norm_type, mlp_gated = "layernorm", False
        hidden_act_override = "relu2"
    elif arch == "NemotronForCausalLM":
        norm_type, mlp_gated = "layernorm1p", False
        hidden_act_override = "relu2"
    elif arch == "DbrxForCausalLM":
        norm_type = "layernorm"  # bias-free LayerNorm (loader leaves 0s)
    elif arch == "BloomForCausalLM":
        norm_type, mlp_gated = "layernorm", False
        hidden_act_override = "gelu_only"   # bloom_gelu = tanh approx
    elif arch in ("MptForCausalLM", "MPTForCausalLM"):
        norm_type, mlp_gated = "layernorm", False
        hidden_act_override = "gelu_exact"  # nn.GELU(approximate="none")
    elif arch == "OPTForCausalLM":
        norm_type, mlp_gated, learned_pos = "layernorm", False, True
        hidden_act_override = hf.get("activation_function", "relu")
        if hidden_act_override in ("gelu", "gelu_new"):
            hidden_act_override = "gelu_only"
    elif arch == "GPTJForCausalLM":
        norm_type, mlp_gated = "layernorm", False
        hidden_act_override = "gelu_only"
        parallel_residual = "single"
        lm_head_bias = True
    elif arch in ("CohereForCausalLM", "Cohere2ForCausalLM"):
        # Command-R: bias-free LayerNorm, one shared input norm feeding
        # parallel attn+MLP, gated SiLU MLP, interleaved rope, scaled
        # tied-head logits (reference: models/commandr.py).
        norm_type = "layernorm"
        parallel_residual = "single"
    elif arch == "PersimmonForCausalLM":
        norm_type, mlp_gated = "layernorm", False
        hidden_act_override = "relu2"
    elif arch in ("OlmoForCausalLM", "OrionForCausalLM"):
        # OLMo-v1: non-parametric LayerNorm (no weights in the ckpt — the
        # unit/zero init is exact); Orion: standard biased LayerNorm.
        norm_type = "layernorm"
    elif arch == "ArceeForCausalLM":
        # Arcee AFM: llama layout with a non-gated ReLU² MLP.
        mlp_gated = False
        hidden_act_override = "relu2"
    bias_all = (arch in ("GPT2LMHeadModel", "GPTBigCodeForCausalLM",
                         "PhiForCausalLM", "BloomForCausalLM",
                         "PersimmonForCausalLM", "JAISLMHeadModel",
                         # Whisper: biases everywhere except k_proj (the
                         # loader leaves that one zero).
                         "WhisperForConditionalGeneration") or
                (arch == "OPTForCausalLM" and
                 hf.get("enable_bias", True)) or
                (arch in ("MptForCausalLM", "MPTForCausalLM") and
                 not hf.get("no_bias", True)) or
                (arch == "GPTNeoXForCausalLM" and
                 hf.get("attention_bias", True)) or
                (arch in ("FalconForCausalLM", "RWForCausalLM") and
                 hf.get("bias", False)) or
                (arch == "Starcoder2ForCausalLM" and
                 hf.get("use_bias", True)) or
                # ERNIE 4.5 use_bias puts biases on qkv/o and the MLP.
                (arch.startswith("Ernie4_5") and
                 hf.get("use_bias", False)))
    n_shared = (hf.get("n_shared_experts") or
                hf.get("moe_num_shared_experts") or 0) or \
        (1 if hf.get("shared_expert_intermediate_size") else 0)
    shared_inter = hf.get("shared_expert_intermediate_size")
    if arch == "HunYuanMoEV1ForCausalLM":
        # One always-on shared MLP sized like a dense FFN.
        n_shared, shared_inter = 1, hf.get("intermediate_size")
    if arch in ("GraniteMoeSharedForCausalLM",
                "GraniteMoeHybridForCausalLM") and \
            hf.get("shared_intermediate_size"):
        n_shared, shared_inter = 1, hf["shared_intermediate_size"]
    if arch == "AriaForConditionalGeneration" and \
            hf.get("n_shared_experts"):
        n_shared = hf["n_shared_experts"]
        shared_inter = hf.get("shared_expert_intermediate_size")
    if n_shared and shared_inter is None:
        shared_inter = n_shared * (hf.get("moe_intermediate_size") or 0)

    mc = ModelConfig(
        model=model_path,
        architecture=arch,
        dtype=dtype,
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf.get("intermediate_size", 4 * hf["hidden_size"]),
        num_hidden_layers=hf["num_hidden_layers"],
        # Pure-SSM configs (Mamba2) carry no attention heads at all.
        num_attention_heads=hf.get("num_attention_heads", 1),
        num_key_value_heads=hf.get("num_key_value_heads",
                                   hf.get("num_attention_heads", 1)),
        head_dim=hf.get("head_dim") if "num_attention_heads" in hf else None,
        rms_norm_eps=(hf.get("rms_norm_eps") or
                      hf.get("layer_norm_epsilon") or
                      hf.get("layer_norm_eps") or      # StableLM
                      hf.get("norm_epsilon") or        # Starcoder2
                      hf.get("norm_eps") or            # Nemotron
                      1e-6),
        rope_theta=hf.get("rope_theta", 10000.0),
        rope_scaling=_patch_rope_scaling(hf),
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
        # Gemma/Cohere tie the LM head and HF leaves the (True) default
        # out of config.json, so the fallback is per-family.
        tie_word_embeddings=hf.get("tie_word_embeddings",
                                   arch.startswith("Gemma") or
                                   arch == "VaultGemmaForCausalLM" or
                                   arch.startswith("Cohere")),
        # Qwen-style configs gate the window behind use_sliding_window;
        # Mistral/Gemma/gpt-oss set sliding_window unconditionally.
        sliding_window=(hf.get("sliding_window")
                        if hf.get("use_sliding_window",
                                  "use_sliding_window" not in hf)
                        else None),
        num_experts=num_experts,
        num_experts_per_tok=_first(
            hf.get("num_experts_per_tok") or
            hf.get("num_experts_per_token") or
            hf.get("moe_k") or              # ERNIE 4.5
            hf.get("moe_topk") or 2),       # Hunyuan
        moe_intermediate_size=moe_inter,
        num_shared_experts=n_shared,
        shared_expert_intermediate_size=shared_inter,
        norm_topk_prob=hf.get("norm_topk_prob", True),
        decoder_sparse_step=hf.get("decoder_sparse_step", 1),
        mlp_only_layers=tuple(mlp_only),
        eos_token_id=_first(hf.get("eos_token_id", 2)),
        bos_token_id=_first(hf.get("bos_token_id", 1)),
        qk_norm=hf.get("use_qk_norm",
                       hf.get("qk_layernorm",
                              arch in ("Qwen3ForCausalLM",
                                       "ChameleonForConditionalGeneration",
                                       "Qwen3MoeForCausalLM",
                                       "Qwen3NextForCausalLM",
                                       "Qwen3VLForConditionalGeneration",
                                       "Qwen3VLMoeForConditionalGeneration",
                                       "Gemma3ForCausalLM",
                                       "MiniMaxM2ForCausalLM",
                                       "Olmo2ForCausalLM",
                                       "Olmo3ForCausalLM",
                                       "OlmoeForCausalLM",
                                       "FlexOlmoForCausalLM",
                                       "ApertusForCausalLM",
                                       "HunYuanMoEV1ForCausalLM",
                                       "HunYuanDenseV1ForCausalLM",
                                       "Dots1ForCausalLM",
                                       "Exaone4ForCausalLM"))),
        qk_norm_after_rope=arch in ("HunYuanMoEV1ForCausalLM",
                                    "HunYuanDenseV1ForCausalLM"),
        attn_temperature_tuning=bool(hf.get("attn_temperature_tuning"))
        if arch == "Llama4ForCausalLM" else False,
        attn_floor_scale=float(hf.get("floor_scale", 8192.0)),
        attn_scale=float(hf.get("attn_scale", 0.1)),
        moe_apply_weight_on_input=bool(
            hf.get("moe_apply_weight_on_input", False)),
        qk_norm_type=("layernorm" if arch in (
            "CohereForCausalLM", "Cohere2ForCausalLM",
            "PersimmonForCausalLM",
            "ChameleonForConditionalGeneration")
                      else hf.get("qk_norm_type", "rmsnorm")),
        qk_norm_bias=arch in ("PersimmonForCausalLM",
                              "ChameleonForConditionalGeneration"),
        qk_norm_per_head=arch in ("CohereForCausalLM",
                                  "Cohere2ForCausalLM",
                                  "ChameleonForConditionalGeneration"),
        clip_qkv=hf.get("clip_qkv"),
        parallel_residual=parallel_residual,
        lm_head_bias=lm_head_bias,
        qk_norm_across_heads=(arch in (
            "MiniMaxM2ForCausalLM",
            # OLMo2/OLMoE norm q over all heads jointly (HF Olmo2Attention).
            "Olmo2ForCausalLM", "Olmo3ForCausalLM", "OlmoeForCausalLM",
            "FlexOlmoForCausalLM")
            or bool(hf.get("qk_norm_across_heads"))),
        norm_type=norm_type,
        # Per-family fixups may force the gating (GTE/NomicBert encoders).
        mlp_gated=hf.get("mlp_gated", mlp_gated),
        # GPT-J biases its fc_in/fc_out but not the attention projections.
        # TeleChat2 biases only down_proj (gate/up bias nodes stay zero).
        mlp_bias=(bias_all or arch in ("GPTJForCausalLM",
                                       "TeleChat2ForCausalLM",
                                       "TeleChatForCausalLM")
                  or (arch.startswith("BailingMoe") and
                      hf.get("use_bias", False))),
        o_proj_bias=(bias_all or hf.get("_o_proj_bias", False) or
                     arch in ("TeleChat2ForCausalLM",
                              "TeleChatForCausalLM") or
                     (arch.startswith("BailingMoe") and
                      hf.get("use_bias", False)) or
                     # PhiMoE biases all four attention projections.
                     (arch == "PhimoeForCausalLM" and
                      hf.get("attention_bias", False)) or
                     (arch == "InternLMForCausalLM" and
                      hf.get("bias", True))),
        rope_interleaved=hf.get("rope_interleaved", False) or
        arch in ("GPTJForCausalLM", "CohereForCausalLM",
                 "Cohere2ForCausalLM",
                 # GLM-4 dense rotates interleaved pairs
                 # over the partial-rotary prefix (HF
                 # modeling_glm4.apply_rotary_pos_emb).
                 "Glm4ForCausalLM"),
        sandwich_output_norms=(arch in ("Glm4ForCausalLM",
                                        "Grok1ForCausalLM",
                                        "Grok1ModelForCausalLM",
                                        "AfmoeForCausalLM") or
                               (arch.startswith("Pangu") and
                                bool(hf.get("sandwich_norm"))) or
                               # HyperCLOVAX dual post-norms
                               # (reference hyperclovax.py:254-292).
                               (arch == "HyperCLOVAXForCausalLM" and
                                bool(hf.get("use_post_norm")))),
        learned_pos_embeddings=learned_pos,
        norm_after=(arch in ("Olmo2ForCausalLM", "Olmo3ForCausalLM",
                             "Exaone4ForCausalLM",
                             # FlexOlmo keeps OLMo2's output-norm layout.
                             "FlexOlmoForCausalLM")
                    or (arch == "MolmoForCausalLM"
                        and bool(hf.get("norm_after")))),
        attention_bias=(bias_all or hf.get("use_qkv_bias", False) or
                        (arch in ("InternLM2ForCausalLM",
                                  "InternLM2ForRewardModel",
                                  "InternLM2VEForCausalLM") and
                         hf.get("bias", False)) or
                        (arch == "InternLMForCausalLM" and
                         hf.get("bias", True)) or
                        (arch.startswith("Ernie4_5") and
                         hf.get("use_bias", False)) or
                        hf.get(
                            "attention_bias",
                            arch in ("Qwen2ForCausalLM",
                                     "Qwen2MoeForCausalLM",
                                     "Qwen2VLForCausalLM",
                                     "Qwen2VLForConditionalGeneration",
                                     "Qwen2_5_VLForConditionalGeneration",
                                     "Tarsier2ForConditionalGeneration",
                                     # HF Glm4/GlmConfig bias=True.
                                     "Glm4ForCausalLM",
                                     "GlmForCausalLM"))),
        # (Qwen3-VL text attention is bias-free qk-norm Qwen3 — covered by
        # the hf attention_bias=False default above.)
        router_scoring_fn=scoring_fn,
        routed_scaling_factor=hf.get("routed_scaling_factor", 1.0),
        partial_rotary_factor=partial_rotary,
        n_group=hf.get("n_group") or 1,
        topk_group=hf.get("topk_group") or 1,
        attention_type=("mla" if arch.startswith("Deepseek")
                        or arch in ("LongcatFlashForCausalLM",
                                    "MiniCPM3ForCausalLM",
                                    "KimiLinearForCausalLM",
                                    "GlmMoeDsaForCausalLM",
                                    "MistralLarge3ForCausalLM")
                        or arch == "SarvamMLAForCausalLM"
                        or (arch in ("Glm4MoeLiteForCausalLM",
                                     "PanguEmbeddedForCausalLM",
                                     "PanguUltraMoEForCausalLM",
                                     "PanguProMoEV2ForCausalLM") and
                            bool(hf.get("kv_lora_rank")))
                        else "mha"),
        mla_rope_interleaved=arch != "MiniCPM3ForCausalLM",
        zero_expert_num=hf.get("zero_expert_num", 0) or 0,
        mla_scale_q_lora=(
            (hf["hidden_size"] / hf["q_lora_rank"]) ** 0.5
            if arch == "LongcatFlashForCausalLM" and hf.get("q_lora_rank")
            else None),
        mla_scale_kv_lora=(
            (hf["hidden_size"] / hf["kv_lora_rank"]) ** 0.5
            if arch == "LongcatFlashForCausalLM" and hf.get("kv_lora_rank")
            else None),
        q_lora_rank=hf.get("q_lora_rank"),
        kv_lora_rank=hf.get("kv_lora_rank", 512),
        qk_nope_head_dim=hf.get("qk_nope_head_dim", 128),
        qk_rope_head_dim=hf.get("qk_rope_head_dim", 64),
        v_head_dim=hf.get("v_head_dim", 128),
        layer_types=tuple(layer_types) if keep_layer_types else None,
        hidden_act=(hidden_act_override if hidden_act_override
                    else "swiglu_oai" if arch == "GptOssForCausalLM"
                    else "geglu" if (hf.get("hidden_activation") or
                                     hf.get("hidden_act") or "silu") in
                    ("gelu_pytorch_tanh", "gelu_new", "gelu") else "silu"),
        attention_sinks=arch == "GptOssForCausalLM",
        moe_bias=arch == "GptOssForCausalLM",
        attn_logit_softcap=hf.get("attn_logit_softcapping"),
        final_logit_softcap=hf.get("final_logit_softcapping"),
        scale_embedding=(arch.startswith("Gemma") or
                         arch == "VaultGemmaForCausalLM" or
                         (arch == "WhisperForConditionalGeneration" and
                          hf.get("scale_embedding", False))),
        query_pre_attn_scalar=hf.get("query_pre_attn_scalar"),
        rope_local_base_freq=hf.get("rope_local_base_freq"),
        no_rope_layers=(tuple(
                            1 if t == "sliding_attention" else 0
                            for t in layer_types)
                        if (arch == "Exaone4ForCausalLM" and
                            hf.get("sliding_window") and layer_types)
                        else tuple(hf["no_rope_layers"])
                        if hf.get("no_rope_layers")
                        # Cohere2: rope only on sliding_attention layers
                        # (full-attention layers are NoPE).
                        else (tuple(1 if t == "sliding_attention" else 0
                                    for t in layer_types)
                              if arch in ("Cohere2ForCausalLM",
                                          "AfmoeForCausalLM") and
                              layer_types
                              # GPT-2/GPTBigCode/OPT: learned positions, no
                              # rope; ALiBi families: slopes replace rope.
                              else (0,) * hf["num_hidden_layers"]
                              if (use_alibi or
                                  arch in ("GPT2LMHeadModel",
                                           "GPTBigCodeForCausalLM",
                                           "OPTForCausalLM",
                                           "WhisperForConditionalGeneration"
                                           )) else None)),
        alibi=use_alibi,
        embedding_norm=arch == "BloomForCausalLM",
        embedding_multiplier=hf.get("embedding_multiplier", 1.0),
        attention_multiplier=hf.get("attention_multiplier"),
        residual_multiplier=hf.get("residual_multiplier", 1.0),
        # Cohere multiplies logits by logit_scale; logits_scaling divides
        # (Granite convention), so invert.
        logits_scaling=(1.0 / hf["logit_scale"]
                        if arch.startswith("Cohere") and
                        hf.get("logit_scale")
                        else hf.get("logits_scaling", 1.0)),
        # Mamba2/Bamba SSD mixer dims (both naming conventions).
        mamba_use_gated_norm=hf.get("mamba_use_gated_norm", True),
        mup_multipliers=hf.get("mup_multipliers"),
        mamba_num_heads=(hf.get("mamba_n_heads") or
                         (hf.get("num_heads") if "state_size" in hf else 0)
                         or 0),
        mamba_head_dim=(hf.get("mamba_d_head") or
                        (hf.get("head_dim") if "state_size" in hf else 0)
                        or 64),
        mamba_state_size=(hf.get("mamba_d_state") or
                          hf.get("state_size") or 128),
        mamba_n_groups=(hf.get("mamba_n_groups") or
                        hf.get("n_groups") or 1),
        mamba_conv_kernel=(hf.get("mamba_d_conv") or
                           hf.get("conv_kernel") or 4),
        mamba_expand=hf.get("mamba_expand") or hf.get("expand") or 2,
        mamba_conv_bias=hf.get("mamba_conv_bias",
                               hf.get("use_conv_bias", True)),
        mamba_proj_bias=hf.get("mamba_proj_bias",
                               hf.get("use_bias", False)),
        time_step_limit=(tuple(hf["time_step_limit"])
                         if hf.get("time_step_limit") else None),
        mamba_dt_rank=hf.get("mamba_dt_rank") or 0,
        mamba_norm_group_size=hf.get("mamba_norm_group_size", 0),
        num_mem_blocks=hf.get("num_mem_blocks", 0) or 0,
        adapter_rank=hf.get("adapter_rank", 8) or 8,
        use_shared_attention_adapter=hf.get(
            "use_shared_attention_adapter", False),
        use_mem_rope=hf.get("use_mem_rope", True),
        linear_num_value_heads=hf.get("linear_num_value_heads", 8),
        linear_num_key_heads=hf.get("linear_num_key_heads", 4),
        linear_key_head_dim=hf.get("linear_key_head_dim", 64),
        linear_value_head_dim=hf.get("linear_value_head_dim", 64),
        linear_conv_kernel_dim=hf.get("linear_conv_kernel_dim", 4),
        gemma3n=hf.get("_gemma3n"),
        vision_config=vision_cfg,
        image_token_id=image_token_id,
        mrope_section=mrope_section,
        mrope_interleaved=hf.get("mrope_interleaved", False),
        video_token_id=video_token_id,
        vision_start_token_id=vision_start_token_id,
        type_vocab_size=hf.get("type_vocab_size", 0)
        if "position_offset" in hf or "encoder_rope" in hf else 0,
        position_offset=hf.get("position_offset", 0),
        encoder_rope=hf.get("encoder_rope", False),
        num_labels=hf.get("num_labels", 0) or len(hf.get("id2label") or ())
        or 0,
        minimax_residual_factors=(
            tuple(hf["minimax_residual_factors"])
            if hf.get("minimax_residual_factors") else None),
        minimax_postnorm=hf.get("minimax_postnorm", False),
        global_attn_every_n_layers=hf.get("global_attn_every_n_layers", 3),
        local_attention=hf.get("local_attention", 128),
        global_rope_theta=hf.get("global_rope_theta", 160000.0),
        local_rope_theta=hf.get("local_rope_theta", 10000.0),
        classifier_pooling=hf.get("classifier_pooling", "cls"),
        colbert_dim=hf.get("colbert_dim"),
        share_q_dim=hf.get("share_q_dim"),
        router_logit_softcap=hf.get("router_logit_softcap"),
        attn_output_multiplier=hf.get("attn_output_multiplier", 1.0),
        attn_gate_proj=arch == "AfmoeForCausalLM",
        # Solar backbone skip connections; bskcn_tv[1] = inference blend.
        bskcn_1=tuple(hf["bskcn_1"]) if hf.get("bskcn_1") else None,
        bskcn_2=tuple(hf["bskcn_2"]) if hf.get("bskcn_2") else None,
        bskcn_3=tuple(hf["bskcn_3"]) if hf.get("bskcn_3") else None,
        bskcn_4=tuple(hf["bskcn_4"]) if hf.get("bskcn_4") else None,
        bskcn_tv=(hf["bskcn_tv"][1]
                  if isinstance(hf.get("bskcn_tv"), (list, tuple))
                  else hf.get("bskcn_tv", 0.2)),
    )
    if _clf_arch is not None:
        mc.architecture = _clf_arch
    if override_arch is not None:
        mc.architecture = override_arch
    if _retrieval_arch is not None:
        mc.architecture = _retrieval_arch
    from lvllm_tpu.model_loader.quant_ckpt import detect_ckpt_quant
    mc.ckpt_quant = detect_ckpt_quant(hf)
    if max_model_len is not None:
        mc.max_model_len = min(max_model_len, mc.max_position_embeddings)
    else:
        mc.max_model_len = min(mc.max_model_len, mc.max_position_embeddings)
    return mc


def _first(v):
    if isinstance(v, (list, tuple)):
        return v[0]
    return v


def _patch_rope_scaling(hf: dict) -> Optional[dict]:
    """Thread top-level original_max_position_embeddings into the scaling
    dict (Phi-3 longrope keeps it outside rope_scaling)."""
    rs = hf.get("rope_scaling")
    if rs is None:
        return None
    rs = dict(rs)
    if "original_max_position_embeddings" not in rs and \
            hf.get("original_max_position_embeddings"):
        rs["original_max_position_embeddings"] = \
            hf["original_max_position_embeddings"]
    return rs
