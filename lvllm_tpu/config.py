"""Engine configuration system.

Counterpart of the reference's ``vllm/config/`` (29 dataclasses composed into
a frozen ``VllmConfig``, built by ``EngineArgs.create_engine_config``,
``engine/arg_utils.py:1594``). We keep the same decomposition scoped to the
TPU build: Model / Cache / Scheduler / Parallel / Offload / Engine.
"""

import hashlib
import json
from dataclasses import dataclass, field, asdict
from typing import Any, Dict, List, Optional, Tuple

from lvllm_tpu import envs
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


@dataclass
class ModelConfig:
    """Model architecture + dtype config.

    Populated either from a HuggingFace config.json on disk (see
    ``model_loader/hf_config.py``) or directly for tests. Field names follow
    the HF conventions used by Qwen3/Qwen3-MoE style configs.
    """

    model: str = "dummy"  # path or HF id (or "dummy" for tests)
    architecture: str = "Qwen3MoeForCausalLM"
    dtype: str = "bfloat16"
    seed: int = 0

    # Core transformer dims.
    vocab_size: int = 32000
    hidden_size: int = 1024
    intermediate_size: int = 2816
    num_hidden_layers: int = 4
    num_attention_heads: int = 8
    num_key_value_heads: int = 2
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    # Qwen3-style per-head q/k norm.
    qk_norm: bool = True
    # MiniMax-M2-style q/k norm computed over ALL heads jointly (one RMS
    # statistic per token across the flattened q / k vector; reference:
    # MiniMaxText01RMSNormTP.forward_qk). Weight shape [heads*head_dim].
    qk_norm_across_heads: bool = False
    # Hunyuan applies the per-head q/k norm AFTER rope (query_layernorm /
    # key_layernorm); Qwen3-style norms apply before.
    qk_norm_after_rope: bool = False
    # q/k norm flavor: "rmsnorm" (Qwen3) or "layernorm" (mean-centered;
    # Cohere use_qk_norm, Persimmon q/k_layernorm).
    qk_norm_type: str = "rmsnorm"
    # Persimmon's q/k LayerNorms carry biases.
    qk_norm_bias: bool = False
    # Cohere qk-norm keeps separate weights per head ([heads, head_dim]).
    qk_norm_per_head: bool = False
    # Llama4 attention deltas: L2-normalized qk (weightless) on rope
    # layers + temperature-tuned q scaling on NoPE layers
    # (modeling_llama4.Llama4TextAttention:291-344).
    attn_temperature_tuning: bool = False
    attn_floor_scale: float = 8192.0
    attn_scale: float = 0.1
    # Llama4 MoE: routing weight multiplies the expert INPUT
    # (Llama4TextMoe.forward:157), not the output.
    moe_apply_weight_on_input: bool = False
    # DBRX clip_qkv: clamp fused qkv projections to ±clip_qkv.
    clip_qkv: Optional[float] = None
    sliding_window: Optional[int] = None
    # FFN activation over the fused gate/up projection:
    # "silu" | "geglu" (Gemma) | "swiglu_oai" (gpt-oss clamped SwiGLU).
    # Non-gated MLPs (mlp_gated=False) use "gelu_only" (GPT-2/Starcoder2)
    # or "relu2" (Nemotron squared-ReLU).
    hidden_act: str = "silu"
    # Layer norm flavor: "rmsnorm" | "layernorm" (weight+bias; GPT-2,
    # Starcoder2, StableLM) | "layernorm1p" (zero-centered weight+1 with
    # bias; Nemotron).
    norm_type: str = "rmsnorm"
    # False → single up_proj + activation + down_proj (GPT-2 c_fc/c_proj,
    # Starcoder2, Nemotron).
    mlp_gated: bool = True
    # Bias terms on MLP projections (GPT-2 / Starcoder2) and on o_proj.
    mlp_bias: bool = False
    o_proj_bias: bool = False
    # GPT-2 wpe-style learned absolute position embeddings (added to the
    # token embedding; such models run with rope disabled).
    learned_pos_embeddings: bool = False
    # OLMo2-style post-norm: no pre-norm; RMSNorm is applied to each
    # sublayer's OUTPUT before the residual add (post_attention_layernorm
    # after attention, post_feedforward_layernorm after the MLP).
    norm_after: bool = False
    # GLM-4 dense sandwich: pre-norms as usual PLUS extra RMSNorms on the
    # attention output (post_self_attn_layernorm) and MLP output
    # (post_mlp_layernorm) before each residual add (HF Glm4DecoderLayer).
    sandwich_output_norms: bool = False
    # Parallel residual: x = x + attn(norm(x)) + mlp(norm'(x)).
    # "single" shares one norm (Phi, Falcon-7B); "dual" norms attention
    # and MLP inputs separately (GPT-NeoX, Falcon-40B ln_attn/ln_mlp).
    parallel_residual: Optional[str] = None
    # Phi puts a bias on the LM head.
    lm_head_bias: bool = False
    # gpt-oss attention sinks: learned per-head logit in every softmax.
    attention_sinks: bool = False
    # gpt-oss per-expert biases (gate_up_proj_bias / down_proj_bias).
    moe_bias: bool = False
    # Gemma-family knobs: tanh soft caps on attention logits (Gemma2) and
    # final LM-head logits (Gemma1/2), √H embedding scaling, explicit
    # query scale (attention scale = query_pre_attn_scalar**-0.5), and a
    # separate rope base for sliding_attention layers (Gemma3 local rope).
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    scale_embedding: bool = False
    query_pre_attn_scalar: Optional[float] = None
    rope_local_base_freq: Optional[float] = None
    # SmolLM3/Llama4-style NoPE: per-layer 1 (rope) / 0 (no rope).
    no_rope_layers: Optional[Tuple[int, ...]] = None
    # ALiBi positional bias (Bloom / MPT / Baichuan-13B): per-head slopes
    # added to attention logits as slope * (key_pos - query_pos); such
    # models run with rope disabled.
    alibi: bool = False
    # Bloom word_embeddings_layernorm: LayerNorm on the embedding output.
    embedding_norm: bool = False
    # GPT-J/Cohere-style interleaved rotary (pairs (x0,x1),(x2,x3)…
    # instead of the NeoX half-split).
    rope_interleaved: bool = False
    # Granite muP-style multipliers (all 1.0 = off).
    embedding_multiplier: float = 1.0
    attention_multiplier: Optional[float] = None  # used directly as scale
    residual_multiplier: float = 1.0
    logits_scaling: float = 1.0

    # MoE (0 experts => dense model).
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_intermediate_size: Optional[int] = None
    num_shared_experts: int = 0
    shared_expert_intermediate_size: Optional[int] = None
    norm_topk_prob: bool = True
    decoder_sparse_step: int = 1  # every Nth layer is MoE
    mlp_only_layers: Tuple[int, ...] = ()
    # Router scoring function: "softmax" | "sigmoid" (DeepSeek/GLM-style).
    router_scoring_fn: str = "softmax"
    # DeepSeek/GLM-style routed-output scaling and rotary fraction.
    routed_scaling_factor: float = 1.0
    partial_rotary_factor: float = 1.0
    # Group-limited routing (DeepSeek V3 noaux-tc): select topk_group of
    # n_group expert groups before top-k.
    n_group: int = 1
    topk_group: int = 1
    # Grok-1: tanh soft cap on router logits before scoring
    # (reference grok1.py router_logit_soft_cap, default 30.0), and the
    # o_proj output multiplier (folded into o_proj weights at load).
    router_logit_softcap: Optional[float] = None
    attn_output_multiplier: float = 1.0

    # Solar backbone skip connections (reference solar.py:317-335): layers
    # in bskcn_1/bskcn_2 snapshot the residual stream; layers in
    # bskcn_3/bskcn_4 blend it back as tv*saved + (1-tv)*current with the
    # inference-time tv = config.bskcn_tv[1].
    bskcn_1: Optional[Tuple[int, ...]] = None
    bskcn_2: Optional[Tuple[int, ...]] = None
    bskcn_3: Optional[Tuple[int, ...]] = None
    bskcn_4: Optional[Tuple[int, ...]] = None
    bskcn_tv: float = 0.2

    # ColBERT late-interaction projection width (reference colbert.py
    # get_colbert_dim_from_config: colbert_dim | dim | projection_dim).
    colbert_dim: Optional[int] = None

    # Step3 two-stage query: x → q_proj [share_q_dim] → RMS inter_norm →
    # wq [heads*head_dim] (reference step3_text.py:139-220).
    share_q_dim: Optional[int] = None

    # Hybrid layer schedule (Qwen3-Next): per-layer "full_attention" |
    # "linear_attention"; None = all full attention.
    layer_types: Optional[Tuple[str, ...]] = None
    linear_num_value_heads: int = 8
    linear_num_key_heads: int = 4
    linear_key_head_dim: int = 64
    linear_value_head_dim: int = 64
    linear_conv_kernel_dim: int = 4
    # Gated attention output (Qwen3-Next full-attention layers pack the
    # gate inside q_proj; attn_gate_proj = Afmoe-style separate gate
    # projection applied as sigma(x@gate_proj) * attn_out before o_proj).
    attn_output_gate: bool = False
    attn_gate_proj: bool = False
    # Mamba2 (SSD) mixer dims — used by layers typed "linear_attention"
    # in Mamba2/Bamba-style models (0 heads = no mamba layers).
    mamba_num_heads: int = 0
    mamba_head_dim: int = 64
    mamba_state_size: int = 128
    mamba_n_groups: int = 1
    mamba_conv_kernel: int = 4
    mamba_expand: int = 2
    mamba_conv_bias: bool = True
    mamba_proj_bias: bool = False
    # Gated output norm in the mamba2 mixer (MambaRMSNormGated). FalconH1
    # sets mamba_rms_norm=False: plain y * silu(gate), no norm.
    mamba_use_gated_norm: bool = True
    # FalconH1 muP multipliers folded into weights at load
    # (modeling_falcon_h1.compute_mup_vector + per-module multipliers).
    mup_multipliers: Optional[dict] = None
    time_step_limit: Optional[Tuple[float, float]] = None
    # Mamba1 (selective scan): dt low-rank projection width
    # (HF time_step_rank; 0 = not a mamba1 model). Layers typed
    # "linear_attention" use mamba1 when this is set and mamba2 otherwise;
    # layers typed "short_conv" are LFM2-style gated convolutions.
    mamba_dt_rank: int = 0

    # Zamba2 shared-block hybrid (models/zamba2.py): count of distinct
    # shared transformer blocks cycled over the hybrid layers; LoRA-style
    # per-use adapters on qkv / gate_up; rope in the shared attention.
    num_mem_blocks: int = 0
    adapter_rank: int = 8
    use_shared_attention_adapter: bool = False
    use_mem_rope: bool = True
    # Grouped gated RMSNorm in the mamba2 mixer (Zamba2RMSNormGated
    # group_size = intermediate // n_groups; 0 = flat).
    mamba_norm_group_size: int = 0

    # LongcatFlash: zero-compute (identity) experts appended to the
    # routed set, and the MLA q/kv LoRA output scalings
    # (modeling_longcat_flash.LongcatFlashMLA.mla_scale_*_lora).
    zero_expert_num: int = 0
    mla_scale_q_lora: Optional[float] = None
    mla_scale_kv_lora: Optional[float] = None

    # MLA (DeepSeek latent attention). attention_type "mha" | "mla".
    # DeepSeek checkpoints use the interleaved (GPT-J) rope pairing on the
    # rope sub-dims; MiniCPM3 uses plain neox pairing.
    mla_rope_interleaved: bool = True
    attention_type: str = "mha"
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128

    max_model_len: int = 4096
    # None | "int8" | "int4" | "fp8" (weight-only) | "w8a8" | "w4a8"
    # (weight + dynamic per-token int8 activation quant on the int8 MXU).
    quantization: Optional[str] = None
    # Dense-layer quantization under w8a8/w4a8 (attention qkv/o, dense
    # MLP, lm_head -> int8 per-channel; reference compressed-tensors
    # w8a8-int8 quantizes every linear). "off" keeps dense layers bf16.
    dense_quantization: Optional[str] = None
    # Per-layer MoE quantization overrides (reference: the fork's
    # MoeComputeStrategy KEEP|INT4, envs.py:233-240 + FP8→INT4 repack
    # fused_moe/layer.py:2074): "method:ranges;method:ranges" with the
    # LVLLM range syntax, e.g. "fp8:0-3;int4:4-23" keeps the first four
    # expert layers in FP8 and packs the rest to INT4 ("keep" = leave the
    # layer unquantized). Unlisted layers use `quantization`.
    moe_quant_overrides: Optional[str] = None
    # Pre-quantized checkpoint format ({method, bits, group_size}), parsed
    # from config.json's quantization_config (AWQ/GPTQ) — see
    # model_loader/quant_ckpt.py.
    ckpt_quant: Optional[dict] = None

    # Multimodal (LLaVA-family): CLIP vision tower config dict + the
    # placeholder token id spliced with image features.
    vision_config: Optional[dict] = None
    image_token_id: Optional[int] = None
    # Qwen2-VL family: M-RoPE feature sections (t/h/w) + extra vision
    # marker tokens (reference: MRotaryEmbedding, get_rope_index).
    mrope_section: Optional[Tuple[int, ...]] = None
    # Qwen3-VL frequency-interleaved M-RoPE layout (vs chunked sections).
    mrope_interleaved: bool = False
    video_token_id: Optional[int] = None
    vision_start_token_id: Optional[int] = None

    # Encoder-only embedding families (BERT/RoBERTa/GTE): token-type
    # vocabulary, RoBERTa's position-id offset (padding_idx + 1), and
    # GTE-NewModel's rope-instead-of-absolute-positions + gated MLP.
    type_vocab_size: int = 0
    position_offset: int = 0
    encoder_rope: bool = False
    # Sequence/token classification head width (cross-encoder score /
    # rerank models; 0 = no classification head).
    num_labels: int = 0
    # Gemma3n (MatFormer) knob group: altup_num_inputs/active_idx/
    # correct_scale, laurel_rank, hidden_size_per_layer_input,
    # vocab_size_per_layer_input, num_kv_shared_layers,
    # activation_sparsity_pattern, intermediate_size_per_layer.
    gemma3n: Optional[dict] = None
    # MiniMax-Text-01 residual scaling (layernorm_*_alpha/beta) and
    # postnorm variant: (full_a, full_b, linear_a, linear_b, mlp_a, mlp_b).
    minimax_residual_factors: Optional[Tuple[float, ...]] = None
    minimax_postnorm: bool = False
    # ModernBERT encoder knobs (alternating global/local attention).
    global_attn_every_n_layers: int = 3
    local_attention: int = 128
    global_rope_theta: float = 160000.0
    local_rope_theta: float = 10000.0
    classifier_pooling: str = "cls"

    # Special tokens (filled by tokenizer glue when available).
    eos_token_id: int = 2
    bos_token_id: int = 1
    pad_token_id: int = 0

    def __post_init__(self) -> None:
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads
        if self.moe_intermediate_size is None:
            self.moe_intermediate_size = self.intermediate_size
        if self.max_model_len > self.max_position_embeddings:
            self.max_model_len = self.max_position_embeddings

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    def layer_type(self, layer_idx: int) -> str:
        if self.layer_types is not None:
            return self.layer_types[layer_idx]
        return "full_attention"

    def window_for_layer(self, layer_idx: int) -> Optional[int]:
        """Per-layer sliding window (gpt-oss / Gemma alternate
        sliding_attention and full_attention layers via layer_types)."""
        if self.sliding_window is None:
            return None
        if self.layer_types is not None and \
                "sliding_attention" in self.layer_types:
            return (self.sliding_window
                    if self.layer_types[layer_idx] == "sliding_attention"
                    else None)
        return self.sliding_window

    def quant_method_for_layer(self, layer_idx: int) -> Optional[str]:
        """Effective MoE weight-quantization method for one layer
        (per-layer overrides win over the global `quantization`)."""
        if self.moe_quant_overrides:
            from lvllm_tpu import envs
            for part in self.moe_quant_overrides.split(";"):
                part = part.strip()
                if not part:
                    continue
                method, _, ranges = part.partition(":")
                method = method.strip().lower()
                if layer_idx in envs.parse_layer_ranges(ranges):
                    return None if method in ("keep", "none") else method
        return self.quantization

    def is_moe_layer(self, layer_idx: int) -> bool:
        """Whether layer `layer_idx` uses the MoE FFN (reference:
        qwen3_moe.py decoder_sparse_step / mlp_only_layers logic)."""
        if not self.is_moe:
            return False
        if layer_idx in self.mlp_only_layers:
            return False
        return (layer_idx + 1) % self.decoder_sparse_step == 0

    @property
    def num_kv_heads(self) -> int:
        return self.num_key_value_heads

    # KV-cache geometry (MLA caches one latent "head" of Dc+Dr per token).
    @property
    def kv_cache_heads(self) -> int:
        return 1 if self.attention_type == "mla" else self.num_key_value_heads

    @property
    def kv_cache_dim(self) -> int:
        if self.attention_type == "mla":
            # Pad the latent+rope width to 128 lanes so the Pallas ragged
            # attention kernel serves MLA directly (score over c_kv‖k_pe,
            # value = c_kv‖0 in plane 1).
            raw = self.kv_lora_rank + self.qk_rope_head_dim
            return -(-raw // 128) * 128
        # Lane-pad sub-128 head dims (GPT-2/Phi/Falcon/Whisper: 64/80/96)
        # so the Pallas ragged-attention kernel serves them — zero lanes
        # contribute nothing to scores or values. Costs KV bytes
        # (128/head_dim ratio) in exchange for the MXU kernel path.
        return -(-self.head_dim // 128) * 128


@dataclass
class CacheConfig:
    """Paged KV cache config (reference: vllm/config/cache.py)."""

    block_size: int = 16  # tokens per KV block/page
    num_gpu_blocks: Optional[int] = None  # None => profile-derived
    gpu_memory_utilization: float = 0.9
    enable_prefix_caching: bool = True
    kv_cache_dtype: str = "auto"  # auto | bfloat16 | fp8 | int4
    swap_space_gb: float = 0.0

    def __post_init__(self) -> None:
        if self.block_size & (self.block_size - 1):
            raise ValueError(f"block_size must be a power of 2, got {self.block_size}")


@dataclass
class SchedulerConfig:
    """Continuous-batching scheduler config (reference: config/scheduler.py).

    The reference scheduler has no prefill/decode phases — a single token
    budget per step (``sched/scheduler.py:350``); we keep that model.
    """

    max_num_batched_tokens: int = 2048
    max_num_seqs: int = 128
    max_model_len: int = 4096
    enable_chunked_prefill: bool = True
    # Overlap host scheduling with device execution: one step stays in
    # flight; decode inputs read the previous step's sampled tokens on
    # device (reference: async_scheduling / AsyncScheduler + the runner's
    # AsyncGPUModelRunnerOutput double buffering).
    async_scheduling: bool = False
    # Multi-step decode (TPU analog of capturing N steps in one CUDA
    # graph): when every scheduled request is in steady 1-token decode,
    # fold up to this many iterations into ONE jitted lax.scan — tokens
    # are sampled on device and fed back without host round-trips, and
    # the host fetches results once per horizon. Stop conditions are
    # checked post-hoc (same multi-token truncation as spec decode).
    multi_step_decode: int = 1
    long_prefill_token_threshold: int = 0  # 0 => no cap beyond budget
    # Prefix-LM models (PaliGemma): the bidirectional prefix span is only
    # correct when the whole prompt lands in one prefill chunk (keys for
    # later prefix tokens must exist when earlier ones attend). Set by
    # the engine from model.prefix_lm; a request is held until a step
    # with enough budget for its entire remaining prompt.
    atomic_prefill: bool = False
    # Multimodal encoder budget per step (reference: encoder budget in
    # Scheduler.schedule, v1/core/sched/scheduler.py:1114): caps how many
    # image-placeholder tokens' worth of encoder work may be admitted in
    # one scheduling step. 0 = unlimited.
    max_encoder_tokens_per_step: int = 0
    policy: str = "fcfs"  # fcfs | priority
    # Padded token-bucket sizes for the jitted step (replaces CUDA-graph
    # capture sizes, reference config/compilation.py cudagraph_capture_sizes).
    token_buckets: Tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024, 2048)

    def __post_init__(self) -> None:
        buckets = sorted(set(int(b) for b in self.token_buckets))
        buckets = [b for b in buckets if b <= self.max_num_batched_tokens]
        # The scheduler can always fill the whole budget — the top bucket
        # must cover it exactly.
        if not buckets or buckets[-1] < self.max_num_batched_tokens:
            buckets.append(self.max_num_batched_tokens)
        self.token_buckets = tuple(buckets)

    def pad_tokens_to_bucket(self, num_tokens: int) -> int:
        for b in self.token_buckets:
            if num_tokens <= b:
                return b
        return self.token_buckets[-1]


@dataclass
class ParallelConfig:
    """Mesh parallelism config (reference: vllm/config/parallel.py).

    TP/EP/DP/(DCP/PCP later) map to named mesh axes instead of process
    groups; XLA inserts the collectives.
    """

    tensor_parallel_size: int = 1
    expert_parallel_size: int = 1
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    # Decode context parallel (KV interleaved over TP subgroup,
    # reference config/parallel.py:308-331).
    decode_context_parallel_size: int = 1
    # Prefill context parallel (long-prefill query chunks sharded across
    # ranks, reference config/parallel.py:115 + parallel_state.py:1277).
    # Shares the mesh "context" axis with DCP (reference combined rank:
    # total_cp_rank = pcp_rank * dcp_ws + dcp_rank, config/parallel.py:330).
    prefill_context_parallel_size: int = 1
    enable_expert_parallel: bool = False
    # Sequence parallelism (reference: the compilation sequence_parallelism
    # pass, SURVEY §2.3 SP): explicitly shard the norm/residual activation
    # regions over the model axis so XLA turns the row-parallel all-reduce
    # into reduce-scatter + all-gather around them.
    enable_sequence_parallel: bool = False
    # EP dispatch backend (reference: all2all_backend,
    # config/parallel.py:172-181): "naive" = masked-local + psum
    # (replicated activations, decode regime); "alltoall" = ragged
    # all-to-all token exchange (DeepEP analog, prefill regime).
    moe_backend: str = "naive"
    # DBO / ubatching (reference: UBatchContext, v1/worker/ubatching.py +
    # docs/design/dbo.md): >1 splits each MoE batch into this many
    # independent micro-batches inside the step so XLA's latency-hiding
    # scheduler overlaps one ubatch's all-to-all with another's GEMM.
    moe_ubatches: int = 1

    @property
    def world_size(self) -> int:
        return (self.tensor_parallel_size * self.data_parallel_size *
                self.pipeline_parallel_size)


@dataclass
class OffloadConfig:
    """HBM + host-RAM expert tiering config.

    TPU-native replacement for the reference fork's CPU(NUMA)+GPU hybrid MoE
    (SURVEY.md §2.11) and upstream's PrefetchOffloader
    (``model_executor/offloader/prefetch.py:127``): cold expert weights live
    in pinned host RAM and stream into a rotating HBM buffer one layer ahead
    of compute.
    """

    enabled: bool = False
    # Layers pinned resident in HBM ("0-3,9" range syntax, reference
    # LVLLM_GPU_RESIDENT_MOE_LAYERS).
    hbm_resident_moe_layers: str = ""
    prefetch_window: int = 1
    num_hbm_buffers: int = 2  # rotating placeholder buffer sets (ref: ≤4)
    # How multi-step decode composes with streaming:
    #   "scan"   — stream every cold layer once per horizon and pass the
    #              weights as lax.scan constants (needs the whole streamed
    #              set to fit transient HBM; amortizes stream bytes over
    #              horizon x batch tokens).
    #   "staged" — per-layer streamed dispatch each step with the decode
    #              carry (tokens/positions) kept on device; one host fetch
    #              per horizon.
    #   "auto"   — scan when resident + streamed + KV fits ~90% of HBM,
    #              else staged.
    multi_step_mode: str = "auto"

    def resident_layer_set(self) -> set:
        return envs.parse_layer_ranges(self.hbm_resident_moe_layers)


@dataclass
class LoRAConfig:
    """Multi-LoRA serving config (reference: config/lora.py)."""

    enabled: bool = False
    max_loras: int = 8
    max_lora_rank: int = 16


@dataclass
class SpeculativeConfig:
    """Speculative decoding (reference: config/speculative.py; proposers in
    v1/spec_decode/). method=None disables."""

    # None | "ngram" | "draft_model" | "eagle" | "eagle3" | "medusa" |
    # "suffix" | "mtp" (checkpoint's own multi-token-prediction layer)
    method: Optional[str] = None
    # eagle3: target layer indices whose hidden states feed the head
    # (None => {1, L/2, L-2}).
    eagle_aux_layers: Optional[tuple] = None
    num_speculative_tokens: int = 4
    # Multi-candidate (tree) speculation (reference: tree_attn.py:32 +
    # SpeculativeConfig.speculative_token_tree, config/speculative.py:140):
    # verify up to this many candidate chains per step via row expansion —
    # each chain is a virtual request row sharing the prefix blocks with a
    # chain-private scratch block for its draft KV. 1 = classic single
    # chain.
    num_spec_chains: int = 1
    # Reference-style tree spec: a literal like "[(0,),(1,),(0,0)]" whose
    # tuples are root-to-node child paths. Parsed into (num chains, depth):
    # chains = leaves, depth = longest path (proposers branch at the root).
    speculative_token_tree: Optional[str] = None
    ngram_min: int = 2
    ngram_max: int = 4
    # draft_model method: checkpoint path of the small LM (or a full
    # ModelConfig for tests/dummy weights).
    draft_model: Optional[str] = None
    draft_model_config: Optional["ModelConfig"] = None

    @property
    def enabled(self) -> bool:
        return self.method is not None

    def _tree_paths(self):
        import ast
        return [tuple(p) for p in
                ast.literal_eval(self.speculative_token_tree)]

    @property
    def resolved_num_chains(self) -> int:
        """Chains to verify per step (leaves of speculative_token_tree if
        given, else num_spec_chains)."""
        if self.speculative_token_tree:
            paths = self._tree_paths()
            leaves = [p for p in paths
                      if not any(len(q) > len(p) and q[:len(p)] == p
                                 for q in paths)]
            return max(len(leaves), 1)
        return max(self.num_spec_chains, 1)

    @property
    def resolved_depth(self) -> int:
        """Draft depth per chain (longest tree path if given, else
        num_speculative_tokens)."""
        if self.speculative_token_tree:
            return max(len(p) for p in self._tree_paths())
        return self.num_speculative_tokens


@dataclass
class ObservabilityConfig:
    collect_detailed_metrics: bool = False
    log_stats_interval_s: float = 10.0
    # Per-request tracing (reference: ObservabilityConfig
    # otlp_traces_endpoint → vllm/tracing/otel.py request spans).
    # "memory" | "console" | "jsonl:<path>" | "otlp:<endpoint>" | None.
    trace_exporter: Optional[str] = None


@dataclass
class EngineConfig:
    """Frozen composite of all sub-configs (reference: config/vllm.py
    ``VllmConfig``)."""

    model_config: ModelConfig = field(default_factory=ModelConfig)
    cache_config: CacheConfig = field(default_factory=CacheConfig)
    scheduler_config: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel_config: ParallelConfig = field(default_factory=ParallelConfig)
    offload_config: OffloadConfig = field(default_factory=OffloadConfig)
    lora_config: LoRAConfig = field(default_factory=LoRAConfig)
    speculative_config: SpeculativeConfig = field(
        default_factory=SpeculativeConfig)
    observability_config: ObservabilityConfig = field(
        default_factory=ObservabilityConfig)

    def __post_init__(self) -> None:
        # Keep scheduler and model length consistent.
        self.scheduler_config.max_model_len = self.model_config.max_model_len

    def compute_hash(self) -> str:
        """Stable hash of the config, used as part of the compile-cache key
        (reference: VllmConfig.compute_hash feeding torch.compile cache)."""
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]
