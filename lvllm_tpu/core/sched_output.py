"""Scheduler output datatypes.

Counterpart of the reference's ``vllm/v1/core/sched/output.py``
(SchedulerOutput / NewRequestData / CachedRequestData) and the runner-side
``ModelRunnerOutput``.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from lvllm_tpu.sampling_params import SamplingParams


@dataclass
class NewRequestData:
    """A request entering the running set this step (prefill start)."""

    req_id: str
    prompt_token_ids: List[int]
    block_ids: List[int]
    num_computed_tokens: int
    sampling_params: SamplingParams
    lora_int_id: int = 0
    mm_data: object = None  # {"pixel_values": np [B, 3, S, S]} or None


@dataclass
class CachedRequestData:
    """A request already running (decode or continued chunked prefill)."""

    req_id: str
    new_block_ids: List[int]
    num_computed_tokens: int
    resumed_from_preemption: bool = False
    # For resumed requests the runner must re-learn all tokens/blocks.
    all_token_ids: Optional[List[int]] = None
    all_block_ids: Optional[List[int]] = None


@dataclass
class SchedulerOutput:
    scheduled_new_reqs: List[NewRequestData] = field(default_factory=list)
    scheduled_cached_reqs: List[CachedRequestData] = field(default_factory=list)
    # req_id -> number of tokens to run this step (includes spec tokens).
    num_scheduled_tokens: Dict[str, int] = field(default_factory=dict)
    total_num_scheduled_tokens: int = 0
    # req_id -> spec-decode draft token ids scheduled for verification.
    scheduled_spec_decode_tokens: Dict[str, List[int]] = field(
        default_factory=dict)
    # Multi-candidate (tree) speculation (reference: tree_attn.py:32,
    # speculative_token_tree): req_id -> ALL candidate chains (chain 0 ==
    # scheduled_spec_decode_tokens[rid]). Each chain becomes a virtual
    # request row in the runner; chains past the first write their draft
    # KV into per-chain scratch blocks.
    spec_chains: Dict[str, List[List[int]]] = field(default_factory=dict)
    # req_id -> per-extra-chain scratch block ids (len == num_chains - 1);
    # freed by update_from_output after the verify step.
    spec_scratch_blocks: Dict[str, List[List[int]]] = field(
        default_factory=dict)
    finished_req_ids: List[str] = field(default_factory=list)
    preempted_req_ids: List[str] = field(default_factory=list)
    # Async scheduling: rows scheduled with optimistic bookkeeping whose
    # sampled token is a placeholder until the step is finalized.
    async_mode: bool = False
    async_sampled_req_ids: set = field(default_factory=set)
    # KV offload loads to perform BEFORE executing this step:
    # req_id -> (host_slots, device_block_ids) (reference:
    # OffloadingConnector load plan).
    kv_loads: Dict[str, tuple] = field(default_factory=dict)
    # Multi-step decode: the runner MAY run up to this many decode
    # iterations on device for this schedule (KV blocks are pre-allocated
    # with horizon-1 lookahead); accounting uses len(sampled).
    decode_horizon: int = 1

    @property
    def num_reqs(self) -> int:
        return len(self.num_scheduled_tokens)

    def is_empty(self) -> bool:
        return self.total_num_scheduled_tokens == 0


@dataclass
class ModelRunnerOutput:
    """Per-step result handed back from the runner to the scheduler
    (reference: vllm/v1/outputs.py ModelRunnerOutput)."""

    # req_id -> newly sampled token ids (>=1; >1 with spec decode).
    sampled_token_ids: Dict[str, List[int]] = field(default_factory=dict)
    # req_id -> logprob of each sampled token (optional).
    logprobs: Optional[Dict[str, List[float]]] = None
    # req_id -> per-position {token_id: logprob} top-k dicts (optional).
    topk_logprobs: Dict[str, List[dict]] = field(default_factory=dict)
    # req_id -> draft tokens proposed for the *next* step.
    spec_token_ids: Optional[Dict[str, List[int]]] = None
    # Multi-candidate verification: req_id -> absolute canonical-KV
    # computed-token count after the step (the winning chain's drafts may
    # live in scratch blocks; their KV is recomputed as a catch-up chunk
    # next step). Also req_id -> winning chain index (bench counter).
    spec_kv_computed: Dict[str, int] = field(default_factory=dict)
    spec_winner_chain: Dict[str, int] = field(default_factory=dict)
    # req_id -> next-step candidate chains (chain 0 == spec_token_ids).
    spec_next_chains: Optional[Dict[str, List[List[int]]]] = None
