"""Model interface + attention metadata.

Counterpart of the reference's model contract (``forward(input_ids,
positions, …)``, ``compute_logits``, ``load_weights`` — e.g.
``models/qwen3_moe.py:675-787``), reshaped functionally for JAX: models are
stateless objects; parameters are an explicit pytree threaded through
``__call__`` so the whole step jits and shards under one pjit.
"""

from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional, Protocol, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class AttentionMetadata:
    """Device arrays describing the ragged batch (reference:
    CommonAttentionMetadata, v1/attention/backend.py:353). Registered as a
    pytree so it can cross jit boundaries."""

    query_start_loc: jax.Array  # [R+1] i32
    seq_lens: jax.Array         # [R] i32
    block_table: jax.Array      # [R, MAXB] i32
    slot_mapping: jax.Array     # [T] i32 (padded tokens → slots in block 0)
    # Hybrid (linear-attention) layers: persistent state slot per batch row
    # (index max_num_reqs = scratch); None for pure-paged models.
    row_slots: Optional[jax.Array] = None
    # Prefix-LM (PaliGemma): [R] bidirectional-prefix length per request
    # (image + prompt tokens attend each other both ways; completion stays
    # causal). Filled by the runner for models with prefix_lm = True.
    prefix_lens: Optional[jax.Array] = None
    # DCP (decode context parallel): [CP, T] per-shard local slot mapping;
    # non-None switches attention to the context-sharded write+attend+merge
    # path (ops/context_parallel.py dcp_write_and_attend).
    dcp_slot_mapping: Optional[jax.Array] = None
    # Cascade attention (shared-prefix): non-None prefix blocks switch
    # attention to the two-phase path (ops/cascade.py). All four set
    # together by the runner's detection (gpu_model_runner.py:2356 analog).
    cascade_prefix_blocks: Optional[jax.Array] = None   # [NPB] page ids
    cascade_prefix_len: Optional[jax.Array] = None      # scalar tokens
    cascade_suffix_block_table: Optional[jax.Array] = None  # [R, MAXB]
    cascade_suffix_seq_lens: Optional[jax.Array] = None     # [R]
    # Encoder-decoder (Whisper): persistent cross-attention K/V pool
    # [L, 2, P, S, H, Dh] + per-scheduled-request pool slot [R]. Written
    # once at request admit; decoder layers read their slice per layer.
    cross_kv: Optional[jax.Array] = None
    cross_slots: Optional[jax.Array] = None
    # STATIC (part of the jit cache key): the batch is one contiguous
    # request segment (long prefill) — linear-attention layers take the
    # chunk-parallel MXU path instead of the token scan (ops/gdn.py
    # gated_delta_rule_chunked).
    single_seq_prefill: bool = field(default=False,
                                     metadata=dict(static=True))
    # STATIC: PCP — this step is one long-prefill chunk whose queries are
    # sharded over the mesh "context" axis; eligible attention layers take
    # the pcp_chunked_prefill path (parallel/prefill_cp.py; reference:
    # prefill_context_parallel_size, config/parallel.py:115).
    pcp_prefill: bool = field(default=False, metadata=dict(static=True))
    # STATIC: pure decode batch — every scheduled request contributes
    # exactly one token, so recurrent-state layers (GDN/Mamba) take the
    # fully parallel batched update (ops/gdn.py *_decode) instead of the
    # T-step token scan. Set by the runner for decode steps and inside
    # the multi-step scan body.
    decode_mode: bool = field(default=False, metadata=dict(static=True))

    @property
    def num_reqs(self) -> int:
        return self.seq_lens.shape[0]


Params = Dict[str, Any]
KVCaches = List[jax.Array]  # one [2, NB, BS, Hkv, D] array per layer


class Model(Protocol):
    """Protocol every model implementation satisfies."""

    def init_params(self, rng: jax.Array) -> Params:
        """Random-init params (the 'dummy' load format for tests)."""
        ...

    def __call__(
        self,
        params: Params,
        input_ids: jax.Array,   # [T] i32
        positions: jax.Array,   # [T] i32
        kv_caches: KVCaches,
        attn_metadata: AttentionMetadata,
    ) -> Tuple[jax.Array, KVCaches]:
        """Returns (hidden [T, H], updated kv_caches)."""
        ...

    def compute_logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        """[T, H] → [T, V]."""
        ...

    def load_weights(self, weights: Iterable[Tuple[str, Any]]) -> Params:
        """Build params from (hf_name, numpy array) pairs."""
        ...
