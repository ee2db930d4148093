"""Draft-model speculative decoding proposer.

Counterpart of the reference's draft-model / EAGLE-style proposers
(``vllm/v1/spec_decode/eagle.py``, ``medusa.py``; SpeculativeConfig
draft_model): a small causal LM runs ahead of the target model and
proposes ``k`` greedy tokens per step, which the target verifies in one
multi-position pass (runner ``_sample_from_hidden`` exact-match verify).

TPU-native state design: the draft keeps its own paged KV cache and a
per-request ``processed`` cursor. Each ``propose_for`` call ingests the
tokens accepted since the last call as a ragged prefill chunk (this
naturally *overwrites* the cache slots written by rejected drafts — slot
p always holds the KV of the token actually at position p), then decodes
k greedy tokens. Cache rollback is therefore free: only the cursor moves.

Token positions are bucketed to limit compile count; per-request steps
dispatch one request at a time (draft models are small — the win is
fewer *target* dispatches).
"""

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.logger import init_logger
from lvllm_tpu.models.model_base import AttentionMetadata

logger = init_logger(__name__)


def _bucket(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return b


class DraftModelProposer:

    def __init__(self, draft_config: ModelConfig, k: int,
                 num_blocks: int = 512, block_size: int = 16,
                 load_format: str = "auto"):
        from lvllm_tpu.model_loader.loader import load_model

        self.k = k
        self.block_size = block_size
        self.config = draft_config
        self.model, self.params = load_model(draft_config, load_format)
        self.kv_caches = [
            self.model.make_layer_cache(i, num_blocks, block_size,
                                        jnp.bfloat16, max_reqs=1)
            for i in range(draft_config.num_hidden_layers)
        ]
        self._free_blocks = list(range(num_blocks - 1, 0, -1))
        # rid → {"processed": int, "blocks": List[int]}
        self._reqs: Dict[str, dict] = {}
        self._max_blocks_per_req = -(-draft_config.max_model_len
                                     // block_size)

        def step(params, kv_caches, input_ids, positions, qsl, seq_lens,
                 block_table, slot_mapping, last_idx):
            md = AttentionMetadata(query_start_loc=qsl, seq_lens=seq_lens,
                                   block_table=block_table,
                                   slot_mapping=slot_mapping)
            hidden, kv_caches = self.model(params, input_ids, positions,
                                           kv_caches, md)
            logits = self.model.compute_logits(params, hidden[last_idx])
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv_caches

        self._step = jax.jit(step, donate_argnums=(1,))

    # ---- request lifecycle -------------------------------------------------

    def free(self, rid: str) -> None:
        st = self._reqs.pop(rid, None)
        if st:
            self._free_blocks.extend(reversed(st["blocks"]))

    def _state(self, rid: str) -> dict:
        if rid not in self._reqs:
            self._reqs[rid] = {"processed": 0, "blocks": []}
        return self._reqs[rid]

    def _ensure_blocks(self, st: dict, num_tokens: int) -> bool:
        need = -(-num_tokens // self.block_size)
        while len(st["blocks"]) < need:
            if not self._free_blocks:
                return False
            st["blocks"].append(self._free_blocks.pop())
        return True

    # ---- proposal ----------------------------------------------------------

    def propose_for(self, rid: str, token_ids: List[int]) -> List[int]:
        """Sync the draft KV to ``token_ids`` (the target's accepted
        prefix) and return up to k greedy draft continuations."""
        st = self._state(rid)
        L = len(token_ids)
        if L >= self.config.max_model_len - 1 or L == 0:
            return []
        # +k: room for the draft tokens' own cache slots.
        if not self._ensure_blocks(st, min(L + self.k,
                                           self.config.max_model_len)):
            return []

        drafts: List[int] = []
        # 1) ingest the accepted delta; its last logits give draft #1.
        delta = token_ids[st["processed"]:]
        pos0 = st["processed"]
        tok = self._run(st, delta, pos0)
        st["processed"] = L
        drafts.append(tok)
        # 2) decode the remaining k-1 drafts (cache slots L.. get
        # overwritten by the next call's delta — free rollback).
        for j in range(self.k - 1):
            p = L + j
            if p + 1 >= self.config.max_model_len:
                break
            tok = self._run(st, [tok], p, speculative=True)
            drafts.append(tok)
        return drafts

    def _run(self, st: dict, tokens: List[int], pos0: int,
             speculative: bool = False) -> int:
        T = len(tokens)
        B = _bucket(T)
        MAXB = self._max_blocks_per_req
        blocks = st["blocks"] + [0] * (MAXB - len(st["blocks"]))
        ids = np.zeros(B, np.int32)
        ids[:T] = tokens
        positions = np.zeros(B, np.int32)
        positions[:T] = pos0 + np.arange(T)
        # Pads target slot 0 (the reserved null block) — -1 would WRAP to
        # the last slot under jax indexing and corrupt real cache entries.
        slot_mapping = np.zeros(B, np.int32)
        for i in range(T):
            p = pos0 + i
            slot_mapping[i] = (st["blocks"][p // self.block_size]
                               * self.block_size + p % self.block_size)
        seq_len = pos0 + T
        out, self.kv_caches = self._step(
            self.params, self.kv_caches,
            jnp.asarray(ids), jnp.asarray(positions),
            jnp.asarray([0, T], jnp.int32),
            jnp.asarray([seq_len], jnp.int32),
            jnp.asarray([blocks], jnp.int32),
            jnp.asarray(slot_mapping), T - 1)
        return int(out)
