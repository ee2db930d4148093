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

    supports_sampled_drafts = True

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

        def step_sampled(params, kv_caches, input_ids, positions, qsl,
                         seq_lens, block_table, slot_mapping, last_idx,
                         temperature, top_k, top_p, min_p, seed, draw):
            """Sampling-based drafting (reference: rejection_sampler.py
            arbitrary-q verification): draw the draft token from the
            draft model's own filtered distribution and return that
            distribution q so the target can verify losslessly."""
            md = AttentionMetadata(query_start_loc=qsl, seq_lens=seq_lens,
                                   block_table=block_table,
                                   slot_mapping=slot_mapping)
            hidden, kv_caches = self.model(params, input_ids, positions,
                                           kv_caches, md)
            logits = self.model.compute_logits(params, hidden[last_idx])
            V = logits.shape[-1]
            scaled = logits.astype(jnp.float32) / jnp.maximum(temperature,
                                                              1e-6)
            lse = jax.scipy.special.logsumexp(scaled, keepdims=True)
            sort_idx = jnp.argsort(-scaled)
            sorted_logits = scaled[sort_idx]
            probs_sorted = jnp.exp(sorted_logits - lse)
            cumsum = jnp.cumsum(probs_sorted)
            rv = jnp.arange(V, dtype=jnp.int32)
            kk = jnp.where(top_k <= 0, V, top_k)
            keep_sorted = (rv < kk) & ((cumsum - probs_sorted) < top_p) & \
                (probs_sorted >= min_p * probs_sorted[0])
            keep = jnp.zeros((V,), jnp.bool_).at[sort_idx].set(keep_sorted)
            p = jnp.where(keep, jnp.exp(scaled - lse), 0.0)
            q = p / jnp.maximum(p.sum(), 1e-20)
            # Draft chain rng: per-request seed, fold 3 (disjoint from the
            # target's sample/accept/recovery streams), per-draw offset.
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(seed), 3), draw)
            g = jax.random.gumbel(key, (V,), dtype=jnp.float32)
            tok = jnp.argmax(jnp.where(keep, scaled + g, -jnp.inf))
            return tok.astype(jnp.int32), q, kv_caches

        self._step_sampled = jax.jit(step_sampled, donate_argnums=(1,))
        # rid → [k, V] f32 proposal distributions of the last proposal
        # (consumed by the runner's rejection_sample draft_q).
        self.last_q: Dict[str, np.ndarray] = {}

    # ---- request lifecycle -------------------------------------------------

    def free(self, rid: str) -> None:
        st = self._reqs.pop(rid, None)
        if st:
            self._free_blocks.extend(reversed(st["blocks"]))
        # Drop the stored proposal distribution too — each entry is a
        # [k, V] f32 (~MBs at real vocab sizes) and would otherwise leak
        # for every finished sampled-draft request.
        self.last_q.pop(rid, None)

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

    def propose_for(self, rid: str, token_ids: List[int],
                    sampling_params=None) -> List[int]:
        """Sync the draft KV to ``token_ids`` (the target's accepted
        prefix) and return up to k draft continuations — greedy by
        default; sampled from the draft's own filtered distribution (with
        q recorded in ``last_q``) when ``sampling_params`` carries a
        temperature > 0."""
        st = self._state(rid)
        L = len(token_ids)
        if L >= self.config.max_model_len - 1 or L == 0:
            return []
        # +k: room for the draft tokens' own cache slots.
        if not self._ensure_blocks(st, min(L + self.k,
                                           self.config.max_model_len)):
            return []
        sp = sampling_params
        sampled_mode = bool(sp is not None and sp.temperature > 0.0)
        if sampled_mode and sp.seed is None:
            import dataclasses
            import zlib
            sp = dataclasses.replace(
                sp, seed=zlib.crc32(rid.encode()) & 0x7FFFFFFF)
        self.last_q.pop(rid, None)
        qs: List[np.ndarray] = []

        def run(tokens, pos0, draw):
            if not sampled_mode:
                return self._run(st, tokens, pos0)
            tok, q = self._run(st, tokens, pos0, sp=sp,
                               draw=L * 131 + draw)
            qs.append(q)
            return tok

        drafts: List[int] = []
        # 1) ingest the accepted delta; its last logits give draft #1.
        delta = token_ids[st["processed"]:]
        pos0 = st["processed"]
        tok = run(delta, pos0, 0)
        st["processed"] = L
        drafts.append(tok)
        # 2) decode the remaining k-1 drafts (cache slots L.. get
        # overwritten by the next call's delta — free rollback).
        for j in range(self.k - 1):
            p = L + j
            if p + 1 >= self.config.max_model_len:
                break
            tok = run([tok], p, 1 + j)
            drafts.append(tok)
        if sampled_mode:
            self.last_q[rid] = np.stack(qs)
        return drafts

    def _run(self, st: dict, tokens: List[int], pos0: int,
             speculative: bool = False, sp=None, draw: int = 0):
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
        args = (self.params, self.kv_caches,
                jnp.asarray(ids), jnp.asarray(positions),
                jnp.asarray([0, T], jnp.int32),
                jnp.asarray([seq_len], jnp.int32),
                jnp.asarray([blocks], jnp.int32),
                jnp.asarray(slot_mapping), T - 1)
        if sp is not None:
            out, q, self.kv_caches = self._step_sampled(
                *args,
                jnp.asarray(sp.temperature, jnp.float32),
                jnp.asarray(sp.top_k or 0, jnp.int32),
                jnp.asarray(sp.top_p, jnp.float32),
                jnp.asarray(sp.min_p, jnp.float32),
                jnp.asarray(sp.seed, jnp.uint32),
                jnp.asarray(draw, jnp.int32))
            return int(out), np.asarray(q, np.float32)
        out, self.kv_caches = self._step(*args)
        return int(out)
