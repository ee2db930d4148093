"""Persistent input batch: host-side per-slot request state.

Counterpart of the reference's ``vllm/v1/worker/gpu_input_batch.py``
(InputBatch, 1085 LoC) + ``block_table.py``: numpy arrays holding every
active request's tokens, block table and sampling params, diffed in place
each step so per-step input prep is O(changes), not O(batch).
"""

from typing import Dict, List, Optional

import numpy as np

from lvllm_tpu.sampling_params import SamplingParams


class InputBatch:

    def __init__(
        self,
        max_num_reqs: int,
        max_model_len: int,
        max_blocks_per_req: int,
        vocab_size: int,
    ) -> None:
        self.max_num_reqs = max_num_reqs
        self.max_model_len = max_model_len
        self.max_blocks_per_req = max_blocks_per_req
        self.vocab_size = vocab_size

        self.req_ids: List[Optional[str]] = [None] * max_num_reqs
        self.req_id_to_index: Dict[str, int] = {}

        self.token_ids = np.zeros((max_num_reqs, max_model_len),
                                  dtype=np.int32)
        self.num_tokens = np.zeros(max_num_reqs, dtype=np.int32)
        self.num_prompt_tokens = np.zeros(max_num_reqs, dtype=np.int32)
        self.num_computed_tokens = np.zeros(max_num_reqs, dtype=np.int32)
        self.block_table = np.zeros((max_num_reqs, max_blocks_per_req),
                                    dtype=np.int32)
        self.num_blocks = np.zeros(max_num_reqs, dtype=np.int32)

        # Sampling state per slot.
        self.temperature = np.zeros(max_num_reqs, dtype=np.float32)
        self.top_k = np.zeros(max_num_reqs, dtype=np.int32)
        self.top_p = np.ones(max_num_reqs, dtype=np.float32)
        self.min_p = np.zeros(max_num_reqs, dtype=np.float32)
        self.seeds = np.zeros(max_num_reqs, dtype=np.uint32)
        self.wants_logprobs = np.zeros(max_num_reqs, dtype=bool)
        self.num_logprobs = np.zeros(max_num_reqs, dtype=np.int32)
        self.repetition_penalty = np.ones(max_num_reqs, dtype=np.float32)
        self.presence_penalty = np.zeros(max_num_reqs, dtype=np.float32)
        self.frequency_penalty = np.zeros(max_num_reqs, dtype=np.float32)
        self.has_penalty = np.zeros(max_num_reqs, dtype=bool)
        self.lora_slot = np.zeros(max_num_reqs, dtype=np.int32)

        self._rng = np.random.default_rng(0)

    @property
    def num_reqs(self) -> int:
        return len(self.req_id_to_index)

    # ---- mutation ---------------------------------------------------------

    def add_request(
        self,
        req_id: str,
        prompt_token_ids: List[int],
        all_token_ids: List[int],
        block_ids: List[int],
        num_computed_tokens: int,
        sampling_params: SamplingParams,
        lora_slot: int = 0,
    ) -> int:
        idx = self._find_free_slot()
        self.req_ids[idx] = req_id
        self.req_id_to_index[req_id] = idx
        n = len(all_token_ids)
        assert n <= self.max_model_len
        self.token_ids[idx, :n] = all_token_ids
        self.num_tokens[idx] = n
        self.num_prompt_tokens[idx] = len(prompt_token_ids)
        self.num_computed_tokens[idx] = num_computed_tokens
        nb = len(block_ids)
        self.block_table[idx, :nb] = block_ids
        self.block_table[idx, nb:] = 0
        self.num_blocks[idx] = nb

        sp = sampling_params
        self.temperature[idx] = sp.temperature
        self.top_k[idx] = sp.top_k
        self.top_p[idx] = sp.top_p
        self.min_p[idx] = sp.min_p
        self.seeds[idx] = (sp.seed if sp.seed is not None
                           else int(self._rng.integers(0, 2**32))) & 0xFFFFFFFF
        self.wants_logprobs[idx] = sp.logprobs is not None
        self.num_logprobs[idx] = min(sp.logprobs or 0, 8)
        self.repetition_penalty[idx] = sp.repetition_penalty
        self.presence_penalty[idx] = sp.presence_penalty
        self.frequency_penalty[idx] = sp.frequency_penalty
        self.has_penalty[idx] = (sp.repetition_penalty != 1.0
                                 or sp.presence_penalty != 0.0
                                 or sp.frequency_penalty != 0.0)
        self.lora_slot[idx] = lora_slot
        return idx

    def _find_free_slot(self) -> int:
        for i in range(self.max_num_reqs):
            if self.req_ids[i] is None:
                return i
        raise RuntimeError("InputBatch full")

    def remove_request(self, req_id: str) -> None:
        idx = self.req_id_to_index.pop(req_id, None)
        if idx is None:
            return
        self.req_ids[idx] = None
        self.num_tokens[idx] = 0
        self.num_computed_tokens[idx] = 0
        self.num_blocks[idx] = 0
        self.temperature[idx] = 0.0
        self.num_logprobs[idx] = 0
        self.has_penalty[idx] = False
        self.lora_slot[idx] = 0
        self.repetition_penalty[idx] = 1.0
        self.presence_penalty[idx] = 0.0
        self.frequency_penalty[idx] = 0.0

    def append_block_ids(self, req_id: str, new_block_ids: List[int]) -> None:
        idx = self.req_id_to_index[req_id]
        nb = self.num_blocks[idx]
        self.block_table[idx, nb:nb + len(new_block_ids)] = new_block_ids
        self.num_blocks[idx] = nb + len(new_block_ids)

    def append_token_ids(self, req_id: str, token_ids: List[int]) -> None:
        idx = self.req_id_to_index[req_id]
        n = self.num_tokens[idx]
        self.token_ids[idx, n:n + len(token_ids)] = token_ids
        self.num_tokens[idx] = n + len(token_ids)
