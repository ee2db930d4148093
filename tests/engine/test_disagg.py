"""Prefill/decode disaggregation tests: the disaggregated pipeline must
reproduce single-engine generation exactly (reference:
examples/offline_inference/disaggregated_prefill.py + kv_connector tests).
"""

import numpy as np
import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.distributed.kv_connector import (KVHandoff,
                                                inject_and_decode_request,
                                                prefill_and_extract)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def build_engine():
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        seed=8)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64,
                                 enable_prefix_caching=True),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128))
    return LLMEngine(cfg, load_format="dummy")


def run_to_completion(engine, rid):
    final = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished and o.request_id == rid:
                final = o
    return final


def test_disagg_matches_single_engine():
    prompt = list(range(1, 40))  # 39 tokens → 2 full blocks + tail
    sp = SamplingParams(temperature=0.0, max_tokens=8)

    # Baseline: one engine does everything.
    single = build_engine()
    rid = single.add_request(None, prompt, sp)
    want = run_to_completion(single, rid).outputs[0].token_ids

    # Disaggregated: prefill engine → handoff → decode engine.
    prefill_eng = build_engine()
    decode_eng = build_engine()
    handoff = prefill_and_extract(prefill_eng, prompt)
    assert handoff.first_token_id == want[0]
    assert handoff.num_full_block_tokens == 32
    assert len(handoff.kv_blocks) == 2          # layers
    assert handoff.kv_blocks[0].shape[1] == 2   # full blocks

    rid2 = inject_and_decode_request(decode_eng, handoff, sp, "dec0")
    out = run_to_completion(decode_eng, rid2)
    got = [handoff.first_token_id] + out.outputs[0].token_ids
    assert got == want, (got, want)


def test_disagg_short_prompt_no_full_blocks():
    """Prompt shorter than one block: pure-recompute path still works."""
    prompt = [3, 1, 4, 1, 5]
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    single = build_engine()
    rid = single.add_request(None, prompt, sp)
    want = run_to_completion(single, rid).outputs[0].token_ids

    prefill_eng = build_engine()
    decode_eng = build_engine()
    handoff = prefill_and_extract(prefill_eng, prompt)
    assert handoff.num_full_block_tokens == 0
    rid2 = inject_and_decode_request(decode_eng, handoff, sp, "dec1")
    out = run_to_completion(decode_eng, rid2)
    got = [handoff.first_token_id] + out.outputs[0].token_ids
    assert got == want
