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


def _cfg(offload=False, seed=8):
    from lvllm_tpu.config import OffloadConfig
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=64, max_position_embeddings=256,
        max_model_len=128, eos_token_id=-1, seed=seed)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64,
                                 enable_prefix_caching=True),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128))
    if offload:
        cfg.offload_config = OffloadConfig(enabled=True,
                                           hbm_resident_moe_layers="0")
    return cfg


def test_disagg_cross_process_matches_single_engine():
    """Two-process P/D disaggregation over ZMQ (reference:
    nixl_connector API shape): pipelined prefill-process + decode-process
    outputs must equal single-engine generation."""
    from lvllm_tpu.distributed.disagg import DisaggregatedEngine

    prompts = [list(range(1, 40)), list(range(50, 75)), [7, 8, 9]]
    sp = SamplingParams(temperature=0.0, max_tokens=6)

    single = LLMEngine(_cfg(), load_format="dummy")
    want = []
    for p in prompts:
        rid = single.add_request(None, p, sp)
        want.append(run_to_completion(single, rid).outputs[0].token_ids)

    pair = DisaggregatedEngine(_cfg(), _cfg(), load_format="dummy")
    try:
        outs = pair.generate(prompts, sp)
        got = [o.outputs[0].token_ids for o in outs]
        assert got == want, (got, want)
        assert pair.stats["handoffs"] == 3
        assert pair.stats["kv_bytes_transferred"] > 0
    finally:
        pair.shutdown()


def test_disagg_full_speed_prefill_with_offloaded_decode():
    """The fork's README:47 headline: full-speed prefill in its own
    process while the decode engine runs offload-assisted (expert weights
    streaming from host RAM). Outputs must match the non-offloaded
    single-engine baseline bit-for-bit."""
    from lvllm_tpu.distributed.disagg import DisaggregatedEngine

    prompts = [list(range(1, 36)), list(range(40, 60))]
    sp = SamplingParams(temperature=0.0, max_tokens=5)

    single = LLMEngine(_cfg(), load_format="dummy")
    want = []
    for p in prompts:
        rid = single.add_request(None, p, sp)
        want.append(run_to_completion(single, rid).outputs[0].token_ids)

    pair = DisaggregatedEngine(_cfg(), _cfg(offload=True),
                               load_format="dummy")
    try:
        store = pair.decode_engine.core.runner.expert_store
        assert store is not None and store.streamed_layers  # offload active
        outs = pair.generate(prompts, sp)
        got = [o.outputs[0].token_ids for o in outs]
        assert got == want, (got, want)
        assert store.stats["bytes_streamed"] > 0
    finally:
        pair.shutdown()
