"""Async scheduling tests: pipelined execution must be token-identical to
synchronous execution (reference: async_scheduling config +
AsyncScheduler)."""

import numpy as np
import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def build_engine(async_scheduling: bool, num_kv_blocks=64):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, max_model_len=256, eos_token_id=-1,
        seed=13)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=num_kv_blocks),
        scheduler_config=SchedulerConfig(
            max_num_batched_tokens=128, max_num_seqs=4, max_model_len=256,
            async_scheduling=async_scheduling))
    return LLMEngine(cfg, load_format="dummy")


def run(engine, prompts, sps):
    outs = {}
    for i, (p, sp) in enumerate(zip(prompts, sps)):
        engine.add_request(f"r{i}", p, sp)
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
        assert steps < 5000
    return [outs[f"r{i}"] for i in range(len(prompts))], steps


@pytest.mark.parametrize("max_tokens", [1, 5, 12])
def test_async_matches_sync_greedy(max_tokens):
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], list(range(40))]
    sps = [SamplingParams(temperature=0.0, max_tokens=max_tokens)] * 3
    sync_outs, _ = run(build_engine(False), prompts, sps)
    async_outs, _ = run(build_engine(True), prompts, sps)
    for s, a in zip(sync_outs, async_outs):
        assert s.outputs[0].token_ids == a.outputs[0].token_ids
        assert s.outputs[0].finish_reason == a.outputs[0].finish_reason


def test_async_matches_sync_sampled():
    prompts = [[5, 6, 7]] * 2
    sps = [SamplingParams(temperature=0.9, seed=11, max_tokens=8),
           SamplingParams(temperature=0.7, seed=22, top_k=20, max_tokens=8)]
    sync_outs, _ = run(build_engine(False), prompts, sps)
    async_outs, _ = run(build_engine(True), prompts, sps)
    for s, a in zip(sync_outs, async_outs):
        assert s.outputs[0].token_ids == a.outputs[0].token_ids


def test_async_stop_token():
    eng = build_engine(False)
    sp = SamplingParams(temperature=0.0, max_tokens=10)
    base, _ = run(eng, [[4, 4, 4]], [sp])
    stop_tok = base[0].outputs[0].token_ids[3]
    sp2 = SamplingParams(temperature=0.0, max_tokens=10,
                         stop_token_ids=[stop_tok])
    sync_outs, _ = run(build_engine(False), [[4, 4, 4]], [sp2])
    async_outs, _ = run(build_engine(True), [[4, 4, 4]], [sp2])
    assert sync_outs[0].outputs[0].token_ids == \
        async_outs[0].outputs[0].token_ids
    assert async_outs[0].outputs[0].finish_reason == "stop"


def test_async_staggered_arrivals():
    """Requests joining mid-stream (prefill while others decode)."""
    eng = build_engine(True)
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    eng.add_request("a", [1, 2, 3], sp)
    outs = {}
    steps = 0
    added_b = False
    while eng.has_unfinished_requests() or not added_b:
        if steps == 2 and not added_b:
            eng.add_request("b", list(range(30)), sp)
            added_b = True
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
        assert steps < 1000
    assert set(outs) == {"a", "b"}

    # Same prompts on a sync engine give the same tokens.
    sync_outs, _ = run(build_engine(False),
                       [[1, 2, 3], list(range(30))], [sp, sp])
    assert outs["a"].outputs[0].token_ids == sync_outs[0].outputs[0].token_ids
    assert outs["b"].outputs[0].token_ids == sync_outs[1].outputs[0].token_ids


def test_async_preemption_recovers():
    eng = build_engine(True, num_kv_blocks=9)
    sp = SamplingParams(temperature=0.0, max_tokens=40)
    outs, _ = run(eng, [[1] * 30, [2] * 30], [sp, sp])
    assert all(len(o.outputs[0].token_ids) == 40 for o in outs)
    sync_outs, _ = run(build_engine(False, num_kv_blocks=9),
                       [[1] * 30, [2] * 30], [sp, sp])
    for a, s in zip(outs, sync_outs):
        assert a.outputs[0].token_ids == s.outputs[0].token_ids
