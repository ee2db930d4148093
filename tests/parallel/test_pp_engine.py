"""Engine-wired pipeline parallelism (reference: pipeline_parallel_size,
config/parallel.py + EngineCore.step_with_batch_queue, v1/engine/core.py:443):
``pipeline_parallel_size=2`` must produce the same outputs as single-device
execution, with layers staged across two devices and up to pp batches in
flight."""

import numpy as np
import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ParallelConfig, SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def _config(pp=1, **model_kw):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="float32",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=64, max_model_len=128, eos_token_id=-1,
        **model_kw)
    return EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64,
                                 enable_prefix_caching=False),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128),
        parallel_config=ParallelConfig(pipeline_parallel_size=pp),
    )


def _run(engine, prompts, sps, max_steps=200):
    outs = {}
    for i, (p, sp) in enumerate(zip(prompts, sps)):
        engine.add_request(f"r{i}", p, sp)
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
        assert steps < max_steps
    return [outs[f"r{i}"].outputs[0].token_ids for i in range(len(prompts))]


PROMPTS = [[1, 2, 3, 4, 5, 6, 7], [9, 8, 7], list(range(20, 52))]


def test_pp2_greedy_matches_single_device():
    sps = [SamplingParams(temperature=0.0, max_tokens=8)] * 3
    ref = _run(LLMEngine(_config(pp=1), load_format="dummy"), PROMPTS, sps)
    got = _run(LLMEngine(_config(pp=2), load_format="dummy"), PROMPTS, sps)
    assert got == ref


def test_pp2_sampled_seeded_matches_single_device():
    sps = [SamplingParams(temperature=0.9, max_tokens=6, seed=7 + i)
           for i in range(3)]
    ref = _run(LLMEngine(_config(pp=1), load_format="dummy"), PROMPTS, sps)
    got = _run(LLMEngine(_config(pp=2), load_format="dummy"), PROMPTS, sps)
    assert got == ref


def test_pp2_batch_queue_depth():
    """With pp=2 the engine keeps up to 2 dispatched batches in flight."""
    cfg = _config(pp=2)
    eng = LLMEngine(cfg, load_format="dummy")
    assert eng.core._batch_queue_depth == 2
    assert cfg.scheduler_config.async_scheduling  # forced on by PP
    for i in range(3):
        eng.add_request(f"q{i}", [1 + i, 2, 3],
                        SamplingParams(temperature=0.0, max_tokens=12))
    depth_seen = 0
    steps = 0
    while eng.has_unfinished_requests():
        eng.step()
        depth_seen = max(depth_seen, len(eng.core._inflight_q))
        steps += 1
        assert steps < 200
    assert depth_seen == 2


def test_pp2_stop_and_max_len():
    """EOS stop + max_tokens truncation work through the delayed
    finalization of the batch queue."""
    cfg = _config(pp=2)
    cfg.model_config.eos_token_id = 0
    eng = LLMEngine(cfg, load_format="dummy")
    sp = SamplingParams(temperature=0.0, max_tokens=32)
    eng.add_request("s", [3, 1, 4, 1, 5], sp)
    outs = {}
    steps = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
        assert steps < 300
    toks = outs["s"].outputs[0].token_ids
    assert 0 < len(toks) <= 32
    if len(toks) < 32:
        assert toks[-1] == 0  # stopped on EOS


def test_pp3_uneven_stages():
    """4 layers over 3 stages (2/1/1 split) still match."""
    sps = [SamplingParams(temperature=0.0, max_tokens=5)] * 2
    ref = _run(LLMEngine(_config(pp=1), load_format="dummy"),
               PROMPTS[:2], sps)
    got = _run(LLMEngine(_config(pp=3), load_format="dummy"),
               PROMPTS[:2], sps)
    assert got == ref
