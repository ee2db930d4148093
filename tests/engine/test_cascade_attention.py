"""Cascade-attention engine wiring (reference: use_cascade_attention,
gpu_model_runner.py:2356-2489): many requests sharing a prompt prefix take
the two-phase path; outputs must equal the non-cascade engine exactly."""

import numpy as np
import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def _engine():
    cfg = EngineConfig(
        model_config=ModelConfig(
            model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=32,
            max_position_embeddings=512, max_model_len=256,
            eos_token_id=-1),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=256),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=1024,
                                         max_num_seqs=12,
                                         max_model_len=256),
    )
    return LLMEngine(cfg, load_format="dummy")


def _run(engine, prompts, max_tokens=8):
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens)
    for rid, p in enumerate(prompts):
        engine.add_request(f"r{rid}", p, sp)
    done = {}
    for _ in range(120):
        for o in engine.step():
            if o.finished:
                done[o.request_id] = o.outputs[0].token_ids
        if len(done) == len(prompts):
            return done
    raise AssertionError("unfinished")


def test_cascade_matches_non_cascade(monkeypatch):
    rng = np.random.default_rng(0)
    shared = list(rng.integers(1, 100, size=96))       # 6 shared blocks
    prompts = [shared + list(rng.integers(1, 100, size=3 + i))
               for i in range(10)]

    monkeypatch.setenv("LVLLM_DISABLE_CASCADE", "1")
    base = _run(_engine(), prompts)
    monkeypatch.delenv("LVLLM_DISABLE_CASCADE")
    got = _run(_engine(), prompts)
    assert got == base


def test_cascade_triggers(monkeypatch):
    """The detection must actually fire for a shared-prefix decode batch."""
    import lvllm_tpu.ops.cascade as casc
    fired = {"n": 0}
    orig = casc.use_cascade_heuristic

    def spy(num_reqs, shared_len, bs):
        r = orig(num_reqs, shared_len, bs)
        if r:
            fired["n"] += 1
        return r

    monkeypatch.setattr(casc, "use_cascade_heuristic", spy)
    rng = np.random.default_rng(1)
    shared = list(rng.integers(1, 100, size=96))
    prompts = [shared + list(rng.integers(1, 100, size=2 + i))
               for i in range(10)]
    _run(_engine(), prompts, max_tokens=4)
    assert fired["n"] > 0
