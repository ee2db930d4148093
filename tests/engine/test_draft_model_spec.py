"""Draft-model speculative decoding.

Mirrors the reference's spec-decode correctness strategy (rejection
sampling is lossless): whatever the draft model proposes, greedy outputs
must equal the non-speculative baseline. With draft == target weights,
acceptance is 100% and the engine must finish in fewer steps.
"""

import dataclasses

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def _model_config(seed=0):
    return ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="bfloat16",
        seed=seed, vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, max_model_len=128,
        eos_token_id=-1)


def _engine(spec=None):
    cfg = EngineConfig(
        model_config=_model_config(),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128),
        speculative_config=spec or SpeculativeConfig(),
    )
    return LLMEngine(cfg, load_format="dummy")


def _run(engine, prompts, max_tokens=16):
    for rid, p in enumerate(prompts):
        engine.add_request(f"r{rid}", p,
                           SamplingParams(temperature=0.0,
                                          max_tokens=max_tokens))
    outs, steps = [], 0
    while engine.has_unfinished_requests() and steps < 200:
        outs.extend(o for o in engine.step() if o.finished)
        steps += 1
    return {o.request_id: o.outputs[0].token_ids for o in outs}, steps


PROMPTS = [[1, 2, 3, 4, 5], [9, 8, 7], list(range(10, 30))]


def test_draft_model_equals_baseline_and_saves_steps():
    base, base_steps = _run(_engine(), PROMPTS)
    spec = SpeculativeConfig(method="draft_model",
                             num_speculative_tokens=4,
                             draft_model_config=_model_config(seed=0))
    got, spec_steps = _run(_engine(spec), PROMPTS)
    assert got == base
    # Identical draft ⇒ full acceptance ⇒ strictly fewer engine steps.
    assert spec_steps < base_steps, (spec_steps, base_steps)


def test_mismatched_draft_still_lossless():
    base, _ = _run(_engine(), PROMPTS)
    spec = SpeculativeConfig(method="draft_model",
                             num_speculative_tokens=3,
                             draft_model_config=_model_config(seed=123))
    got, _ = _run(_engine(spec), PROMPTS)
    assert got == base


def test_draft_state_freed_on_finish():
    spec = SpeculativeConfig(method="draft_model",
                             num_speculative_tokens=2,
                             draft_model_config=_model_config(seed=0))
    eng = _engine(spec)
    _run(eng, PROMPTS, max_tokens=4)
    proposer = eng.core.proposer
    assert proposer._reqs == {}
    # All non-null blocks returned to the free list.
    assert len(proposer._free_blocks) == 511
