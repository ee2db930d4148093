"""Medusa + suffix speculative decoding.

Same losslessness contract as the EAGLE/ngram tests: exact-match
verification keeps greedy outputs identical regardless of draft quality.
"""

import numpy as np

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams
from lvllm_tpu.spec_decode.suffix import SuffixConfig, SuffixProposer


def _engine(spec=None):
    cfg = EngineConfig(
        model_config=ModelConfig(
            model="dummy", architecture="Qwen3ForCausalLM", dtype="bfloat16",
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=32,
            max_position_embeddings=256, max_model_len=128,
            eos_token_id=-1, tie_word_embeddings=False),
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
    while engine.has_unfinished_requests() and steps < 300:
        outs.extend(o for o in engine.step() if o.finished)
        steps += 1
    return {o.request_id: o.outputs[0].token_ids for o in outs}, steps


PROMPTS = [[1, 2, 3, 4, 5], [9, 8, 7], list(range(10, 30))]


def test_medusa_lossless_vs_baseline():
    base, _ = _run(_engine(), PROMPTS)
    spec = SpeculativeConfig(method="medusa", num_speculative_tokens=3)
    got, _ = _run(_engine(spec), PROMPTS)
    assert got == base


def test_suffix_lossless_vs_baseline():
    base, _ = _run(_engine(), PROMPTS)
    spec = SpeculativeConfig(method="suffix", num_speculative_tokens=4)
    got, _ = _run(_engine(spec), PROMPTS)
    assert got == base


def test_suffix_accelerates_repeats():
    """A repeated response must be proposed from the global tree: the
    second identical request finishes in fewer engine steps."""
    spec = SpeculativeConfig(method="suffix", num_speculative_tokens=4)
    engine = _engine(spec)
    first, steps1 = _run(engine, [[1, 2, 3, 4, 5]], max_tokens=16)
    second, steps2 = _run(engine, [[1, 2, 3, 4, 5]], max_tokens=16)
    assert first["r0"] == second["r0"]
    assert steps2 < steps1, (steps1, steps2)


def test_suffix_tree_proposals():
    p = SuffixProposer(SuffixConfig(num_speculative_tokens=3))
    p.observe_finished([7, 8, 9, 10, 11, 12])
    # Suffix [8, 9] seen → propose the continuation 10, 11, 12.
    assert p.propose([1, 2, 7, 8, 9]) == [10, 11, 12]
    # LRU eviction drops old sequences.
    small = SuffixProposer(SuffixConfig(num_speculative_tokens=3,
                                        max_cached_sequences=1))
    small.observe_finished([7, 8, 9, 10])
    small.observe_finished([20, 21, 22, 23])
    assert small.propose([7, 8, 9]) == []  # evicted, no self-history
    assert small.propose([5, 20, 21, 22]) == [23]
