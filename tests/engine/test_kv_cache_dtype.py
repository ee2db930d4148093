"""KV cache dtype tests (reference: kv_cache_dtype fp8/turboquant KV)."""

import numpy as np
import jax.numpy as jnp

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def build(kv_dtype):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        seed=17)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64,
                                 kv_cache_dtype=kv_dtype),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128))
    return LLMEngine(cfg, load_format="dummy")


def run(engine, prompt, n=10):
    rid = engine.add_request(None, prompt, SamplingParams(
        temperature=0.0, max_tokens=n))
    final = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                final = o
    return final.outputs[0].token_ids


def test_fp8_kv_cache_dtype_applied():
    eng = build("fp8")
    assert eng.core.runner.kv_caches[0].dtype == jnp.float8_e4m3fn
    toks = run(eng, [1, 2, 3, 4, 5])
    assert len(toks) == 10


def test_fp8_kv_outputs_track_full_precision():
    """fp8 KV greedy decode should mostly agree with f32 KV at tiny scale
    (accuracy gate analog)."""
    base = run(build("auto"), list(range(30)))
    fp8 = run(build("fp8"), list(range(30)))
    agree = sum(a == b for a, b in zip(base, fp8))
    assert agree >= 7, (base, fp8)
