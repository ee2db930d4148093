"""Engine-wired PCP (reference: prefill_context_parallel_size,
config/parallel.py:115 + parallel_state.py:1277): long-prefill query chunks
sharded over the mesh "context" axis must produce identical outputs to
single-device execution — including chunked prefills where later chunks
attend the already-cached prefix."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ParallelConfig, SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.parallel.mesh import make_mesh
from lvllm_tpu.sampling_params import SamplingParams


def _config(pcp=1, max_batched=64):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="float32",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_experts=0, max_model_len=256, eos_token_id=-1)
    return EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64,
                                 enable_prefix_caching=False),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=max_batched,
                                         max_num_seqs=4, max_model_len=256),
        parallel_config=ParallelConfig(prefill_context_parallel_size=pcp),
    )


def _engine(pcp, max_batched=64):
    cfg = _config(pcp, max_batched)
    mesh = None
    if pcp > 1:
        mesh = make_mesh(cfg.parallel_config, jax.devices()[:pcp])
    return LLMEngine(cfg, load_format="dummy", mesh=mesh)


def _run(engine, prompts, sp, max_steps=100):
    outs = {}
    for i, p in enumerate(prompts):
        engine.add_request(f"r{i}", p, sp)
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
        assert steps < max_steps
    return [outs[f"r{i}"].outputs[0].token_ids for i in range(len(prompts))]


def test_pcp2_long_prefill_matches_single_device():
    """One 120-token prompt: prefill runs through the PCP path (single
    request, query chunk sharded 2 ways), decode through the regular path."""
    prompt = list(np.random.default_rng(0).integers(1, 250, size=120))
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    ref = _run(_engine(1), [prompt], sp)
    got = _run(_engine(2), [prompt], sp)
    assert got == ref


def test_pcp2_chunked_prefill_prefix_merge():
    """Prompt longer than the token budget → multiple prefill chunks; the
    second chunk's PCP attention must LSE-merge against the cached prefix."""
    prompt = list(np.random.default_rng(1).integers(1, 250, size=150))
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    ref = _run(_engine(1, max_batched=64), [prompt], sp)
    got = _run(_engine(2, max_batched=64), [prompt], sp)
    assert got == ref


def test_pcp4_matches_single_device():
    prompt = list(np.random.default_rng(2).integers(1, 250, size=96))
    sp = SamplingParams(temperature=0.0, max_tokens=4)
    ref = _run(_engine(1), [prompt], sp)
    got = _run(_engine(4), [prompt], sp)
    assert got == ref


def test_pcp2_multi_request_batch_falls_back():
    """Batches with >1 request take the regular path and still match."""
    prompts = [list(np.random.default_rng(3).integers(1, 250, size=40)),
               [5, 6, 7, 8]]
    sp = SamplingParams(temperature=0.9, max_tokens=5, seed=3)
    ref = _run(_engine(1), prompts, sp)
    got = _run(_engine(2), prompts, sp)
    assert got == ref
