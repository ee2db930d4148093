"""Elastic EP: rescale the expert axis mid-serve without losing state.

Reference behavior: elastic EP scale-up/down re-shards expert weights
across a new EP world while preserving in-flight requests. Here the
whole mesh is rebuilt (ep=2→4 and back) between engine steps; generated
tokens must equal a never-rescaled run.
"""

import jax
import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ParallelConfig, SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.parallel.mesh import make_mesh
from lvllm_tpu.sampling_params import SamplingParams

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _engine(ep):
    pc = ParallelConfig(tensor_parallel_size=8 // ep,
                        expert_parallel_size=ep)
    mesh = make_mesh(pc, jax.devices()[:8])
    cfg = EngineConfig(
        model_config=ModelConfig(
            model="dummy", architecture="Qwen3MoeForCausalLM",
            dtype="bfloat16", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4, head_dim=16,
            num_experts=8, num_experts_per_tok=2, moe_intermediate_size=64,
            max_position_embeddings=256, max_model_len=128,
            eos_token_id=-1),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128),
        parallel_config=pc,
    )
    return LLMEngine(cfg, load_format="dummy", mesh=mesh)


PROMPTS = [[1, 2, 3, 4, 5], [9, 8, 7, 6]]


def _drive(engine, rescale_at=None, new_ep=None, max_tokens=12):
    for rid, p in enumerate(PROMPTS):
        engine.add_request(f"r{rid}", p,
                           SamplingParams(temperature=0.0,
                                          max_tokens=max_tokens))
    outs, steps = [], 0
    while engine.has_unfinished_requests() and steps < 60:
        if rescale_at is not None and steps == rescale_at:
            engine.core.scale_expert_parallel(new_ep)
        outs.extend(o for o in engine.step() if o.finished)
        steps += 1
    return {o.request_id: o.outputs[0].token_ids for o in outs}


def test_scale_up_and_down_preserves_outputs():
    base = _drive(_engine(ep=2))
    up = _drive(_engine(ep=2), rescale_at=3, new_ep=4)
    assert up == base
    down = _drive(_engine(ep=4), rescale_at=3, new_ep=2)
    assert down == base


def test_invalid_scale_rejected():
    eng = _engine(ep=2)
    with pytest.raises(ValueError, match="factor"):
        eng.core.scale_expert_parallel(3)   # 8 devices don't factor
    with pytest.raises(ValueError, match="factor"):
        eng.core.scale_expert_parallel(16)  # more ranks than devices
