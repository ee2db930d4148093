"""Explicit sequence-parallel activation sharding (SURVEY §2.3 SP): greedy
outputs must be unchanged when the norm/residual regions are token-sharded
over the model axis."""

import jax

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ParallelConfig, SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.parallel.mesh import make_mesh
from lvllm_tpu.sampling_params import SamplingParams


def _build(pc, mesh):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=64,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128),
        parallel_config=pc or ParallelConfig(),
    )
    return LLMEngine(cfg, load_format="dummy", mesh=mesh)


def _run(engine):
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    engine.add_request("r0", [1, 2, 3, 4, 5, 6, 7, 8], sp)
    for _ in range(30):
        for o in engine.step():
            if o.finished:
                return o.outputs[0].token_ids
    raise AssertionError("unfinished")


def test_sp_matches_non_sp():
    base = _run(_build(None, None))
    pc = ParallelConfig(tensor_parallel_size=2,
                        enable_sequence_parallel=True)
    mesh = make_mesh(pc, jax.devices()[:2])
    sp_out = _run(_build(pc, mesh))
    assert base == sp_out, (base, sp_out)
