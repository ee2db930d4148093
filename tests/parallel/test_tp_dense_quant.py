"""Dense-layer w8a8 under tensor parallelism: per-output-channel scales
shard with their kernels (column-parallel q/k/v/gate_up + lm_head shard
the scale on the output dim; row-parallel o/down replicate it), and a
TP=2 engine matches single-device w8a8 outputs exactly.

Reference: compressed-tensors w8a8-int8 applies to every linear under TP
(schemes/compressed_tensors_w8a8_int8.py).
"""

import jax
import numpy as np
import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ParallelConfig, SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.parallel.mesh import make_mesh
from lvllm_tpu.sampling_params import SamplingParams

pytestmark = pytest.mark.smoke


def _config(pc=None):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=128, max_position_embeddings=256,
        max_model_len=128, eos_token_id=-1, quantization="w8a8",
        tie_word_embeddings=False, seed=11)
    return EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128),
        parallel_config=pc or ParallelConfig())


def _run(engine, reqs):
    for rid, toks, sp in reqs:
        engine.add_request(rid, toks, sp)
    outs = {}
    steps = 0
    while engine.has_unfinished_requests() and steps < 100:
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0].token_ids
        steps += 1
    return outs


def test_tp2_dense_w8a8_matches_single_device():
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    reqs = [("a", [1, 2, 3, 4, 5], sp), ("b", list(range(30, 50)), sp)]
    ref = _run(LLMEngine(_config(), load_format="dummy"), reqs)
    pc = ParallelConfig(tensor_parallel_size=2)
    mesh = make_mesh(pc, jax.devices()[:2])
    got = _run(LLMEngine(_config(pc), load_format="dummy", mesh=mesh),
               reqs)
    for rid in ref:
        np.testing.assert_allclose(got[rid], ref[rid], err_msg=rid)
