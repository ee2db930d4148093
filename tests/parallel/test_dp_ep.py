"""EP spanning DP ranks, the SPMD way (reference: DP+EP serving topology —
experts partitioned over all dp*ep ranks, fused_moe/layer.py:84
determine_expert_map; DP wave sync via DPEngineCoreProc.run_busy_loop
core.py:1731 + dummy batches dp_utils.py).

In the TPU-native design the lockstep IS the SPMD program: a (data, expert)
mesh runs one jitted step; expert weights shard over the joint group; an
idle data shard only sees padding rows (= the reference's dummy batches).
These tests pin: (a) the joint-group MoE op matches single-device math,
(b) a 2-DP x 2-EP engine matches DP=1 outputs, including a step where one
data shard has no real work."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ParallelConfig, SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.layers.moe import MoEParams, fused_moe
from lvllm_tpu.parallel.expert_parallel import fused_moe_ep
from lvllm_tpu.parallel.mesh import make_mesh
from lvllm_tpu.sampling_params import SamplingParams


def _moe_params(rng, E=8, H=32, I=16):
    return MoEParams(
        router=jnp.asarray(rng.standard_normal((H, E)), jnp.float32),
        w1=jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.1,
                       jnp.float32),
        w2=jnp.asarray(rng.standard_normal((E, I, H)) * 0.1, jnp.float32),
    )


def test_moe_op_dp2_ep2_matches_single_device():
    rng = np.random.default_rng(0)
    params = _moe_params(rng)
    x = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    ref = fused_moe(x, params, top_k=2)
    mesh = make_mesh(ParallelConfig(data_parallel_size=2,
                                    expert_parallel_size=2),
                     jax.devices()[:4])
    got = fused_moe_ep(x, params, mesh, top_k=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_moe_op_dp2_ep1_and_dp1_ep4():
    """Degenerate joint-group splits also match."""
    rng = np.random.default_rng(1)
    params = _moe_params(rng)
    x = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    ref = fused_moe(x, params, top_k=2)
    for dp, ep in ((2, 1), (1, 4), (2, 4)):
        mesh = make_mesh(ParallelConfig(data_parallel_size=dp,
                                        expert_parallel_size=ep),
                         jax.devices()[:dp * ep])
        got = fused_moe_ep(x, params, mesh, top_k=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=f"{dp}x{ep}")


def _config(pc=None):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="float32",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_experts=8, num_experts_per_tok=2,
        moe_intermediate_size=64, max_model_len=128, eos_token_id=-1)
    return EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64,
                                 enable_prefix_caching=False),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128),
        parallel_config=pc or ParallelConfig(),
    )


def _run(engine, reqs, max_steps=100):
    outs = {}
    for rid, p, sp in reqs:
        engine.add_request(rid, p, sp)
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
        assert steps < max_steps
    return {rid: outs[rid].outputs[0].token_ids for rid, _, _ in reqs}


def test_engine_dp2_ep2_matches_dp1():
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    reqs = [("a", [1, 2, 3, 4, 5, 6, 7], sp),
            ("b", list(range(20, 45)), sp)]
    ref = _run(LLMEngine(_config(), load_format="dummy"), reqs)
    pc = ParallelConfig(data_parallel_size=2, expert_parallel_size=2,
                        enable_expert_parallel=True)
    mesh = make_mesh(pc, jax.devices()[:4])
    got = _run(LLMEngine(_config(pc), load_format="dummy", mesh=mesh), reqs)
    for rid in ref:
        np.testing.assert_allclose(got[rid], ref[rid], err_msg=rid)


def test_engine_dp2_ep2_idle_shard_dummy_batch():
    """One single-token decode batch: the second data shard holds only
    padding rows (the reference's dummy batch) yet the joint-group expert
    collectives still execute — outputs must match DP=1 exactly."""
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    reqs = [("solo", [5, 4, 3, 2, 1], sp)]
    ref = _run(LLMEngine(_config(), load_format="dummy"), reqs)
    pc = ParallelConfig(data_parallel_size=2, expert_parallel_size=2,
                        enable_expert_parallel=True)
    mesh = make_mesh(pc, jax.devices()[:4])
    got = _run(LLMEngine(_config(pc), load_format="dummy", mesh=mesh), reqs)
    np.testing.assert_allclose(got["solo"], ref["solo"])
