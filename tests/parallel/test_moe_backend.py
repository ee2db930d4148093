"""EP dispatch backend + DBO ubatching tests (reference: all2all_backend
selection config/parallel.py:172-181, DBO docs/design/dbo.md): the
token-moving alltoall backend and its micro-batched variant must match the
masked-local (naive) backend and the single-device engine exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ParallelConfig, SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.layers.moe import MoEParams, fused_moe
from lvllm_tpu.parallel.ep_alltoall import fused_moe_ep_a2a
from lvllm_tpu.parallel.mesh import make_mesh
from lvllm_tpu.sampling_params import SamplingParams


def _params(rng, E=8, H=32, I=64):
    return MoEParams(
        router=jnp.asarray(rng.standard_normal((H, E)), jnp.float32),
        w1=jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.05,
                       jnp.float32),
        w2=jnp.asarray(rng.standard_normal((E, I, H)) * 0.05, jnp.float32))


def test_a2a_ubatch_matches_dense():
    """ubatch=2 a2a == ubatch=1 a2a == dense reference."""
    rng = np.random.default_rng(0)
    mesh = make_mesh(ParallelConfig(expert_parallel_size=4),
                     jax.devices()[:4])
    mp = _params(rng)
    x = jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
    dense = fused_moe(x, mp, top_k=2)
    a2a1 = fused_moe_ep_a2a(x, mp, mesh, top_k=2, ubatch=1)
    a2a2 = fused_moe_ep_a2a(x, mp, mesh, top_k=2, ubatch=2)
    np.testing.assert_allclose(np.asarray(a2a1), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(a2a2), np.asarray(a2a1),
                               rtol=1e-6, atol=1e-6)


def test_a2a_quant_matches_dense_quant():
    """Quantized (int8) experts through the a2a dispatch == the dense
    quantized reference."""
    import jax.numpy as jnp
    from lvllm_tpu.layers.moe import QuantMoEParams, fused_moe_quant
    from lvllm_tpu.ops.quant import quantize_int8_np

    rng = np.random.default_rng(3)
    E, H, I = 8, 128, 128
    mesh = make_mesh(ParallelConfig(expert_parallel_size=4),
                     jax.devices()[:4])
    router = jnp.asarray(rng.standard_normal((H, E)), jnp.float32)
    w1 = rng.standard_normal((E, H, 2 * I)).astype(np.float32) * 0.05
    w2 = rng.standard_normal((E, I, H)).astype(np.float32) * 0.05
    w1_q, w1_s = quantize_int8_np(w1, 128)
    w2_q, w2_s = quantize_int8_np(w2, 128)
    qp = QuantMoEParams(router=router, w1_q=jnp.asarray(w1_q),
                        w1_scales=jnp.asarray(w1_s),
                        w2_q=jnp.asarray(w2_q),
                        w2_scales=jnp.asarray(w2_s), method="int8",
                        group_size=128)
    x = jnp.asarray(rng.standard_normal((32, H)), jnp.float32)
    dense = fused_moe_quant(x, qp, 2, True, "softmax")
    a2a = fused_moe_ep_a2a(x, qp, mesh, top_k=2, ubatch=2)
    np.testing.assert_allclose(np.asarray(a2a), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)


def test_engine_alltoall_backend_matches_single():
    """Greedy generation with moe_backend=alltoall (+DBO) == unsharded."""
    def build(mesh, pc):
        mc = ModelConfig(
            model="dummy", architecture="Qwen3MoeForCausalLM",
            dtype="float32", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, num_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=64,
            max_position_embeddings=256, max_model_len=128, eos_token_id=-1)
        cfg = EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=64, max_num_seqs=4,
                max_model_len=128),
            parallel_config=pc or ParallelConfig(),
        )
        return LLMEngine(cfg, load_format="dummy", mesh=mesh)

    def run(engine):
        sp = SamplingParams(temperature=0.0, max_tokens=6)
        engine.add_request("r0", [1, 2, 3, 4, 5, 6, 7, 8], sp)
        toks = None
        for _ in range(30):
            for o in engine.step():
                if o.finished:
                    toks = o.outputs[0].token_ids
            if toks:
                break
        return toks

    single = run(build(None, None))
    pc = ParallelConfig(expert_parallel_size=2, moe_backend="alltoall",
                        moe_ubatches=2)
    mesh = make_mesh(pc, jax.devices()[:2])
    a2a = run(build(mesh, pc))
    assert single == a2a, (single, a2a)
