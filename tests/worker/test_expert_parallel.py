"""EP shard_map dispatch tests on the virtual CPU mesh: EP results must
match the single-shard MoE exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvllm_tpu.config import ParallelConfig
from lvllm_tpu.layers.moe import MoEParams, QuantMoEParams, fused_moe
from lvllm_tpu.parallel.expert_parallel import fused_moe_ep, fused_moe_ep_quant
from lvllm_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh4():
    pc = ParallelConfig(tensor_parallel_size=1, expert_parallel_size=4)
    return make_mesh(pc, jax.devices()[:4])


def test_ep_matches_single_shard(mesh4):
    rng = np.random.default_rng(0)
    T, H, I, E, K = 9, 128, 128, 8, 2
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.float32)
    router = jnp.asarray(rng.standard_normal((H, E)) * 0.3, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, I, H)) * 0.05, jnp.float32)
    mp = MoEParams(router=router, w1=w1, w2=w2)

    expected = fused_moe(x, mp, K)
    got = fused_moe_ep(x, mp, mesh4, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_ep_quant_matches_single_shard(mesh4):
    from lvllm_tpu.layers.moe import fused_moe_quant
    from lvllm_tpu.ops import quant

    rng = np.random.default_rng(1)
    T, H, I, E, K = 6, 128, 128, 8, 2
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.float32)
    router = jnp.asarray(rng.standard_normal((H, E)) * 0.3, jnp.float32)
    wf1 = rng.standard_normal((E, H, 2 * I)).astype(np.float32) * 0.05
    wf2 = rng.standard_normal((E, I, H)).astype(np.float32) * 0.05
    q1, s1 = quant.quantize_int8_np(wf1, 128)
    q2, s2 = quant.quantize_int8_np(wf2, 128)
    qp = QuantMoEParams(router=router,
                        w1_q=jnp.asarray(q1), w1_scales=jnp.asarray(s1),
                        w2_q=jnp.asarray(q2), w2_scales=jnp.asarray(s2),
                        method="int8")

    expected = fused_moe_quant(x, qp, K, use_pallas=False)
    got = fused_moe_ep_quant(x, qp, mesh4, K, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)


def test_ep_under_jit_with_sharded_weights(mesh4):
    """EP inside jit with weights actually placed on the expert axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(2)
    T, H, I, E, K = 4, 128, 128, 8, 2
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.float32)
    router = jnp.asarray(rng.standard_normal((H, E)) * 0.3, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, I, H)) * 0.05, jnp.float32)
    w1s = jax.device_put(w1, NamedSharding(mesh4, P("expert")))
    w2s = jax.device_put(w2, NamedSharding(mesh4, P("expert")))
    mp = MoEParams(router=router, w1=w1s, w2=w2s)

    f = jax.jit(lambda x: fused_moe_ep(x, mp, mesh4, K))
    got = f(x)
    expected = fused_moe(x, MoEParams(router=router, w1=w1, w2=w2), K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_ep_a2a_matches_single_shard(mesh4):
    """Token-moving ragged all-to-all dispatch (DeepEP analog) must equal
    the single-shard MoE on the gathered tokens."""
    from lvllm_tpu.parallel.ep_alltoall import fused_moe_ep_a2a
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(3)
    T, H, I, E, K = 16, 128, 128, 8, 2   # T divisible by ep=4
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.float32)
    router = jnp.asarray(rng.standard_normal((H, E)) * 0.3, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, I, H)) * 0.05, jnp.float32)
    mp = MoEParams(router=router, w1=w1, w2=w2)

    expected = fused_moe(x, mp, K)
    x_sharded = jax.device_put(x, NamedSharding(mesh4, P("expert")))
    got = fused_moe_ep_a2a(x_sharded, mp, mesh4, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_ep_a2a_skewed_routing(mesh4):
    """All tokens routed to experts on one rank (worst-case skew)."""
    from lvllm_tpu.parallel.ep_alltoall import fused_moe_ep_a2a
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(4)
    T, H, I, E, K = 8, 128, 128, 8, 2
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.float32)
    # Router biased so experts 0 and 1 (rank 0) always win.
    router_np = rng.standard_normal((H, E)).astype(np.float32) * 0.01
    router_np[:, 0] += 5.0
    router_np[:, 1] += 4.0
    router = jnp.asarray(router_np)
    w1 = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, I, H)) * 0.05, jnp.float32)
    mp = MoEParams(router=router, w1=w1, w2=w2)

    expected = fused_moe(x, mp, K)
    got = fused_moe_ep_a2a(x, mp, mesh4, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)
