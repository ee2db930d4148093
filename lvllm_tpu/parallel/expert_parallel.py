"""Expert-parallel MoE dispatch over the mesh's "expert" axis.

TPU-native counterpart of the reference's EP stack (``determine_expert_map``
``fused_moe/layer.py:84``, All2All managers ``device_communicators/
all2all.py`` — naive allgather+reducescatter, DeepEP HT/LL backends):

The first-class implementation here is the reference's *naive* backend
re-expressed the SPMD way: activations stay replicated across the expert
axis, each shard computes only the (token, k) pairs routed to its local
experts (non-local pairs masked to weight 0), and one ``psum`` over the
expert axis combines contributions — the all-reduce XLA would have derived
from allgather+reducescatter. Routing math is tiny and replicated.

A ragged all-to-all dispatch (lax.ragged_all_to_all over ICI, DeepEP-LL
analog, which moves tokens instead of replicating them) drops in behind the
same interface for bandwidth-bound regimes.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from lvllm_tpu.layers.common import silu_and_mul
from lvllm_tpu.layers.moe import (MoEParams, QuantMoEParams,
                                  grouped_expert_ffn, permute_for_experts,
                                  route_tokens)
from lvllm_tpu.parallel.mesh import AXIS_DATA, AXIS_EXPERT


def fused_moe_ep(
    x: jax.Array,  # [T, H]
    params: MoEParams,
    mesh,
    top_k: int,
    norm_topk_prob: bool = True,
    scoring_fn: str = "softmax",
) -> jax.Array:
    """EP MoE forward: expert weights sharded over the ("data", "expert")
    mesh axes jointly — EP *spans* DP ranks exactly as the reference's
    DP+EP serving topology (experts partitioned over all dp*ep ranks,
    ``fused_moe/layer.py:84 determine_expert_map``; DP wave sync is
    implicit here — every shard executes the same SPMD program, and an
    idle data shard's padding rows are the reference's dummy batches,
    ``v1/worker/dp_utils.py``). With data axis 1 this reduces to plain
    EP."""
    dp = mesh.shape.get(AXIS_DATA, 1)
    ep = mesh.shape[AXIS_EXPERT]
    E = params.w1.shape[0]
    assert E % (dp * ep) == 0, (E, dp, ep)
    E_local = E // (dp * ep)

    def shard_fn(x, router, w1, w2):
        T, H = x.shape
        topk_w, topk_ids = route_tokens(x, router, top_k, norm_topk_prob,
                                        scoring_fn)
        rank = jax.lax.axis_index(AXIS_DATA) * ep + \
            jax.lax.axis_index(AXIS_EXPERT)
        lo = rank * E_local
        local = (topk_ids >= lo) & (topk_ids < lo + E_local)
        ids_local = jnp.where(local, topk_ids - lo, 0).astype(jnp.int32)
        w_local = jnp.where(local, topk_w, 0.0)

        order, group_sizes = permute_for_experts(ids_local, E_local)
        token_of_pair = order // top_k
        x_sorted = x[token_of_pair]
        y_sorted = grouped_expert_ffn(x_sorted, group_sizes, w1, w2)
        y_flat = jnp.zeros((T * top_k, H), y_sorted.dtype)
        y_flat = y_flat.at[order].set(y_sorted)
        y = jnp.einsum("tkh,tk->th", y_flat.reshape(T, top_k, H),
                       w_local.astype(y_sorted.dtype))
        return jax.lax.psum(y, (AXIS_DATA, AXIS_EXPERT))

    espec = P((AXIS_DATA, AXIS_EXPERT)) if dp > 1 else P(AXIS_EXPERT)
    ep_sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), espec, espec),
        out_specs=P(),
        check_vma=False,
    )
    y = ep_sharded(x, params.router, params.w1, params.w2)
    if params.shared_w1 is not None:
        sh = silu_and_mul(x @ params.shared_w1)
        y = y + sh @ params.shared_w2
    return y.astype(x.dtype)


def fused_moe_ep_quant(
    x: jax.Array,
    params: QuantMoEParams,
    mesh,
    top_k: int,
    norm_topk_prob: bool = True,
    scoring_fn: str = "softmax",
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """EP + weight-only-quantized experts: same masked-local scheme (over
    the joint ("data", "expert") group — see fused_moe_ep) with the fused
    dequant grouped GEMM per shard."""
    from lvllm_tpu import envs
    from lvllm_tpu.ops import moe_align
    from lvllm_tpu.ops.pallas import quant_gemm

    dp = mesh.shape.get(AXIS_DATA, 1)
    ep = mesh.shape[AXIS_EXPERT]
    E = params.w1_q.shape[0]
    assert E % (dp * ep) == 0, (E, dp, ep)
    E_local = E // (dp * ep)
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon") and \
            not envs.LVLLM_USE_REFERENCE_OPS
    gmm = (quant_gemm.grouped_quant_matmul if use_pallas
           else quant_gemm.grouped_quant_matmul_reference)

    from lvllm_tpu.layers.moe import _pick_tile_m
    tile_m = _pick_tile_m(x.shape[0], top_k)

    def shard_fn(x, router, w1_q, w1_s, w2_q, w2_s):
        T, H = x.shape
        topk_w, topk_ids = route_tokens(x, router, top_k, norm_topk_prob,
                                        scoring_fn)
        rank = jax.lax.axis_index(AXIS_DATA) * ep + \
            jax.lax.axis_index(AXIS_EXPERT)
        lo = rank * E_local
        local = (topk_ids >= lo) & (topk_ids < lo + E_local)
        ids_local = jnp.where(local, topk_ids - lo, 0).astype(jnp.int32)
        w_local = jnp.where(local, topk_w, 0.0)

        d = moe_align.align_tokens(x, ids_local, E_local, tile_m)
        h = gmm(d.x_aligned, w1_q, w1_s, d.block_expert,
                method=params.method, tile_m=tile_m,
                group_size=params.group_size)
        h = silu_and_mul(h)
        y_aligned = gmm(h, w2_q, w2_s, d.block_expert,
                        method=params.method, tile_m=tile_m,
                        group_size=params.group_size)
        y = moe_align.combine_tokens(y_aligned, d.pair_pos, w_local,
                                     out_dtype=x.dtype)
        return jax.lax.psum(y.astype(jnp.float32),
                            (AXIS_DATA, AXIS_EXPERT)).astype(x.dtype)

    espec = P((AXIS_DATA, AXIS_EXPERT)) if dp > 1 else P(AXIS_EXPERT)
    ep_sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), espec, espec, espec, espec),
        out_specs=P(),
        check_vma=False,
    )
    y = ep_sharded(x, params.router, params.w1_q, params.w1_scales,
                   params.w2_q, params.w2_scales)
    if params.shared_w1 is not None:
        sh = silu_and_mul(x @ params.shared_w1)
        y = y + sh @ params.shared_w2
    return y.astype(x.dtype)
