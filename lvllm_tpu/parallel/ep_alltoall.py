"""Ragged all-to-all expert dispatch (DeepEP analog) over ICI.

Counterpart of the reference's token-moving EP backends
(``device_communicators/all2all.py`` DeepEP high-throughput/low-latency,
``fused_moe/prepare_finalize/*``): activations are *token-sharded* across
the expert axis (the DP×EP fused layout); each device sends every routed
(token, k) pair to the device owning its expert via
``jax.lax.ragged_all_to_all``, computes its local experts' grouped FFN,
and returns results by the reverse exchange. This moves tokens instead of
replicating them — the bandwidth-optimal regime when tokens ≪ experts'
weights (large-batch prefill, big EP meshes).

Static capacity: the receive buffer is sized for the worst case (every
rank routing all pairs to one device); real deployments cap it with a
capacity factor. Contrast with ``expert_parallel.fused_moe_ep`` (masked
local compute + psum), which is the better regime for replicated
activations / small decode batches.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from lvllm_tpu.layers.common import silu_and_mul
from lvllm_tpu.layers.moe import (MoEParams, grouped_expert_ffn,
                                  route_tokens)
from lvllm_tpu.parallel.mesh import AXIS_EXPERT


def _exclusive_cumsum(x, axis=-1):
    return jnp.cumsum(x, axis=axis) - x


def _ragged_a2a(operand, out_init, input_offsets, send_sizes,
                output_offsets, recv_sizes, *, emulate: bool):
    """lax.ragged_all_to_all, or an all_gather emulation for backends
    without the collective (XLA:CPU — used by the virtual test mesh)."""
    if not emulate:
        return jax.lax.ragged_all_to_all(
            operand, out_init, input_offsets, send_sizes, output_offsets,
            recv_sizes, axis_name=AXIS_EXPERT)
    ep = jax.lax.psum(1, AXIS_EXPERT)
    me = jax.lax.axis_index(AXIS_EXPERT)
    all_ops = jax.lax.all_gather(operand, AXIS_EXPERT)        # [ep, N, ...]
    all_in_off = jax.lax.all_gather(input_offsets, AXIS_EXPERT)  # [ep, ep]
    all_sz = jax.lax.all_gather(send_sizes, AXIS_EXPERT)         # [ep, ep]
    recv_offsets = _exclusive_cumsum(recv_sizes)
    out = out_init
    N = operand.shape[0]
    idx = jnp.arange(N)
    for r in range(ep):
        pos = idx - all_in_off[r, me]
        valid = (pos >= 0) & (pos < all_sz[r, me])
        dest = jnp.where(valid, recv_offsets[r] + pos, out_init.shape[0])
        out = out.at[dest].set(all_ops[r], mode="drop")
    return out


def fused_moe_ep_a2a(
    x: jax.Array,  # [T, H] — token-sharded over the expert axis
    params: MoEParams,
    mesh,
    top_k: int,
    norm_topk_prob: bool = True,
    scoring_fn: str = "softmax",
    ubatch: int = 1,
) -> jax.Array:
    """``ubatch > 1`` is the DBO analog (reference: UBatchContext 2-thread
    ping-pong, ``v1/worker/ubatching.py:20`` + docs/design/dbo.md): the
    local token slab splits into independent micro-batches whose
    dispatch→GEMM→combine chains carry no data dependency, so XLA's
    latency-hiding scheduler overlaps one ubatch's all-to-all with the
    other's expert GEMM — the SPMD expression of the reference's manual
    compute/comm interleave."""
    ep = mesh.shape[AXIS_EXPERT]
    quant = hasattr(params, "w1_q")
    if quant:
        from lvllm_tpu import envs
        from lvllm_tpu.layers.moe import _pick_tile_m
        from lvllm_tpu.ops.pallas import quant_gemm
        E = params.w1_q.shape[0]
        weights = (params.w1_q, params.w1_scales, params.w2_q,
                   params.w2_scales)
        use_pallas = jax.default_backend() in ("tpu", "axon") and \
            not envs.LVLLM_USE_REFERENCE_OPS
        gmm = (quant_gemm.grouped_quant_matmul if use_pallas
               else quant_gemm.grouped_quant_matmul_reference)
        tile_m = _pick_tile_m(x.shape[0], top_k)
    else:
        E = params.w1.shape[0]
        weights = (params.w1, params.w2)
    assert E % ep == 0
    E_local = E // ep
    emulate = jax.default_backend() not in ("tpu", "axon")

    def chain_fn(x, router, *w):
        if quant:
            w1_q, w1_s, w2_q, w2_s = w
        else:
            w1, w2 = w
        T_l, H = x.shape
        N = T_l * top_k
        C = N * ep  # worst-case receive capacity

        topk_w, topk_ids = route_tokens(x, router, top_k, norm_topk_prob,
                                        scoring_fn)
        flat_e = topk_ids.reshape(-1)
        target = flat_e // E_local                       # dest rank per pair
        order = jnp.argsort(target).astype(jnp.int32)
        x_send = x[order // top_k]                       # [N, H]
        e_send = flat_e[order].astype(jnp.int32)         # [N]

        send_sizes = jnp.bincount(target, length=ep)     # [ep]
        input_offsets = _exclusive_cumsum(send_sizes)

        # Full size matrix: all_sizes[r, j] = rank r sends to rank j.
        all_sizes = jax.lax.all_gather(send_sizes, AXIS_EXPERT)  # [ep, ep]
        me = jax.lax.axis_index(AXIS_EXPERT)
        recv_sizes = all_sizes[:, me]                    # [ep] from each rank
        # Receivers lay incoming slices out in sender-rank order.
        recv_offsets = _exclusive_cumsum(recv_sizes)
        # Where MY slice to rank j starts on j: after ranks < me.
        output_offsets = _exclusive_cumsum(all_sizes, axis=0)[me]

        def a2a(operand, out_init):
            return _ragged_a2a(operand, out_init, input_offsets, send_sizes,
                               output_offsets, recv_sizes, emulate=emulate)

        x_recv = a2a(x_send, jnp.zeros((C, H), x.dtype))
        e_recv = a2a(e_send[:, None],
                     jnp.full((C, 1), E, jnp.int32))[:, 0]

        # Compute local experts over received pairs. Sentinel rows (id
        # E_local) compute garbage that is never shipped back (send/recv
        # sizes exclude them).
        local_e = jnp.where(e_recv < E, e_recv - me * E_local, E_local)
        if quant:
            from lvllm_tpu.ops import moe_align
            d = moe_align.align_tokens(
                x_recv, jnp.clip(local_e, 0, E_local - 1)[:, None],
                E_local, tile_m)
            h = gmm(d.x_aligned, w1_q, w1_s, d.block_expert,
                    method=params.method, tile_m=tile_m,
                    group_size=params.group_size)
            h = silu_and_mul(h)
            y_al = gmm(h, w2_q, w2_s, d.block_expert,
                       method=params.method, tile_m=tile_m,
                       group_size=params.group_size)
            y_recv = y_al[d.pair_pos].astype(x.dtype)
        else:
            perm = jnp.argsort(local_e).astype(jnp.int32)
            xs = x_recv[perm]
            gs = jnp.bincount(jnp.clip(local_e, 0, E_local),
                              length=E_local + 1)
            ys = grouped_expert_ffn(xs, gs[:E_local], w1, w2)
            y_recv = jnp.zeros_like(ys).at[perm].set(ys)

        # Reverse exchange: my received slice from rank j goes back to j,
        # landing where j originally staged it (j's input_offsets[me] =
        # exclusive-cumsum of j's row of all_sizes at index me).
        rev_output_offsets = _exclusive_cumsum(all_sizes, axis=1)[:, me]
        y_back = _ragged_a2a(
            y_recv, jnp.zeros((N, H), y_recv.dtype), recv_offsets,
            recv_sizes, rev_output_offsets, send_sizes, emulate=emulate)

        # Un-permute pairs and combine with routing weights.
        y_pairs = jnp.zeros((N, H), y_back.dtype).at[order].set(y_back)
        y = jnp.einsum("tkh,tk->th", y_pairs.reshape(T_l, top_k, H),
                       topk_w.astype(y_back.dtype))
        return y.astype(x.dtype)

    def shard_fn(x, router, *w):
        n_ub = ubatch if x.shape[0] % max(ubatch, 1) == 0 else 1
        if n_ub <= 1:
            return chain_fn(x, router, *w)
        return jnp.concatenate(
            [chain_fn(xc, router, *w)
             for xc in jnp.split(x, n_ub, axis=0)])

    out = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(AXIS_EXPERT), P()) + (P(AXIS_EXPERT),) * len(weights),
        out_specs=P(AXIS_EXPERT),
        check_vma=False,
    )(x, params.router, *weights)

    if params.shared_w1 is not None:
        sh = silu_and_mul(x @ params.shared_w1) @ params.shared_w2
        if params.shared_gate is not None:
            sh = sh * jax.nn.sigmoid(
                (x @ params.shared_gate).astype(jnp.float32)).astype(sh.dtype)
        out = out + sh
    return out
