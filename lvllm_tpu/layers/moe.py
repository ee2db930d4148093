"""Fused MoE layer: router → grouped expert GEMM → weighted combine.

TPU-native counterpart of the reference's MoE stack
(``fused_moe/layer.py`` FusedMoE, ``runner/moe_runner.py``, Triton
``fused_moe.py``, CUDA ``moe_align_block_size``/``topk_softmax`` kernels):

- top-k softmax routing (router/*.py) → ``route_tokens``
- token permutation by expert (moe_align_block_size / permute kernels) →
  argsort + ``jax.lax.ragged_dot`` grouped GEMM, which XLA maps straight
  onto the MXU with ragged group boundaries — no hand-written alignment
  kernel needed.
- shared experts fused alongside (runner/shared_experts.py).

Expert parallelism (EP) adds a ragged all-to-all around the grouped GEMM —
see ``parallel/expert_parallel.py``.
"""

from typing import NamedTuple, Optional, Tuple

import dataclasses

import jax
import jax.numpy as jnp

from lvllm_tpu.layers.common import silu_and_mul


class MoEParams(NamedTuple):
    """One MoE layer's weights.

    w1: [E, H, 2I] fused gate+up ("w13" in the reference)
    w2: [E, I, H] down projection
    router: [H, E]
    """

    router: jax.Array
    w1: jax.Array
    w2: jax.Array
    router_bias: Optional[jax.Array] = None
    shared_w1: Optional[jax.Array] = None  # [H, 2I_s]
    shared_w2: Optional[jax.Array] = None  # [I_s, H]
    shared_gate: Optional[jax.Array] = None  # [H, 1] sigmoid gate
    w1_bias: Optional[jax.Array] = None  # [E, 2I] per-expert bias (gpt-oss)
    w2_bias: Optional[jax.Array] = None  # [E, H]


def route_tokens(
    x: jax.Array,             # [T, H]
    router: jax.Array,        # [H, E]
    top_k: int,
    norm_topk_prob: bool = True,
    scoring_fn: str = "softmax",
    router_bias: Optional[jax.Array] = None,
    e_score_bias: Optional[jax.Array] = None,
    scaling_factor: float = 1.0,
    n_group: int = 1,
    topk_group: int = 1,
    logit_softcap: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k routing → (weights [T, K] f32, expert_ids [T, K] i32).

    softmax-then-topk (Qwen) by default; sigmoid scoring with selection bias
    (DeepSeek-style e_score_correction_bias) supported — the bias affects
    selection only, weights use unbiased scores. Group-limited routing
    (DeepSeek-V3 noaux-tc: keep topk_group of n_group expert groups before
    the final top-k) applies when n_group > 1.
    """
    logits = jnp.einsum("th,he->te", x.astype(jnp.float32),
                        router.astype(jnp.float32))
    if router_bias is not None:
        logits = logits + router_bias.astype(jnp.float32)
    if logit_softcap:
        # Grok-1 router soft cap (reference grok1.py:230).
        logits = logit_softcap * jnp.tanh(logits / logit_softcap)
    if scoring_fn == "softmax_topk":
        # gpt-oss convention (HF GptOssTopKRouter): top-k on raw logits,
        # softmax over the k selected logits only.
        topk_logits, topk_ids = jax.lax.top_k(logits, top_k)
        topk_w = jax.nn.softmax(topk_logits, axis=-1)
        if scaling_factor != 1.0:
            topk_w = topk_w * scaling_factor
        return topk_w, topk_ids.astype(jnp.int32)
    if scoring_fn == "sigmoid_topk":
        # Llama4 convention (HF Llama4Router:138): top-k on raw logits,
        # weights = sigmoid of the selected logits, no renormalization.
        topk_logits, topk_ids = jax.lax.top_k(logits, top_k)
        topk_w = jax.nn.sigmoid(topk_logits)
        if scaling_factor != 1.0:
            topk_w = topk_w * scaling_factor
        return topk_w, topk_ids.astype(jnp.int32)
    if scoring_fn == "sparsemixer":
        # PhiMoE inference routing (modeling_phimoe.sparsemixer eval
        # path, jitter_eps=0.01): two rounds of eps-masked top-1, each
        # weighted by the softmax of its masked gates.
        assert top_k == 2, "sparsemixer is a top-2 scheme"
        eps = 0.01

        def one_round(sc):
            mx = jnp.max(sc, axis=-1, keepdims=True)
            factor = jnp.maximum(jnp.abs(sc), mx)
            drop = ((mx - sc) / factor) > (2 * eps)
            masked = jnp.where(drop, -jnp.inf, sc)
            sel = jnp.argmax(sc, axis=-1)
            gates = jax.nn.softmax(masked, axis=-1)
            w = jnp.take_along_axis(gates, sel[:, None], axis=-1)[:, 0]
            return sel.astype(jnp.int32), w

        e1, w1 = one_round(logits)
        logits2 = logits.at[jnp.arange(logits.shape[0]), e1].set(-jnp.inf)
        e2, w2 = one_round(logits2)
        return (jnp.stack([w1, w2], axis=-1),
                jnp.stack([e1, e2], axis=-1))
    if scoring_fn == "softmax":
        scores = jax.nn.softmax(logits, axis=-1)
    elif scoring_fn == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        raise ValueError(f"unknown scoring_fn {scoring_fn}")
    select_scores = scores if e_score_bias is None else scores + e_score_bias
    if n_group > 1:
        T, E = select_scores.shape
        gs = select_scores.reshape(T, n_group, E // n_group)
        # Group score = sum of the group's top-2 (V3 convention).
        top2 = jax.lax.top_k(gs, min(2, E // n_group))[0].sum(-1)  # [T, G]
        _, keep_groups = jax.lax.top_k(top2, topk_group)           # [T, tg]
        group_mask = jnp.zeros((T, n_group), bool).at[
            jnp.arange(T)[:, None], keep_groups].set(True)
        select_scores = jnp.where(
            jnp.repeat(group_mask, E // n_group, axis=-1),
            select_scores, -jnp.inf)
    _, topk_ids = jax.lax.top_k(select_scores, top_k)
    topk_w = jnp.take_along_axis(scores, topk_ids, axis=-1)
    if norm_topk_prob:
        topk_w = topk_w / jnp.clip(
            jnp.sum(topk_w, axis=-1, keepdims=True), 1e-9)
    if scaling_factor != 1.0:
        topk_w = topk_w * scaling_factor
    return topk_w, topk_ids.astype(jnp.int32)


def permute_for_experts(
    topk_ids: jax.Array,  # [T, K] i32
    num_experts: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sort (token, k) pairs by expert id.

    Returns (sort_order [T*K] — flat pair index per sorted position,
    group_sizes [E]). Counterpart of the reference's moe_align_block_size +
    permute kernels; here a single argsort the TPU sorts natively.
    """
    flat = topk_ids.reshape(-1)
    order = jnp.argsort(flat)  # stable
    group_sizes = jnp.bincount(flat, length=num_experts)
    return order.astype(jnp.int32), group_sizes.astype(jnp.int32)


def grouped_expert_ffn(
    x_sorted: jax.Array,     # [N, H] tokens sorted by expert
    group_sizes: jax.Array,  # [E]
    w1: jax.Array,           # [E, H, 2I]
    w2: jax.Array,           # [E, I, H]
    w1_bias: Optional[jax.Array] = None,   # [E, 2I]
    w2_bias: Optional[jax.Array] = None,   # [E, H]
    expert_sorted: Optional[jax.Array] = None,  # [N] expert id per row
    activation: str = "silu",
) -> jax.Array:
    """Gated FFN through per-expert weights via ragged grouped GEMM.
    Optional per-expert biases (gpt-oss) index by ``expert_sorted``."""
    from lvllm_tpu.layers.common import ACTIVATIONS
    act = ACTIVATIONS[activation]
    h = jax.lax.ragged_dot(x_sorted, w1, group_sizes,
                           preferred_element_type=jnp.float32)
    if w1_bias is not None:
        h = h + w1_bias[expert_sorted].astype(jnp.float32)
    h = act(h.astype(x_sorted.dtype))
    out = jax.lax.ragged_dot(h, w2, group_sizes,
                             preferred_element_type=jnp.float32)
    if w2_bias is not None:
        out = out + w2_bias[expert_sorted].astype(jnp.float32)
    return out.astype(x_sorted.dtype)


def fused_moe(
    x: jax.Array,  # [T, H]
    params: MoEParams,
    top_k: int,
    norm_topk_prob: bool = True,
    scoring_fn: str = "softmax",
    e_score_bias: Optional[jax.Array] = None,
    scaling_factor: float = 1.0,
    n_group: int = 1,
    topk_group: int = 1,
    activation: str = "silu",
    weight_on_input: bool = False,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    """Single-shard fused MoE forward (EP=1). ``weight_on_input``
    multiplies each routed token's INPUT by its routing weight (Llama4:
    routed_in = x * sigmoid(score), Llama4TextMoe.forward:157) instead of
    weighting the expert output — nonlinearly different through the
    swiglu, so it must match the checkpoint's convention."""
    T, H = x.shape
    E = params.w1.shape[0]
    topk_w, topk_ids = route_tokens(
        x, params.router, top_k, norm_topk_prob, scoring_fn,
        params.router_bias, e_score_bias, scaling_factor, n_group,
        topk_group, logit_softcap)

    order, group_sizes = permute_for_experts(topk_ids, E)
    token_of_pair = order // top_k              # [T*K]
    x_sorted = x[token_of_pair]                 # [T*K, H]
    if weight_on_input:
        pair_w = topk_w.reshape(-1)[order].astype(x_sorted.dtype)
        x_sorted = x_sorted * pair_w[:, None]
        topk_w = jnp.ones_like(topk_w)

    expert_sorted = None
    if params.w1_bias is not None or params.w2_bias is not None:
        expert_sorted = topk_ids.reshape(-1)[order]
    y_sorted = grouped_expert_ffn(
        x_sorted, group_sizes, params.w1, params.w2,
        w1_bias=params.w1_bias, w2_bias=params.w2_bias,
        expert_sorted=expert_sorted, activation=activation)

    # Unpermute and combine with routing weights.
    y_flat = jnp.zeros((T * top_k, H), dtype=y_sorted.dtype)
    y_flat = y_flat.at[order].set(y_sorted)
    y = jnp.einsum("tkh,tk->th", y_flat.reshape(T, top_k, H),
                   topk_w.astype(y_sorted.dtype))

    if params.shared_w1 is not None:
        sh = silu_and_mul(x @ params.shared_w1) @ params.shared_w2
        if params.shared_gate is not None:
            sh = sh * jax.nn.sigmoid(
                (x @ params.shared_gate).astype(jnp.float32)).astype(sh.dtype)
        y = y + sh
    return y.astype(x.dtype)


class QuantMoEParams(NamedTuple):
    """Quantized MoE layer weights (weight-only INT4/INT8/FP8; see
    ops/quant.py for layouts). Counterpart of the reference's quantized
    FusedMoE methods (compressed-tensors wNa16 / fp8, experts_int8)."""

    router: jax.Array
    w1_q: jax.Array
    w1_scales: jax.Array
    w2_q: jax.Array
    w2_scales: jax.Array
    method: str = "int8"
    group_size: int = 128
    router_bias: Optional[jax.Array] = None
    shared_w1: Optional[jax.Array] = None
    shared_w2: Optional[jax.Array] = None
    shared_gate: Optional[jax.Array] = None


def _pick_tile_m(num_tokens: int, top_k: int) -> int:
    """Row-block size for the grouped GEMM: small for decode batches (less
    expert padding), large for prefill (MXU-efficient tiles)."""
    pairs = num_tokens * top_k
    if pairs >= 2048:
        return 128
    if pairs >= 512:
        return 32
    return 8


def fused_moe_quant(
    x: jax.Array,  # [T, H]
    params: QuantMoEParams,
    top_k: int,
    norm_topk_prob: bool = True,
    scoring_fn: str = "softmax",
    e_score_bias: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    scaling_factor: float = 1.0,
    n_group: int = 1,
    topk_group: int = 1,
    weight_on_input: bool = False,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    """Quantized MoE forward: route → align → fused dequant grouped GEMM →
    combine (Pallas on TPU, dequant oracle elsewhere)."""
    from lvllm_tpu import envs
    from lvllm_tpu.ops import moe_align
    from lvllm_tpu.ops.pallas import quant_gemm

    T, H = x.shape
    E = params.w1_q.shape[0]
    if use_pallas is None:
        use_pallas = (not envs.LVLLM_USE_REFERENCE_OPS and
                      jax.default_backend() in ("tpu", "axon"))
    gmm = (quant_gemm.grouped_quant_matmul if use_pallas
           else quant_gemm.grouped_quant_matmul_reference)

    tile_m = _pick_tile_m(T, top_k)
    if (use_pallas and scoring_fn in ("softmax", "sigmoid")
            and n_group <= 1 and e_score_bias is None
            and logit_softcap is None):
        # One-launch routing (router GEMM → top-k → counting-sort rank):
        # the XLA route+rank pipeline cost ~0.40 ms/layer at prefill
        # width (ops/pallas/moe_route.py).
        from lvllm_tpu.ops.pallas import moe_route
        topk_w, topk_ids, rank, counts = moe_route.fused_route_rank(
            x, params.router, top_k, router_bias=params.router_bias,
            scoring_fn=scoring_fn, norm_topk_prob=norm_topk_prob,
            scaling_factor=scaling_factor)
        d = moe_align.align_tokens_from_rank(x, topk_ids, rank, counts,
                                             E, tile_m)
    else:
        topk_w, topk_ids = route_tokens(
            x, params.router, top_k, norm_topk_prob, scoring_fn,
            params.router_bias, e_score_bias, scaling_factor, n_group,
            topk_group, logit_softcap)
        d = moe_align.align_tokens(x, topk_ids, E, tile_m)
    if weight_on_input:
        # Llama4: weight the routed INPUT rows, combine with ones
        # (d.pair_pos maps each (token, k) pair to its aligned row).
        pw = jnp.zeros((d.x_aligned.shape[0],), jnp.float32)
        pw = pw.at[d.pair_pos].set(topk_w.reshape(-1))
        d = d._replace(x_aligned=(
            d.x_aligned * pw[:, None].astype(d.x_aligned.dtype)))
        topk_w = jnp.ones_like(topk_w)
    # Activation-quantized variants (reference: cutlass w8a8 /
    # compressed-tensors w8a8-int8): weights stored exactly as int8/int4;
    # activations get dynamic per-token symmetric int8 scales so both GEMM
    # operands ride the int8 MXU at 2x the bf16 rate. Decode row blocks
    # (tile_m < 32) stay on the weight-dequant path: they are HBM-bound,
    # so activation quant only adds VPU work (probed 0.11 → 0.20 ms at
    # batch-16 decode) while prefill tiles gain 17-23%
    # (tools/probe_ffn_a8.py) — and the unquantized-activation decode is
    # strictly closer to the f32 function, never further.
    act_quant = params.method in ("w8a8", "w4a8")
    wmethod = {"w8a8": "int8", "w4a8": "int4"}.get(params.method,
                                                   params.method)
    act_quant = act_quant and tile_m >= 32
    if (use_pallas and params.w1_q.ndim == 4 and params.w2_q.ndim == 4
            and wmethod in ("int4", "int8")):
        # Fused whole-FFN kernel: w1 GEMM → SiLU·mul → w2 GEMM in one
        # launch with a single uninterrupted weight stream per expert
        # (quant_gemm.grouped_quant_ffn_tiled).
        y_aligned = quant_gemm.grouped_quant_ffn_tiled(
            d.x_aligned, params.w1_q, params.w1_scales,
            params.w2_q, params.w2_scales, d.block_expert,
            method=wmethod, tile_m=tile_m,
            group_size=params.group_size, act_quant=act_quant)
    elif act_quant:
        # Oracle path keeps the activation-quant numerics (weight-only
        # fallback would silently change the computed function).
        y_aligned = quant_gemm.grouped_quant_ffn_reference(
            d.x_aligned, params.w1_q, params.w1_scales,
            params.w2_q, params.w2_scales, d.block_expert,
            method=wmethod, tile_m=tile_m,
            group_size=params.group_size, act_quant=True)
    else:
        h = gmm(d.x_aligned, params.w1_q, params.w1_scales, d.block_expert,
                method=wmethod, tile_m=tile_m,
                group_size=params.group_size)
        h = silu_and_mul(h)
        y_aligned = gmm(h, params.w2_q, params.w2_scales, d.block_expert,
                        method=wmethod, tile_m=tile_m,
                        group_size=params.group_size)
    y = moe_align.combine_tokens(y_aligned, d.pair_pos, topk_w,
                                 out_dtype=x.dtype)

    if params.shared_w1 is not None:
        sh = silu_and_mul(x @ params.shared_w1) @ params.shared_w2
        if params.shared_gate is not None:
            sh = sh * jax.nn.sigmoid(
                (x @ params.shared_gate).astype(jnp.float32)).astype(sh.dtype)
        y = y + sh
    return y.astype(x.dtype)
