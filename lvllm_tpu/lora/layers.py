"""Batched multi-LoRA application (SGMV, TPU-style).

Counterpart of the reference's punica SGMV/BGMV Triton kernels
(``vllm/lora/ops/``) and per-layer LoRA wrappers (``vllm/lora/layers/``):
tokens from different requests carry different adapters; the shrink/expand
matmuls are grouped by adapter with ``lax.ragged_dot`` — the same
sort-by-group pattern as the MoE dispatch, so it rides the MXU with ragged
group boundaries instead of a hand-written gather kernel.

Adapter slot 0 is reserved as the null adapter (zero weights), so tokens
without LoRA flow through with no branching.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LoRAWeights(NamedTuple):
    """Stacked adapter weights for ONE target module.

    a: [M, H, r]  (shrink)  — slot 0 all-zero (null adapter)
    b: [M, r, N]  (expand)
    scale: [M]    — alpha/r per slot
    """

    a: jax.Array
    b: jax.Array
    scale: jax.Array


def apply_lora(
    x: jax.Array,           # [T, H]
    base_out: jax.Array,    # [T, N] frozen-weight projection output
    lw: LoRAWeights,
    token_adapter: jax.Array,  # [T] i32 adapter slot per token (0 = none)
) -> jax.Array:
    """base_out + scale * (x @ A[adapter]) @ B[adapter], batched by
    sorting tokens by adapter (SGMV)."""
    T = x.shape[0]
    M = lw.a.shape[0]
    order = jnp.argsort(token_adapter).astype(jnp.int32)
    group_sizes = jnp.bincount(token_adapter, length=M)
    x_sorted = x[order]
    shrink = jax.lax.ragged_dot(x_sorted, lw.a, group_sizes,
                                preferred_element_type=jnp.float32)
    shrink = shrink.astype(x.dtype)
    expand = jax.lax.ragged_dot(shrink, lw.b, group_sizes,
                                preferred_element_type=jnp.float32)
    scale_sorted = lw.scale[token_adapter[order]]
    expand = expand * scale_sorted[:, None]
    # Unsort and add.
    delta = jnp.zeros_like(expand).at[order].set(expand)
    return (base_out.astype(jnp.float32) + delta).astype(base_out.dtype)


def apply_lora_embedding(
    input_ids: jax.Array,    # [T] i32
    x: jax.Array,            # [T, H] base embedding output
    lw: LoRAWeights,         # a: [M, V, r], b: [M, r, H]
    token_adapter: jax.Array,  # [T] i32
) -> jax.Array:
    """Input-embedding adapter (reference: vllm/lora VocabParallel
    embedding wrapper): delta = A[slot, token] @ B[slot] — the one-hot
    shrink collapses to a row gather, so no SGMV needed."""
    a_tok = lw.a[token_adapter, input_ids]               # [T, r]
    delta = jnp.einsum("tr,trh->th", a_tok.astype(jnp.float32),
                       lw.b[token_adapter].astype(jnp.float32))
    delta = delta * lw.scale[token_adapter][:, None]
    return (x.astype(jnp.float32) + delta).astype(x.dtype)
