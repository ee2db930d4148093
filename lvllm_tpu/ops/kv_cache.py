"""Paged KV cache device ops.

TPU-native counterpart of the reference's ``csrc/cache_kernels.cu``
(``reshape_and_cache_flash``): scatter new K/V vectors into their paged
slots. Slot 0 lives in the reserved null block (block 0), so padded tokens
can safely target slot 0..block_size-1.

Layout choice: ``[num_blocks, block_size, num_kv_heads, head_dim]`` per K and
V, kept as one stacked array ``kv[2, ...]`` per layer so a layer's cache is a
single donated leaf in the jitted step.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def new_kv_cache(
    num_blocks: int,
    block_size: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Allocate one layer's paged KV cache: [2, num_blocks, block_size, H, D].
    Index 0 = K, 1 = V."""
    return jnp.zeros((2, num_blocks, block_size, num_kv_heads, head_dim),
                     dtype=dtype)


def write_kv(
    kv_cache: jax.Array,  # [2, num_blocks, block_size, H, D]
    key: jax.Array,       # [T, H, D]
    value: jax.Array,     # [T, H, D]
    slot_mapping: jax.Array,  # [T] flat slot = block_id*block_size + offset
) -> jax.Array:
    """Scatter new K/V into their slots; returns the updated cache.

    Pure XLA scatter — fuses well and is a single dynamic-update per step.
    Padded tokens must map into block 0 (the null block).
    """
    num_blocks, block_size = kv_cache.shape[1], kv_cache.shape[2]
    h, d = kv_cache.shape[3], kv_cache.shape[4]
    if key.shape[-1] < d:
        # Lane-padded cache (config.kv_cache_dim): zero-fill the pad.
        pad = [(0, 0)] * (key.ndim - 1) + [(0, d - key.shape[-1])]
        key = jnp.pad(key, pad)
        value = jnp.pad(value, pad)
    flat = kv_cache.reshape(2, num_blocks * block_size, h, d)
    kv_new = jnp.stack([key.astype(kv_cache.dtype),
                        value.astype(kv_cache.dtype)])
    flat = flat.at[:, slot_mapping].set(kv_new, mode="drop",
                                        unique_indices=False)
    return flat.reshape(kv_cache.shape)


def gather_kv_for_request(
    kv_cache: jax.Array,     # [2, num_blocks, block_size, H, D]
    block_table: jax.Array,  # [max_blocks_per_req]
) -> Tuple[jax.Array, jax.Array]:
    """Gather one request's K and V as contiguous [max_ctx, H, D] arrays."""
    pages = kv_cache[:, block_table]  # [2, nb, bs, H, D]
    nb, bs, h, d = pages.shape[1:]
    flat = pages.reshape(2, nb * bs, h, d)
    return flat[0], flat[1]
