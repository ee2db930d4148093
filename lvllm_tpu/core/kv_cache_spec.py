"""Declarative per-layer KV cache specs.

Counterpart of the reference's KV cache spec system
(``vllm/v1/kv_cache_interface.py`` — ``KVCacheSpec``/``FullAttentionSpec:164``
/``MLAAttentionSpec:313``/``SlidingWindowSpec:404``/``MambaSpec:521``/
``UniformTypeKVCacheSpecs:623``): each layer *declares* what cache it needs;
allocation, memory accounting and grouping derive from the declarations
instead of being hard-coded per model. TPU reshape: a paged spec maps to one
``[2, NB, BS, H, D]`` donated array; constant-size recurrent state (GDN/
mamba) maps to per-request-slot arrays, not pages.
"""

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class KVCacheSpec:
    """Base: one attention layer's cache declaration."""

    def bytes_per_block(self, block_size: int) -> int:
        """HBM bytes one page of ``block_size`` tokens costs (0 for
        non-paged state)."""
        raise NotImplementedError

    def fixed_bytes(self, max_reqs: int) -> int:
        """HBM bytes of constant (non-paged, per-request-slot) state."""
        return 0

    def make(self, num_blocks: int, block_size: int, max_reqs: int):
        """Allocate the layer's cache leaf (array or dict of arrays)."""
        raise NotImplementedError

    @property
    def type_key(self) -> str:
        """Grouping key (reference: UniformTypeKVCacheSpecs) — layers with
        equal keys can share one pool."""
        return type(self).__name__


@dataclass(frozen=True)
class FullAttentionSpec(KVCacheSpec):
    """Paged K/V for full (causal) attention."""

    num_kv_heads: int
    head_dim: int
    dtype: Any = jnp.bfloat16

    def bytes_per_block(self, block_size: int) -> int:
        return (2 * block_size * self.num_kv_heads * self.head_dim *
                jnp.dtype(self.dtype).itemsize)

    def make(self, num_blocks: int, block_size: int, max_reqs: int):
        from lvllm_tpu.ops.kv_cache import new_kv_cache
        return new_kv_cache(num_blocks, block_size, self.num_kv_heads,
                            self.head_dim, self.dtype)

    @property
    def type_key(self) -> str:
        return (f"full.{self.num_kv_heads}x{self.head_dim}."
                f"{jnp.dtype(self.dtype).name}")


@dataclass(frozen=True)
class SlidingWindowSpec(FullAttentionSpec):
    """Same page layout; the window bound allows freeing out-of-window
    blocks (reference SlidingWindowSpec — eviction is a manager-level
    optimization layered on the same pool)."""

    sliding_window: int = 0

    @property
    def type_key(self) -> str:
        return super().type_key + f".swa{self.sliding_window}"


@dataclass(frozen=True)
class MLAAttentionSpec(FullAttentionSpec):
    """Latent-plane cache: one 'head' of padded (c_kv ‖ k_pe) per token
    (reference MLAAttentionSpec; kv_cache_dim padding in config.py)."""


@dataclass(frozen=True)
class Int4KVSpec(KVCacheSpec):
    """4-bit paged K/V + per-(token, head) f32 scales in a two-leaf dict
    {packed [2, NB, BS, H*D//2] int8, scales [2, NB, BS, H] f32}
    (reference: turboquant_4bit kv_cache_dtype, config.yaml:22).
    ~3.5x bf16 token capacity at H=4, D=128; the read path is the Pallas
    in-DMA-dequant kernel (ops/pallas/int4_attention.py)."""

    num_kv_heads: int
    head_dim: int

    def bytes_per_block(self, block_size: int) -> int:
        return 2 * block_size * self.num_kv_heads * (self.head_dim // 2
                                                     + 4)

    def make(self, num_blocks: int, block_size: int, max_reqs: int):
        from lvllm_tpu.ops.kv_cache_int4 import new_kv_cache_int4
        return new_kv_cache_int4(num_blocks, block_size,
                                 self.num_kv_heads, self.head_dim)

    @property
    def type_key(self) -> str:
        return f"int4kv.{self.num_kv_heads}x{self.head_dim}"


@dataclass(frozen=True)
class NullSpec(KVCacheSpec):
    """No per-layer cache (NemotronH MLP/MoE-only layers): a 1-element
    placeholder leaf keeps the per-layer cache list uniform."""

    def bytes_per_block(self, block_size: int) -> int:
        return 0

    def make(self, num_blocks: int, block_size: int, max_reqs: int):
        return jnp.zeros((1,), jnp.float32)


@dataclass(frozen=True)
class PairSpec(KVCacheSpec):
    """Two independent sub-caches in one dict leaf — LongcatFlash's
    dual-sublayer layers carry one MLA cache per attention sublayer
    (reference: models/longcat_flash.py layer_idx*2 + i sub-caches)."""

    keys: Tuple[str, ...]
    specs: Tuple[KVCacheSpec, ...]

    def bytes_per_block(self, block_size: int) -> int:
        return sum(s.bytes_per_block(block_size) for s in self.specs)

    def fixed_bytes(self, max_reqs: int) -> int:
        return sum(s.fixed_bytes(max_reqs) for s in self.specs)

    def make(self, num_blocks: int, block_size: int, max_reqs: int):
        return {k: s.make(num_blocks, block_size, max_reqs)
                for k, s in zip(self.keys, self.specs)}

    @property
    def type_key(self) -> str:
        return "pair." + ".".join(s.type_key for s in self.specs)


@dataclass(frozen=True)
class LinearAttentionSpec(KVCacheSpec):
    """Constant-size recurrent state per request slot (GDN conv + delta
    state; reference MambaSpec shape tuple)."""

    conv_dim: int
    conv_width: int
    num_v_heads: int
    k_head_dim: int
    v_head_dim: int

    def bytes_per_block(self, block_size: int) -> int:
        return 0

    def fixed_bytes(self, max_reqs: int) -> int:
        slots = max_reqs + 1  # +1 scratch slot
        conv = slots * self.conv_dim * (self.conv_width - 1) * 4
        rec = slots * self.num_v_heads * self.k_head_dim * \
            self.v_head_dim * 4
        return conv + rec

    def make(self, num_blocks: int, block_size: int, max_reqs: int):
        return {
            "conv": jnp.zeros((max_reqs + 1, self.conv_dim,
                               self.conv_width - 1), jnp.float32),
            "rec": jnp.zeros((max_reqs + 1, self.num_v_heads,
                              self.k_head_dim, self.v_head_dim),
                             jnp.float32),
        }

    @property
    def type_key(self) -> str:
        return (f"linear.{self.conv_dim}x{self.conv_width}."
                f"{self.num_v_heads}x{self.k_head_dim}x{self.v_head_dim}")


def group_specs(specs: List[KVCacheSpec]) -> Dict[str, List[int]]:
    """Layer indices grouped by spec type (reference:
    KVCacheCoordinator group formation)."""
    groups: Dict[str, List[int]] = {}
    for i, s in enumerate(specs):
        groups.setdefault(s.type_key, []).append(i)
    return groups


def page_bytes_per_block(specs: List[KVCacheSpec], block_size: int) -> int:
    return sum(s.bytes_per_block(block_size) for s in specs)


def fixed_state_bytes(specs: List[KVCacheSpec], max_reqs: int) -> int:
    return sum(s.fixed_bytes(max_reqs) for s in specs)


def num_blocks_for_budget(specs: List[KVCacheSpec], block_size: int,
                          budget_bytes: float, max_reqs: int) -> int:
    """Blocks fitting a byte budget after constant state is carved out
    (reference: EngineCore._initialize_kv_caches sizing)."""
    per_block = page_bytes_per_block(specs, block_size)
    if per_block <= 0:
        return 0
    avail = budget_bytes - fixed_state_bytes(specs, max_reqs)
    return max(int(avail // per_block), 0)
