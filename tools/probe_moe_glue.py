"""Probe: prefill MoE glue attribution + candidate replacements (v5e).

r03 attribution: per layer, route 0.34 / align +0.64 / combine +0.5 ms —
2-3x the HBM roofline. Candidates:
  - align_gather: tiny int32 index scatter + row gather instead of the
    H-wide row scatter.
  - combine variants.

python tools/probe_moe_glue.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import lvllm_tpu
lvllm_tpu.enable_compile_cache()

from lvllm_tpu.ops import moe_align

T, H, E, TOPK = 2048, 2048, 64, 8
TILE_M = 128
ITERS = 128

_probe = jax.jit(lambda x: x.ravel()[0].astype(jnp.float32))


def measure_rtt(x) -> float:
    float(_probe(x))
    t0 = time.time()
    float(_probe(x))
    return time.time() - t0


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(i, carry):
            out = fn(carry, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.where(leaf.ravel()[0].astype(jnp.float32) == 1.5e38,
                             carry + 1, carry).astype(carry.dtype)
        return jax.lax.fori_loop(0, ITERS, body, a[0])

    r = run(*args)
    float(_probe(r))
    rtt = measure_rtt(r)
    t0 = time.time()
    r = run(*args)
    float(_probe(r))
    ms = (time.time() - t0 - rtt) / ITERS * 1000
    print(f"{name:<44} {ms:8.3f} ms", flush=True)
    return ms


def main():
    print(f"backend={jax.default_backend()} T={T} H={H} E={E} top{TOPK}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.bfloat16)
    router = jnp.asarray(rng.standard_normal((H, E)) * 0.3, jnp.float32)
    topk_ids = jnp.asarray(rng.integers(0, E, (T, TOPK)), jnp.int32)
    topk_w = jnp.asarray(rng.random((T, TOPK)), jnp.float32)

    from lvllm_tpu.layers.moe import route_tokens

    timeit("route_tokens", lambda x_: route_tokens(x_, router, TOPK), x)
    timeit("align_tokens (scatter)",
           lambda x_: moe_align.align_tokens(x_, topk_ids, E, TILE_M), x)

    # Candidate: index-scatter + row-gather align.
    def align_gather(x_, ids):
        K = TOPK
        N = T * K
        M_pad = moe_align.max_padded_rows(N, E, TILE_M)
        flat = ids.reshape(-1)
        onehot = (flat[:, None] ==
                  jnp.arange(E, dtype=flat.dtype)[None, :]).astype(jnp.int32)
        csum = jnp.cumsum(onehot, axis=0)
        counts = csum[-1]
        rank = jnp.take_along_axis(csum - onehot, flat[:, None], axis=1)[:, 0]
        padded = ((counts + TILE_M - 1) // TILE_M) * TILE_M
        offsets = jnp.cumsum(padded) - padded
        dest = (offsets[flat] + rank).astype(jnp.int32)
        src = jnp.full((M_pad,), T, jnp.int32).at[dest].set(
            jnp.arange(N, dtype=jnp.int32) // K)
        xp = jnp.concatenate([x_, jnp.zeros((1, H), x_.dtype)], axis=0)
        return xp[src]

    timeit("align_gather (idx scatter + row gather)", align_gather, x,
           topk_ids)

    # Pieces of align_gather.
    def just_cumsum(ids):
        flat = ids.reshape(-1)
        onehot = (flat[:, None] ==
                  jnp.arange(E, dtype=flat.dtype)[None, :]).astype(jnp.int32)
        csum = jnp.cumsum(onehot, axis=0)
        rank = jnp.take_along_axis(csum - onehot, flat[:, None], axis=1)[:, 0]
        return rank
    timeit("  sub: onehot cumsum + rank", lambda ids: just_cumsum(ids),
           topk_ids)

    def rank_two_level(ids, chunk=512):
        """rank via chunked cumsum: int8-ish inner one-hot cumsum within
        chunks + int32 chunk-offset prefix — O(N*E) traffic but the long
        scan runs over N/chunk rows instead of N."""
        flat = ids.reshape(-1)
        N = flat.shape[0]
        C = N // chunk
        f = flat.reshape(C, chunk)
        onehot = (f[:, :, None] ==
                  jnp.arange(E, dtype=flat.dtype)[None, None, :]
                  ).astype(jnp.int32)                       # [C, c, E]
        inner = jnp.cumsum(onehot, axis=1)                  # [C, c, E]
        chunk_tot = inner[:, -1, :]                         # [C, E]
        prefix = jnp.cumsum(chunk_tot, axis=0) - chunk_tot  # [C, E]
        csum_excl = inner - onehot + prefix[:, None, :]
        rank = jnp.take_along_axis(
            csum_excl.reshape(N, E), flat[:, None], axis=1)[:, 0]
        counts = chunk_tot.sum(0)
        return rank, counts
    timeit("  sub: two-level rank", lambda ids: rank_two_level(ids)[0],
           topk_ids)

    M_pad = moe_align.max_padded_rows(T * TOPK, E, TILE_M)
    src = jnp.asarray(rng.integers(0, T, (M_pad,)), jnp.int32)
    xp = jnp.concatenate([x, jnp.zeros((1, H), x.dtype)], axis=0)
    timeit("  sub: row gather [M_pad, H]", lambda xp_: xp_[src], xp)

    ya = jnp.asarray(rng.standard_normal((M_pad, H)) * 0.3, jnp.bfloat16)
    pair_pos = jnp.asarray(
        rng.permutation(M_pad)[:T * TOPK].astype(np.int32))
    timeit("combine_tokens (gather + einsum)",
           lambda ya_: moe_align.combine_tokens(ya_, pair_pos, topk_w,
                                                out_dtype=jnp.bfloat16), ya)

    def combine_sum(ya_):
        yp = ya_[pair_pos].reshape(T, TOPK, H).astype(jnp.float32)
        return (yp * topk_w[:, :, None]).sum(1).astype(jnp.bfloat16)
    timeit("combine variant: gather + bcast mul + sum", combine_sum, ya)


if __name__ == "__main__":
    main()
