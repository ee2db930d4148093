"""DCP math tests: sharded partial attention + LSE merge must equal full
attention exactly (reference: tests/distributed/test_context_parallel.py,
numerics of ops/common.py correction kernel)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvllm_tpu.ops.attention import ragged_paged_attention_reference
from lvllm_tpu.ops.context_parallel import (dcp_shard_seq_lens,
                                            merge_attention_partials,
                                            ragged_paged_attention_with_lse)
from lvllm_tpu.ops.kv_cache import new_kv_cache, write_kv


def test_dcp_shard_seq_lens():
    seq = jnp.asarray([10, 7, 16, 1])
    # 2 shards, interleave 1: round robin tokens.
    s0 = dcp_shard_seq_lens(seq, 0, 2)
    s1 = dcp_shard_seq_lens(seq, 1, 2)
    np.testing.assert_array_equal(np.asarray(s0), [5, 4, 8, 1])
    np.testing.assert_array_equal(np.asarray(s1), [5, 3, 8, 0])
    np.testing.assert_array_equal(np.asarray(s0 + s1), np.asarray(seq))


def test_merge_two_shards_equals_full_attention():
    """Split each request's KV tokens round-robin over 2 shards; merged
    partial attention must match attention over the full KV."""
    rng = np.random.default_rng(0)
    Hq, Hkv, D, bs = 4, 2, 32, 4
    scale = D ** -0.5
    ctx_lens = [11, 6]          # decode: 1 query per request
    R = len(ctx_lens)
    S = 2

    ks = [rng.standard_normal((c, Hkv, D)).astype(np.float32)
          for c in ctx_lens]
    vs = [rng.standard_normal((c, Hkv, D)).astype(np.float32)
          for c in ctx_lens]
    q = jnp.asarray(rng.standard_normal((R, Hq, D)), jnp.float32)
    qsl = jnp.asarray([0, 1, 2], jnp.int32)

    def build_cache(keys, values, lens):
        nb = 16
        cache = new_kv_cache(nb, bs, Hkv, D, jnp.float32)
        maxb = max(1, max(-(-l // bs) for l in lens))
        table = np.zeros((R, maxb), np.int32)
        slots, kk, vv = [], [], []
        next_block = 1
        for r in range(R):
            nblk = -(-max(lens[r], 1) // bs)
            table[r, :nblk] = range(next_block, next_block + nblk)
            for t in range(lens[r]):
                slots.append((next_block + t // bs) * bs + t % bs)
            next_block += nblk
            if lens[r]:
                kk.append(keys[r])
                vv.append(values[r])
        if slots:
            cache = write_kv(cache, jnp.asarray(np.concatenate(kk)),
                             jnp.asarray(np.concatenate(vv)),
                             jnp.asarray(slots, jnp.int32))
        return cache, jnp.asarray(table)

    # Full attention oracle.
    full_cache, full_table = build_cache(ks, vs, ctx_lens)
    expected = ragged_paged_attention_reference(
        q, full_cache, full_table, qsl, jnp.asarray(ctx_lens, jnp.int32),
        scale=scale)

    # Shard: token t of request r goes to shard t % 2, preserving order.
    outs, lses = [], []
    for s in range(S):
        lens_s = [len(range(s, c, S)) for c in ctx_lens]
        ks_s = [k[s::S] for k in ks]
        vs_s = [v[s::S] for v in vs]
        cache_s, table_s = build_cache(ks_s, vs_s, lens_s)
        o, l = ragged_paged_attention_with_lse(
            q, cache_s, table_s, qsl, jnp.asarray(lens_s, jnp.int32),
            scale=scale)
        outs.append(o)
        lses.append(l)

    merged = merge_attention_partials(jnp.stack(outs), jnp.stack(lses))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_merge_with_empty_shard():
    """A shard with zero local keys must not poison the merge (lse=-inf)."""
    T, Hq, D = 3, 2, 8
    rng = np.random.default_rng(1)
    out_real = jnp.asarray(rng.standard_normal((1, T, Hq, D)), jnp.float32)
    lse_real = jnp.asarray(rng.standard_normal((1, T, Hq)), jnp.float32)
    out_empty = jnp.zeros((1, T, Hq, D), jnp.float32)
    lse_empty = jnp.full((1, T, Hq), -jnp.inf, jnp.float32)
    merged = merge_attention_partials(
        jnp.concatenate([out_real, out_empty]),
        jnp.concatenate([lse_real, lse_empty]))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(out_real[0]),
                               rtol=1e-6)
    assert np.isfinite(np.asarray(merged)).all()


def test_lse_matches_reference_softmax():
    """Single shard with full KV: with_lse output equals the causal
    reference for decode tokens (q_len=1 ⇒ causal == full-context)."""
    rng = np.random.default_rng(2)
    Hq, Hkv, D, bs = 4, 2, 32, 4
    ctx = [9]
    k = [rng.standard_normal((9, Hkv, D)).astype(np.float32)]
    v = [rng.standard_normal((9, Hkv, D)).astype(np.float32)]
    cache = new_kv_cache(8, bs, Hkv, D, jnp.float32)
    slots = [bs + i for i in range(9)]  # blocks 1..3
    cache = write_kv(cache, jnp.asarray(k[0]), jnp.asarray(v[0]),
                     jnp.asarray(slots, jnp.int32))
    table = jnp.asarray([[1, 2, 3]], jnp.int32)
    q = jnp.asarray(rng.standard_normal((1, Hq, D)), jnp.float32)
    qsl = jnp.asarray([0, 1], jnp.int32)
    scale = D ** -0.5

    ref = ragged_paged_attention_reference(
        q, cache, table, qsl, jnp.asarray(ctx, jnp.int32), scale=scale)
    got, lse = ragged_paged_attention_with_lse(
        q, cache, table, qsl, jnp.asarray(ctx, jnp.int32), scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    assert np.isfinite(np.asarray(lse)).all()


def test_pcp_prefill_matches_full_attention():
    """PCP: sequence-sharded prefill attention == single-device causal."""
    import jax
    from lvllm_tpu.config import ParallelConfig
    from lvllm_tpu.parallel.mesh import make_mesh
    from lvllm_tpu.parallel.prefill_cp import pcp_prefill_attention

    mesh = make_mesh(ParallelConfig(tensor_parallel_size=4),
                     jax.devices()[:4])
    rng = np.random.default_rng(0)
    T, Hq, Hkv, D = 32, 4, 2, 32
    scale = D ** -0.5
    q = jnp.asarray(rng.standard_normal((T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, Hkv, D)), jnp.float32)

    # Oracle: dense causal attention.
    G = Hq // Hkv
    qf = np.asarray(q).reshape(T, Hkv, G, D)
    scores = np.einsum("thgd,chd->thgc", qf, np.asarray(k)) * scale
    for i in range(T):
        scores[i, :, :, i + 1:] = -np.inf
    probs = np.asarray(jax.nn.softmax(jnp.asarray(scores), axis=-1))
    expected = np.einsum("thgc,chd->thgd", probs,
                         np.asarray(v)).reshape(T, Hq, D)

    got = pcp_prefill_attention(q, k, v, mesh, scale)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5,
                               atol=2e-5)


def test_cascade_attention_matches_full():
    """Two-phase shared-prefix cascade == ordinary attention over the
    concatenated (prefix + suffix) context."""
    from lvllm_tpu.ops.cascade import cascade_attention, use_cascade_heuristic

    rng = np.random.default_rng(5)
    Hq, Hkv, D, bs = 4, 2, 32, 4
    scale = D ** -0.5
    P = 12                      # shared prefix length
    suffix_lens = [5, 9]        # per-request unique suffixes
    q_lens = [1, 3]             # decode + small chunk
    R = len(suffix_lens)

    prefix_k = rng.standard_normal((P, Hkv, D)).astype(np.float32)
    prefix_v = rng.standard_normal((P, Hkv, D)).astype(np.float32)
    suf_k = [rng.standard_normal((s, Hkv, D)).astype(np.float32)
             for s in suffix_lens]
    suf_v = [rng.standard_normal((s, Hkv, D)).astype(np.float32)
             for s in suffix_lens]

    T = sum(q_lens)
    q = jnp.asarray(rng.standard_normal((T, Hq, D)), jnp.float32)
    qsl = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)

    def paged(keys, values, lens):
        nb = 32
        cache = new_kv_cache(nb, bs, Hkv, D, jnp.float32)
        maxb = max(-(-l // bs) for l in lens)
        table = np.zeros((R, maxb), np.int32)
        slots, kk, vv = [], [], []
        nxt = 1
        for r in range(R):
            nblk = -(-lens[r] // bs)
            table[r, :nblk] = range(nxt, nxt + nblk)
            for t in range(lens[r]):
                slots.append((nxt + t // bs) * bs + t % bs)
            nxt += nblk
            kk.append(keys[r])
            vv.append(values[r])
        cache = write_kv(cache, jnp.asarray(np.concatenate(kk)),
                         jnp.asarray(np.concatenate(vv)),
                         jnp.asarray(slots, jnp.int32))
        return cache, jnp.asarray(table)

    # Oracle: full attention over prefix+suffix per request.
    full_k = [np.concatenate([prefix_k, s]) for s in suf_k]
    full_v = [np.concatenate([prefix_v, s]) for s in suf_v]
    full_lens = [P + s for s in suffix_lens]
    fc, ft = paged(full_k, full_v, full_lens)
    expected = ragged_paged_attention_reference(
        q, fc, ft, qsl, jnp.asarray(full_lens, jnp.int32), scale=scale)

    sc, st_tab = paged(suf_k, suf_v, suffix_lens)
    got = cascade_attention(
        q, jnp.asarray(prefix_k), jnp.asarray(prefix_v), sc, st_tab, qsl,
        jnp.asarray(suffix_lens, jnp.int32), scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)

    assert use_cascade_heuristic(16, 128, 16)
    assert not use_cascade_heuristic(2, 128, 16)
