"""Pallas ragged attention vs the jnp reference oracle.

Runs in interpret mode on CPU (the driver/TPU runs it compiled; see
tests/tpu/ for on-hardware checks).
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvllm_tpu.ops.attention import ragged_paged_attention_reference
from lvllm_tpu.ops.kv_cache import new_kv_cache, write_kv
from lvllm_tpu.ops.pallas import ragged_attention as ra


def setup_case(rng, ctx_lens, q_lens, Hq, Hkv, D, bs, num_blocks, T_pad=None):
    R = len(ctx_lens)
    cache = new_kv_cache(num_blocks, bs, Hkv, D, jnp.float32)
    maxb = max(-(-c // bs) for c in ctx_lens)
    table = np.zeros((R, maxb), dtype=np.int32)
    perm = rng.permutation(num_blocks - 1)[: R * maxb] + 1
    perm = perm.reshape(R, maxb)
    ks, vs, slots = [], [], []
    for r, c in enumerate(ctx_lens):
        nb = -(-c // bs)
        table[r, :nb] = perm[r, :nb]
        k = rng.standard_normal((c, Hkv, D)).astype(np.float32)
        v = rng.standard_normal((c, Hkv, D)).astype(np.float32)
        ks.append(k)
        vs.append(v)
        for t in range(c):
            slots.append(perm[r, t // bs] * bs + t % bs)
    cache = write_kv(cache, jnp.asarray(np.concatenate(ks)),
                     jnp.asarray(np.concatenate(vs)),
                     jnp.asarray(slots, jnp.int32))
    T = sum(q_lens)
    T_pad = T_pad or T
    q = np.zeros((T_pad, Hq, D), np.float32)
    q[:T] = rng.standard_normal((T, Hq, D))
    qsl = np.zeros(R + 1, np.int32)
    qsl[1:R + 1] = np.cumsum(q_lens)
    return (jnp.asarray(q), cache, jnp.asarray(table), jnp.asarray(qsl),
            jnp.asarray(ctx_lens, jnp.int32))


def run_both(rng, ctx_lens, q_lens, Hq=4, Hkv=2, D=128, bs=16,
             num_blocks=64, sliding_window=None, soft_cap=None, T_pad=None,
             sinks=None, alibi=None):
    q, cache, table, qsl, seq_lens = setup_case(
        rng, ctx_lens, q_lens, Hq, Hkv, D, bs, num_blocks, T_pad)
    scale = D ** -0.5
    ref = ragged_paged_attention_reference(
        q, cache, table, qsl, seq_lens, scale=scale,
        sliding_window=sliding_window, logits_soft_cap=soft_cap,
        sinks=sinks, alibi_slopes=alibi)
    with pltpu_interpret():
        got = ra.ragged_paged_attention_pallas(
            q, cache, table, qsl, seq_lens, scale=scale,
            sliding_window=sliding_window, logits_soft_cap=soft_cap,
            sinks=sinks, alibi_slopes=alibi)
    T = sum(q_lens)
    np.testing.assert_allclose(np.asarray(got[:T]), np.asarray(ref[:T]),
                               rtol=2e-4, atol=2e-4)
    # Padded tail rows must be zero.
    if got.shape[0] > T:
        assert np.abs(np.asarray(got[T:])).max() == 0.0


class pltpu_interpret:
    def __enter__(self):
        from jax.experimental.pallas import tpu as pltpu
        self._cm = pltpu.force_tpu_interpret_mode()
        self._cm.__enter__()

    def __exit__(self, *a):
        self._cm.__exit__(*a)


def test_decode_only():
    rng = np.random.default_rng(0)
    run_both(rng, ctx_lens=[20, 33, 7, 64], q_lens=[1, 1, 1, 1])


def test_prefill_only():
    rng = np.random.default_rng(1)
    run_both(rng, ctx_lens=[40], q_lens=[40])


def test_mixed_batch_with_padding():
    rng = np.random.default_rng(2)
    run_both(rng, ctx_lens=[20, 33, 12], q_lens=[1, 7, 12], T_pad=32)


def test_chunked_prefill_tail():
    # Query segment is a suffix of a longer context (chunked prefill).
    rng = np.random.default_rng(3)
    run_both(rng, ctx_lens=[50], q_lens=[18])


def test_gqa_8():
    rng = np.random.default_rng(4)
    run_both(rng, ctx_lens=[17, 65], q_lens=[1, 9], Hq=8, Hkv=1)


def test_sliding_window():
    rng = np.random.default_rng(5)
    run_both(rng, ctx_lens=[60, 30], q_lens=[4, 1], sliding_window=16)


def test_soft_cap():
    rng = np.random.default_rng(6)
    run_both(rng, ctx_lens=[25], q_lens=[5], soft_cap=30.0)


def test_multi_chunk_context():
    # seq_len spans several 128-token DMA chunks.
    rng = np.random.default_rng(7)
    run_both(rng, ctx_lens=[300, 150], q_lens=[1, 3], num_blocks=64)


def test_device_tile_metadata_matches_host():
    qsl = np.asarray([0, 1, 8, 20, 20], np.int32)  # 4 reqs, last inactive
    T, R = 24, 4
    NT = ra.num_tiles_upper_bound(T, R)
    h_req, h_qpos, h_tok = ra.build_tile_metadata(qsl, NT)
    d_req, d_qpos, d_tok = ra.device_tile_metadata(jnp.asarray(qsl), T, R)
    np.testing.assert_array_equal(h_req, np.asarray(d_req))
    np.testing.assert_array_equal(h_qpos, np.asarray(d_qpos))
    np.testing.assert_array_equal(h_tok, np.asarray(d_tok))


def test_attention_sinks():
    # gpt-oss sinks: per-head logit in every softmax denominator.
    rng = np.random.default_rng(8)
    sinks = jnp.asarray(rng.standard_normal(4).astype(np.float32) * 2.0)
    run_both(rng, ctx_lens=[20, 33, 7], q_lens=[1, 5, 1], sinks=sinks)


def test_sinks_with_sliding_window():
    rng = np.random.default_rng(9)
    sinks = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    run_both(rng, ctx_lens=[60, 30], q_lens=[4, 1], Hq=8, Hkv=2,
             sliding_window=16, sinks=sinks)


def test_sliding_window_long_context_chunk_skip():
    # Window much smaller than context: the kernel must skip the
    # out-of-window DMA chunks and still match the oracle.
    rng = np.random.default_rng(10)
    run_both(rng, ctx_lens=[600, 350], q_lens=[1, 3], num_blocks=80,
             sliding_window=32)


def test_alibi():
    # ALiBi slopes (Bloom/MPT/Baichuan-13B): distance bias on the logits.
    rng = np.random.default_rng(11)
    from lvllm_tpu.ops.attention import alibi_slopes
    run_both(rng, ctx_lens=[20, 33, 7], q_lens=[1, 5, 1],
             alibi=alibi_slopes(4))


def test_alibi_multi_chunk():
    rng = np.random.default_rng(12)
    from lvllm_tpu.ops.attention import alibi_slopes
    run_both(rng, ctx_lens=[300, 150], q_lens=[4, 1], Hq=8, Hkv=2,
             num_blocks=48, alibi=alibi_slopes(8))


def test_lse_output_matches_jnp():
    """want_lse: kernel (out, lse) == the jnp partial-attention oracle
    (causal local semantics used by cascade suffixes / DCP decode)."""
    from lvllm_tpu.ops.context_parallel import \
        ragged_paged_attention_with_lse
    rng = np.random.default_rng(6)
    q, cache, table, qsl, seq_lens = setup_case(
        rng, ctx_lens=[20, 33, 7], q_lens=[1, 5, 1], Hq=4, Hkv=2, D=128,
        bs=16, num_blocks=64)
    scale = 128 ** -0.5
    ref_o, ref_l = ragged_paged_attention_with_lse(
        q, cache, table, qsl, seq_lens, scale=scale, use_pallas=False)
    with pltpu_interpret():
        got_o, got_l = ra.ragged_paged_attention_pallas(
            q, cache, table, qsl, seq_lens, scale=scale, want_lse=True)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("window,alibi_on", [(None, False), (24, False),
                                             (None, True)])
def test_klen_mode_matches_partial_oracle(window, alibi_on):
    """Explicit-klen mode (DCP page interleave, CP=2 shard 1): masks and
    ALiBi biases over GLOBAL key positions must match the jnp oracle."""
    from lvllm_tpu.ops.attention import _token_request_map, alibi_slopes
    from lvllm_tpu.ops.context_parallel import (
        _partial_attention_token_klen, dcp_shard_seq_lens)
    rng = np.random.default_rng(7)
    Hq, Hkv, D, bs = 4, 2, 128, 16
    CP, shard = 2, 1
    # Local shard view: ctx_lens are LOCAL key counts per request.
    local_ctx = [32, 16]
    q_lens = [1, 1]
    q, cache, table, qsl, local_lens = setup_case(
        rng, local_ctx, q_lens, Hq, Hkv, D, bs, num_blocks=64)
    # Global positions: local count c on shard s means global seq len
    # covers pages interleaved; choose gpos so that
    # dcp_shard_seq_lens(gpos+1, shard, CP, bs) == local_ctx.
    gpos = np.asarray([63, 31], np.int32)   # 64 → 32 local, 32 → 16 local
    for r in range(2):
        got = int(dcp_shard_seq_lens(jnp.asarray([gpos[r] + 1]), shard,
                                     CP, interleave=bs)[0])
        assert got == local_ctx[r], (r, got)
    T = sum(q_lens)
    req_idx = _token_request_map(qsl, T, 2)
    klen = jnp.asarray(local_ctx, jnp.int32)[req_idx]
    token_gpos = jnp.asarray(gpos, jnp.int32)[req_idx]
    C = table.shape[1] * bs
    c_idx = np.arange(C, dtype=np.int32)
    col_global = jnp.asarray(((c_idx // bs) * CP + shard) * bs
                             + c_idx % bs)
    slopes = alibi_slopes(Hq) if alibi_on else None
    scale = D ** -0.5
    ref_o, ref_l = _partial_attention_token_klen(
        q, cache, table, req_idx, klen, scale, sliding_window=window,
        global_pos=token_gpos, col_global=col_global,
        alibi_slopes=slopes)
    with pltpu_interpret():
        got_o, got_l = ra.ragged_paged_attention_pallas(
            q, cache, table, qsl, local_lens, scale=scale,
            sliding_window=window, alibi_slopes=slopes, want_lse=True,
            token_klen=klen, token_gpos=token_gpos, cp_shards=CP,
            shard_idx=jnp.asarray(shard, jnp.int32))
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l),
                               rtol=2e-4, atol=2e-4)


def test_prefix_lm_klen_mode():
    """Prefix-LM (PaliGemma): bidirectional prefix via the klen scalar
    path, multi-tile (NT > 1 — the old VMEM klen layout only lowered at
    one tile)."""
    from lvllm_tpu.ops.attention import _token_request_map

    rng = np.random.default_rng(11)
    ctx_lens = [24, 17]
    q_lens = [24, 17]
    q, cache, table, qsl, seq_lens = setup_case(
        rng, ctx_lens, q_lens, 4, 2, 128, 16, 64)
    scale = 128 ** -0.5
    prefix = jnp.asarray([10, 17], jnp.int32)
    ref = ragged_paged_attention_reference(
        q, cache, table, qsl, seq_lens, scale=scale, prefix_lens=prefix)
    T = sum(q_lens)
    req_idx = _token_request_map(qsl, T, 2)
    pos_in_q = jnp.arange(T, dtype=jnp.int32) - qsl[req_idx]
    gpos = seq_lens[req_idx] - (qsl[req_idx + 1] - qsl[req_idx]) + pos_in_q
    klen = jnp.maximum(gpos + 1,
                       jnp.minimum(prefix[req_idx], seq_lens[req_idx]))
    with pltpu_interpret():
        got = ra.ragged_paged_attention_pallas(
            q, cache, table, qsl, seq_lens, scale=scale,
            token_klen=klen, token_gpos=gpos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
