"""Ragged paged attention vs a dense causal oracle.

Strategy mirrors the reference's kernel tests (tests/kernels/attention):
compare the paged op against a straightforward full-attention computation
over dtype/shape/GQA grids.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvllm_tpu.ops.attention import ragged_paged_attention_reference
from lvllm_tpu.ops.kv_cache import new_kv_cache, write_kv

pytestmark = pytest.mark.smoke


def dense_causal_attention(q, k, v, scale, start_pos, sliding_window=None):
    """Oracle: q [Tq,Hq,D] attends to k/v [Tc,Hkv,D]; query i sits at
    absolute position start_pos+i and sees keys [0, start_pos+i]."""
    Tq, Hq, D = q.shape
    Tc, Hkv, _ = k.shape
    G = Hq // Hkv
    qf = q.astype(np.float32).reshape(Tq, Hkv, G, D)
    kf = k.astype(np.float32)
    vf = v.astype(np.float32)
    scores = np.einsum("thgd,chd->thgc", qf, kf) * scale
    for i in range(Tq):
        limit = start_pos + i + 1
        scores[i, :, :, limit:] = -np.inf
        if sliding_window is not None:
            lo = max(0, limit - sliding_window)
            scores[i, :, :, :lo] = -np.inf
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    out = np.einsum("thgc,chd->thgd", np.asarray(probs), vf)
    return out.reshape(Tq, Hq, D)


def build_paged(keys, values, block_size, num_blocks, rng):
    """Scatter per-request K/V lists into a paged cache with random block
    tables."""
    n_req = len(keys)
    Hkv, D = keys[0].shape[1], keys[0].shape[2]
    cache = new_kv_cache(num_blocks, block_size, Hkv, D, jnp.float32)
    max_blocks = max((len(k) + block_size - 1) // block_size for k in keys)
    table = np.zeros((n_req, max_blocks), dtype=np.int32)
    # Assign random distinct blocks (skip null block 0).
    perm = rng.permutation(num_blocks - 1)[: n_req * max_blocks] + 1
    perm = perm.reshape(n_req, max_blocks)
    all_slots, all_k, all_v = [], [], []
    for r, (k, v) in enumerate(zip(keys, values)):
        nb = (len(k) + block_size - 1) // block_size
        table[r, :nb] = perm[r, :nb]
        for t in range(len(k)):
            blk = perm[r, t // block_size]
            all_slots.append(blk * block_size + t % block_size)
        all_k.append(k)
        all_v.append(v)
    cache = write_kv(cache, jnp.concatenate(all_k), jnp.concatenate(all_v),
                     jnp.asarray(all_slots, dtype=jnp.int32))
    return cache, jnp.asarray(table)


@pytest.mark.parametrize("gqa", [1, 4])
@pytest.mark.parametrize("sliding_window", [None, 16])
def test_mixed_prefill_decode_batch(gqa, sliding_window):
    rng = np.random.default_rng(0)
    Hkv, D, bs = 2, 32, 8
    Hq = Hkv * gqa
    scale = D ** -0.5
    # 3 requests: decode (ctx 20, 1 new), chunked prefill (ctx 33, 7 new),
    # fresh prefill (ctx 12 == new 12).
    ctx_lens = [20, 33, 12]
    q_lens = [1, 7, 12]

    keys = [jnp.asarray(rng.standard_normal((c, Hkv, D)), jnp.float32)
            for c in ctx_lens]
    values = [jnp.asarray(rng.standard_normal((c, Hkv, D)), jnp.float32)
              for c in ctx_lens]
    cache, table = build_paged(keys, values, bs, 64, rng)

    qs = [jnp.asarray(rng.standard_normal((n, Hq, D)), jnp.float32)
          for n in q_lens]
    T = sum(q_lens) + 3  # pad a few tokens
    q = jnp.concatenate(qs + [jnp.zeros((3, Hq, D), jnp.float32)])
    qsl = jnp.asarray(np.cumsum([0] + q_lens + [0, 0, 0])[:4], jnp.int32)
    qsl = jnp.concatenate([qsl])
    seq_lens = jnp.asarray(ctx_lens, jnp.int32)

    out = ragged_paged_attention_reference(
        q, cache, table, qsl, seq_lens, scale=scale,
        sliding_window=sliding_window)

    off = 0
    for r in range(3):
        expected = dense_causal_attention(
            np.asarray(qs[r]), np.asarray(keys[r]), np.asarray(values[r]),
            scale, ctx_lens[r] - q_lens[r], sliding_window)
        got = np.asarray(out[off:off + q_lens[r]])
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)
        off += q_lens[r]


def test_write_kv_scatter():
    cache = new_kv_cache(4, 4, 2, 8, jnp.float32)
    k = jnp.ones((3, 2, 8)) * jnp.asarray([1., 2., 3.])[:, None, None]
    v = -k
    slots = jnp.asarray([5, 6, 14], jnp.int32)  # block1 slots 1,2; block3 s2
    cache = write_kv(cache, k, v, slots)
    flat = np.asarray(cache).reshape(2, 16, 2, 8)
    assert flat[0, 5, 0, 0] == 1.0
    assert flat[0, 6, 1, 3] == 2.0
    assert flat[1, 14, 0, 0] == -3.0
    assert flat[0, 4].sum() == 0  # untouched


def test_padded_tokens_hit_null_block():
    cache = new_kv_cache(4, 4, 1, 8, jnp.float32)
    # Real token in block 1, padded tokens target block 0 slots.
    k = jnp.ones((4, 1, 8))
    v = jnp.ones((4, 1, 8))
    slots = jnp.asarray([4, 0, 1, 2], jnp.int32)
    cache = write_kv(cache, k, v, slots)
    assert np.asarray(cache)[0, 1, 0, 0, 0] == 1.0  # real write landed
