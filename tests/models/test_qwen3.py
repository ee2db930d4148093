"""Tiny-model correctness: paged/chunked execution must match a single full
pass (the invariant the reference checks via HfRunner-vs-VllmRunner logprob
comparison, SURVEY.md §4 — here self-consistency replaces the HF oracle;
cross-framework parity is covered in tests/models/test_hf_parity.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvllm_tpu.config import ModelConfig
from lvllm_tpu.models.model_base import AttentionMetadata
from lvllm_tpu.models.registry import build_model
from lvllm_tpu.ops.kv_cache import new_kv_cache

pytestmark = pytest.mark.smoke


def tiny_config(moe=False):
    return ModelConfig(
        model="dummy",
        architecture="Qwen3MoeForCausalLM" if moe else "Qwen3ForCausalLM",
        dtype="float32",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_experts=8 if moe else 0,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        max_position_embeddings=256,
        max_model_len=256,
    )


def run_tokens(model, params, token_chunks, block_size=8, num_blocks=16):
    """Run chunks sequentially through the paged path; returns concatenated
    hidden states. Single request occupying blocks 1..n."""
    c = model.config
    caches = [model.make_layer_cache(i, num_blocks, block_size,
                                     jnp.float32, max_reqs=4)
              if hasattr(model, "make_layer_cache") else
              new_kv_cache(num_blocks, block_size, c.kv_cache_heads,
                           c.kv_cache_dim, jnp.float32)
              for i in range(c.num_hidden_layers)]
    total = sum(len(ch) for ch in token_chunks)
    max_blocks = -(-total // block_size)
    table = jnp.asarray([[i + 1 for i in range(max_blocks)]], jnp.int32)
    outs = []
    pos = 0
    for chunk in token_chunks:
        T = len(chunk)
        positions = jnp.arange(pos, pos + T, dtype=jnp.int32)
        slots = jnp.asarray(
            [(1 + (pos + i) // block_size) * block_size +
             (pos + i) % block_size for i in range(T)], jnp.int32)
        md = AttentionMetadata(
            query_start_loc=jnp.asarray([0, T], jnp.int32),
            seq_lens=jnp.asarray([pos + T], jnp.int32),
            block_table=table,
            slot_mapping=slots,
        )
        hidden, caches = model(params, jnp.asarray(chunk, jnp.int32),
                               positions, caches, md)
        outs.append(np.asarray(hidden))
        pos += T
    return np.concatenate(outs)


@pytest.mark.parametrize("moe", [False, True])
def test_chunked_matches_full(moe):
    cfg = tiny_config(moe)
    model = build_model(cfg)
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=24).tolist()

    full = run_tokens(model, params, [tokens])
    chunked = run_tokens(model, params, [tokens[:10], tokens[10:17],
                                         tokens[17:]])
    np.testing.assert_allclose(chunked, full, rtol=2e-4, atol=2e-4)

    # Logits shape and finiteness.
    logits = model.compute_logits(params, jnp.asarray(full))
    assert logits.shape == (24, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_routing_selects_topk():
    from lvllm_tpu.layers.moe import route_tokens
    rng = jax.random.key(1)
    x = jax.random.normal(rng, (5, 16))
    router = jax.random.normal(jax.random.key(2), (16, 8))
    w, ids = route_tokens(x, router, top_k=2)
    assert w.shape == (5, 2) and ids.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    assert (np.asarray(ids) < 8).all()


def test_moe_matches_dense_loop():
    """fused_moe (ragged_dot path) vs a naive per-token loop."""
    from lvllm_tpu.layers.moe import MoEParams, fused_moe, route_tokens
    T, H, I, E, K = 7, 16, 24, 4, 2
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((T, H)), jnp.float32)
    router = jnp.asarray(r.standard_normal((H, E)) * 0.5, jnp.float32)
    w1 = jnp.asarray(r.standard_normal((E, H, 2 * I)) * 0.1, jnp.float32)
    w2 = jnp.asarray(r.standard_normal((E, I, H)) * 0.1, jnp.float32)
    out = fused_moe(x, MoEParams(router=router, w1=w1, w2=w2), K)

    topk_w, topk_ids = route_tokens(x, router, K)
    expected = np.zeros((T, H), np.float32)
    for t in range(T):
        for k in range(K):
            e = int(topk_ids[t, k])
            h = np.asarray(x[t]) @ np.asarray(w1[e])
            gate, up = h[:I], h[I:]
            act = gate / (1 + np.exp(-gate)) * up
            expected[t] += float(topk_w[t, k]) * (act @ np.asarray(w2[e]))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-4)
