"""DCP engine wiring tests (reference: decode context parallel,
config/parallel.py:308-331 + LSE merge ops/common.py): the context-sharded
write+attend+merge op and the end-to-end engine path must match the
single-shard implementation exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ParallelConfig, SchedulerConfig)
from lvllm_tpu.ops.attention import ragged_paged_attention_reference
from lvllm_tpu.ops.context_parallel import dcp_write_and_attend
from lvllm_tpu.ops.kv_cache import new_kv_cache, write_kv
from lvllm_tpu.parallel.mesh import make_mesh
from lvllm_tpu.sampling_params import SamplingParams


def _dcp_slots(tok_pos, blocks, bs, cp):
    """Per-shard slot mapping exactly as the model runner builds it."""
    owner = (tok_pos // bs) % cp
    lslot = blocks[tok_pos // (bs * cp)] * bs + tok_pos % bs
    return np.stack([np.where(owner == s, lslot, tok_pos % bs)
                     for s in range(cp)]).astype(np.int32)


def test_dcp_op_prefill_then_decode_matches_reference():
    """Prefill a ragged 2-request batch through the DCP op, then decode one
    step reusing the returned sharded cache; both steps must match the
    single-cache reference attention."""
    cp = 2
    mesh = make_mesh(ParallelConfig(decode_context_parallel_size=cp),
                     jax.devices()[:cp])
    rng = np.random.default_rng(0)
    Hq, Hkv, D, bs = 4, 2, 32, 4
    scale = D ** -0.5
    ctx = [11, 6]
    R = len(ctx)
    T = sum(ctx)
    maxb_dcp = 4          # super-pages of bs*cp=8 tokens
    maxb_full = 8

    q = rng.standard_normal((T, Hq, D)).astype(np.float32)
    k = rng.standard_normal((T, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((T, Hkv, D)).astype(np.float32)
    positions = np.concatenate([np.arange(c) for c in ctx]).astype(np.int32)
    qsl = np.asarray([0, ctx[0], T], np.int32)

    # Block tables: pool pages 1.. (block 0 = null block).
    table_dcp = np.zeros((R, maxb_dcp), np.int32)
    table_dcp[0, :2] = [1, 2]
    table_dcp[1, :1] = [3]
    table_full = np.zeros((R, maxb_full), np.int32)
    table_full[0, :3] = [1, 2, 3]
    table_full[1, :2] = [4, 5]

    # DCP path.
    dcp_cache = jnp.zeros((cp, 2, 8, bs, Hkv, D), jnp.float32)
    slots = np.concatenate(
        [_dcp_slots(np.arange(c), table_dcp[r], bs, cp) for r, c in
         enumerate(ctx)], axis=1)
    out_dcp, dcp_cache = dcp_write_and_attend(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), dcp_cache,
        jnp.asarray(table_dcp), jnp.asarray(positions), jnp.asarray(qsl),
        jnp.asarray(slots), mesh, scale)

    # Reference path.
    full_cache = new_kv_cache(16, bs, Hkv, D, jnp.float32)
    full_slots = np.concatenate([
        table_full[r][np.arange(c) // bs] * bs + np.arange(c) % bs
        for r, c in enumerate(ctx)]).astype(np.int32)
    full_cache = write_kv(full_cache, jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(full_slots))
    out_ref = ragged_paged_attention_reference(
        jnp.asarray(q), full_cache, jnp.asarray(table_full),
        jnp.asarray(qsl), jnp.asarray(ctx, jnp.int32), scale=scale)
    np.testing.assert_allclose(np.asarray(out_dcp), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)

    # Decode step: one new token per request at position ctx[r].
    q2 = rng.standard_normal((R, Hq, D)).astype(np.float32)
    k2 = rng.standard_normal((R, Hkv, D)).astype(np.float32)
    v2 = rng.standard_normal((R, Hkv, D)).astype(np.float32)
    pos2 = np.asarray(ctx, np.int32)
    qsl2 = np.asarray([0, 1, 2], np.int32)
    slots2 = np.concatenate(
        [_dcp_slots(np.asarray([ctx[r]]), table_dcp[r], bs, cp)
         for r in range(R)], axis=1)
    out2_dcp, _ = dcp_write_and_attend(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2), dcp_cache,
        jnp.asarray(table_dcp), jnp.asarray(pos2), jnp.asarray(qsl2),
        jnp.asarray(slots2), mesh, scale)

    full_slots2 = np.asarray(
        [table_full[r][ctx[r] // bs] * bs + ctx[r] % bs for r in range(R)],
        np.int32)
    full_cache = write_kv(full_cache, jnp.asarray(k2), jnp.asarray(v2),
                          jnp.asarray(full_slots2))
    out2_ref = ragged_paged_attention_reference(
        jnp.asarray(q2), full_cache, jnp.asarray(table_full),
        jnp.asarray(qsl2), jnp.asarray([c + 1 for c in ctx], jnp.int32),
        scale=scale)
    np.testing.assert_allclose(np.asarray(out2_dcp), np.asarray(out2_ref),
                               rtol=2e-5, atol=2e-5)


def test_dcp_engine_matches_single_device():
    """Greedy generation with dcp=2 must match the unsharded engine."""
    from lvllm_tpu.engine.llm_engine import LLMEngine

    def build(mesh, pc):
        mc = ModelConfig(
            model="dummy", architecture="Qwen3MoeForCausalLM",
            dtype="float32", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, num_experts=4,
            num_experts_per_tok=2, moe_intermediate_size=64,
            max_position_embeddings=256, max_model_len=128, eos_token_id=-1)
        cfg = EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=4, num_gpu_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=64, max_num_seqs=4,
                max_model_len=128),
            parallel_config=pc or ParallelConfig(),
        )
        return LLMEngine(cfg, load_format="dummy", mesh=mesh)

    def run(engine):
        sp = SamplingParams(temperature=0.0, max_tokens=10)
        engine.add_request("r0", [1, 2, 3, 4, 5, 6, 7], sp)
        engine.add_request("r1", list(range(9, 22)), sp)
        toks = {}
        for _ in range(40):
            for o in engine.step():
                if o.finished:
                    toks[o.request_id] = o.outputs[0].token_ids
            if len(toks) == 2:
                break
        return toks

    single = run(build(None, None))
    assert len(single) == 2
    pc = ParallelConfig(decode_context_parallel_size=2)
    mesh = make_mesh(pc, jax.devices()[:2])
    dcp = run(build(mesh, pc))
    assert single == dcp, (single, dcp)


def test_dcp_op_sliding_window_softcap_matches_reference():
    """DCP partial attention with sliding window + logit soft cap must
    equal the single-cache reference (window masking over GLOBAL key
    positions across the page interleave)."""
    cp = 2
    mesh = make_mesh(ParallelConfig(decode_context_parallel_size=cp),
                     jax.devices()[:cp])
    rng = np.random.default_rng(7)
    Hq, Hkv, D, bs = 4, 2, 32, 4
    scale = D ** -0.5
    window, cap = 7, 30.0
    ctx = [13, 5]
    R = len(ctx)
    T = sum(ctx)

    q = rng.standard_normal((T, Hq, D)).astype(np.float32)
    k = rng.standard_normal((T, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((T, Hkv, D)).astype(np.float32)
    positions = np.concatenate([np.arange(c) for c in ctx]).astype(np.int32)
    qsl = np.asarray([0, ctx[0], T], np.int32)

    table_dcp = np.zeros((R, 4), np.int32)
    table_dcp[0, :2] = [1, 2]
    table_dcp[1, :1] = [3]
    table_full = np.zeros((R, 8), np.int32)
    table_full[0, :4] = [1, 2, 3, 4]
    table_full[1, :2] = [5, 6]

    dcp_cache = jnp.zeros((cp, 2, 8, bs, Hkv, D), jnp.float32)
    slots = np.concatenate(
        [_dcp_slots(np.arange(c), table_dcp[r], bs, cp) for r, c in
         enumerate(ctx)], axis=1)
    out_dcp, _ = dcp_write_and_attend(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), dcp_cache,
        jnp.asarray(table_dcp), jnp.asarray(positions), jnp.asarray(qsl),
        jnp.asarray(slots), mesh, scale, sliding_window=window,
        logits_soft_cap=cap)

    full_cache = new_kv_cache(16, bs, Hkv, D, jnp.float32)
    full_slots = np.concatenate([
        table_full[r][np.arange(c) // bs] * bs + np.arange(c) % bs
        for r, c in enumerate(ctx)]).astype(np.int32)
    full_cache = write_kv(full_cache, jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(full_slots))
    out_ref = ragged_paged_attention_reference(
        jnp.asarray(q), full_cache, jnp.asarray(table_full),
        jnp.asarray(qsl), jnp.asarray(ctx, jnp.int32), scale=scale,
        sliding_window=window, logits_soft_cap=cap)
    np.testing.assert_allclose(np.asarray(out_dcp), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_dcp_op_sinks_and_alibi_match_reference():
    """Attention sinks enter the DCP merge denominator exactly once;
    ALiBi biases use global key positions."""
    cp = 2
    mesh = make_mesh(ParallelConfig(decode_context_parallel_size=cp),
                     jax.devices()[:cp])
    rng = np.random.default_rng(8)
    Hq, Hkv, D, bs = 4, 2, 32, 4
    scale = D ** -0.5
    ctx = [11]
    R, T = 1, 11
    sinks = jnp.asarray(rng.standard_normal(Hq), jnp.float32)
    from lvllm_tpu.ops.attention import alibi_slopes as make_slopes
    slopes = make_slopes(Hq)

    q = rng.standard_normal((T, Hq, D)).astype(np.float32)
    k = rng.standard_normal((T, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((T, Hkv, D)).astype(np.float32)
    positions = np.arange(T, dtype=np.int32)
    qsl = np.asarray([0, T], np.int32)

    table_dcp = np.zeros((R, 4), np.int32)
    table_dcp[0, :2] = [1, 2]
    table_full = np.zeros((R, 8), np.int32)
    table_full[0, :3] = [1, 2, 3]

    full_cache = new_kv_cache(16, bs, Hkv, D, jnp.float32)
    full_slots = (table_full[0][positions // bs] * bs +
                  positions % bs).astype(np.int32)
    full_cache = write_kv(full_cache, jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(full_slots))

    for kw in ({"sinks": sinks}, {"alibi_slopes": slopes},
               {"sinks": sinks, "alibi_slopes": slopes}):
        dcp_cache = jnp.zeros((cp, 2, 8, bs, Hkv, D), jnp.float32)
        slots = _dcp_slots(positions, table_dcp[0], bs, cp)
        out_dcp, _ = dcp_write_and_attend(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), dcp_cache,
            jnp.asarray(table_dcp), jnp.asarray(positions),
            jnp.asarray(qsl), jnp.asarray(slots), mesh, scale, **kw)
        out_ref = ragged_paged_attention_reference(
            jnp.asarray(q), full_cache, jnp.asarray(table_full),
            jnp.asarray(qsl), jnp.asarray(ctx, jnp.int32), scale=scale,
            **kw)
        np.testing.assert_allclose(np.asarray(out_dcp), np.asarray(out_ref),
                                   rtol=2e-5, atol=2e-5, err_msg=str(kw))


def test_dcp_mla_engine_matches_single_device():
    """MLA (DeepSeek latent cache) under dcp=2 must generate identically
    to the unsharded engine (reference: MLA DCP merge,
    mla_attention.py:745-770)."""
    from lvllm_tpu.engine.llm_engine import LLMEngine

    def build(mesh, pc):
        mc = ModelConfig(
            model="dummy", architecture="DeepseekV2ForCausalLM",
            dtype="float32", vocab_size=128, hidden_size=64,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
            attention_type="mla", q_lora_rank=None, kv_lora_rank=32,
            qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
            qk_norm=False, seed=11)
        cfg = EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=4, num_gpu_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=64, max_num_seqs=4,
                max_model_len=128),
            parallel_config=pc or ParallelConfig(),
        )
        return LLMEngine(cfg, load_format="dummy", mesh=mesh)

    def run(engine):
        sp = SamplingParams(temperature=0.0, max_tokens=10)
        engine.add_request("r0", [1, 2, 3, 4, 5, 6, 7], sp)
        engine.add_request("r1", list(range(9, 22)), sp)
        toks = {}
        for _ in range(40):
            for o in engine.step():
                if o.finished:
                    toks[o.request_id] = o.outputs[0].token_ids
            if len(toks) == 2:
                break
        return toks

    single = run(build(None, None))
    assert len(single) == 2
    pc = ParallelConfig(decode_context_parallel_size=2)
    mesh = make_mesh(pc, jax.devices()[:2])
    dcp = run(build(mesh, pc))
    assert single == dcp, (single, dcp)


def test_dcp_gptoss_engine_matches_single_device():
    """gpt-oss (attention sinks + alternating sliding windows) under dcp=2
    must generate identically to the unsharded engine."""
    from lvllm_tpu.engine.llm_engine import LLMEngine

    def build(mesh, pc):
        mc = ModelConfig(
            model="dummy", architecture="GptOssForCausalLM",
            dtype="float32", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=64,
            max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
            attention_sinks=True, sliding_window=8,
            layer_types=("sliding_attention", "full_attention"),
            hidden_act="swiglu_oai", moe_bias=True, o_proj_bias=True,
            attention_bias=True, seed=5)
        cfg = EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=4, num_gpu_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=64, max_num_seqs=4,
                max_model_len=128),
            parallel_config=pc or ParallelConfig(),
        )
        return LLMEngine(cfg, load_format="dummy", mesh=mesh)

    def run(engine):
        sp = SamplingParams(temperature=0.0, max_tokens=10)
        engine.add_request("r0", [1, 2, 3, 4, 5, 6, 7], sp)
        engine.add_request("r1", list(range(9, 22)), sp)
        toks = {}
        for _ in range(40):
            for o in engine.step():
                if o.finished:
                    toks[o.request_id] = o.outputs[0].token_ids
            if len(toks) == 2:
                break
        return toks

    single = run(build(None, None))
    assert len(single) == 2
    pc = ParallelConfig(decode_context_parallel_size=2)
    mesh = make_mesh(pc, jax.devices()[:2])
    dcp = run(build(mesh, pc))
    assert single == dcp, (single, dcp)
