"""KV cache dtype tests (reference: kv_cache_dtype fp8/turboquant KV)."""

import numpy as np
import jax.numpy as jnp

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def build(kv_dtype):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        seed=17)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64,
                                 kv_cache_dtype=kv_dtype),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128))
    return LLMEngine(cfg, load_format="dummy")


def run(engine, prompt, n=10):
    rid = engine.add_request(None, prompt, SamplingParams(
        temperature=0.0, max_tokens=n))
    final = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                final = o
    return final.outputs[0].token_ids


def test_fp8_kv_cache_dtype_applied():
    eng = build("fp8")
    assert eng.core.runner.kv_caches[0].dtype == jnp.float8_e4m3fn
    toks = run(eng, [1, 2, 3, 4, 5])
    assert len(toks) == 10


def test_fp8_kv_outputs_track_full_precision():
    """fp8 KV greedy decode should mostly agree with f32 KV at tiny scale
    (accuracy gate analog)."""
    base = run(build("auto"), list(range(30)))
    fp8 = run(build("fp8"), list(range(30)))
    agree = sum(a == b for a, b in zip(base, fp8))
    assert agree >= 7, (base, fp8)


def test_int4_kv_cache_layout_and_decode():
    """INT4 KV (reference: turboquant_4bit_nc, config.yaml:22): two-leaf
    dict {packed int8, scales f32}; engine decode must run end-to-end."""
    eng = build("int4")
    kv = eng.core.runner.kv_caches[0]
    assert kv["packed"].dtype == jnp.int8
    # [2, NB, Hp/2, BS, D] head-pair planes with (BS, D) minor dims.
    assert kv["packed"].shape[2:] == (1, 16, 64 // 4)
    assert kv["scales"].dtype == jnp.float32
    assert kv["scales"].shape[-1] == 128            # per-page scale row
    toks = run(eng, [1, 2, 3, 4, 5])
    assert len(toks) == 10


def test_int4_kv_outputs_track_full_precision():
    base = run(build("auto"), list(range(30)))
    q4 = run(build("int4"), list(range(30)))
    agree = sum(a == b for a, b in zip(base, q4))
    assert agree >= 6, (base, q4)


def test_int4_kv_capacity_per_block():
    """Bytes per block must reflect the 4-bit layout: ~3.2x less than
    bf16 at H=4, D=128 geometry."""
    from lvllm_tpu.core.kv_cache_spec import FullAttentionSpec, Int4KVSpec
    i4 = Int4KVSpec(num_kv_heads=4, head_dim=128)
    bf = FullAttentionSpec(num_kv_heads=4, head_dim=128,
                           dtype=jnp.bfloat16)
    ratio = bf.bytes_per_block(16) / i4.bytes_per_block(16)
    assert ratio > 3.0, ratio


def test_int4_kv_roundtrip_attention_matches_dense():
    """write_kv_int4 + ragged_paged_attention_int4 vs dense f32 attention
    over the SAME quantized values (the quantization error itself is the
    only difference vs bf16 KV)."""
    import jax
    from lvllm_tpu.ops.kv_cache_int4 import (new_kv_cache_int4,
                                             quantize_roundtrip,
                                             ragged_paged_attention_int4,
                                             write_kv_int4)

    rng = np.random.default_rng(0)
    H, D, BS = 2, 64, 16
    lens = [13, 29]
    cache = new_kv_cache_int4(8, BS, H, D)
    bt = np.zeros((2, 4), np.int32)
    bt[0, :1] = [1]
    bt[1, :2] = [2, 3]
    slots, ks, vs = [], [], []
    for r, L in enumerate(lens):
        for p in range(L):
            slots.append(int(bt[r, p // BS]) * BS + p % BS)
    T = sum(lens)
    k = rng.standard_normal((T, H, D)).astype(np.float32)
    v = rng.standard_normal((T, H, D)).astype(np.float32)
    cache = write_kv_int4(cache, jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(np.asarray(slots, np.int32)))
    q = rng.standard_normal((2, 4, D)).astype(np.float32)
    out = ragged_paged_attention_int4(
        jnp.asarray(q), cache, jnp.asarray(bt),
        jnp.asarray([0, 1, 2], jnp.int32), jnp.asarray(lens, jnp.int32),
        scale=D ** -0.5)
    # Oracle over the quantize→dequantize'd K/V (exact same values).
    kq = np.asarray(quantize_roundtrip(jnp.asarray(k)))
    vq = np.asarray(quantize_roundtrip(jnp.asarray(v)))
    for r, L in enumerate(lens):
        off = sum(lens[:r])
        for hq in range(4):
            hk = hq * H // 4
            s = (q[r, hq] @ kq[off:off + L, hk].T) * (D ** -0.5)
            p = np.exp(s - s.max())
            p /= p.sum()
            ref = p @ vq[off:off + L, hk]
            np.testing.assert_allclose(np.asarray(out)[r, hq], ref,
                                       rtol=2e-3, atol=2e-3)


def test_int4_pallas_kernel_matches_jnp():
    """Pallas in-DMA-dequant int4 attention (interpret mode) == jnp."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from lvllm_tpu.ops.kv_cache_int4 import (new_kv_cache_int4,
                                             ragged_paged_attention_int4,
                                             write_kv_int4)
    rng = np.random.default_rng(3)
    H, D, BS = 4, 128, 16
    lens = [13, 40, 7]
    q_lens = [1, 9, 1]
    cache = new_kv_cache_int4(16, BS, H, D)
    bt = np.zeros((3, 4), np.int32)
    p = 1
    slots = []
    for r, L in enumerate(lens):
        nb = -(-L // BS)
        bt[r, :nb] = np.arange(p, p + nb)
        for t in range(L):
            slots.append(int(bt[r, t // BS]) * BS + t % BS)
        p += nb
    T_ctx = sum(lens)
    k = rng.standard_normal((T_ctx, H, D)).astype(np.float32)
    v = rng.standard_normal((T_ctx, H, D)).astype(np.float32)
    cache = write_kv_int4(cache, jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(slots, jnp.int32))
    T = sum(q_lens)
    q = jnp.asarray(rng.standard_normal((T, 8, D)), jnp.float32)
    qsl = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)
    sl = jnp.asarray(lens, jnp.int32)
    ref = ragged_paged_attention_int4(
        q, cache, jnp.asarray(bt), qsl, sl, scale=D ** -0.5,
        use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        got = ragged_paged_attention_int4(
            q, cache, jnp.asarray(bt), qsl, sl, scale=D ** -0.5,
            use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
