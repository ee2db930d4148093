"""Per-layer hybrid MoE quantization (reference: the fork's
MoeComputeStrategy KEEP|INT4, envs.py:233-240, FP8→INT4 repack
fused_moe/layer.py:2074; BASELINE config #3 'FP8 with FP8+INT4 hybrid
expert layers')."""

import numpy as np
import pytest
import jax.numpy as jnp

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.model_loader.loader import load_model, quantize_moe_weights
from lvllm_tpu.ops import quant
from lvllm_tpu.sampling_params import SamplingParams


def _mc(**kw):
    return ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=128, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=128, max_model_len=128, eos_token_id=-1,
        seed=3, **kw)


def test_quant_method_for_layer_parsing():
    mc = _mc(quantization="int8",
             moe_quant_overrides="fp8:0-1;int4:3;keep:2")
    assert mc.quant_method_for_layer(0) == "fp8"
    assert mc.quant_method_for_layer(1) == "fp8"
    assert mc.quant_method_for_layer(2) is None      # keep = unquantized
    assert mc.quant_method_for_layer(3) == "int4"
    mc2 = _mc(quantization="int4")
    assert mc2.quant_method_for_layer(2) == "int4"


def test_hybrid_layers_quantized_per_method():
    mc = _mc(moe_quant_overrides="fp8:0-1;int4:2-3")
    model, params = load_model(mc, "dummy")
    l0 = params["layers"][0]["moe"]
    l2 = params["layers"][2]["moe"]
    assert str(l0["w1_q"].dtype).startswith("float8")
    assert l2["w1_q"].dtype == jnp.int8
    # INT4 packs two nibbles per int8 along the contraction dim; int4/int8
    # additionally store the column-tiled 4D layout [E, N/tn, K/2, tn]
    # (fp8 keeps [E, K, N]).
    k_int4 = (l2["w1_q"].shape[2] if l2["w1_q"].ndim == 4
              else l2["w1_q"].shape[1])
    assert k_int4 == l0["w1_q"].shape[1] // 2
    assert "w1" not in l0 and "w1" not in l2


def test_hybrid_forward_close_to_bf16():
    """Hybrid FP8+INT4 model must stay close to the unquantized model."""
    from lvllm_tpu.models.model_base import AttentionMetadata

    mc_ref = _mc()
    model, params = load_model(mc_ref, "dummy")
    mc_h = _mc(moe_quant_overrides="fp8:0-1;int4:2-3")
    model_h, params_h = load_model(mc_h, "dummy")

    kv = [model.make_layer_cache(i, 8, 16, jnp.float32, 4)
          for i in range(4)]
    kv_h = [model_h.make_layer_cache(i, 8, 16, jnp.float32, 4)
            for i in range(4)]
    md = AttentionMetadata(
        query_start_loc=jnp.asarray([0, 6, 6, 6, 6], jnp.int32),
        seq_lens=jnp.asarray([6, 0, 0, 0], jnp.int32),
        block_table=jnp.asarray([[1, 2]] + [[0, 0]] * 3, jnp.int32),
        slot_mapping=jnp.asarray(np.arange(16, 22), jnp.int32))
    ids = jnp.asarray([5, 9, 2, 7, 1, 3], jnp.int32)
    pos = jnp.asarray(np.arange(6), jnp.int32)
    h_ref, _ = model(params, ids, pos, kv, md)
    h_q, _ = model_h(params_h, ids, pos, kv_h, md)
    logits_ref = model.compute_logits(params, h_ref)
    logits_q = model_h.compute_logits(params_h, h_q)
    assert bool(jnp.isfinite(logits_q).all())
    # Weight-only 4-bit on random weights: coarse but correlated.
    corr = np.corrcoef(np.asarray(logits_ref).ravel(),
                       np.asarray(logits_q).ravel())[0, 1]
    assert corr > 0.98, corr


def test_fp8_to_int4_repack():
    """FP8-quantized layers repack to INT4 when the strategy says so
    (the fork's _process_block_weights_quant)."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 128, 64)).astype(np.float32) * 0.1
    qf, sf = quant.quantize_fp8_np(w)

    mc = _mc(moe_quant_overrides="int4:0-3")
    params = {"layers": [
        {"moe": {"router": jnp.zeros((64, 4)),
                 "w1_q": jnp.asarray(qf), "w1_scales": jnp.asarray(sf),
                 "w2_q": jnp.asarray(qf), "w2_scales": jnp.asarray(sf)}}]}
    out = quantize_moe_weights(params, mc)
    moe = out["layers"][0]["moe"]
    assert moe["w1_q"].dtype == jnp.int8
    assert moe["w1_q"].shape == (4, 64, 64)  # packed K/2
    # Repacked values track the fp8-dequantized source.
    deq4 = quant.dequant_int4(moe["w1_q"], moe["w1_scales"], 128,
                              jnp.float32)
    src = quant.dequant_fp8_np(np.asarray(qf), np.asarray(sf))
    # Within one int4 half-step (group amax / 7 / 2).
    np.testing.assert_allclose(np.asarray(deq4), src, atol=0.04)


def test_engine_hybrid_generates():
    cfg = EngineConfig(
        model_config=_mc(moe_quant_overrides="fp8:0-1;int4:2-3"),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128))
    eng = LLMEngine(cfg, load_format="dummy")
    eng.add_request("h", [1, 2, 3, 4, 5],
                    SamplingParams(temperature=0.0, max_tokens=6))
    outs = {}
    steps = 0
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
        steps += 1
        assert steps < 50
    assert len(outs["h"].outputs[0].token_ids) == 6
