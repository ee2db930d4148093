"""MTP (multi-token prediction) speculative decoding.

Losslessness: exact-match verification keeps greedy outputs identical
regardless of head quality, including on a DeepSeek-V3-mini target where
the MTP block is the family's own MLA + MoE layer (reference:
deepseek_mtp.py; registry models/registry.py:572-594). Plus: spec-layer
weight mapping (enorm/hnorm/eh_proj/shared_head at layer index
num_hidden_layers) and engine acceptance-rate stats.
"""

import numpy as np

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig, SpeculativeConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def _qwen_config(tie=False):
    return ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="bfloat16",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, max_model_len=128,
        eos_token_id=-1, tie_word_embeddings=tie)


def _deepseek_config():
    return ModelConfig(
        model="dummy", architecture="DeepseekV3ForCausalLM",
        dtype="float32", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=2, head_dim=32, max_position_embeddings=256,
        max_model_len=128, eos_token_id=-1, attention_type="mla",
        q_lora_rank=None, kv_lora_rank=16, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=32,
        router_scoring_fn="sigmoid", partial_rotary_factor=8 / 32)


def _engine(mc, spec=None):
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128),
        speculative_config=spec or SpeculativeConfig(),
    )
    return LLMEngine(cfg, load_format="dummy")


def _run(engine, prompts, max_tokens=16):
    for rid, p in enumerate(prompts):
        engine.add_request(f"r{rid}", p,
                           SamplingParams(temperature=0.0,
                                          max_tokens=max_tokens))
    outs, steps = [], 0
    while engine.has_unfinished_requests() and steps < 200:
        outs.extend(o for o in engine.step() if o.finished)
        steps += 1
    return {o.request_id: o.outputs[0].token_ids for o in outs}, steps


PROMPTS = [[1, 2, 3, 4, 5], [9, 8, 7], list(range(10, 30))]


def test_mtp_lossless_vs_baseline():
    base, _ = _run(_engine(_qwen_config()), PROMPTS)
    spec = SpeculativeConfig(method="mtp", num_speculative_tokens=3)
    got, _ = _run(_engine(_qwen_config(), spec), PROMPTS)
    assert got == base


def test_mtp_lossless_deepseek_v3_mini():
    """The MTP block is the checkpoint family's own layer: for DeepSeek
    that is MLA attention (latent KV cache) + sigmoid-routed MoE."""
    base, _ = _run(_engine(_deepseek_config()), PROMPTS, max_tokens=10)
    spec = SpeculativeConfig(method="mtp", num_speculative_tokens=2)
    eng = _engine(_deepseek_config(), spec)
    prop = eng.core.runner.eagle_proposer
    assert prop.mode == "mtp"
    assert prop.mtp_config.is_moe_layer(0)
    # Family-native latent cache (1 latent "head" of lane-padded
    # kv_lora_rank+rope width), not Eagle's MHA cache.
    mc = _deepseek_config()
    assert prop.kv_cache.shape[-1] == mc.kv_cache_dim
    assert prop.kv_cache.shape[-2] == 1  # latent head
    got, _ = _run(eng, PROMPTS, max_tokens=10)
    assert got == base


def test_mtp_weight_mapping():
    """Spec-layer tensors live at layer index == num_hidden_layers in the
    checkpoint; enorm/hnorm/eh_proj/shared_head must map with correct
    orientation and the own lm head must win over the target's."""
    import jax.numpy as jnp

    from lvllm_tpu.spec_decode.mtp import MTPProposer

    mc = _qwen_config()
    rng = np.random.default_rng(0)
    H, V = mc.hidden_size, mc.vocab_size
    L = mc.num_hidden_layers
    enorm = rng.standard_normal(H).astype(np.float32)
    hnorm = rng.standard_normal(H).astype(np.float32)
    eh = rng.standard_normal((H, 2 * H)).astype(np.float32)
    head = rng.standard_normal((V, H)).astype(np.float32)
    stream = [
        (f"model.layers.{L}.enorm.weight", enorm),
        (f"model.layers.{L}.hnorm.weight", hnorm),
        (f"model.layers.{L}.eh_proj.weight", eh),
        (f"model.layers.{L}.shared_head.norm.weight",
         np.ones(H, np.float32)),
        (f"model.layers.{L}.shared_head.head.weight", head),
        (f"model.layers.{L}.input_layernorm.weight",
         np.ones(H, np.float32)),
        # layer index below the spec layer: must be ignored
        ("model.layers.0.enorm.weight", np.zeros(H, np.float32)),
    ]
    prop = MTPProposer(mc, k=2, weights=iter(stream))
    np.testing.assert_allclose(np.asarray(prop.params["enorm"],
                                          np.float32), enorm, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(prop.params["hnorm"],
                                          np.float32), hnorm, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(prop.params["eh_proj"], np.float32), eh.T, rtol=1e-2)
    assert "head" in prop.params
    np.testing.assert_allclose(
        np.asarray(prop.params["head"], np.float32), head.T, rtol=1e-2)
    assert prop.params["layer"]["input_layernorm"] is not None


def test_mtp_acceptance_stats_in_engine_metrics():
    spec = SpeculativeConfig(method="mtp", num_speculative_tokens=2)
    eng = _engine(_qwen_config(), spec)
    _run(eng, PROMPTS[:1], max_tokens=12)
    sd = eng.get_stats()["spec_decode"]
    assert sd["num_draft_tokens"] > 0
    assert 0 <= sd["num_accepted_tokens"] <= sd["num_draft_tokens"]
    assert sd["acceptance_rate"] is not None


def test_mtp_sampled_drafts_beat_greedy_acceptance():
    """At temperature > 0 the MTP head samples its own filtered
    distribution and ships q to the general-q rejection verifier
    (reference MTP default). Acceptance = E[min(1, p/q)] summed over the
    draft support beats the one-hot p(argmax q) of greedy drafting when
    q tracks p — on the random-weight DeepSeek-V3-mini the head shares
    the target's lm kernel, so they correlate."""

    def run(seed):
        spec = SpeculativeConfig(method="mtp", num_speculative_tokens=2)
        eng = _engine(_deepseek_config(), spec)
        for rid, p in enumerate(PROMPTS):
            eng.add_request(
                f"r{rid}", p,
                SamplingParams(temperature=0.8, seed=seed + rid,
                               max_tokens=24))
        steps = 0
        while eng.has_unfinished_requests() and steps < 300:
            eng.step()
            steps += 1
        sd = eng.get_stats()["spec_decode"]
        return eng, sd

    eng, sd = run(7)
    # Sampled mode engaged: q distributions were stored for verification.
    assert sd["num_draft_tokens"] > 20
    sampled_rate = sd["acceptance_rate"]

    # Force greedy drafting for comparison: same engine config, but the
    # proposer ignores sampling (sampling=None path) via temperature on
    # the DRAFT side only — emulate by monkeypatching ingest sampling off.
    spec = SpeculativeConfig(method="mtp", num_speculative_tokens=2)
    eng2 = _engine(_deepseek_config(), spec)
    orig = eng2.core.runner.eagle_proposer.ingest_and_propose

    def greedy_ingest(*args, **kw):
        kw["sampling"] = None
        return orig(*args, **kw)

    eng2.core.runner.eagle_proposer.ingest_and_propose = greedy_ingest
    for rid, p in enumerate(PROMPTS):
        eng2.add_request(
            f"r{rid}", p,
            SamplingParams(temperature=0.8, seed=7 + rid, max_tokens=24))
    steps = 0
    while eng2.has_unfinished_requests() and steps < 300:
        eng2.step()
        steps += 1
    sd2 = eng2.get_stats()["spec_decode"]
    greedy_rate = sd2["acceptance_rate"]
    assert sampled_rate > greedy_rate, (sampled_rate, greedy_rate)
