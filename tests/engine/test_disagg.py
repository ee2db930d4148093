"""Prefill/decode disaggregation tests: the disaggregated pipeline must
reproduce single-engine generation exactly (reference:
examples/offline_inference/disaggregated_prefill.py + kv_connector tests).
"""

import numpy as np
import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.distributed.kv_connector import (KVHandoff,
                                                inject_and_decode_request,
                                                prefill_and_extract)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def build_engine():
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        seed=8)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64,
                                 enable_prefix_caching=True),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128))
    return LLMEngine(cfg, load_format="dummy")


def run_to_completion(engine, rid):
    final = None
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished and o.request_id == rid:
                final = o
    return final


def test_disagg_matches_single_engine():
    prompt = list(range(1, 40))  # 39 tokens → 2 full blocks + tail
    sp = SamplingParams(temperature=0.0, max_tokens=8)

    # Baseline: one engine does everything.
    single = build_engine()
    rid = single.add_request(None, prompt, sp)
    want = run_to_completion(single, rid).outputs[0].token_ids

    # Disaggregated: prefill engine → handoff → decode engine.
    prefill_eng = build_engine()
    decode_eng = build_engine()
    handoff = prefill_and_extract(prefill_eng, prompt)
    assert handoff.first_token_id == want[0]
    assert handoff.num_full_block_tokens == 32
    assert len(handoff.kv_blocks) == 2          # layers
    assert handoff.kv_blocks[0].shape[1] == 2   # full blocks

    rid2 = inject_and_decode_request(decode_eng, handoff, sp, "dec0")
    out = run_to_completion(decode_eng, rid2)
    got = [handoff.first_token_id] + out.outputs[0].token_ids
    assert got == want, (got, want)


def test_disagg_short_prompt_no_full_blocks():
    """Prompt shorter than one block: pure-recompute path still works."""
    prompt = [3, 1, 4, 1, 5]
    sp = SamplingParams(temperature=0.0, max_tokens=5)
    single = build_engine()
    rid = single.add_request(None, prompt, sp)
    want = run_to_completion(single, rid).outputs[0].token_ids

    prefill_eng = build_engine()
    decode_eng = build_engine()
    handoff = prefill_and_extract(prefill_eng, prompt)
    assert handoff.num_full_block_tokens == 0
    rid2 = inject_and_decode_request(decode_eng, handoff, sp, "dec1")
    out = run_to_completion(decode_eng, rid2)
    got = [handoff.first_token_id] + out.outputs[0].token_ids
    assert got == want


def _cfg(offload=False, seed=8):
    from lvllm_tpu.config import OffloadConfig
    mc = ModelConfig(
        model="dummy", architecture="Qwen3MoeForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=64, max_position_embeddings=256,
        max_model_len=128, eos_token_id=-1, seed=seed)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64,
                                 enable_prefix_caching=True),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128))
    if offload:
        cfg.offload_config = OffloadConfig(enabled=True,
                                           hbm_resident_moe_layers="0")
    return cfg


def test_disagg_cross_process_matches_single_engine():
    """Two-process P/D disaggregation over ZMQ (reference:
    nixl_connector API shape): pipelined prefill-process + decode-process
    outputs must equal single-engine generation."""
    from lvllm_tpu.distributed.disagg import DisaggregatedEngine

    prompts = [list(range(1, 40)), list(range(50, 75)), [7, 8, 9]]
    sp = SamplingParams(temperature=0.0, max_tokens=6)

    single = LLMEngine(_cfg(), load_format="dummy")
    want = []
    for p in prompts:
        rid = single.add_request(None, p, sp)
        want.append(run_to_completion(single, rid).outputs[0].token_ids)

    pair = DisaggregatedEngine(_cfg(), _cfg(), load_format="dummy")
    try:
        outs = pair.generate(prompts, sp)
        got = [o.outputs[0].token_ids for o in outs]
        assert got == want, (got, want)
        assert pair.stats["handoffs"] == 3
        assert pair.stats["kv_bytes_transferred"] > 0
    finally:
        pair.shutdown()


def test_disagg_full_speed_prefill_with_offloaded_decode():
    """The fork's README:47 headline: full-speed prefill in its own
    process while the decode engine runs offload-assisted (expert weights
    streaming from host RAM). Outputs must match the non-offloaded
    single-engine baseline bit-for-bit."""
    from lvllm_tpu.distributed.disagg import DisaggregatedEngine

    prompts = [list(range(1, 36)), list(range(40, 60))]
    sp = SamplingParams(temperature=0.0, max_tokens=5)

    single = LLMEngine(_cfg(), load_format="dummy")
    want = []
    for p in prompts:
        rid = single.add_request(None, p, sp)
        want.append(run_to_completion(single, rid).outputs[0].token_ids)

    pair = DisaggregatedEngine(_cfg(), _cfg(offload=True),
                               load_format="dummy")
    try:
        store = pair.decode_engine.core.runner.expert_store
        assert store is not None and store.streamed_layers  # offload active
        outs = pair.generate(prompts, sp)
        got = [o.outputs[0].token_ids for o in outs]
        assert got == want, (got, want)
        assert store.stats["bytes_streamed"] > 0
    finally:
        pair.shutdown()


def test_disagg_ec_transfer_whisper(tmp_path):
    """EC transfer: the prefill engine runs the audio encoder; its
    cross-attention K/V ride the handoff and the decode engine decodes
    WITHOUT re-encoding — outputs identical to a single engine."""
    torch = pytest.importorskip("torch")
    import transformers

    from lvllm_tpu.model_loader.hf_config import load_model_config

    cfg = transformers.WhisperConfig(
        vocab_size=128, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=16,
        max_source_positions=32, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3, suppress_tokens=None,
        begin_suppress_tokens=None)
    torch.manual_seed(0)
    transformers.WhisperForConditionalGeneration(cfg).save_pretrained(
        str(tmp_path), safe_serialization=True)

    def mk():
        mc = load_model_config(str(tmp_path), max_model_len=64,
                               dtype="float32")
        ecfg = EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=16, num_gpu_blocks=32,
                                     enable_prefix_caching=True),
            scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                             max_num_seqs=2,
                                             max_model_len=64))
        return LLMEngine(ecfg, load_format="safetensors")

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((1, 16, 64)).astype(np.float32)
    dec_ids = [3, 7]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    base_eng = mk()
    rid = base_eng.add_request(None, dec_ids, sp,
                               mm_data={"input_features": feats})
    base = run_to_completion(base_eng, rid).outputs[0].token_ids

    prefill_eng = mk()
    decode_eng = mk()
    handoff = prefill_and_extract(prefill_eng, dec_ids, sp,
                                  mm_data={"input_features": feats})
    assert handoff.cross_kv is not None            # EC payload present
    rid2 = inject_and_decode_request(decode_eng, handoff, sp)
    out = run_to_completion(decode_eng, rid2)
    combined = [handoff.first_token_id] + out.outputs[0].token_ids
    assert combined == base[:len(combined)], (combined, base)


def build_engine_with_host_tier(swap_gb=0.02):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        seed=8)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64,
                                 enable_prefix_caching=True,
                                 swap_space_gb=swap_gb),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128))
    return LLMEngine(cfg, load_format="dummy")


def test_connector_composition_host_tier_fills_evicted_handoff():
    """MultiConnector (reference multi_connector.py:126 +
    offloading_connector.py:44): the decode engine's own host tier
    supplies prefix blocks the prefill engine EVICTED before extraction
    — P/D transfer and host offload stack on one request chain."""
    prompt = list(range(1, 52))  # 51 tokens → 3 full blocks + tail
    sp = SamplingParams(temperature=0.0, max_tokens=8)

    single = build_engine()
    rid = single.add_request(None, prompt, sp)
    want = run_to_completion(single, rid).outputs[0].token_ids

    decode_eng = build_engine_with_host_tier()
    # Warm the decode engine's HOST tier: run the prompt once (blocks
    # stored HBM→host on finish), then churn the device pool so the
    # device prefix-cache entries are gone but the host copies remain.
    w = decode_eng.add_request(None, prompt,
                               SamplingParams(temperature=0.0,
                                              max_tokens=2))
    run_to_completion(decode_eng, w)
    assert decode_eng.core.kv_offload_manager.stats()["stored_blocks"] >= 3
    for i in range(14):
        churn = decode_eng.add_request(
            None, [100 + i] * 40, SamplingParams(temperature=0.0,
                                                 max_tokens=2))
        run_to_completion(decode_eng, churn)

    # Handoff truncated to ONE block — as if the prefill engine evicted
    # the rest before extraction.
    prefill_eng = build_engine()
    handoff = prefill_and_extract(prefill_eng, prompt)
    assert handoff.num_full_block_tokens == 48
    handoff = KVHandoff(
        prompt_token_ids=handoff.prompt_token_ids,
        first_token_id=handoff.first_token_id,
        num_full_block_tokens=16,
        kv_blocks=[b[:, :1] for b in handoff.kv_blocks])

    from lvllm_tpu.distributed import kv_connector as kvc
    from lvllm_tpu.distributed.connectors import (HandoffConnector,
                                                  MultiConnector,
                                                  host_tier_connector_for)
    mgr = decode_eng.core.scheduler.kv_cache_manager
    conn = MultiConnector([HandoffConnector(handoff, mgr.block_size),
                           host_tier_connector_for(decode_eng)])
    covered = kvc.inject_prefix_kv(decode_eng, handoff.prompt_token_ids,
                                   conn, "cmp0")
    assert covered == 48, covered               # 1 from handoff + 2 host
    assert conn.stats["p2p_handoff"] == 1
    assert conn.stats["host_tier"] == 2

    sp2 = sp.clone()
    sp2.max_tokens = 7
    rid2 = decode_eng.add_request(
        "cmp0", handoff.prompt_token_ids + [handoff.first_token_id], sp2)
    out = run_to_completion(decode_eng, rid2)
    got = [handoff.first_token_id] + out.outputs[0].token_ids
    assert got == want, (got, want)


def test_weight_push_changes_logits_without_restart():
    """Minimal RLHF weight-push engine (reference:
    distributed/weight_transfer/ nccl_engine/ipc_engine): a pushed
    update must change generation without restarting the engine."""
    import uuid

    from lvllm_tpu.distributed.weight_transfer import (WeightPushClient,
                                                       WeightPushServer)

    eng = build_engine()
    prompt = [1, 2, 3, 4, 5]
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    r0 = eng.add_request(None, prompt, sp)
    before = run_to_completion(eng, r0).outputs[0].token_ids

    ep = f"ipc:///tmp/wpush-{uuid.uuid4().hex[:8]}"
    server = WeightPushServer(eng, ep)
    client = WeightPushClient(ep)
    try:
        rng = np.random.default_rng(123)
        emb = np.asarray(eng.core.runner.params["embed"]["weight"])
        q = np.asarray(
            eng.core.runner.params["layers"][0]["self_attn"]["q_proj"]
            ["kernel"])
        n = client.push({
            "embed/weight": rng.standard_normal(emb.shape).astype(
                np.float32) * 0.05,
            "layers/0/self_attn/q_proj/kernel":
                rng.standard_normal(q.shape).astype(np.float32) * 0.05,
        })
        assert n == 2
        assert server.updates_applied == 2

        r1 = eng.add_request(None, prompt, sp)
        after = run_to_completion(eng, r1).outputs[0].token_ids
        assert after != before, (before, after)

        # Shape mismatches are rejected, not applied.
        with pytest.raises(RuntimeError):
            client.push({"embed/weight": np.zeros((2, 2), np.float32)})
    finally:
        client.close()
        server.close()
