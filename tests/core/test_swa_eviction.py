"""Sliding-window block eviction (reference: SlidingWindowManager in
single_type_kv_cache_manager.py): out-of-window blocks free eagerly and
outputs are unchanged (the attention mask never reads them)."""

import numpy as np

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.core.kv_cache_manager import KVCacheManager
from lvllm_tpu.core.request import Request
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams


def _req(rid, n_prompt):
    return Request(request_id=rid, prompt_token_ids=list(range(n_prompt)),
                   sampling_params=SamplingParams(max_tokens=4),
                   eos_token_id=-1)


def test_manager_frees_out_of_window_blocks():
    m = KVCacheManager(block_size=16, num_blocks=32, enable_caching=False,
                       sliding_window=32)
    req = _req("r", 100)
    free0 = m.block_pool.get_num_free_blocks()
    m.allocate_slots(req, 100)
    used_all = free0 - m.block_pool.get_num_free_blocks()
    assert used_all == 7  # ceil(100/16)

    # Advance: at 100 computed tokens, tokens <= 100-32=68 are dead →
    # blocks 0..3 (64 tokens) free on the next allocation.
    req.num_computed_tokens = 100
    m.allocate_slots(req, 1)
    used_now = free0 - m.block_pool.get_num_free_blocks()
    assert used_now == used_all - 4 + 0  # 4 dead blocks reclaimed
    blocks = m.get_blocks("r")
    assert all(b is m.block_pool.null_block for b in blocks[:4])
    assert all(b is not m.block_pool.null_block for b in blocks[4:7])

    # Free must not double-release nulls.
    m.free(req)
    assert m.block_pool.get_num_free_blocks() == free0


def test_swa_engine_output_unchanged_and_fewer_blocks():
    def build(window_evict: bool):
        mc = ModelConfig(
            model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=32, sliding_window=32,
            max_position_embeddings=512, max_model_len=256,
            eos_token_id=-1)
        cfg = EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=8, num_gpu_blocks=64,
                                     enable_prefix_caching=False),
            scheduler_config=SchedulerConfig(max_num_batched_tokens=256,
                                             max_num_seqs=2,
                                             max_model_len=256))
        eng = LLMEngine(cfg, load_format="dummy")
        if not window_evict:
            eng.core.scheduler.kv_cache_manager.sliding_window = None
        return eng

    prompt = list(np.random.default_rng(0).integers(1, 100, size=80))
    outs = {}
    usage = {}
    for evict in (False, True):
        eng = build(evict)
        eng.add_request("r", prompt,
                        SamplingParams(temperature=0.0, max_tokens=40))
        peak = 0.0
        done = None
        for _ in range(80):
            for o in eng.step():
                if o.finished:
                    done = o
            peak = max(peak, eng.core.scheduler.kv_cache_manager.usage)
            if done:
                break
        outs[evict] = done.outputs[0].token_ids
        usage[evict] = peak
    assert outs[True] == outs[False]
    assert usage[True] < usage[False]
