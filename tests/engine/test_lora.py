"""Multi-LoRA serving tests (reference: tests/lora).

The key invariants: zero-weight adapters are identity; a real adapter
changes outputs for exactly its requests; adapter/plain requests batch
together without cross-talk; adapters can be removed and slots reused.
"""

import numpy as np
import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, LoRAConfig,
                              ModelConfig, SchedulerConfig)
from lvllm_tpu.core.request import Request
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.lora.manager import LoRARequest
from lvllm_tpu.sampling_params import SamplingParams


def build_engine(lora=True):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1,
        seed=21)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128),
        lora_config=LoRAConfig(enabled=lora, max_loras=2, max_lora_rank=8),
    )
    return LLMEngine(cfg, load_format="dummy")


def make_adapter(lora_id, scale=1.0, rank=4, h=64, qout=64, seed=0):
    rng = np.random.default_rng(seed)
    A = (rng.standard_normal((rank, h)) * scale).astype(np.float32)
    B = (rng.standard_normal((qout, rank)) * scale).astype(np.float32)
    return LoRARequest(lora_name=f"ad{lora_id}", lora_int_id=lora_id,
                       weights={"q_proj": (A, B)}, alpha=8.0, rank=rank)


def run(engine, reqs):
    outs = {}
    for rid, prompt, sp, lora_id in reqs:
        r = Request(rid, prompt, sp,
                    eos_token_id=engine.config.model_config.eos_token_id,
                    lora_int_id=lora_id)
        engine.core.add_request(r)
        engine.output_processor.add_request(r)
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                outs[o.request_id] = o
    return outs


def test_null_adapter_is_identity():
    base_eng = build_engine(lora=False)
    lora_eng = build_engine(lora=True)
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    p = [1, 2, 3, 4]
    base = run(base_eng, [("r0", p, sp, None)])["r0"].outputs[0].token_ids
    # LoRA enabled but request has no adapter → identical.
    same = run(lora_eng, [("r0", p, sp, None)])["r0"].outputs[0].token_ids
    assert base == same


def test_adapter_changes_output_only_for_its_request():
    eng = build_engine()
    eng.core.add_lora(make_adapter(1, scale=0.8, seed=3))
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    p = [5, 6, 7, 8, 9]
    outs = run(eng, [("plain", p, sp, None), ("tuned", p, sp, 1)])
    plain = outs["plain"].outputs[0].token_ids
    tuned = outs["tuned"].outputs[0].token_ids
    assert plain != tuned  # adapter took effect

    # Plain request unchanged vs a no-LoRA engine.
    ref = run(build_engine(), [("r", p, sp, None)])["r"].outputs[0].token_ids
    assert plain == ref


def test_two_adapters_differ():
    eng = build_engine()
    eng.core.add_lora(make_adapter(1, scale=0.8, seed=3))
    eng.core.add_lora(make_adapter(2, scale=0.8, seed=7))
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    p = [9, 8, 7]
    outs = run(eng, [("a", p, sp, 1), ("b", p, sp, 2)])
    assert outs["a"].outputs[0].token_ids != outs["b"].outputs[0].token_ids


def test_remove_and_reuse_slot():
    eng = build_engine()
    s1 = eng.core.add_lora(make_adapter(1))
    s2 = eng.core.add_lora(make_adapter(2))
    with pytest.raises(RuntimeError):
        eng.core.add_lora(make_adapter(3))  # capacity 2
    assert eng.core.remove_lora(1)
    s3 = eng.core.add_lora(make_adapter(3))
    assert s3 == s1  # slot reused
    assert set(eng.core.list_loras()) == {2, 3}


def test_lora_request_without_serving_enabled_rejected():
    eng = build_engine(lora=False)
    r = Request("x", [1, 2], SamplingParams(), lora_int_id=1)
    with pytest.raises(ValueError):
        eng.core.add_request(r)
