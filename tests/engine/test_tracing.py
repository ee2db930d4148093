"""Request tracing tests (reference: vllm/tracing/otel.py spans emitted
from the output processor with queue/prefill/decode latency attributes)."""

import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ObservabilityConfig, SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.sampling_params import SamplingParams
from lvllm_tpu.tracing import SpanAttributes, make_exporter


def _engine(exporter_spec="memory"):
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, max_model_len=128, eos_token_id=-1)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128),
        observability_config=ObservabilityConfig(
            trace_exporter=exporter_spec))
    return LLMEngine(cfg, load_format="dummy")


def test_request_span_emitted_with_reference_attributes():
    eng = _engine()
    sp = SamplingParams(temperature=0.7, top_p=0.9, max_tokens=5, seed=1)
    eng.add_request("traced", [1, 2, 3, 4, 5, 6, 7], sp)
    steps = 0
    while eng.has_unfinished_requests():
        eng.step()
        steps += 1
        assert steps < 50

    exporter = eng.core.tracer.exporter
    assert len(exporter.spans) == 1
    span = exporter.spans[0]
    assert span.name == "llm_request"
    A = SpanAttributes
    at = span.attributes
    assert at[A.GEN_AI_REQUEST_ID] == "traced"
    assert at[A.GEN_AI_USAGE_PROMPT_TOKENS] == 7
    assert at[A.GEN_AI_USAGE_COMPLETION_TOKENS] == 5
    assert at[A.GEN_AI_REQUEST_MAX_TOKENS] == 5
    assert at[A.GEN_AI_REQUEST_TEMPERATURE] == pytest.approx(0.7)
    assert at[A.GEN_AI_REQUEST_TOP_P] == pytest.approx(0.9)
    # Latency decomposition: queue + prefill + decode ≈ e2e, all >= 0.
    q = at[A.GEN_AI_LATENCY_TIME_IN_QUEUE]
    pf = at[A.GEN_AI_LATENCY_TIME_IN_MODEL_PREFILL]
    dec = at[A.GEN_AI_LATENCY_TIME_IN_MODEL_DECODE]
    e2e = at[A.GEN_AI_LATENCY_E2E]
    assert q >= 0 and pf >= 0 and dec >= 0
    assert abs((q + pf + dec) - e2e) < 0.05
    assert at[A.GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN] == pytest.approx(
        q + pf, abs=1e-6)
    assert span.end_time > span.start_time


def test_multiple_requests_multiple_spans():
    eng = _engine()
    sp = SamplingParams(temperature=0.0, max_tokens=3)
    for i in range(3):
        eng.add_request(f"r{i}", [1 + i, 2, 3], sp)
    steps = 0
    while eng.has_unfinished_requests():
        eng.step()
        steps += 1
        assert steps < 50
    spans = eng.core.tracer.exporter.spans
    assert sorted(s.attributes[SpanAttributes.GEN_AI_REQUEST_ID]
                  for s in spans) == ["r0", "r1", "r2"]


def test_jsonl_exporter(tmp_path):
    import json
    path = str(tmp_path / "spans.jsonl")
    eng = _engine(f"jsonl:{path}")
    eng.add_request("j", [1, 2, 3], SamplingParams(temperature=0.0,
                                                   max_tokens=2))
    steps = 0
    while eng.has_unfinished_requests():
        eng.step()
        steps += 1
        assert steps < 50
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["name"] == "llm_request"
    assert rec["attributes"]["gen_ai.request.id"] == "j"


def test_disabled_by_default():
    mc = ModelConfig(model="dummy", architecture="Qwen3ForCausalLM",
                     dtype="float32", vocab_size=128, hidden_size=64,
                     intermediate_size=128, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2,
                     max_model_len=128, eos_token_id=-1)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128))
    eng = LLMEngine(cfg, load_format="dummy")
    assert eng.core.tracer.exporter is None
    assert make_exporter(None) is None
