"""OpenAI server integration tests (reference model: RemoteOpenAIServer
boots a real server subprocess; here aiohttp's test client drives the real
app in-process against a dummy-weight engine). No pytest-asyncio in the
image, so each test runs its scenario under asyncio.run."""

import asyncio
import json

import pytest

pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.async_llm import AsyncLLM
from lvllm_tpu.entrypoints.openai_server import OpenAIServer


class IdentityTokenizer:
    """Maps text to small ids for testing without a real tokenizer."""

    chat_template = None
    eos_token_id = -1

    def encode(self, text):
        return [ord(c) % 120 + 1 for c in text][:64]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (t % 26)) for t in ids)


def run_scenario(scenario):
    async def main():
        mc = ModelConfig(
            model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            max_model_len=128, eos_token_id=-1)
        cfg = EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=128, max_num_seqs=4,
                max_model_len=128))
        llm = AsyncLLM(cfg, load_format="dummy",
                       tokenizer=IdentityTokenizer())
        await llm.start()
        server = OpenAIServer(llm, model_name="tiny-test")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            await scenario(client)
        finally:
            await client.close()
            await llm.stop()

    asyncio.run(main())


def test_health_and_models():
    async def scenario(client):
        r = await client.get("/health")
        assert r.status == 200
        r = await client.get("/v1/models")
        data = await r.json()
        assert data["data"][0]["id"] == "tiny-test"
    run_scenario(scenario)


def test_completions():
    async def scenario(client):
        r = await client.post("/v1/completions", json={
            "prompt": "hello world", "max_tokens": 5, "temperature": 0.0})
        assert r.status == 200
        data = await r.json()
        assert data["object"] == "text_completion"
        assert data["choices"][0]["finish_reason"] == "length"
        assert data["usage"]["completion_tokens"] == 5
        assert len(data["choices"][0]["text"]) > 0
    run_scenario(scenario)


def test_concurrent_chat_and_completions():
    async def scenario(client):
        async def one_chat():
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "temperature": 0.0})
            assert r.status == 200
            data = await r.json()
            assert data["choices"][0]["message"]["role"] == "assistant"

        async def one_cmpl(i):
            r = await client.post("/v1/completions", json={
                "prompt": f"prompt {i}", "max_tokens": 3,
                "temperature": 0.0})
            assert r.status == 200

        await asyncio.gather(one_chat(), one_cmpl(0), one_cmpl(1))
    run_scenario(scenario)


def test_streaming_completions():
    async def scenario(client):
        r = await client.post("/v1/completions", json={
            "prompt": "abc", "max_tokens": 4, "temperature": 0.0,
            "stream": True})
        assert r.status == 200
        body = await r.text()
        chunks = [l for l in body.split("\n\n") if l.startswith("data: ")]
        assert chunks[-1] == "data: [DONE]"
        first = json.loads(chunks[0][len("data: "):])
        assert first["object"] == "text_completion"
    run_scenario(scenario)


def test_bad_request():
    async def scenario(client):
        r = await client.post("/v1/completions", json={
            "prompt": "x", "temperature": -5})
        assert r.status == 400
        data = await r.json()
        assert "error" in data
    run_scenario(scenario)


def test_metrics_and_tokenize():
    async def scenario(client):
        # One finished request so latency/size histograms are populated.
        r = await client.post("/v1/completions", json={
            "prompt": "metrics probe", "max_tokens": 3,
            "temperature": 0.0})
        assert r.status == 200
        r = await client.get("/metrics")
        text = await r.text()
        assert "vllm:num_requests_running" in text
        assert "vllm:kv_cache_usage_perc" in text
        # Reference-parity breadth (loggers.py:452-930).
        for series in (
                "vllm:num_requests_waiting",
                "vllm:num_preemptions_total",
                "vllm:prefix_cache_queries_total",
                "vllm:prefix_cache_hits_total",
                "vllm:prompt_tokens_cached_total",
                "vllm:request_queue_time_seconds_bucket",
                "vllm:request_prefill_time_seconds_bucket",
                "vllm:request_decode_time_seconds_bucket",
                "vllm:request_inference_time_seconds_bucket",
                "vllm:inter_token_latency_seconds_bucket",
                "vllm:request_time_per_output_token_seconds_bucket",
                "vllm:request_prompt_tokens_bucket",
                "vllm:request_generation_tokens_bucket",
                "vllm:request_params_n_bucket",
                "vllm:request_params_max_tokens_bucket",
                "vllm:iteration_tokens_total_bucket",
                'vllm:request_success_total{finished_reason=',
                "vllm:engine_sleep_state",
                "vllm:cache_config_info",
        ):
            assert series in text, f"missing series: {series}"
        r = await client.post("/tokenize", json={"prompt": "hello"})
        data = await r.json()
        assert data["count"] == 5
    run_scenario(scenario)


def test_sleep_wake_cycle():
    async def scenario(client):
        r = await client.post("/v1/completions", json={
            "prompt": "warm", "max_tokens": 2, "temperature": 0.0})
        assert r.status == 200
        first = (await r.json())["choices"][0]["text"]
        r = await client.post("/sleep")
        assert r.status == 200
        r = await client.get("/is_sleeping")
        assert (await r.json())["is_sleeping"] is True
        r = await client.post("/wake_up")
        assert r.status == 200
        # Generation after wake produces the same greedy result.
        r = await client.post("/v1/completions", json={
            "prompt": "warm", "max_tokens": 2, "temperature": 0.0})
        assert r.status == 200
        assert (await r.json())["choices"][0]["text"] == first
    run_scenario(scenario)


def test_embeddings_endpoint():
    async def scenario(client):
        r = await client.post("/v1/embeddings", json={"input": ["hi", "yo"]})
        assert r.status == 200
        data = await r.json()
        assert len(data["data"]) == 2
        v = data["data"][0]["embedding"]
        assert len(v) == 64  # hidden size
        import math
        assert abs(sum(x * x for x in v) - 1.0) < 1e-3  # normalized
        # Same input twice → same embedding; different input → different.
        r2 = await client.post("/v1/embeddings", json={"input": ["hi"]})
        v2 = (await r2.json())["data"][0]["embedding"]
        assert all(abs(a - b) < 1e-4 for a, b in zip(v, v2))
    run_scenario(scenario)


def test_score_and_rerank():
    async def scenario(client):
        r = await client.post("/v1/score", json={
            "text_1": "hello", "text_2": ["hello", "zzzz"]})
        assert r.status == 200
        data = await r.json()
        assert len(data["data"]) == 2
        # Identical text scores highest (normalized embeddings → 1.0).
        assert data["data"][0]["score"] > data["data"][1]["score"]
        assert abs(data["data"][0]["score"] - 1.0) < 1e-3

        r = await client.post("/v1/rerank", json={
            "query": "hello", "documents": ["zzzz", "hello", "qqq"],
            "top_n": 2})
        data = await r.json()
        assert len(data["results"]) == 2
        assert data["results"][0]["document"]["text"] == "hello"
    run_scenario(scenario)


def test_anthropic_messages():
    async def scenario(client):
        r = await client.post("/v1/messages", json={
            "model": "tiny-test", "max_tokens": 5,
            "system": "be brief",
            "messages": [{"role": "user",
                          "content": [{"type": "text", "text": "hi"}]}],
            "temperature": 0.0})
        assert r.status == 200
        data = await r.json()
        assert data["type"] == "message"
        assert data["role"] == "assistant"
        assert data["content"][-1]["type"] == "text"
        assert data["stop_reason"] == "max_tokens"
        assert data["usage"]["output_tokens"] == 5

        # Malformed: missing messages.
        r = await client.post("/v1/messages", json={"max_tokens": 4})
        assert r.status == 400
        assert (await r.json())["type"] == "error"
    run_scenario(scenario)


class ScriptedTokenizer(IdentityTokenizer):
    """decode() reveals a fixed script one char per generated token, so
    the server's streaming path sees deterministic tool/think markup."""

    def __init__(self, script: str):
        self.script = script

    def decode(self, ids, skip_special_tokens=True):
        return self.script[:len(ids)]


def run_scripted_scenario(scenario, script, **server_kw):
    async def main():
        mc = ModelConfig(
            model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=512,
            max_model_len=256, eos_token_id=-1)
        cfg = EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=256, max_num_seqs=4,
                max_model_len=256))
        llm = AsyncLLM(cfg, load_format="dummy",
                       tokenizer=ScriptedTokenizer(script))
        await llm.start()
        server = OpenAIServer(llm, model_name="tiny-test", **server_kw)
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            await scenario(client)
        finally:
            await client.close()
            await llm.stop()

    asyncio.run(main())


async def _collect_sse(resp):
    chunks = []
    async for line in resp.content:
        line = line.decode().strip()
        if not line.startswith("data:"):
            continue
        payload = line[5:].strip()
        if payload == "[DONE]":
            break
        chunks.append(json.loads(payload))
    return chunks


def _merge_chat_stream(chunks):
    content = ""
    reasoning = ""
    calls = {}
    finish = None
    for ch in chunks:
        d = ch["choices"][0]["delta"]
        content += d.get("content") or ""
        reasoning += d.get("reasoning_content") or ""
        for tc in d.get("tool_calls", []):
            c = calls.setdefault(tc["index"],
                                 {"id": None, "name": None, "args": ""})
            if tc.get("id"):
                c["id"] = tc["id"]
                c["name"] = tc["function"]["name"]
            c["args"] += tc.get("function", {}).get("arguments", "")
        if ch["choices"][0].get("finish_reason"):
            finish = ch["choices"][0]["finish_reason"]
    return content, reasoning, calls, finish


SCRIPT = ('I will check.<tool_call>{"name": "get_weather", '
          '"arguments": {"city": "Paris"}}</tool_call>')


def test_streaming_tool_call_deltas():
    """Streaming chat with tools set must emit delta.tool_calls chunks
    (header with id/name then argument fragments), never raw markup as
    content (reference: every serving parser's
    extract_tool_calls_streaming)."""
    async def scenario(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": len(SCRIPT) + 4, "temperature": 0.0,
            "stream": True,
            "tools": [{"type": "function",
                       "function": {"name": "get_weather"}}]})
        assert r.status == 200
        chunks = await _collect_sse(r)
        content, _reasoning, calls, finish = _merge_chat_stream(chunks)
        assert "<tool_call" not in content
        assert content.strip() == "I will check."
        assert len(calls) == 1
        call = calls[0]
        assert call["name"] == "get_weather" and call["id"]
        assert json.loads(call["args"]) == {"city": "Paris"}
        assert finish == "tool_calls"
        # Argument fragments must be incremental: more than one chunk
        # carried pieces of this call.
        n_arg_chunks = sum(
            1 for ch in chunks
            for tc in ch["choices"][0]["delta"].get("tool_calls", [])
            if tc.get("function", {}).get("arguments"))
        assert n_arg_chunks >= 2, chunks

    run_scripted_scenario(scenario, SCRIPT)


THINK_SCRIPT = "<think>step by step</think>The answer is 4."


def test_streaming_reasoning_deltas():
    async def scenario(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": len(THINK_SCRIPT) + 4, "temperature": 0.0,
            "stream": True})
        assert r.status == 200
        chunks = await _collect_sse(r)
        content, reasoning, calls, _ = _merge_chat_stream(chunks)
        assert reasoning == "step by step"
        assert content == "The answer is 4."
        assert "<think" not in content and "</think" not in content
        assert not calls

    run_scripted_scenario(scenario, THINK_SCRIPT)


def test_streaming_without_tools_keeps_content():
    """Same markup-bearing script WITHOUT tools: content passes through
    (tool parsing only activates when the request declares tools)."""
    async def scenario(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": len(SCRIPT) + 4, "temperature": 0.0,
            "stream": True})
        assert r.status == 200
        chunks = await _collect_sse(r)
        content, _r, calls, _f = _merge_chat_stream(chunks)
        assert not calls
        assert "<tool_call>" in content  # raw markup passes through

    run_scripted_scenario(scenario, SCRIPT)


def test_cross_encoder_score_and_rerank():
    """A classifier model (cross-encoder) routes /score and /rerank
    through joint-pair classification instead of embedding similarity."""
    async def scenario_with_classifier():
        from aiohttp.test_utils import TestClient, TestServer

        mc = ModelConfig(
            model="dummy", architecture="BertForSequenceClassification",
            dtype="float32", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4, head_dim=16,
            max_position_embeddings=256, max_model_len=128,
            eos_token_id=-1, num_labels=1, type_vocab_size=2)
        cfg = EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=128, max_num_seqs=4,
                max_model_len=128))
        llm = AsyncLLM(cfg, load_format="dummy",
                       tokenizer=IdentityTokenizer())
        await llm.start()
        server = OpenAIServer(llm, model_name="tiny-ce")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            r = await client.post("/v1/score", json={
                "text_1": "q", "text_2": ["aa", "bb"]})
            assert r.status == 200
            data = await r.json()
            assert len(data["data"]) == 2
            # single-label head → sigmoid probabilities in (0, 1)
            for row in data["data"]:
                assert 0.0 < row["score"] < 1.0

            r = await client.post("/v1/rerank", json={
                "query": "q", "documents": ["aa", "bb", "cc"],
                "top_n": 2})
            data = await r.json()
            assert len(data["results"]) == 2
            assert data["results"][0]["relevance_score"] >= \
                data["results"][1]["relevance_score"]
        finally:
            await client.close()
            await llm.stop()

    asyncio.run(scenario_with_classifier())


def test_pooling_route():
    async def scenario(client):
        r = await client.post("/v1/pooling", json={"input": ["abc", "defg"],
                                                   "task": "last"})
        assert r.status == 200
        data = await r.json()
        assert len(data["data"]) == 2
        assert data["data"][0]["object"] == "pooling"
        assert isinstance(data["data"][0]["data"], list)
        r2 = await client.post("/pooling", json={"input": "abc"})
        assert r2.status == 200
    run_scenario(scenario)
