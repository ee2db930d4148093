"""/v1/realtime WebSocket endpoint tests (reference: OpenAI Realtime API
serving; text-conversation subset)."""

import asyncio
import json

import numpy as np
import pytest

aiohttp_test = pytest.importorskip("aiohttp.test_utils")

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,  # noqa: E402
                              SchedulerConfig)
from lvllm_tpu.engine.async_llm import AsyncLLM  # noqa: E402
from lvllm_tpu.entrypoints.openai_server import OpenAIServer  # noqa: E402


class CharTokenizer:
    eos_token_id = 0

    def encode(self, text, add_special_tokens=False):
        return [max(ord(c) % 128, 1) for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(t) for t in ids if t > 0)


def test_realtime_text_session():
    asyncio.run(_run())


async def _run():
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, max_model_len=128,
        eos_token_id=0, seed=7)
    cfg = EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128))
    llm = AsyncLLM(cfg, load_format="dummy", tokenizer=CharTokenizer())
    srv = OpenAIServer(llm, tool_parser=None, enable_reasoning=False)
    client = aiohttp_test.TestClient(aiohttp_test.TestServer(srv.app))
    await client.start_server()
    try:
        ws = await client.ws_connect("/v1/realtime")
        created = json.loads((await ws.receive()).data)
        assert created["type"] == "session.created"

        await ws.send_json({"type": "session.update",
                            "session": {"modalities": ["text"]}})
        assert json.loads((await ws.receive()).data)["type"] == \
            "session.updated"

        await ws.send_json({
            "type": "conversation.item.create",
            "item": {"type": "message", "role": "user",
                     "content": [{"type": "input_text",
                                  "text": "hello"}]}})
        assert json.loads((await ws.receive()).data)["type"] == \
            "conversation.item.created"

        await ws.send_json({"type": "response.create",
                            "response": {"temperature": 0.0,
                                         "max_output_tokens": 8}})
        deltas, done = [], None
        for _ in range(200):
            ev = json.loads((await ws.receive()).data)
            if ev["type"] == "response.text.delta":
                deltas.append(ev["delta"])
            elif ev["type"] == "response.done":
                done = ev
                break
            elif ev["type"] in ("response.created", "response.text.done"):
                continue
            else:
                raise AssertionError(ev)
        assert done is not None
        full = done["response"]["output"][0]["content"][0]["text"]
        assert "".join(deltas) == full and len(full) > 0
        await ws.send_json({"type": "session.close"})
        await ws.close()
    finally:
        await client.close()
