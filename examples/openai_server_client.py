"""Boot the OpenAI-compatible server in-process and drive it (reference:
examples/online_serving/openai_chat_completion_client.py). In production:

    python -m lvllm_tpu serve <model> --port 8000
    curl localhost:8000/v1/chat/completions -d '{...}'

This example uses aiohttp's test client so it runs anywhere:
    JAX_PLATFORMS=cpu python examples/openai_server_client.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import asyncio

from aiohttp.test_utils import TestClient, TestServer

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.async_llm import AsyncLLM
from lvllm_tpu.entrypoints.openai_server import OpenAIServer


class TinyTokenizer:
    chat_template = None
    eos_token_id = -1

    def encode(self, text):
        return [ord(c) % 120 + 1 for c in text][:64]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (t % 26)) for t in ids)


async def main() -> None:
    cfg = EngineConfig(
        model_config=ModelConfig(
            model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=256,
            max_model_len=128, eos_token_id=-1),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128))
    llm = AsyncLLM(cfg, load_format="dummy", tokenizer=TinyTokenizer())
    await llm.start()
    server = OpenAIServer(llm, model_name="demo")
    client = TestClient(TestServer(server.app))
    await client.start_server()

    r = await client.post("/v1/chat/completions", json={
        "model": "demo", "max_tokens": 16, "temperature": 0,
        "messages": [{"role": "user", "content": "Hello!"}]})
    print("chat:", (await r.json())["choices"][0]["message"]["content"])

    r = await client.post("/v1/responses", json={
        "model": "demo", "input": "Hello!", "max_output_tokens": 8})
    print("responses:", (await r.json())["output_text"])

    await client.close()
    await llm.stop()


if __name__ == "__main__":
    asyncio.run(main())
