"""OpenAI server vision input: image_url content blocks drive the LLaVA
path end-to-end (decode → CLIP normalize → placeholder splice → engine)."""

import asyncio
import base64
import io

import pytest

pytest.importorskip("aiohttp")
pytest.importorskip("PIL")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.async_llm import AsyncLLM
from lvllm_tpu.entrypoints.openai_server import OpenAIServer

from tests.engine.test_openai_server import IdentityTokenizer


def _png_data_url(color=(255, 0, 0)):
    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (32, 32), color).save(buf, format="PNG")
    return "data:image/png;base64," + \
        base64.b64encode(buf.getvalue()).decode()


def run_scenario(scenario):
    async def main():
        mc = ModelConfig(
            model="dummy", architecture="LlavaForConditionalGeneration",
            dtype="float32", vocab_size=128, hidden_size=48,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=12,
            qk_norm=False, max_position_embeddings=256, max_model_len=128,
            eos_token_id=-1, image_token_id=127,
            vision_config={"hidden_size": 32, "intermediate_size": 64,
                           "num_hidden_layers": 2, "num_attention_heads": 2,
                           "image_size": 28, "patch_size": 14})
        cfg = EngineConfig(
            model_config=mc,
            cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=128, max_num_seqs=4,
                max_model_len=128))
        llm = AsyncLLM(cfg, load_format="dummy",
                       tokenizer=IdentityTokenizer())
        await llm.start()
        server = OpenAIServer(llm, model_name="tiny-vision")
        client = TestClient(TestServer(server.app))
        await client.start_server()
        try:
            await scenario(client)
        finally:
            await client.close()
            await llm.stop()

    asyncio.run(main())


def test_chat_with_image():
    async def scenario(client):
        resp = await client.post("/v1/chat/completions", json={
            "model": "tiny-vision",
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "describe "},
                {"type": "image_url",
                 "image_url": {"url": _png_data_url()}},
            ]}],
            "max_tokens": 5, "temperature": 0,
        })
        assert resp.status == 200, await resp.text()
        data = await resp.json()
        assert data["choices"][0]["message"]["content"]

        # Different image → different pixels reach the model; both succeed.
        resp2 = await client.post("/v1/chat/completions", json={
            "model": "tiny-vision",
            "messages": [{"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": _png_data_url((0, 0, 255))}},
            ]}],
            "max_tokens": 5, "temperature": 0,
        })
        assert resp2.status == 200, await resp2.text()

        # Remote URLs are rejected (no egress).
        resp3 = await client.post("/v1/chat/completions", json={
            "model": "tiny-vision",
            "messages": [{"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": "https://example.com/cat.png"}},
            ]}],
            "max_tokens": 5,
        })
        assert resp3.status == 400

    run_scenario(scenario)
