"""gRPC server tests (reference: the grpc_server.py Generate/Abort/Health
surface): boot the grpc.aio server in-process over a dummy-weight AsyncLLM
and exercise streaming generation + health + abort."""

import asyncio
import json

import pytest

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.async_llm import AsyncLLM
from lvllm_tpu.entrypoints.grpc_server import SERVICE, make_server


def _config():
    return EngineConfig(
        model_config=ModelConfig(
            model="dummy", architecture="Qwen3ForCausalLM", dtype="bfloat16",
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=32,
            max_position_embeddings=256, max_model_len=128,
            eos_token_id=-1),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=32),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=64,
                                         max_num_seqs=4, max_model_len=128),
    )


async def _with_server(body):
    import grpc

    async_llm = AsyncLLM(_config(), load_format="dummy")
    await async_llm.start()
    server, port = make_server(async_llm, "127.0.0.1", 0)
    await server.start()
    ident = lambda x: x  # noqa: E731
    channel = grpc.aio.insecure_channel(f"127.0.0.1:{port}")
    try:
        await body(channel, ident)
    finally:
        await channel.close()
        await server.stop(grace=None)
        await async_llm.stop()


def test_grpc_generate_stream():
    async def body(channel, ident):
        gen = channel.unary_stream(f"/{SERVICE}/Generate",
                                   request_serializer=ident,
                                   response_deserializer=ident)
        req = {"prompt": [1, 2, 3, 4, 5],
               "sampling_params": {"temperature": 0.0, "max_tokens": 6}}
        msgs = [json.loads(m) async for m in gen(json.dumps(req).encode())]
        assert msgs, "no stream messages"
        assert msgs[-1]["finished"]
        assert msgs[-1]["finish_reason"] == "length"
        all_tokens = [t for m in msgs for t in m["token_ids"]]
        assert len(all_tokens) == 6
        assert len({m["request_id"] for m in msgs}) == 1

    asyncio.run(_with_server(body))


def test_grpc_health_and_abort():
    async def body(channel, ident):
        health = channel.unary_unary(f"/{SERVICE}/Health",
                                     request_serializer=ident,
                                     response_deserializer=ident)
        resp = json.loads(await health(b"{}"))
        assert resp["status"] == "SERVING"
        assert "stats" in resp

        abort = channel.unary_unary(f"/{SERVICE}/Abort",
                                    request_serializer=ident,
                                    response_deserializer=ident)
        gen = channel.unary_stream(f"/{SERVICE}/Generate",
                                   request_serializer=ident,
                                   response_deserializer=ident)
        req = {"prompt": list(range(1, 20)), "request_id": "todrop",
               "sampling_params": {"temperature": 0.0, "max_tokens": 64}}
        stream = gen(json.dumps(req).encode())
        first = json.loads(await stream.read())
        assert first["request_id"] == "todrop"
        resp = json.loads(await abort(b'{"request_id": "todrop"}'))
        assert resp["aborted"]

    asyncio.run(_with_server(body))
