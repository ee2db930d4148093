"""gRPC serving endpoint.

Counterpart of the reference's gRPC server (``vllm/entrypoints/
grpc_server.py:serve_grpc`` — an AsyncLLM-backed engine servicer with
Generate/Abort/Health RPCs). The reference delegates message types to an
external protobuf package; this image has no ``protoc``/``grpc_tools``, so
the service is registered through ``grpc.aio`` *generic handlers* with
JSON-over-bytes messages — the RPC surface and streaming semantics match,
the wire encoding is documented here instead of a .proto:

service lvllm.Engine:
  Generate  (unary → server streaming)
      request : {"prompt": str | [int], "request_id"?: str,
                 "sampling_params"?: {temperature, top_p, top_k, min_p,
                                      max_tokens, stop, seed, ...}}
      response: {"request_id", "text", "token_ids", "finished",
                 "finish_reason"}   (deltas: new tokens since last message)
  Abort     (unary → unary)   request {"request_id"} → {"aborted": bool}
  Health    (unary → unary)   {} → {"status": "SERVING", "stats": {...}}
"""

import asyncio
import json
from typing import Optional

from lvllm_tpu.logger import init_logger
from lvllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)

SERVICE = "lvllm.Engine"

_SAMPLING_FIELDS = (
    "temperature", "top_p", "top_k", "min_p", "max_tokens", "min_tokens",
    "stop", "stop_token_ids", "seed", "presence_penalty",
    "frequency_penalty", "repetition_penalty", "logprobs", "n",
    "ignore_eos",
)


def _parse_sampling(d: Optional[dict]) -> SamplingParams:
    d = d or {}
    kwargs = {k: d[k] for k in _SAMPLING_FIELDS if k in d}
    return SamplingParams(**kwargs)


def _json_bytes(obj) -> bytes:
    return json.dumps(obj).encode()


def make_server(async_llm, host: str = "0.0.0.0", port: int = 50051):
    """Build (not start) a grpc.aio server wrapping an AsyncLLM."""
    import grpc

    async def generate(request: bytes, context):
        req = json.loads(request)
        sp = _parse_sampling(req.get("sampling_params"))
        prompt = req["prompt"]
        rid = req.get("request_id")
        sent = 0
        sent_text = 0
        async for out in async_llm.generate(prompt, sp, request_id=rid):
            seq = out.outputs[0]
            text = seq.text or ""
            msg = {
                "request_id": out.request_id,
                "text": text[sent_text:],
                "token_ids": list(seq.token_ids[sent:]),
                "finished": out.finished,
                "finish_reason": seq.finish_reason,
            }
            sent = len(seq.token_ids)
            sent_text = len(text)
            yield _json_bytes(msg)

    async def abort(request: bytes, context):
        req = json.loads(request)
        await async_llm.abort(req["request_id"])
        return _json_bytes({"aborted": True})

    async def health(request: bytes, context):
        return _json_bytes({"status": "SERVING",
                            "stats": async_llm.get_stats()})

    ident = lambda x: x  # noqa: E731  bytes in, bytes out
    handlers = grpc.method_handlers_generic_handler(SERVICE, {
        "Generate": grpc.unary_stream_rpc_method_handler(
            generate, request_deserializer=ident, response_serializer=ident),
        "Abort": grpc.unary_unary_rpc_method_handler(
            abort, request_deserializer=ident, response_serializer=ident),
        "Health": grpc.unary_unary_rpc_method_handler(
            health, request_deserializer=ident, response_serializer=ident),
    })
    server = grpc.aio.server()
    server.add_generic_rpc_handlers((handlers,))
    bound = server.add_insecure_port(f"{host}:{port}")
    return server, bound


async def serve_grpc(config, load_format: str = "auto", host: str = "0.0.0.0",
                     port: int = 50051, tokenizer=None, mesh=None) -> None:
    """Boot AsyncLLM + gRPC server and serve until cancelled (reference:
    serve_grpc, grpc_server.py)."""
    from lvllm_tpu.engine.async_llm import AsyncLLM

    async_llm = AsyncLLM(config, load_format=load_format,
                         tokenizer=tokenizer, mesh=mesh)
    await async_llm.start()
    server, bound = make_server(async_llm, host, port)
    await server.start()
    logger.info("gRPC server listening on %s:%d", host, bound)
    try:
        await server.wait_for_termination()
    finally:
        await async_llm.stop()


def main(argv=None) -> None:
    """``python -m lvllm_tpu.entrypoints.grpc_server <model> [--port]``
    (reference: grpc_server.py __main__)."""
    import argparse

    from lvllm_tpu.entrypoints.cli import (_add_engine_args,
                                           _apply_yaml_config,
                                           _build_config,
                                           _make_mesh_if_parallel)
    from lvllm_tpu.entrypoints.llm import _maybe_load_tokenizer

    parser = argparse.ArgumentParser("lvllm gRPC server")
    _add_engine_args(parser)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=50051)
    args = parser.parse_args(argv)
    _apply_yaml_config(args)
    config = _build_config(args)
    tokenizer = _maybe_load_tokenizer(config.model_config.model)
    asyncio.run(serve_grpc(config, load_format=args.load_format,
                           host=args.host, port=args.port,
                           tokenizer=tokenizer,
                           mesh=_make_mesh_if_parallel(args)))


if __name__ == "__main__":
    main()


class EngineStub:
    """Minimal client for the JSON-over-gRPC service (test/tooling use;
    the reference ships generated *_pb2_grpc stubs instead)."""

    def __init__(self, channel):
        import grpc  # noqa: F401
        ident = lambda x: x  # noqa: E731
        self._generate = channel.unary_stream(
            f"/{SERVICE}/Generate", request_serializer=ident,
            response_deserializer=ident)
        self._abort = channel.unary_unary(
            f"/{SERVICE}/Abort", request_serializer=ident,
            response_deserializer=ident)
        self._health = channel.unary_unary(
            f"/{SERVICE}/Health", request_serializer=ident,
            response_deserializer=ident)

    def generate(self, prompt, sampling_params=None, request_id=None):
        req = {"prompt": prompt}
        if sampling_params:
            req["sampling_params"] = sampling_params
        if request_id:
            req["request_id"] = request_id
        for msg in self._generate(_json_bytes(req)):
            yield json.loads(msg)

    def abort(self, request_id: str) -> dict:
        return json.loads(self._abort(_json_bytes({"request_id":
                                                   request_id})))

    def health(self) -> dict:
        return json.loads(self._health(_json_bytes({})))
