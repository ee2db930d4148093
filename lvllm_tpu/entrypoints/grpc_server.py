"""gRPC serving endpoint — protobuf wire format.

Counterpart of the reference's gRPC server (``vllm/entrypoints/
grpc_server.py:serve_grpc`` — an AsyncLLM-backed engine servicer with
Generate/Abort/Health RPCs; message types from the external
``smg_grpc_proto`` package). The image has no ``protoc``, so the schema
(``engine.proto``) resolves through hand-constructed descriptors
(``engine_pb2.py``) — messages are standard proto3 wire bytes and any
stack compiling ``engine.proto`` interoperates.

service lvllm.Engine:
  Generate  (unary → server streaming)  GenerateRequest → GenerateResponse*
            (responses carry DELTA text/token_ids since the last message)
  Abort     AbortRequest → AbortResponse
  Health    HealthRequest → HealthResponse
"""

import asyncio
import json

from lvllm_tpu.entrypoints import engine_pb2 as pb
from lvllm_tpu.logger import init_logger
from lvllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)

SERVICE = pb.SERVICE_NAME

_SCALAR_FIELDS = (
    "temperature", "top_p", "top_k", "min_p", "max_tokens", "min_tokens",
    "seed", "presence_penalty", "frequency_penalty", "repetition_penalty",
    "logprobs", "n", "ignore_eos",
)


def _parse_sampling(msg) -> SamplingParams:
    """Proto → SamplingParams; unset optional fields keep the engine
    defaults (proto3 explicit presence via synthetic oneofs)."""
    kwargs = {}
    for name in _SCALAR_FIELDS:
        if msg.HasField(name):
            kwargs[name] = getattr(msg, name)
    if msg.stop:
        kwargs["stop"] = list(msg.stop)
    if msg.stop_token_ids:
        kwargs["stop_token_ids"] = list(msg.stop_token_ids)
    return SamplingParams(**kwargs)


def make_server(async_llm, host: str = "0.0.0.0", port: int = 50051):
    """Build (not start) a grpc.aio server wrapping an AsyncLLM."""
    import grpc

    async def generate(request, context):
        sp = (_parse_sampling(request.sampling_params)
              if request.HasField("sampling_params") else SamplingParams())
        prompt = (list(request.prompt_token_ids)
                  if request.prompt_token_ids else request.prompt)
        rid = request.request_id or None
        sent = 0
        sent_text = 0
        async for out in async_llm.generate(prompt, sp, request_id=rid):
            seq = out.outputs[0]
            text = seq.text or ""
            msg = pb.GenerateResponse(
                request_id=out.request_id,
                text=text[sent_text:],
                token_ids=list(seq.token_ids[sent:]),
                finished=out.finished,
                finish_reason=seq.finish_reason or "")
            sent = len(seq.token_ids)
            sent_text = len(text)
            yield msg

    async def abort(request, context):
        await async_llm.abort(request.request_id)
        return pb.AbortResponse(aborted=True)

    async def health(request, context):
        return pb.HealthResponse(
            status="SERVING", stats_json=json.dumps(async_llm.get_stats()))

    handlers = grpc.method_handlers_generic_handler(SERVICE, {
        "Generate": grpc.unary_stream_rpc_method_handler(
            generate,
            request_deserializer=pb.GenerateRequest.FromString,
            response_serializer=pb.GenerateResponse.SerializeToString),
        "Abort": grpc.unary_unary_rpc_method_handler(
            abort,
            request_deserializer=pb.AbortRequest.FromString,
            response_serializer=pb.AbortResponse.SerializeToString),
        "Health": grpc.unary_unary_rpc_method_handler(
            health,
            request_deserializer=pb.HealthRequest.FromString,
            response_serializer=pb.HealthResponse.SerializeToString),
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
    """Typed client stub over the proto service (the reference ships
    generated *_pb2_grpc stubs; this is their hand-rolled equivalent)."""

    def __init__(self, channel):
        self._generate = channel.unary_stream(
            f"/{SERVICE}/Generate",
            request_serializer=pb.GenerateRequest.SerializeToString,
            response_deserializer=pb.GenerateResponse.FromString)
        self._abort = channel.unary_unary(
            f"/{SERVICE}/Abort",
            request_serializer=pb.AbortRequest.SerializeToString,
            response_deserializer=pb.AbortResponse.FromString)
        self._health = channel.unary_unary(
            f"/{SERVICE}/Health",
            request_serializer=pb.HealthRequest.SerializeToString,
            response_deserializer=pb.HealthResponse.FromString)

    def generate(self, prompt, sampling_params=None, request_id=None):
        req = pb.GenerateRequest()
        if isinstance(prompt, str):
            req.prompt = prompt
        else:
            req.prompt_token_ids.extend(prompt)
        if request_id:
            req.request_id = request_id
        if sampling_params:
            for k, v in dict(sampling_params).items():
                if k in ("stop", "stop_token_ids"):
                    getattr(req.sampling_params, k).extend(
                        [v] if isinstance(v, str) else v)
                else:
                    setattr(req.sampling_params, k, v)
        else:
            req.sampling_params.SetInParent()
        for msg in self._generate(req):
            yield {"request_id": msg.request_id, "text": msg.text,
                   "token_ids": list(msg.token_ids),
                   "finished": msg.finished,
                   "finish_reason": msg.finish_reason or None}

    def abort(self, request_id: str) -> dict:
        resp = self._abort(pb.AbortRequest(request_id=request_id))
        return {"aborted": resp.aborted}

    def health(self) -> dict:
        resp = self._health(pb.HealthRequest())
        return {"status": resp.status,
                "stats": json.loads(resp.stats_json or "{}")}
