"""Hand-constructed protobuf descriptors for engine.proto.

The image ships the protobuf *runtime* but no ``protoc``, so this module
plays the role of the generated ``*_pb2.py``: it builds the
FileDescriptorProto that protoc would emit for ``engine.proto`` and
resolves real message classes through ``message_factory``. Messages
serialize to standard proto3 wire format — any stack compiling
``engine.proto`` interoperates byte-for-byte.

Reference counterpart: the external ``smg_grpc_proto.vllm_engine_pb2``
imported by ``vllm/entrypoints/grpc_server.py:31``.
"""

from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

_F = descriptor_pb2.FieldDescriptorProto

_TYPES = {
    "float": _F.TYPE_FLOAT,
    "int32": _F.TYPE_INT32,
    "int64": _F.TYPE_INT64,
    "bool": _F.TYPE_BOOL,
    "string": _F.TYPE_STRING,
    "message": _F.TYPE_MESSAGE,
}


def _field(name, number, ftype, repeated=False, type_name=None,
           opt=False):
    f = _F(name=name, number=number, type=_TYPES[ftype],
           label=(_F.LABEL_REPEATED if repeated else _F.LABEL_OPTIONAL))
    if type_name:
        f.type_name = type_name
    if opt:
        # proto3 `optional` = explicit presence via a synthetic oneof
        # (exactly what protoc emits): HasField() then works on scalars.
        f.proto3_optional = True
    return f


def _message(name, fields):
    m = descriptor_pb2.DescriptorProto(name=name)
    m.field.extend(fields)
    for f in m.field:
        if f.proto3_optional:
            f.oneof_index = len(m.oneof_decl)
            m.oneof_decl.add(name=f"_{f.name}")
    return m


def _build_file() -> descriptor_pb2.FileDescriptorProto:
    fdp = descriptor_pb2.FileDescriptorProto(
        name="lvllm/engine.proto", package="lvllm", syntax="proto3")
    fdp.message_type.extend([
        _message("SamplingParams", [
            _field("temperature", 1, "float", opt=True),
            _field("top_p", 2, "float", opt=True),
            _field("top_k", 3, "int32", opt=True),
            _field("min_p", 4, "float", opt=True),
            _field("max_tokens", 5, "int32", opt=True),
            _field("min_tokens", 6, "int32", opt=True),
            _field("stop", 7, "string", repeated=True),
            _field("stop_token_ids", 8, "int32", repeated=True),
            _field("seed", 9, "int64", opt=True),
            _field("presence_penalty", 10, "float", opt=True),
            _field("frequency_penalty", 11, "float", opt=True),
            _field("repetition_penalty", 12, "float", opt=True),
            _field("logprobs", 13, "int32", opt=True),
            _field("n", 14, "int32", opt=True),
            _field("ignore_eos", 15, "bool", opt=True),
        ]),
        _message("GenerateRequest", [
            _field("request_id", 1, "string"),
            _field("prompt", 2, "string"),
            _field("prompt_token_ids", 3, "int32", repeated=True),
            _field("sampling_params", 4, "message",
                   type_name=".lvllm.SamplingParams"),
        ]),
        _message("GenerateResponse", [
            _field("request_id", 1, "string"),
            _field("text", 2, "string"),
            _field("token_ids", 3, "int32", repeated=True),
            _field("finished", 4, "bool"),
            _field("finish_reason", 5, "string"),
        ]),
        _message("AbortRequest", [_field("request_id", 1, "string")]),
        _message("AbortResponse", [_field("aborted", 1, "bool")]),
        _message("HealthRequest", []),
        _message("HealthResponse", [
            _field("status", 1, "string"),
            _field("stats_json", 2, "string"),
        ]),
    ])
    svc = descriptor_pb2.ServiceDescriptorProto(name="Engine")
    svc.method.extend([
        descriptor_pb2.MethodDescriptorProto(
            name="Generate", input_type=".lvllm.GenerateRequest",
            output_type=".lvllm.GenerateResponse", server_streaming=True),
        descriptor_pb2.MethodDescriptorProto(
            name="Abort", input_type=".lvllm.AbortRequest",
            output_type=".lvllm.AbortResponse"),
        descriptor_pb2.MethodDescriptorProto(
            name="Health", input_type=".lvllm.HealthRequest",
            output_type=".lvllm.HealthResponse"),
    ])
    fdp.service.extend([svc])
    return fdp


_pool = descriptor_pool.Default()
try:
    _file = _pool.Add(_build_file())
except Exception:  # already registered (re-import in the same process)
    _file = _pool.FindFileByName("lvllm/engine.proto")


def _cls(name):
    return message_factory.GetMessageClass(
        _pool.FindMessageTypeByName(f"lvllm.{name}"))


SamplingParams = _cls("SamplingParams")
GenerateRequest = _cls("GenerateRequest")
GenerateResponse = _cls("GenerateResponse")
AbortRequest = _cls("AbortRequest")
AbortResponse = _cls("AbortResponse")
HealthRequest = _cls("HealthRequest")
HealthResponse = _cls("HealthResponse")

SERVICE_NAME = "lvllm.Engine"
