"""Request tracing: OTel-compatible per-request spans.

Counterpart of the reference's ``vllm/tracing/otel.py`` +
``tracing/utils.py SpanAttributes`` (request spans carrying
queue/prefill/decode latency, emitted from the output processor,
``v1/engine/output_processor.py:731``). The attribute names are kept
identical so downstream trace tooling reads either engine.

OpenTelemetry SDK is optional (not in the TPU image): when installed and
``otlp_traces_endpoint`` is set, spans export over OTLP; otherwise the
built-in exporters (in-memory for tests, console/JSONL for ops) record
the same spans. One span per request, stamped at finish with its full
latency breakdown.
"""

import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class SpanAttributes:
    """Reference-identical attribute names (vllm/tracing/utils.py:15)."""

    GEN_AI_USAGE_COMPLETION_TOKENS = "gen_ai.usage.completion_tokens"
    GEN_AI_USAGE_PROMPT_TOKENS = "gen_ai.usage.prompt_tokens"
    GEN_AI_REQUEST_MAX_TOKENS = "gen_ai.request.max_tokens"
    GEN_AI_REQUEST_TOP_P = "gen_ai.request.top_p"
    GEN_AI_REQUEST_TEMPERATURE = "gen_ai.request.temperature"
    GEN_AI_RESPONSE_MODEL = "gen_ai.response.model"
    GEN_AI_REQUEST_ID = "gen_ai.request.id"
    GEN_AI_REQUEST_N = "gen_ai.request.n"
    GEN_AI_LATENCY_TIME_IN_QUEUE = "gen_ai.latency.time_in_queue"
    GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN = \
        "gen_ai.latency.time_to_first_token"
    GEN_AI_LATENCY_E2E = "gen_ai.latency.e2e"
    GEN_AI_LATENCY_TIME_IN_MODEL_PREFILL = \
        "gen_ai.latency.time_in_model_prefill"
    GEN_AI_LATENCY_TIME_IN_MODEL_DECODE = \
        "gen_ai.latency.time_in_model_decode"
    GEN_AI_LATENCY_TIME_IN_MODEL_INFERENCE = \
        "gen_ai.latency.time_in_model_inference"


@dataclass
class Span:
    name: str
    start_time: float
    end_time: float
    attributes: Dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps({"name": self.name, "start": self.start_time,
                           "end": self.end_time,
                           "attributes": self.attributes})


class InMemorySpanExporter:
    """Test exporter (the analog of OTel SDK's InMemorySpanExporter)."""

    def __init__(self) -> None:
        self.spans: List[Span] = []

    def export(self, span: Span) -> None:
        self.spans.append(span)


class ConsoleSpanExporter:

    def export(self, span: Span) -> None:
        logger.info("trace span: %s", span.to_json())


class JsonlSpanExporter:

    def __init__(self, path: str) -> None:
        self.path = path

    def export(self, span: Span) -> None:
        with open(self.path, "a") as f:
            f.write(span.to_json() + "\n")


class OtlpSpanExporter:
    """Real OTLP export when the (optional) OpenTelemetry SDK is present
    (reference: init_otel_tracer, tracing/otel.py:61)."""

    def __init__(self, endpoint: str, service: str = "lvllm_tpu") -> None:
        from opentelemetry import trace as ot_trace
        from opentelemetry.exporter.otlp.proto.grpc.trace_exporter import (
            OTLPSpanExporter)
        from opentelemetry.sdk.resources import Resource
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import BatchSpanProcessor

        provider = TracerProvider(
            resource=Resource.create({"service.name": service}))
        provider.add_span_processor(
            BatchSpanProcessor(OTLPSpanExporter(endpoint=endpoint)))
        self._tracer = provider.get_tracer("lvllm_tpu")

    def export(self, span: Span) -> None:
        ot = self._tracer.start_span(
            span.name, start_time=int(span.start_time * 1e9))
        for k, v in span.attributes.items():
            ot.set_attribute(k, v)
        ot.end(end_time=int(span.end_time * 1e9))


def make_exporter(spec: Optional[str]):
    """'memory' | 'console' | 'jsonl:<path>' | 'otlp:<endpoint>' | None."""
    if not spec:
        return None
    if spec == "memory":
        return InMemorySpanExporter()
    if spec == "console":
        return ConsoleSpanExporter()
    if spec.startswith("jsonl:"):
        return JsonlSpanExporter(spec.split(":", 1)[1])
    if spec.startswith("otlp:"):
        try:
            return OtlpSpanExporter(spec.split(":", 1)[1])
        except ImportError:
            logger.warning("opentelemetry SDK not installed; tracing "
                           "disabled (wanted %s)", spec)
            return None
    raise ValueError(f"unknown trace exporter spec {spec!r}")


class RequestTracer:
    """Builds one llm_request span per finished request from the engine's
    RequestTiming record (reference: do_tracing,
    v1/engine/output_processor.py:713)."""

    def __init__(self, exporter, model_name: str = "lvllm-model") -> None:
        self.exporter = exporter
        self.model_name = model_name

    def on_request_finished(self, request, timing, now: Optional[float]
                            = None) -> None:
        if self.exporter is None or timing is None:
            return
        now = now or time.time()
        A = SpanAttributes
        sp = request.sampling_params
        first = timing.first_token or now
        scheduled = timing.scheduled or timing.arrival
        attrs = {
            A.GEN_AI_RESPONSE_MODEL: self.model_name,
            A.GEN_AI_REQUEST_ID: request.request_id,
            A.GEN_AI_USAGE_PROMPT_TOKENS: request.num_prompt_tokens,
            A.GEN_AI_USAGE_COMPLETION_TOKENS: timing.num_generated,
            A.GEN_AI_LATENCY_TIME_IN_QUEUE: scheduled - timing.arrival,
            A.GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN: first - timing.arrival,
            A.GEN_AI_LATENCY_E2E: now - timing.arrival,
            A.GEN_AI_LATENCY_TIME_IN_MODEL_PREFILL: first - scheduled,
            A.GEN_AI_LATENCY_TIME_IN_MODEL_DECODE: now - first,
            A.GEN_AI_LATENCY_TIME_IN_MODEL_INFERENCE: now - scheduled,
        }
        if sp is not None:
            attrs[A.GEN_AI_REQUEST_TEMPERATURE] = sp.temperature
            attrs[A.GEN_AI_REQUEST_TOP_P] = sp.top_p
            if sp.max_tokens is not None:
                attrs[A.GEN_AI_REQUEST_MAX_TOKENS] = sp.max_tokens
            attrs[A.GEN_AI_REQUEST_N] = sp.n
        self.exporter.export(Span("llm_request", timing.arrival, now,
                                  attrs))
