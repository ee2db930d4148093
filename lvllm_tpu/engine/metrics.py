"""Engine metrics: scheduler stats, iteration stats, request latency
histograms.

Counterpart of the reference's ``vllm/v1/metrics/`` (SchedulerStats /
IterationStats produced in update_from_output, StatLoggerBase console +
Prometheus loggers with ~40 vllm:* series). Prometheus exposition keeps the
vllm:* names so existing dashboards read it.
"""

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)

# Histogram bucket edges (seconds) — match the reference's latency buckets.
TTFT_BUCKETS = (0.001, 0.005, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1, 0.25, 0.5,
                0.75, 1.0, 2.5, 5.0, 7.5, 10.0, 20.0, 40.0, 80.0)
TPOT_BUCKETS = (0.001, 0.0025, 0.005, 0.0075, 0.01, 0.015, 0.02, 0.025,
                0.03, 0.04, 0.05, 0.075, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5,
                0.75, 1.0)
E2E_BUCKETS = (0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, 20.0, 40.0, 80.0,
               160.0, 320.0)


def _125_buckets(max_value: int) -> tuple:
    """1-2-5 ladder up to max_value (reference: build_1_2_5_buckets,
    v1/metrics/loggers.py)."""
    out, exp = [], 0
    while True:
        for m in (1, 2, 5):
            v = m * 10 ** exp
            if v > max_value:
                return tuple(out)
            out.append(v)
        exp += 1


class Histogram:

    def __init__(self, buckets):
        self.buckets = buckets
        self.counts = [0] * (len(buckets) + 1)
        self.total = 0.0
        self.n = 0

    def observe(self, v: float) -> None:
        self.total += v
        self.n += 1
        for i, b in enumerate(self.buckets):
            if v <= b:
                self.counts[i] += 1
                return
        self.counts[-1] += 1

    def prometheus_lines(self, name: str, labels: str = "") -> List[str]:
        lines = [f"# TYPE {name} histogram"]
        cum = 0
        for b, c in zip(self.buckets, self.counts):
            cum += c
            lines.append(f'{name}_bucket{{le="{b}"{labels}}} {cum}')
        cum += self.counts[-1]
        lines.append(f'{name}_bucket{{le="+Inf"{labels}}} {cum}')
        lines.append(f"{name}_sum{labels and '{'+labels+'}'} "
                     f"{self.total:.6f}".replace("  ", " "))
        lines.append(f"{name}_count {cum}")
        return lines

    @property
    def mean(self) -> float:
        return self.total / self.n if self.n else 0.0


@dataclass
class RequestTiming:
    arrival: float
    scheduled: Optional[float] = None   # first time the scheduler ran it
    first_token: Optional[float] = None
    last_token: Optional[float] = None
    num_generated: int = 0
    num_prompt: int = 0


class EngineMetrics:
    """Collects per-request TTFT/TPOT/E2E + cumulative counters.

    Series breadth matches the reference Prometheus logger
    (v1/metrics/loggers.py:452-930): interval histograms (TTFT, ITL,
    E2E, queue/prefill/decode/inference time), request-size histograms
    (prompt/generation tokens, per-request mean TPOT, params n /
    max_tokens), iteration tokens, and cumulative counters (prompt /
    cached / generation tokens, success by reason, preemptions live in
    the scheduler stats)."""

    def __init__(self, max_model_len: int = 32768,
                 max_num_batched_tokens: int = 8192) -> None:
        self.ttft = Histogram(TTFT_BUCKETS)
        self.tpot = Histogram(TPOT_BUCKETS)
        self.e2e = Histogram(E2E_BUCKETS)
        self.queue_time = Histogram(E2E_BUCKETS)
        self.prefill_time = Histogram(E2E_BUCKETS)
        self.decode_time = Histogram(E2E_BUCKETS)
        self.inference_time = Histogram(E2E_BUCKETS)
        len_buckets = _125_buckets(max_model_len)
        self.request_prompt_tokens = Histogram(len_buckets)
        self.request_generation_tokens = Histogram(len_buckets)
        self.request_mean_tpot = Histogram(TPOT_BUCKETS)
        self.request_params_n = Histogram((1, 2, 5, 10, 20))
        self.request_params_max_tokens = Histogram(len_buckets)
        self.iteration_tokens = Histogram(
            _125_buckets(max_num_batched_tokens))
        self.num_prompt_tokens = 0
        self.num_cached_tokens = 0
        self.num_generation_tokens = 0
        self.num_requests_finished = 0
        self.finished_by_reason: Dict[str, int] = {}
        self._timing: Dict[str, RequestTiming] = {}

    # ---- lifecycle hooks ---------------------------------------------------

    def on_request_added(self, request_id: str, num_prompt_tokens: int,
                         now: Optional[float] = None,
                         params=None) -> None:
        self._timing[request_id] = RequestTiming(now or time.time(),
                                                 num_prompt=num_prompt_tokens)
        self.num_prompt_tokens += num_prompt_tokens
        self.request_prompt_tokens.observe(num_prompt_tokens)
        if params is not None:
            self.request_params_n.observe(getattr(params, "n", 1) or 1)
            mt = getattr(params, "max_tokens", None)
            if mt:
                self.request_params_max_tokens.observe(mt)

    def on_iteration(self, num_tokens: int) -> None:
        """One engine step's total scheduled tokens (reference:
        vllm:iteration_tokens_total, loggers.py:712)."""
        self.iteration_tokens.observe(num_tokens)

    def on_request_scheduled(self, request_id: str,
                             now: Optional[float] = None) -> None:
        t = self._timing.get(request_id)
        if t is not None and t.scheduled is None:
            t.scheduled = now or time.time()

    def timing(self, request_id: str) -> Optional[RequestTiming]:
        """Peek a live request's timing record (for the tracer, which
        stamps the span before on_request_finished pops it)."""
        return self._timing.get(request_id)

    def on_tokens(self, request_id: str, num_new: int,
                  now: Optional[float] = None) -> None:
        t = self._timing.get(request_id)
        if t is None:
            return
        now = now or time.time()
        if t.first_token is None:
            t.first_token = now
            self.ttft.observe(now - t.arrival)
        elif t.last_token is not None:
            # Inter-token latency per emitted token this step.
            self.tpot.observe((now - t.last_token) / max(num_new, 1))
        t.last_token = now
        t.num_generated += num_new
        self.num_generation_tokens += num_new

    def on_request_finished(self, request_id: str,
                            now: Optional[float] = None,
                            finish_reason: Optional[str] = None,
                            num_cached_tokens: int = 0) -> None:
        t = self._timing.pop(request_id, None)
        if t is None:
            return
        now = now or time.time()
        self.e2e.observe(now - t.arrival)
        self.num_requests_finished += 1
        reason = finish_reason or "stop"
        self.finished_by_reason[reason] = \
            self.finished_by_reason.get(reason, 0) + 1
        self.num_cached_tokens += num_cached_tokens
        self.request_generation_tokens.observe(t.num_generated)
        if t.scheduled is not None:
            self.queue_time.observe(t.scheduled - t.arrival)
            self.inference_time.observe(now - t.scheduled)
            if t.first_token is not None:
                self.prefill_time.observe(t.first_token - t.scheduled)
                self.decode_time.observe(now - t.first_token)
                if t.num_generated > 1:
                    self.request_mean_tpot.observe(
                        (now - t.first_token) / (t.num_generated - 1))

    # ---- export ------------------------------------------------------------

    def prometheus_lines(self) -> List[str]:
        lines = [
            "# TYPE vllm:prompt_tokens_total counter",
            f"vllm:prompt_tokens_total {self.num_prompt_tokens}",
            "# TYPE vllm:prompt_tokens_cached_total counter",
            f"vllm:prompt_tokens_cached_total {self.num_cached_tokens}",
            "# TYPE vllm:generation_tokens_total counter",
            f"vllm:generation_tokens_total {self.num_generation_tokens}",
            "# TYPE vllm:request_success_total counter",
        ]
        if self.finished_by_reason:
            for reason, n in sorted(self.finished_by_reason.items()):
                lines.append(
                    f'vllm:request_success_total{{finished_reason='
                    f'"{reason}"}} {n}')
        else:
            lines.append(
                f"vllm:request_success_total {self.num_requests_finished}")
        lines += self.ttft.prometheus_lines("vllm:time_to_first_token_seconds")
        lines += self.tpot.prometheus_lines("vllm:time_per_output_token_seconds")
        # Same observations under the reference's newer name
        # (loggers.py:788 — dashboards may scrape either).
        lines += self.tpot.prometheus_lines("vllm:inter_token_latency_seconds")
        lines += self.request_mean_tpot.prometheus_lines(
            "vllm:request_time_per_output_token_seconds")
        lines += self.e2e.prometheus_lines("vllm:e2e_request_latency_seconds")
        lines += self.queue_time.prometheus_lines(
            "vllm:request_queue_time_seconds")
        lines += self.prefill_time.prometheus_lines(
            "vllm:request_prefill_time_seconds")
        lines += self.decode_time.prometheus_lines(
            "vllm:request_decode_time_seconds")
        lines += self.inference_time.prometheus_lines(
            "vllm:request_inference_time_seconds")
        lines += self.request_prompt_tokens.prometheus_lines(
            "vllm:request_prompt_tokens")
        lines += self.request_generation_tokens.prometheus_lines(
            "vllm:request_generation_tokens")
        lines += self.request_params_n.prometheus_lines(
            "vllm:request_params_n")
        lines += self.request_params_max_tokens.prometheus_lines(
            "vllm:request_params_max_tokens")
        lines += self.iteration_tokens.prometheus_lines(
            "vllm:iteration_tokens_total")
        return lines

    def summary(self) -> dict:
        return {
            "requests_finished": self.num_requests_finished,
            "prompt_tokens": self.num_prompt_tokens,
            "generation_tokens": self.num_generation_tokens,
            "mean_ttft_s": round(self.ttft.mean, 4),
            "mean_tpot_s": round(self.tpot.mean, 4),
            "mean_e2e_s": round(self.e2e.mean, 4),
        }
