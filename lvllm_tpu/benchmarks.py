"""Benchmark suites (reference: vllm/benchmarks/{latency,throughput,
serve}.py — `vllm bench latency|throughput|serve`).

- latency: end-to-end latency percentiles of one fixed batch.
- throughput: offline requests/s + tokens/s over a prompt set.
- serve: HTTP load against an in-process OpenAI server with Poisson
  arrivals; reports TTFT/TPOT/ITL percentiles (SSE streaming).
All print ONE JSON line.
"""

import asyncio
import json
import time
from typing import List, Optional

import numpy as np

from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def _percentiles(xs: List[float]) -> dict:
    if not xs:
        return {}
    a = np.asarray(xs)
    return {"p50": round(float(np.percentile(a, 50)), 4),
            "p90": round(float(np.percentile(a, 90)), 4),
            "p99": round(float(np.percentile(a, 99)), 4),
            "mean": round(float(a.mean()), 4)}


def _prompts(n: int, input_len: int, vocab: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    return [rng.integers(1, max(vocab - 1, 2),
                         size=input_len).tolist() for _ in range(n)]


def bench_latency(llm, batch: int = 8, input_len: int = 128,
                  output_len: int = 32, iters: int = 5) -> dict:
    """Reference: benchmarks/latency.py — latency of one batch, repeated."""
    from lvllm_tpu.sampling_params import SamplingParams
    vocab = llm.engine.core.config.model_config.vocab_size
    prompts = _prompts(batch, input_len, vocab)
    sp = SamplingParams(temperature=0.0, max_tokens=output_len)
    llm.generate(prompts[:1], SamplingParams(temperature=0.0, max_tokens=4))
    lat = []
    for _ in range(iters):
        t0 = time.time()
        llm.generate(prompts, sp)
        lat.append(time.time() - t0)
    out = {"metric": "latency_s", "batch": batch, "input_len": input_len,
           "output_len": output_len, **_percentiles(lat)}
    print(json.dumps(out))
    return out


def bench_throughput(llm, num_prompts: int = 64, input_len: int = 128,
                     output_len: int = 32) -> dict:
    """Reference: benchmarks/throughput.py — offline batch throughput."""
    from lvllm_tpu.sampling_params import SamplingParams
    vocab = llm.engine.core.config.model_config.vocab_size
    prompts = _prompts(num_prompts, input_len, vocab)
    sp = SamplingParams(temperature=0.0, max_tokens=output_len)
    llm.generate(prompts[:1], SamplingParams(temperature=0.0, max_tokens=4))
    t0 = time.time()
    outs = llm.generate(prompts, sp)
    dt = time.time() - t0
    gen = sum(len(o.outputs[0].token_ids) for o in outs)
    total = gen + num_prompts * input_len
    out = {"metric": "throughput",
           "requests_per_s": round(num_prompts / dt, 2),
           "output_tokens_per_s": round(gen / dt, 1),
           "total_tokens_per_s": round(total / dt, 1),
           "num_prompts": num_prompts, "elapsed_s": round(dt, 2)}
    print(json.dumps(out))
    return out


async def bench_serve(config, load_format: str = "auto", tokenizer=None,
                      num_prompts: int = 32, input_len: int = 64,
                      output_len: int = 16,
                      request_rate: Optional[float] = None,
                      mesh=None) -> dict:
    """Reference: benchmarks/serve.py — streaming HTTP load; TTFT/TPOT/ITL
    per request, Poisson arrivals (None = all at once)."""
    from aiohttp.test_utils import TestClient, TestServer

    from lvllm_tpu.engine.async_llm import AsyncLLM
    from lvllm_tpu.entrypoints.openai_server import OpenAIServer

    llm = AsyncLLM(config, load_format=load_format, tokenizer=tokenizer,
                   mesh=mesh)
    await llm.start()
    server = OpenAIServer(llm)
    client = TestClient(TestServer(server.app))
    await client.start_server()
    vocab = config.model_config.vocab_size
    prompts = _prompts(num_prompts, input_len, vocab)
    ttft, tpot, itl, e2e = [], [], [], []

    async def one(prompt, delay):
        await asyncio.sleep(delay)
        t0 = time.time()
        first = None
        stamps = []
        resp = await client.post("/v1/completions", json={
            "model": "bench", "prompt": prompt, "stream": True,
            "max_tokens": output_len, "temperature": 0.0})
        async for line in resp.content:
            if not line.startswith(b"data: ") or b"[DONE]" in line:
                continue
            now = time.time()
            if first is None:
                first = now
            stamps.append(now)
        if first is None:
            return
        ttft.append(first - t0)
        e2e.append(stamps[-1] - t0)
        if len(stamps) > 1:
            gaps = np.diff(stamps)
            itl.extend(gaps.tolist())
            tpot.append((stamps[-1] - first) / (len(stamps) - 1))

    rng = np.random.default_rng(0)
    delays = (np.cumsum(rng.exponential(1.0 / request_rate, num_prompts))
              if request_rate else np.zeros(num_prompts))
    t0 = time.time()
    await asyncio.gather(*[one(p, float(d))
                           for p, d in zip(prompts, delays)])
    wall = time.time() - t0
    await client.close()
    await llm.stop()
    out = {"metric": "serve",
           "ttft_s": _percentiles(ttft), "tpot_s": _percentiles(tpot),
           "itl_s": _percentiles(itl), "e2e_s": _percentiles(e2e),
           "completed": len(e2e), "wall_s": round(wall, 2),
           "throughput_tokens_per_s": round(
               len(e2e) * output_len / wall, 1)}
    print(json.dumps(out))
    return out
