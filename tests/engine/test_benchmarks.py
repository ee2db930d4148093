"""Benchmark suites (reference: vllm bench latency|throughput|serve)."""

import asyncio

from lvllm_tpu.benchmarks import bench_latency, bench_serve, bench_throughput
from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.entrypoints.llm import LLM


def _mc():
    return ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=256, max_model_len=128,
        eos_token_id=-1)


def test_latency_and_throughput():
    llm = LLM(model_config=_mc(), load_format="dummy", max_num_seqs=4,
              max_num_batched_tokens=128, num_kv_blocks=64)
    lat = bench_latency(llm, batch=2, input_len=8, output_len=4, iters=2)
    assert lat["p50"] > 0
    thr = bench_throughput(llm, num_prompts=4, input_len=8, output_len=4)
    assert thr["requests_per_s"] > 0
    assert thr["output_tokens_per_s"] > 0


def test_serve_benchmark():
    class Tok:
        chat_template = None
        eos_token_id = -1

        def encode(self, text):
            return [ord(c) % 120 + 1 for c in text][:32]

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(97 + (t % 26)) for t in ids)

    cfg = EngineConfig(
        model_config=_mc(),
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4, max_model_len=128))
    out = asyncio.run(bench_serve(cfg, load_format="dummy", tokenizer=Tok(),
                                  num_prompts=3, input_len=8, output_len=4))
    assert out["completed"] == 3
    assert out["ttft_s"]["p50"] > 0
