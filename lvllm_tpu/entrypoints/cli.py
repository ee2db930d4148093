"""CLI: ``python -m lvllm_tpu serve|complete|bench``.

Counterpart of the reference's ``vllm/entrypoints/cli/`` (``vllm
serve|chat|complete|bench``).
"""

import argparse
import asyncio
import sys

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              ParallelConfig, SchedulerConfig)
from lvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def _add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", help="model path or 'dummy'")
    p.add_argument("--max-model-len", type=int, default=None)
    p.add_argument("--max-num-seqs", type=int, default=128)
    p.add_argument("--max-num-batched-tokens", type=int, default=2048)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--num-kv-blocks", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    p.add_argument("--expert-parallel-size", "-ep", type=int, default=1)
    p.add_argument("--load-format", default="auto",
                   choices=["auto", "safetensors", "dummy"])
    p.add_argument("--no-prefix-caching", action="store_true")
    # The environment's TPU bootstrap overrides JAX_PLATFORMS, so platform
    # choice must go through jax.config (see tests/conftest.py note).
    p.add_argument("--device", default="auto", choices=["auto", "cpu", "tpu"])


def _build_config(args) -> EngineConfig:
    if args.model == "dummy":
        mc = ModelConfig(model="dummy", dtype=args.dtype)
        args.load_format = "dummy"
    else:
        from lvllm_tpu.model_loader.hf_config import load_model_config
        mc = load_model_config(args.model, max_model_len=args.max_model_len,
                               dtype=args.dtype)
    return EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(
            block_size=args.block_size,
            num_gpu_blocks=args.num_kv_blocks,
            enable_prefix_caching=not args.no_prefix_caching),
        scheduler_config=SchedulerConfig(
            max_num_batched_tokens=args.max_num_batched_tokens,
            max_num_seqs=args.max_num_seqs,
            max_model_len=mc.max_model_len),
        parallel_config=ParallelConfig(
            tensor_parallel_size=args.tensor_parallel_size,
            expert_parallel_size=args.expert_parallel_size),
    )


def _make_mesh_if_parallel(args):
    if args.tensor_parallel_size * args.expert_parallel_size > 1:
        from lvllm_tpu.parallel.mesh import make_mesh
        return make_mesh(ParallelConfig(
            tensor_parallel_size=args.tensor_parallel_size,
            expert_parallel_size=args.expert_parallel_size))
    return None


def cmd_serve(args) -> None:
    from lvllm_tpu.entrypoints.llm import _maybe_load_tokenizer
    from lvllm_tpu.entrypoints.openai_server import serve
    config = _build_config(args)
    tokenizer = _maybe_load_tokenizer(config.model_config.model)
    asyncio.run(serve(config, host=args.host, port=args.port,
                      load_format=args.load_format, tokenizer=tokenizer,
                      model_name=args.served_model_name or args.model,
                      mesh=_make_mesh_if_parallel(args)))


def cmd_complete(args) -> None:
    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams
    llm = LLM(model=args.model, load_format=args.load_format,
              max_model_len=args.max_model_len,
              max_num_seqs=args.max_num_seqs,
              max_num_batched_tokens=args.max_num_batched_tokens,
              block_size=args.block_size, num_kv_blocks=args.num_kv_blocks,
              dtype=args.dtype, mesh=_make_mesh_if_parallel(args))
    sp = SamplingParams(temperature=args.temperature,
                        max_tokens=args.max_tokens)
    prompt = args.prompt if args.prompt else sys.stdin.read()
    out = llm.generate([prompt], sp)[0]
    print(out.outputs[0].text)


def cmd_bench(args) -> None:
    import bench
    bench.main()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="lvllm")
    sub = parser.add_subparsers(dest="command", required=True)

    p_serve = sub.add_parser("serve", help="start OpenAI-compatible server")
    _add_engine_args(p_serve)
    p_serve.add_argument("--host", default="0.0.0.0")
    p_serve.add_argument("--port", type=int, default=8000)
    p_serve.add_argument("--served-model-name", default=None)
    p_serve.set_defaults(func=cmd_serve)

    p_c = sub.add_parser("complete", help="one-shot completion")
    _add_engine_args(p_c)
    p_c.add_argument("--prompt", default=None)
    p_c.add_argument("--max-tokens", type=int, default=64)
    p_c.add_argument("--temperature", type=float, default=0.0)
    p_c.set_defaults(func=cmd_complete)

    p_b = sub.add_parser("bench", help="run the benchmark")
    p_b.set_defaults(func=cmd_bench)

    args = parser.parse_args(argv)
    if getattr(args, "device", "auto") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    args.func(args)


if __name__ == "__main__":
    main()
