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
    _add_engine_args_rest(p)


def _add_engine_args_optional_model(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default="dummy", help="model path or 'dummy'")
    _add_engine_args_rest(p)


def _add_engine_args_rest(p: argparse.ArgumentParser) -> None:
    p.add_argument("--max-model-len", type=int, default=None)
    p.add_argument("--max-num-seqs", type=int, default=128)
    p.add_argument("--max-num-batched-tokens", type=int, default=2048)
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--num-kv-blocks", type=int, default=None)
    p.add_argument("--swap-space-gb", type=float, default=0.0,
                   help="host-RAM KV offload tier size (0 = off)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    p.add_argument("--expert-parallel-size", "-ep", type=int, default=1)
    p.add_argument("--decode-context-parallel-size", "-dcp", type=int,
                   default=1)
    p.add_argument("--moe-backend", default="naive",
                   choices=["naive", "alltoall"])
    p.add_argument("--moe-ubatches", type=int, default=1,
                   help="DBO micro-batches for the alltoall EP backend")
    p.add_argument("--load-format", default="auto",
                   choices=["auto", "safetensors", "dummy"])
    p.add_argument("--no-prefix-caching", action="store_true")
    # The environment's TPU bootstrap overrides JAX_PLATFORMS, so platform
    # choice must go through jax.config (see tests/conftest.py note).
    p.add_argument("--device", default="auto", choices=["auto", "cpu", "tpu"])
    p.add_argument("--quantization", "-q", default=None,
                   choices=["int8", "int4", "fp8"],
                   help="weight-only quantization of MoE experts on load")
    p.add_argument("--moe-quant-overrides", default=None,
                   help="per-layer hybrid MoE quantization map, e.g. "
                        "'fp8:0-3;int4:4-23' (reference MoeComputeStrategy)")
    p.add_argument("--kv-cache-dtype", default="auto",
                   choices=["auto", "bfloat16", "fp8"])
    p.add_argument("--multi-step-decode", type=int, default=1,
                   help="fold N decode steps into one on-device scan")
    p.add_argument("--async-scheduling", action="store_true",
                   help="overlap host scheduling with device execution")
    p.add_argument("--enable-expert-offload", action="store_true",
                   help="stream cold MoE expert weights from host RAM")
    p.add_argument("--hbm-resident-moe-layers", default="",
                   help="layers pinned in HBM, range syntax e.g. '0-3,9'")
    p.add_argument("--offload-prefetch-window", type=int, default=1)
    p.add_argument("--speculative-method", default=None,
                   choices=["ngram", "draft_model", "eagle", "eagle3",
                            "medusa", "suffix"])
    p.add_argument("--num-speculative-tokens", type=int, default=4)
    p.add_argument("--draft-model", default=None,
                   help="checkpoint path of the draft LM "
                        "(--speculative-method draft_model)")
    p.add_argument("--enable-lora", action="store_true")
    p.add_argument("--max-loras", type=int, default=8)
    p.add_argument("--config", default=None,
                   help="YAML file of engine args (CLI flags win)")


def _apply_yaml_config(args) -> None:
    """Merge a YAML config file under explicit CLI flags (reference:
    --config config.yaml support, arg_utils.py)."""
    if not getattr(args, "config", None):
        return
    import yaml
    with open(args.config) as f:
        data = yaml.safe_load(f) or {}
    for key, value in data.items():
        attr = key.replace("-", "_")
        if hasattr(args, attr):
            setattr(args, attr, value)
        else:
            logger.warning("unknown config key %r ignored", key)


def _build_config(args) -> EngineConfig:
    _apply_yaml_config(args)
    if args.model == "dummy":
        mc = ModelConfig(model="dummy", dtype=args.dtype)
        args.load_format = "dummy"
    else:
        from lvllm_tpu.model_loader.hf_config import load_model_config
        mc = load_model_config(args.model, max_model_len=args.max_model_len,
                               dtype=args.dtype)
    if args.quantization:
        mc.quantization = args.quantization
    if getattr(args, "moe_quant_overrides", None):
        mc.moe_quant_overrides = args.moe_quant_overrides
    from lvllm_tpu.config import (LoRAConfig, OffloadConfig,
                                  SpeculativeConfig)
    return EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(
            block_size=args.block_size,
            num_gpu_blocks=args.num_kv_blocks,
            enable_prefix_caching=not args.no_prefix_caching,
            kv_cache_dtype=args.kv_cache_dtype,
            swap_space_gb=args.swap_space_gb),
        scheduler_config=SchedulerConfig(
            max_num_batched_tokens=args.max_num_batched_tokens,
            max_num_seqs=args.max_num_seqs,
            multi_step_decode=args.multi_step_decode,
            max_model_len=mc.max_model_len,
            async_scheduling=args.async_scheduling),
        parallel_config=ParallelConfig(
            tensor_parallel_size=args.tensor_parallel_size,
            expert_parallel_size=args.expert_parallel_size,
            decode_context_parallel_size=args.decode_context_parallel_size,
            moe_backend=args.moe_backend,
            moe_ubatches=args.moe_ubatches),
        offload_config=OffloadConfig(
            enabled=args.enable_expert_offload,
            hbm_resident_moe_layers=args.hbm_resident_moe_layers,
            prefetch_window=args.offload_prefetch_window),
        speculative_config=SpeculativeConfig(
            method=args.speculative_method,
            num_speculative_tokens=args.num_speculative_tokens,
            draft_model=getattr(args, "draft_model", None)),
        lora_config=LoRAConfig(enabled=args.enable_lora,
                               max_loras=args.max_loras),
    )


def _make_mesh_if_parallel(args):
    dcp = getattr(args, "decode_context_parallel_size", 1)
    if args.tensor_parallel_size * args.expert_parallel_size * dcp > 1:
        from lvllm_tpu.parallel.mesh import make_mesh
        return make_mesh(ParallelConfig(
            tensor_parallel_size=args.tensor_parallel_size,
            expert_parallel_size=args.expert_parallel_size,
            decode_context_parallel_size=dcp))
    return None


def cmd_serve(args) -> None:
    from lvllm_tpu.entrypoints.llm import _maybe_load_tokenizer
    from lvllm_tpu.entrypoints.openai_server import serve
    config = _build_config(args)
    tokenizer = _maybe_load_tokenizer(config.model_config.model)
    asyncio.run(serve(config, host=args.host, port=args.port,
                      load_format=args.load_format, tokenizer=tokenizer,
                      model_name=args.served_model_name or args.model,
                      mesh=_make_mesh_if_parallel(args),
                      tool_parser=args.tool_call_parser,
                      reasoning_parser=args.reasoning_parser))


def cmd_complete(args) -> None:
    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams
    llm = LLM.from_engine_config(_build_config(args),
                                 load_format=args.load_format,
                                 mesh=_make_mesh_if_parallel(args))
    sp = SamplingParams(temperature=args.temperature,
                        max_tokens=args.max_tokens)
    prompt = args.prompt if args.prompt else sys.stdin.read()
    out = llm.generate([prompt], sp)[0]
    print(out.outputs[0].text)


def cmd_chat(args) -> None:
    """Interactive chat REPL (reference: `vllm chat`,
    entrypoints/cli/chat.py): chat-template the running history each
    turn and stream the completion."""
    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams
    llm = LLM.from_engine_config(_build_config(args),
                                 load_format=args.load_format,
                                 mesh=_make_mesh_if_parallel(args))
    tok = llm.engine.tokenizer
    history = []
    if args.system_prompt:
        history.append({"role": "system", "content": args.system_prompt})
    sp = SamplingParams(temperature=args.temperature,
                        max_tokens=args.max_tokens)
    print("lvllm chat — empty line or Ctrl-D to exit")
    while True:
        try:
            msg = input("> ").strip()
        except EOFError:
            break
        if not msg:
            break
        history.append({"role": "user", "content": msg})
        if tok is not None and getattr(tok, "chat_template", None):
            prompt = tok.apply_chat_template(
                history, tokenize=False, add_generation_prompt=True)
        else:
            prompt = "\n".join(f"{m['role']}: {m['content']}"
                                for m in history) + "\nassistant:"
        if tok is None:
            # Dummy-model mode: byte-level ids, raw token-id output.
            V = llm.engine.core.config.model_config.vocab_size
            ids = [ord(c) % V for c in prompt][-512:]
            toks = llm.generate([ids], sp)[0].outputs[0].token_ids
            out = " ".join(str(t) for t in toks)
        else:
            out = llm.generate([prompt], sp)[0].outputs[0].text
        print(out)
        history.append({"role": "assistant", "content": out})


def cmd_collect_env(args) -> None:
    """Environment report (reference: `vllm collect-env`,
    collect_env.py): versions, devices, compile-cache state."""
    import platform

    import jax

    import lvllm_tpu

    print(f"lvllm_tpu: {getattr(lvllm_tpu, '__version__', 'dev')}")
    print(f"python: {platform.python_version()} ({platform.platform()})")
    print(f"jax: {jax.__version__}")
    try:
        import jaxlib
        print(f"jaxlib: {jaxlib.__version__}")
    except Exception:  # noqa: BLE001
        pass
    for mod in ("flax", "optax", "numpy", "transformers"):
        try:
            m = __import__(mod)
            print(f"{mod}: {m.__version__}")
        except Exception:  # noqa: BLE001
            print(f"{mod}: <absent>")
    try:
        devs = jax.devices()
        print(f"backend: {jax.default_backend()} ({len(devs)} device(s))")
        for d in devs:
            print(f"  {d.device_kind} id={d.id}")
        stats = getattr(devs[0], "memory_stats", lambda: None)()
        if stats and "bytes_limit" in stats:
            print(f"  memory limit: {stats['bytes_limit'] / 1e9:.1f} GB")
    except Exception as e:  # noqa: BLE001
        print(f"backend: <unavailable: {e}>")
    import os
    cache = os.path.join(os.getcwd(), ".jax_cache")
    if os.path.isdir(cache):
        n = sum(len(fs) for _, _, fs in os.walk(cache))
        print(f"compile cache: {cache} ({n} entries)")


def cmd_bench(args) -> None:
    """`bench` = the repo's headline benchmark; `bench latency|throughput|
    serve` = the reference's `vllm bench` suites (benchmarks.py)."""
    mode = getattr(args, "mode", "default")
    if mode == "default":
        import bench
        bench.main()
        return
    from lvllm_tpu import benchmarks
    if mode == "serve":
        from lvllm_tpu.entrypoints.llm import _maybe_load_tokenizer
        config = _build_config(args)
        asyncio.run(benchmarks.bench_serve(
            config, load_format=args.load_format,
            tokenizer=_maybe_load_tokenizer(config.model_config.model),
            num_prompts=args.num_prompts, input_len=args.input_len,
            output_len=args.output_len, request_rate=args.request_rate,
            mesh=_make_mesh_if_parallel(args)))
        return
    from lvllm_tpu.entrypoints.llm import LLM
    llm = LLM.from_engine_config(_build_config(args),
                                 load_format=args.load_format,
                                 mesh=_make_mesh_if_parallel(args))
    if mode == "latency":
        benchmarks.bench_latency(llm, batch=args.batch,
                                 input_len=args.input_len,
                                 output_len=args.output_len,
                                 iters=args.iters)
    else:
        benchmarks.bench_throughput(llm, num_prompts=args.num_prompts,
                                    input_len=args.input_len,
                                    output_len=args.output_len)


def cmd_run_batch(args) -> None:
    """Offline OpenAI batch API (reference: vllm run-batch): JSONL of
    {custom_id, body:{prompt|messages, ...}} → JSONL of responses."""
    import json as _json

    from lvllm_tpu.entrypoints.llm import LLM
    from lvllm_tpu.sampling_params import SamplingParams
    from lvllm_tpu.entrypoints.openai_server import \
        sampling_params_from_request

    llm = LLM.from_engine_config(_build_config(args),
                                 load_format=args.load_format)
    requests = []
    with open(args.input_file) as f:
        for line in f:
            line = line.strip()
            if line:
                requests.append(_json.loads(line))
    prompts, sps = [], []
    for req in requests:
        body = req.get("body", req)
        if "messages" in body:
            text = "\n".join(m.get("content", "")
                              for m in body["messages"])
        else:
            text = body.get("prompt", "")
        prompts.append(text if llm.engine.tokenizer else
                       body.get("prompt_token_ids", [1]))
        sps.append(sampling_params_from_request(body))
    outs = llm.generate(prompts, sps)
    with open(args.output_file, "w") as f:
        for req, out in zip(requests, outs):
            f.write(_json.dumps({
                "custom_id": req.get("custom_id"),
                "response": {
                    "status_code": 200,
                    "body": {
                        "choices": [{
                            "index": 0,
                            "text": out.outputs[0].text,
                            "token_ids": out.outputs[0].token_ids,
                            "finish_reason": out.outputs[0].finish_reason,
                        }],
                    },
                },
            }) + "\n")
    logger.info("wrote %d results to %s", len(outs), args.output_file)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="lvllm")
    sub = parser.add_subparsers(dest="command", required=True)

    p_serve = sub.add_parser("serve", help="start OpenAI-compatible server")
    _add_engine_args(p_serve)
    p_serve.add_argument("--host", default="0.0.0.0")
    p_serve.add_argument("--port", type=int, default=8000)
    p_serve.add_argument("--served-model-name", default=None)
    p_serve.add_argument("--tool-call-parser", default="hermes",
                         help="hermes|llama3_json|mistral|deepseek_v3|"
                              "glm4|qwen3_coder")
    p_serve.add_argument("--reasoning-parser", default="basic",
                         help="basic|qwen3|glm45|deepseek_r1|deepseek_v3|"
                              "kimi_k2|step3|minimax_m2|mistral|ernie45|"
                              "hunyuan_a13b|granite|gptoss|identity")
    p_serve.set_defaults(func=cmd_serve)

    p_c = sub.add_parser("complete", help="one-shot completion")
    _add_engine_args(p_c)
    p_c.add_argument("--prompt", default=None)
    p_c.add_argument("--max-tokens", type=int, default=64)
    p_c.add_argument("--temperature", type=float, default=0.0)
    p_c.set_defaults(func=cmd_complete)

    p_b = sub.add_parser("bench", help="benchmarks: default|latency|"
                                       "throughput|serve")
    p_b.add_argument("mode", nargs="?", default="default",
                     choices=["default", "latency", "throughput", "serve"])
    _add_engine_args_optional_model(p_b)
    p_b.add_argument("--batch", type=int, default=8)
    p_b.add_argument("--num-prompts", type=int, default=64)
    p_b.add_argument("--input-len", type=int, default=128)
    p_b.add_argument("--output-len", type=int, default=32)
    p_b.add_argument("--iters", type=int, default=5)
    p_b.add_argument("--request-rate", type=float, default=None,
                     help="Poisson arrivals/s for bench serve")
    p_b.set_defaults(func=cmd_bench)

    p_chat = sub.add_parser("chat", help="interactive chat REPL")
    _add_engine_args(p_chat)
    p_chat.add_argument("--system-prompt", default=None)
    p_chat.add_argument("--max-tokens", type=int, default=256)
    p_chat.add_argument("--temperature", type=float, default=0.7)
    p_chat.set_defaults(func=cmd_chat)

    p_env = sub.add_parser("collect-env",
                           help="print environment report")
    p_env.add_argument("--device", default="auto")
    p_env.set_defaults(func=cmd_collect_env)

    p_rb = sub.add_parser("run-batch", help="offline OpenAI batch API")
    _add_engine_args(p_rb)
    p_rb.add_argument("-i", "--input-file", required=True)
    p_rb.add_argument("-o", "--output-file", required=True)
    p_rb.set_defaults(func=cmd_run_batch)

    args = parser.parse_args(argv)
    if getattr(args, "device", "auto") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    args.func(args)


if __name__ == "__main__":
    main()
