"""Offline `LLM` entrypoint.

Counterpart of the reference's ``vllm/entrypoints/llm.py`` (LLM class:
generate/chat over a sync engine, ``llm.py:106``).
"""

from typing import List, Optional, Sequence, Union

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              OffloadConfig, ParallelConfig, SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.logger import init_logger
from lvllm_tpu.outputs import RequestOutput
from lvllm_tpu.sampling_params import SamplingParams

logger = init_logger(__name__)


def _maybe_load_tokenizer(model: str):
    if model == "dummy":
        return None
    try:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(model)
    except Exception as e:  # noqa: BLE001
        logger.warning("could not load tokenizer from %s: %s", model, e)
        return None


class LLM:
    """Offline batch inference API.

    >>> llm = LLM(model="/path/to/qwen3", max_model_len=4096)
    >>> outs = llm.generate(["hello"], SamplingParams(max_tokens=16))
    """

    def __init__(
        self,
        model: str = "dummy",
        *,
        model_config: Optional[ModelConfig] = None,
        load_format: str = "auto",
        max_model_len: Optional[int] = None,
        max_num_seqs: int = 128,
        max_num_batched_tokens: int = 2048,
        block_size: int = 16,
        num_kv_blocks: Optional[int] = None,
        enable_prefix_caching: bool = True,
        swap_space_gb: float = 0.0,
        dtype: str = "bfloat16",
        seed: int = 0,
        tensor_parallel_size: int = 1,
        async_scheduling: bool = False,
        multi_step_decode: int = 1,
        speculative_config=None,
        parallel_config=None,
        offload_config=None,
        mesh=None,
    ) -> None:
        if model_config is None:
            if model == "dummy":
                model_config = ModelConfig(model="dummy", dtype=dtype,
                                           seed=seed)
                load_format = "dummy"
            else:
                from lvllm_tpu.model_loader.hf_config import load_model_config
                model_config = load_model_config(
                    model, max_model_len=max_model_len, dtype=dtype)
        if max_model_len is not None:
            model_config.max_model_len = min(max_model_len,
                                             model_config.max_position_embeddings)
        config = EngineConfig(
            model_config=model_config,
            cache_config=CacheConfig(
                block_size=block_size,
                num_gpu_blocks=num_kv_blocks,
                enable_prefix_caching=enable_prefix_caching,
                swap_space_gb=swap_space_gb),
            scheduler_config=SchedulerConfig(
                max_num_batched_tokens=max_num_batched_tokens,
                max_num_seqs=max_num_seqs,
                max_model_len=model_config.max_model_len,
                async_scheduling=async_scheduling,
                multi_step_decode=multi_step_decode),
            parallel_config=parallel_config or ParallelConfig(
                tensor_parallel_size=tensor_parallel_size),
        )
        if offload_config is not None:
            config.offload_config = offload_config
        if speculative_config is not None:
            config.speculative_config = speculative_config
        tokenizer = _maybe_load_tokenizer(model_config.model)
        self.engine = LLMEngine(config, load_format=load_format,
                                tokenizer=tokenizer, mesh=mesh)

    @classmethod
    def from_engine_config(cls, config: EngineConfig,
                           load_format: str = "auto", mesh=None) -> "LLM":
        """Build from a fully-specified EngineConfig (CLI/YAML path)."""
        self = cls.__new__(cls)
        tokenizer = _maybe_load_tokenizer(config.model_config.model)
        self.engine = LLMEngine(config, load_format=load_format,
                                tokenizer=tokenizer, mesh=mesh)
        return self

    def generate(
        self,
        prompts: Union[str, List[int], Sequence[Union[str, List[int]]]],
        sampling_params: Optional[Union[SamplingParams,
                                        List[SamplingParams]]] = None,
    ) -> List[RequestOutput]:
        if isinstance(prompts, str) or (
                prompts and isinstance(prompts, (list, tuple))
                and isinstance(prompts[0], int)):
            prompts = [prompts]
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * len(prompts)

        # n>1: fan out into n sibling requests (distinct seeds); the prefix
        # cache shares the prompt KV across siblings (reference: n parameter
        # handled via parallel sampling; beam_search builds on the same
        # fanout).
        slots: List[List[str]] = []
        for p, sp in zip(prompts, sampling_params):
            group: List[str] = []
            for j in range(max(sp.n, 1)):
                spj = sp.clone()
                spj.n = 1
                if sp.n > 1:
                    spj.seed = (sp.seed + j) if sp.seed is not None else None
                group.append(self.engine.add_request(None, p, spj))
            slots.append(group)

        finals = {}
        while self.engine.has_unfinished_requests():
            for out in self.engine.step():
                if out.finished:
                    finals[out.request_id] = out

        results: List[RequestOutput] = []
        for group in slots:
            parent = finals[group[0]]
            if len(group) > 1:
                outs = []
                for j, rid in enumerate(group):
                    c = finals[rid].outputs[0]
                    c.index = j
                    outs.append(c)
                parent.outputs = outs
            results.append(parent)
        return results

    def beam_search(self, prompt, beam_width: int = 4,
                    max_tokens: int = 16) -> List[dict]:
        """Beam search decoding (reference: vllm/beam_search.py + LLM.
        beam_search): iterative expansion using top-k logprobs; the prefix
        cache makes per-step re-prefill cheap. Returns beams sorted by
        cumulative logprob: [{token_ids, cum_logprob, finished}]."""
        from lvllm_tpu.worker.model_runner import ModelRunner
        assert 2 * beam_width <= ModelRunner.MAX_TOPK_LOGPROBS, \
            f"beam_width > {ModelRunner.MAX_TOPK_LOGPROBS // 2} unsupported"
        if isinstance(prompt, str):
            if self.engine.tokenizer is None:
                raise ValueError("string prompt requires a tokenizer")
            prompt = self.engine.tokenizer.encode(prompt)
        eos = self.engine.config.model_config.eos_token_id

        beams = [([], 0.0)]
        completed: List[tuple] = []
        for _ in range(max_tokens):
            if not beams:
                break
            prompts = [list(prompt) + toks for toks, _ in beams]
            sps = [SamplingParams(temperature=0.0, max_tokens=1,
                                  logprobs=2 * beam_width, ignore_eos=True)
                   for _ in beams]
            outs = self.generate(prompts, sps)
            candidates = []
            for (toks, lp), out in zip(beams, outs):
                top = (out.outputs[0].logprobs or [{}])[0]
                for t, l in top.items():
                    candidates.append((lp + l, toks + [t]))
            candidates.sort(key=lambda c: c[0], reverse=True)
            beams = []
            for lp, toks in candidates:
                if eos is not None and eos >= 0 and toks[-1] == eos:
                    completed.append((lp, toks[:-1], True))
                elif len(beams) < beam_width:
                    beams.append((toks, lp))
                if len(beams) >= beam_width and \
                        len(completed) >= beam_width:
                    break
        completed.extend((lp, toks, False) for toks, lp in beams)
        completed.sort(key=lambda c: c[0], reverse=True)
        return [{"token_ids": toks, "cum_logprob": lp, "finished": fin}
                for lp, toks, fin in completed[:beam_width]]

    def embed(self, prompts, pooling: str = "auto"):
        """Embedding API (reference: LLM.encode/embed). Returns [N, H]
        normalized float32 vectors."""
        from lvllm_tpu.engine.pooling import PoolingRunner
        if isinstance(prompts, str) or (
                prompts and isinstance(prompts, (list, tuple))
                and isinstance(prompts[0], int)):
            prompts = [prompts]
        token_lists = []
        for p in prompts:
            if isinstance(p, str):
                if self.engine.tokenizer is None:
                    raise ValueError("string prompt requires a tokenizer")
                token_lists.append(self.engine.tokenizer.encode(p))
            else:
                token_lists.append(list(p))
        if not hasattr(self, "_pooling_runner"):
            self._pooling_runner = PoolingRunner(
                self.engine.core.model, self.engine.core.runner.params,
                block_size=self.engine.config.cache_config.block_size)
        return self._pooling_runner.embed(token_lists, pooling=pooling)

    def classify(self, prompts):
        """Cross-encoder classification logits (reference: LLM.classify /
        score over BertForSequenceClassification-style models)."""
        from lvllm_tpu.engine.pooling import PoolingRunner
        if isinstance(prompts, str) or (
                prompts and isinstance(prompts, (list, tuple))
                and isinstance(prompts[0], int)):
            prompts = [prompts]
        token_lists = []
        for p in prompts:
            if isinstance(p, str):
                if self.engine.tokenizer is None:
                    raise ValueError("string prompt requires a tokenizer")
                token_lists.append(self.engine.tokenizer.encode(p))
            else:
                token_lists.append(list(p))
        if not hasattr(self, "_pooling_runner"):
            self._pooling_runner = PoolingRunner(
                self.engine.core.model, self.engine.core.runner.params,
                block_size=self.engine.config.cache_config.block_size)
        return self._pooling_runner.classify(token_lists)

    def get_stats(self) -> dict:
        return self.engine.get_stats()
