"""lm-evaluation-harness adapter + accuracy gates.

Counterpart of the reference's lm-eval plumbing
(``.buildkite/lm-eval-harness/test_lm_eval_correctness.py`` + per-model
gate YAMLs): `LvllmLM` implements the harness's LM protocol
(``loglikelihood`` / ``loglikelihood_rolling`` / ``generate_until``) over
this engine, and :func:`check_gates` compares task metrics against the
committed baselines in ``lvllm_tpu/eval/configs/*.yaml``.

The lm_eval package and real checkpoints are not present in this image
(zero egress), so the adapter import-guards lm_eval and the in-tree tests
exercise the protocol methods directly against a dummy-weight model; on a
networked host:

    pip install lm-eval
    python -m lvllm_tpu.eval.lm_eval_adapter --model <hf-dir> \
        --config lvllm_tpu/eval/configs/qwen3-8b.yaml
"""

import json
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

DEFAULT_RTOL = 0.08


def _score_batch(model, params, token_lists: List[List[int]],
                 ctx_lens: List[int], block_size: int = 16
                 ) -> List[Tuple[float, bool]]:
    """Teacher-forced scoring: for each sequence, the summed log-prob of
    tokens past ``ctx_len`` and whether every one was the argmax."""
    import jax
    import jax.numpy as jnp

    from lvllm_tpu.models.model_base import AttentionMetadata

    outs = []
    for ids, ctx_len in zip(token_lists, ctx_lens):
        T = len(ids)
        nb = -(-T // block_size) + 1
        caches = [model.make_layer_cache(i, nb + 1, block_size,
                                         jnp.float32, max_reqs=2)
                  for i in range(model.config.num_hidden_layers)]
        md = AttentionMetadata(
            query_start_loc=jnp.asarray([0, T], jnp.int32),
            seq_lens=jnp.asarray([T], jnp.int32),
            block_table=jnp.asarray([list(range(1, nb + 1))], jnp.int32),
            slot_mapping=(block_size + jnp.arange(T)).astype(jnp.int32))
        hidden, _ = model(params, jnp.asarray(ids, jnp.int32),
                          jnp.arange(T, dtype=jnp.int32), caches, md)
        logits = np.asarray(model.compute_logits(params, hidden),
                            np.float32)
        logp = logits - jax.scipy.special.logsumexp(
            logits, axis=-1, keepdims=True)
        logp = np.asarray(logp)
        tgt = np.asarray(ids[ctx_len:], np.int64)
        rows = np.arange(ctx_len - 1, T - 1)
        ll = float(logp[rows, tgt].sum())
        greedy = bool((logp[rows].argmax(-1) == tgt).all())
        outs.append((ll, greedy))
    return outs


class LvllmLM:
    """lm-eval `LM` protocol over this engine.

    Instances are usable standalone (the in-tree tests do); when lm_eval
    is installed, :func:`as_lm_eval_model` wraps this in a registered
    subclass of ``lm_eval.api.model.LM``.
    """

    def __init__(self, llm, tokenizer, max_gen_tokens: int = 256):
        self.llm = llm
        self.tokenizer = tokenizer
        self.max_gen_tokens = max_gen_tokens

    # ---- harness protocol -------------------------------------------------

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        """requests: [(context, continuation)] strings (or .args objects).
        Returns [(logprob, is_greedy)]."""
        pairs = [r.args if hasattr(r, "args") else r for r in requests]
        token_lists, ctx_lens = [], []
        for ctx, cont in pairs:
            ctx_ids = self.tokenizer.encode(ctx) if ctx else \
                [self.llm.engine.config.model_config.bos_token_id]
            cont_ids = self.tokenizer.encode(cont)
            token_lists.append(list(ctx_ids) + list(cont_ids))
            ctx_lens.append(len(ctx_ids))
        core = self.llm.engine.core
        return _score_batch(core.model, core.runner.params, token_lists,
                            ctx_lens,
                            self.llm.engine.config.cache_config.block_size)

    def loglikelihood_rolling(self, requests) -> List[float]:
        texts = [(r.args if hasattr(r, "args") else r)[0] for r in requests]
        out = []
        for t in texts:
            ids = self.tokenizer.encode(t)
            core = self.llm.engine.core
            (ll, _), = _score_batch(
                core.model, core.runner.params, [ids], [1],
                self.llm.engine.config.cache_config.block_size)
            out.append(ll)
        return out

    def generate_until(self, requests) -> List[str]:
        from lvllm_tpu.sampling_params import SamplingParams
        outs = []
        for r in requests:
            ctx, kw = (r.args if hasattr(r, "args") else r)
            until = kw.get("until") or []
            sp = SamplingParams(
                temperature=kw.get("temperature", 0.0),
                max_tokens=kw.get("max_gen_toks", self.max_gen_tokens),
                stop=until or None)
            res = self.llm.generate([self.tokenizer.encode(ctx)], sp)
            text = res[0].outputs[0].text
            for s in until:
                idx = text.find(s)
                if idx >= 0:
                    text = text[:idx]
            outs.append(text)
        return outs


def check_gates(results: Dict[str, Any], config: Dict[str, Any],
                rtol: float = DEFAULT_RTOL) -> List[str]:
    """Compare lm-eval `results` against a gate config (the reference's
    per-model YAML schema). Returns a list of failure strings (empty =
    all gates pass)."""
    failures = []
    for task in config["tasks"]:
        got_task = results.get("results", results).get(task["name"], {})
        for metric in task["metrics"]:
            got = got_task.get(metric["name"])
            want = metric["value"]
            if got is None:
                failures.append(f"{task['name']}: metric "
                                f"{metric['name']} missing")
            elif not (got >= want * (1 - rtol)):
                failures.append(
                    f"{task['name']}.{metric['name']}: {got:.4f} < "
                    f"{want:.4f} (rtol {rtol})")
    return failures


def as_lm_eval_model(llm, tokenizer):
    """Wrap LvllmLM in a registered lm_eval model (requires lm-eval)."""
    import lm_eval.api.model

    class _Registered(lm_eval.api.model.LM):
        def __init__(self):
            super().__init__()
            self._inner = LvllmLM(llm, tokenizer)

        def loglikelihood(self, requests):
            return self._inner.loglikelihood(requests)

        def loglikelihood_rolling(self, requests):
            return self._inner.loglikelihood_rolling(requests)

        def generate_until(self, requests):
            return self._inner.generate_until(requests)

    return _Registered()


def main() -> None:
    import argparse

    import yaml

    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args()

    import lm_eval

    from lvllm_tpu.entrypoints.llm import LLM
    llm = LLM(model=args.model)
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(args.model)
    cfg = yaml.safe_load(open(args.config))
    results = lm_eval.simple_evaluate(
        model=as_lm_eval_model(llm, tok),
        tasks=[t["name"] for t in cfg["tasks"]],
        num_fewshot=cfg.get("num_fewshot", 0),
        limit=args.limit or cfg.get("limit"),
        batch_size=cfg.get("batch_size", "auto"))
    failures = check_gates(results, cfg)
    print(json.dumps({"failures": failures,
                      "results": results.get("results")}, default=str))
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
