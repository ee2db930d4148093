"""lm-eval adapter protocol tests against a dummy-weight engine
(reference: .buildkite/lm-eval-harness/test_lm_eval_correctness.py —
the harness itself needs real checkpoints; this pins the LM-protocol
scoring semantics)."""

import math

from lvllm_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                              SchedulerConfig)
from lvllm_tpu.engine.llm_engine import LLMEngine
from lvllm_tpu.eval.lm_eval_adapter import LvllmLM, check_gates


class CharTok:
    eos_token_id = 0

    def encode(self, text, add_special_tokens=False):
        return [max(ord(c) % 128, 1) for c in text]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(t) for t in ids if t > 0)


class _LLMShim:
    def __init__(self, engine):
        self.engine = engine

    def generate(self, prompts, sp):
        outs = {}
        for i, p in enumerate(prompts):
            self.engine.add_request(f"ev-{i}", p, sp)
        while self.engine.has_unfinished_requests():
            for o in self.engine.step():
                if o.finished:
                    outs[o.request_id] = o
        return [outs[f"ev-{i}"] for i in range(len(prompts))]


def _make():
    mc = ModelConfig(
        model="dummy", architecture="Qwen3ForCausalLM", dtype="float32",
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, max_model_len=128,
        eos_token_id=0, bos_token_id=1, seed=3)
    eng = LLMEngine(EngineConfig(
        model_config=mc,
        cache_config=CacheConfig(block_size=16, num_gpu_blocks=64),
        scheduler_config=SchedulerConfig(max_num_batched_tokens=128,
                                         max_num_seqs=4,
                                         max_model_len=128)),
        load_format="dummy", tokenizer=CharTok())
    return LvllmLM(_LLMShim(eng), CharTok())


def test_loglikelihood_additivity_and_greedy_flag():
    lm = _make()
    (ll_ab, greedy_ab), = lm.loglikelihood([("abc", "de")])
    (ll_a, _), (ll_b, _) = lm.loglikelihood([("abc", "d"), ("abcd", "e")])
    assert math.isfinite(ll_ab) and ll_ab < 0
    # Chain rule: logp(de|abc) == logp(d|abc) + logp(e|abcd).
    assert abs(ll_ab - (ll_a + ll_b)) < 1e-3
    assert isinstance(greedy_ab, bool)


def test_greedy_continuation_scores_as_greedy():
    lm = _make()
    from lvllm_tpu.sampling_params import SamplingParams
    out = lm.llm.generate([lm.tokenizer.encode("hello")],
                          SamplingParams(temperature=0.0, max_tokens=4))
    cont = out[0].outputs[0].token_ids
    ids = lm.tokenizer.encode("hello") + list(cont)
    from lvllm_tpu.eval.lm_eval_adapter import _score_batch
    core = lm.llm.engine.core
    (ll, greedy), = _score_batch(core.model, core.runner.params, [ids],
                                 [len(lm.tokenizer.encode("hello"))], 16)
    assert greedy          # engine's greedy decode == argmax chain
    assert ll < 0


def test_generate_until_stops_at_sequences():
    lm = _make()

    class R:
        def __init__(self, args):
            self.args = args

    texts = lm.generate_until([R(("hi", {"max_gen_toks": 8,
                                         "until": []}))])
    assert len(texts) == 1 and isinstance(texts[0], str)


def test_check_gates_schema():
    cfg = {"tasks": [{"name": "gsm8k", "metrics": [
        {"name": "exact_match,strict-match", "value": 0.8}]}]}
    ok = {"results": {"gsm8k": {"exact_match,strict-match": 0.79}}}
    bad = {"results": {"gsm8k": {"exact_match,strict-match": 0.5}}}
    assert check_gates(ok, cfg) == []
    assert check_gates(bad, cfg)
    assert check_gates({"results": {}}, cfg)
